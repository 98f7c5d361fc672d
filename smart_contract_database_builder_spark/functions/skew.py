"""Skew-handling helpers (SURVEY.md §4.2 / scale brief): salting for
hot keys, two-phase salted aggregation.

AQE's skew-join splitting handles most cases automatically; explicit
salting is for the stubborn shapes — a groupBy where one key holds a
double-digit percentage of all rows, or a join against such a key —
where spreading the hot key across ``n_salts`` synthetic sub-keys keeps
every task bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts): hash of the whole row —
    stable across retries (no rand(), which breaks task re-execution)."""
    return df.withColumn(
        col_name, F.pmod(F.hash(*df.columns), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    key: str | Column,
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial aggregate on
    (key, salt) — at most ``n_salts`` partials per key per wave — then
    final aggregate on the key. Every agg expression must be
    decomposable (sum/count/min/max); provide the partial expression in
    ``aggs`` and the matching re-aggregate is applied by name:
    sums re-sum, counts re-sum, min/max re-apply.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key_col.alias("_key"), F.col("_salt")).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    # re-aggregation by naming convention: count_/n_ columns re-SUM,
    # min_/max_ re-apply, everything else re-SUMs (sums)
    finals = []
    for name in aggs:
        if name.startswith("min_"):
            finals.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            finals.append(F.max(name).alias(name))
        else:
            finals.append(F.sum(name).alias(name))
    return partial.groupBy(F.col("_key")).agg(*finals)


def hot_key_split_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    how: str = "inner",
) -> DataFrame:
    """Skewed-join rewrite for keys AQE can't save (a key so hot its
    split partitions still straggle): route the hot-key rows through a
    BROADCAST join against the matching dim slice — no shuffle touches
    them at all — and shuffle-join only the well-behaved remainder.

    ``hot_keys`` comes from the caller's frequency knowledge (a prior
    approx_count or domain constant — e.g. the null/default key, the
    mega-customer). Only ``inner``/``left_semi`` routing is exposed:
    outer variants would need null-key bookkeeping across the split,
    which is exactly the subtle-wrong-answer territory this helper
    exists to avoid.

    Value-neutrality (split ∪ == plain join) is pinned in
    tests/test_scale_layout.py.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"hot_key_split_join supports inner/left_semi, got {how!r}")
    k = F.col(key)
    fact_hot = fact.filter(k.isin(hot_keys))
    fact_cold = fact.filter(~k.isin(hot_keys))
    dim_hot = dim.filter(F.col(key).isin(hot_keys))
    joined_hot = fact_hot.join(F.broadcast(dim_hot), key, how)
    joined_cold = fact_cold.join(dim, key, how)
    return joined_hot.unionByName(joined_cold)
