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


#: The decomposable aggregate kinds salted_agg accepts, mapped to the
#: re-aggregation applied to the per-salt partials. An aggregate whose
#: partials do NOT merge under one of these (avg, stddev, percentiles,
#: count-distinct) has no entry — pass its decomposition explicitly
#: (e.g. avg = sum partial + count partial, divided after the final).
_MERGE_BY_KIND = {
    "sum": F.sum,    # partial sums re-sum
    "count": F.sum,  # partial counts re-SUM (re-counting would count groups)
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    key: str | Column,
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial aggregate on
    (key, salt) — at most ``n_salts`` partials per key per wave — then
    final aggregate on the key.

    ``aggs`` maps each output name to ``(kind, partial_expr)``, where
    ``kind`` ∈ {"sum", "count", "min", "max"} names how the partials
    merge. The kind is EXPLICIT because it cannot be inferred: an
    earlier version re-aggregated by column-name convention, which
    silently re-SUMMED any non-prefixed aggregate — a caller passing an
    ``avg_x`` partial got a wrong answer instead of an error. A kind
    outside the whitelist raises immediately.
    """
    for name, spec in aggs.items():
        if (
            not isinstance(spec, tuple)
            or len(spec) != 2
            or spec[0] not in _MERGE_BY_KIND
        ):
            raise ValueError(
                f"salted_agg aggregate {name!r} must be (kind, expr) with "
                f"kind in {sorted(_MERGE_BY_KIND)}; got {spec!r}. "
                "Non-decomposable aggregates (avg/stddev/percentile/"
                "count-distinct) must be decomposed by the caller."
            )
    key_col = F.col(key) if isinstance(key, str) else key
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key_col.alias("_key"), F.col("_salt")).agg(
        *[expr.alias(name) for name, (_, expr) in aggs.items()]
    )
    finals = [
        _MERGE_BY_KIND[kind](name).alias(name)
        for name, (kind, _) in aggs.items()
    ]
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
