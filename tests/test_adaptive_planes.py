"""Adaptive hyperplane count (r7 VERDICT item #5).

The ANN family self-sizes its LSH plane count from a corpus count:
``planes = max(floor, ceil(log2(N / target_bucket)))``. These tests pin

1. the rule's values (floor for small corpora, 17 planes at 1e9
   vectors / 1e4-vector buckets — the SCALE.md scaling rule, now code);
2. that every driver corpus (sf0.001/sf0.01/sf0.1) derives the FLOOR,
   which is why the registered DuckDB oracles may bake ``_N_PLANES``;
3. exact Spark↔DuckDB bucket parity at TWO corpus sizes that derive
   DIFFERENT plane counts (shrunken ``target_bucket`` so the rule
   leaves the floor at test scale), with the oracle SQL generated from
   the same ``_sql_bucket_expr`` helper the registered oracles use.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_contract_database_builder_spark.plans.llm_ops import (
    _N_PLANES,
    _SQL_ISCALE,
    _bucket_expr,
    _iscale,
    _sql_bucket_expr,
    adaptive_planes,
)

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.exists(os.path.join(d, "embeddings.parquet"))
]


def test_rule_values():
    assert adaptive_planes(0) == _N_PLANES
    assert adaptive_planes(1) == _N_PLANES
    assert adaptive_planes(10_000) == _N_PLANES
    # the documented 100 TB point: 1e9 vectors / 1e4-vector buckets
    assert adaptive_planes(1_000_000_000) == 17
    # floor holds right up to target_bucket << floor
    assert adaptive_planes(10_000 << _N_PLANES) == _N_PLANES
    assert adaptive_planes((10_000 << _N_PLANES) + 1) > _N_PLANES
    # monotone in N
    prev = 0
    for n in (1, 10**4, 10**6, 10**7, 10**8, 10**9, 10**12):
        p = adaptive_planes(n)
        assert p >= prev
        prev = p


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_driver_corpora_derive_the_floor(spark, sf_dir):
    """The registered oracles bake _N_PLANES; that is sound only while
    every corpus the driver runs derives exactly the floor."""
    n = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    assert adaptive_planes(n) == _N_PLANES, (sf_dir, n)


def _synth_embeddings(spark, n_rows: int, dims: int = 64):
    """Deterministic synthetic embedding corpus — no RNG, engine-free."""
    return spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dims)),
            lambda d: F.sin(F.col("id") * d).cast("double"),
        ).alias("embedding"),
    )


@pytest.mark.parametrize("n_rows", [48, 400])
def test_bucket_parity_at_derived_plane_counts(spark, n_rows):
    """Two corpus sizes, two DIFFERENT derived plane counts, exact
    bucket parity — the oracle SQL is generated at the derived count by
    the same helper the registered oracles use at the floor."""
    target, floor = 4, 2
    planes = adaptive_planes(n_rows, target_bucket=target, floor=floor)
    other = adaptive_planes(48 if n_rows != 48 else 400, target_bucket=target, floor=floor)
    assert planes != other  # the two parametrizations genuinely differ
    assert planes == math.ceil(math.log2(n_rows / target))

    df = _synth_embeddings(spark, n_rows)
    got = (
        df.select("vec_id", F.transform("embedding", _iscale).alias("sv"))
        .select("vec_id", _bucket_expr(n_planes=planes).alias("bucket"))
        .orderBy("vec_id")
        .toPandas()
    )

    con = duckdb.connect()
    pdf = df.toPandas()
    con.register("embeddings", pdf)
    want = con.execute(
        f"""
        SELECT vec_id, {_sql_bucket_expr(planes)} AS bucket
        FROM (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> {_SQL_ISCALE.format(v="x")}) AS sv
          FROM embeddings
        )
        ORDER BY vec_id
        """
    ).df()
    assert len(got) == n_rows
    assert got["bucket"].str.len().eq(planes).all()
    assert list(got["vec_id"]) == list(want["vec_id"])
    assert list(got["bucket"]) == list(want["bucket"])
