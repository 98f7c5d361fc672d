"""Bucketed co-located joins: the pay-the-shuffle-once layout must
actually eliminate exchanges, and keep answers identical to the plain
shuffled join."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from smart_contract_database_builder_spark.sources.bucketing import (
    co_located_join,
    write_bucketed,
)
from smart_contract_database_builder_spark.sources.tables import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(
        orders, "b_orders", "o_orderkey", 4, str(root / "orders")
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        4,
        str(root / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # at test SF the planner would broadcast (cheaper than ANY shuffle
    # strategy, bucketed or not) — disable it to surface the plan the
    # layout exists for: fact⋈fact at a scale where broadcast is off
    # the table and co-partitioning must come from the catalog
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        joined = co_located_join(spark, left, right, "o_orderkey").select(
            "o_orderkey", "o_totalprice", "l_quantity"
        )
        joined.collect()  # final adaptive plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # and the scans really use the bucketed layout
        assert "Bucketed: true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    bucketed = co_located_join(spark, left, right, "o_orderkey")
    plain = load_table(spark, SF_SMOKE, "orders").join(
        load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "o_orderkey",
    )
    b = bucketed.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
    ).collect()[0]
    p = plain.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
    ).collect()[0]
    assert tuple(b) == tuple(p)


def test_bucketed_scan_prunes_columns(spark, bucketed_tables):
    """Bucketing must not cost the scan its column pruning."""
    left, _ = bucketed_tables
    df = spark.table(left).select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "o_comment" not in plan
