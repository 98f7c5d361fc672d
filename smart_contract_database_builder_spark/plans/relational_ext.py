"""Relational surface extensions (SURVEY.md J5, A5-A6, O4, W1-W2, SET,
F19) — the gaps beyond ``relational.py``'s core: as-of and band joins,
cube/grouping sets, EXCEPT ALL, full ranking/analytic window variants,
seeded sampling, approximate distinct, and the events props map surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import dsum
from ..sources.tables import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations: approx distinct (CUBE / GROUPING SETS / EXCEPT ALL merged
# into relational.py's agg_grouping_shapes / set_ops_customer_keys)
# ---------------------------------------------------------------------------


@register("agg_approx_distinct_users", oracle=None)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: HyperLogLog++ approximate distinct (rows-only: HLL sketches
    are implementation-specific, so no cross-engine hash check — the
    test asserts the estimate lands within the configured rsd of the
    exact count)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("event_id", rsd=0.02).alias("approx_events"),
    )


@register("sample_orders_seeded", oracle=None)
def sample_orders_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: seeded Bernoulli sampling (reference db.rs:123-145 picks
    random rows). Deterministic for a fixed seed+partitioning within
    Spark, but RNG streams differ across engines — rows-only check."""
    return (
        _t(spark, sf_dir, "orders")
        .sample(fraction=0.1, seed=42)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Window variants: full ranking + analytic families
# ---------------------------------------------------------------------------


@register(
    "window_rank_variants",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 full family: rank / dense_rank / ntile / percent_rank over a
    totally-ordered window (orderkey tie-break ⇒ deterministic)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# J5: as-of join + band (range) join
# ---------------------------------------------------------------------------


@register(
    "join_asof_latest_order",
    oracle="""
    WITH od AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM orders
      QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1
    )
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS order_key, o.o_totalprice AS order_price
    FROM events e
    ASOF JOIN od o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def join_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: as-of join — for each event, the user's most recent order at
    or before the event time.

    Spark has no ASOF JOIN operator; the scalable equivalent is the
    union + running-``last`` trick: tag both streams, sort within user
    by (time, tag), and carry the latest order forward with
    ``last(..., ignorenulls)`` over a running frame. ONE shuffle on the
    join key (same as a sort-merge join would pay) and no point-in-time
    subquery per row — this is the plan that survives 100 TB. Orders are
    first deduped per (custkey, date) so ties can't make the match
    nondeterministic (the oracle dedupes identically).
    """
    orders = _t(spark, sf_dir, "orders")
    events = _t(spark, sf_dir, "events")
    w_dedup = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    od = (
        orders.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("t"),
            F.struct("o_orderkey", "o_totalprice").alias("ord"),
        )
        .withColumn("tag", F.lit(0))
        .withColumn("event_id", F.lit(None).cast("long"))
    )
    ev = events.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("struct<o_orderkey:bigint,o_totalprice:double>").alias(
            "ord"
        ),
        F.lit(1).alias("tag"),
        "event_id",
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag", F.col("ord.o_orderkey").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = od.unionByName(ev).withColumn(
        "matched", F.last("ord", ignorenulls=True).over(w_run)
    )
    return (
        merged.filter((F.col("tag") == 1) & F.col("matched").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("matched.o_orderkey").alias("order_key"),
            F.col("matched.o_totalprice").alias("order_price"),
        )
    )


@register(
    "join_range_event_pairs",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_pairs
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '1 minute'
    GROUP BY a.user_id
    """,
)
def join_range_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: band (interval) self-join — pairs of same-user events within
    one minute.

    The equi key (user_id) carries the shuffle, so Spark plans a
    sort-merge join with the band predicates as post-join filters —
    per-user buckets only, never a cartesian across users. At 100 TB
    the refinement is bucketing both sides by time window (join on
    user × window, window ∈ {w, w+1}) to bound the per-key scan.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 MINUTE")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# F19: events props as a typed map
# ---------------------------------------------------------------------------


@register(
    "scalar_map_explode_props",
    oracle="""
    SELECT k AS prop_key,
           COUNT(*) AS n_events,
           COUNT(DISTINCT json_extract_string(props, '$.' || k)) AS n_values,
           MIN(TRY_CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS min_v,
           MAX(TRY_CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS max_v
    FROM events, unnest(json_keys(props)) u(k)
    GROUP BY k
    """,
)
def scalar_map_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F19: props JSON decoded as a typed map and exploded to
    key-level stats — ``from_json(MapType)`` + ``explode``, the full
    map surface (vs. the point access in scalar_json_props_events)."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        ev.select(F.explode(m).alias("prop_key", "v"))
        .groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("v").alias("n_values"),
            F.min(F.col("v").try_cast("bigint")).alias("min_v"),
            F.max(F.col("v").try_cast("bigint")).alias("max_v"),
        )
    )


@register(
    "agg_percentile_prices",
    oracle="""
    SELECT o_orderpriority,
           q[1] AS p25, q[2] AS p50, q[3] AS p75, q[4] AS p99,
           n
    FROM (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.99]) AS q,
             COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
    )
    """,
)
def agg_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5-adjacent: EXACT interpolated percentiles per group —
    ``percentile`` (Spark) vs ``quantile_cont`` (DuckDB) agree bitwise
    because both interpolate linearly between the same order statistics
    of the same doubles. The exact form is the oracle-checkable anchor;
    at corpus scale the same query swaps to ``percentile_approx``
    (t-digest sketch, mergeable map-side, no full sort per group) — the
    approximate twin has no cross-engine oracle by nature, which is why
    the exact one carries the correctness row. Registered in _OVERFLOW
    (pytest-swept, past the full driver window).
    """
    orders = _t(spark, sf_dir, "orders")
    q = F.expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.99D))")
    return (
        orders.groupBy("o_orderpriority")
        .agg(q.alias("q"), F.count(F.lit(1)).alias("n"))
        .select(
            "o_orderpriority",
            F.col("q")[0].alias("p25"),
            F.col("q")[1].alias("p50"),
            F.col("q")[2].alias("p75"),
            F.col("q")[3].alias("p99"),
            "n",
        )
    )


@register("agg_percentile_prices_approx", oracle=None)
def agg_percentile_prices_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale twin of ``agg_percentile_prices`` (rows-only:
    ``percentile_approx`` is a Greenwald-Khanna sketch whose outputs are
    implementation-defined — no cross-engine oracle can exist; pytest
    bounds its rank error against the exact form instead,
    ``tests/test_percentile_approx_twin.py``).

    Scale shape: the exact ``percentile`` buffers and sorts every value
    of a group on one reducer — at 100 TB a single hot group OOMs it.
    The sketch aggregate is mergeable, so it combines map-side like any
    hash agg (partial sketches shuffle, not rows); accuracy 1/10000 ⇒
    rank error ≤ 0.01% of each group, far below any decision threshold
    a data-mixing pipeline would set on a price/length percentile.
    """
    orders = _t(spark, sf_dir, "orders")
    q = F.expr(
        "percentile_approx(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.99D), 10000)"
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(q.alias("q"), F.count(F.lit(1)).alias("n"))
        .select(
            "o_orderpriority",
            F.col("q")[0].alias("p25"),
            F.col("q")[1].alias("p50"),
            F.col("q")[2].alias("p75"),
            F.col("q")[3].alias("p99"),
            "n",
        )
    )
