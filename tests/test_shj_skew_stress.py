"""Stress test for the engine-wide ``preferSortMergeJoin=false`` default
(session.py _DEFAULTS; r17 VERDICT "what's wrong" #2 / ADVICE #1).

Shuffled-hash join builds each partition's build side into an in-memory
hash map, so the hazard the conf introduces is a SKEWED or
stats-underestimated build partition that does not fit. These tests
demonstrate, under the ENGINE confs (SHJ preference + AQE skew/coalesce
guards as shipped), that:

1. the planner actually picks ShuffledHashJoin for a moderate build side
   above the broadcast threshold (the conf does what it claims);
2. a join whose build side carries one hot key holding ~half the rows —
   max/median partition ratio far past the guide-§2.5 "worth fixing"
   bar — COMPLETES with the correct exact result (no OOM/abort), i.e.
   the size gating + AQE guards hold where sort-merge would have
   degraded gracefully by spilling.

The build side is sized to be a real hash-map build (hundreds of
thousands of rows, wide payload) while staying inside the test session's
heap: the point is skew behavior under the shipped confs, not crashing
the JVM for sport.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_engine_confs_pick_shuffled_hash_for_midsize_build(spark):
    """Sanity: over-threshold build side + SHJ preference ⇒ the planner
    picks ShuffledHashJoin, not SortMergeJoin (the conf is live).

    Sizing note: the stats estimator prices strings at their 20-byte
    DEFAULT width (it cannot see literal lengths), so the gates are
    driven by ROW COUNT, not payload width. The planner needs
    (a) build estimate > 64 MiB broadcast threshold,
    (b) build estimate < threshold × shuffle partitions
        (canBuildLocalHashMapBySize), and
    (c) probe estimate ≥ 3 × build estimate (muchSmaller).
    4M × ~36 B ≈ 137 MiB build vs 24M × 24 B ≈ 576 MiB probe satisfies
    all three under the test session's 4 shuffle partitions. This test
    only PLANS (no execution), so the row counts are free."""
    assert spark.conf.get("spark.sql.join.preferSortMergeJoin") == "false"
    big = spark.range(0, 24_000_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    build = spark.range(0, 4_000_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("pay"),
    )
    plan = _plan(big.join(build, "k"))
    assert "ShuffledHashJoin" in plan, plan


def test_shj_completes_on_skewed_build_side(spark):
    """One build key owns ~50% of the build rows (hot-key skew: the
    max/median partition ratio is >> the AQE skewedPartitionFactor).
    The join must complete under the engine confs and produce the exact
    expected row count."""
    n_build = 400_000
    hot_share = 2  # every even id collapses onto key 0 → ~200k-row key
    build = spark.range(0, n_build).select(
        F.when((F.col("id") % hot_share) == 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.concat(F.lit("x" * 120), F.col("id").cast("string")).alias("pay"),
    )
    probe = spark.range(0, 50_000).select(
        (F.col("id") % 25_000).alias("k"), F.col("id").alias("p")
    )
    joined = probe.join(build.hint("shuffle_hash"), "k")
    # expected exact count, computed independently: key 0 matches every
    # even build id (n_build/2 rows) for each of the 2 probe rows with
    # k=0; every other probe key k<n_build matches exactly the odd build
    # ids k (k odd) — i.e. 2 probe rows × 1 build row per odd k < 25k.
    hot_matches = 2 * (n_build // 2)
    odd_keys = len([k for k in range(1, 25_000) if k % 2 == 1])
    expected = hot_matches + 2 * odd_keys
    assert "ShuffledHashJoin" in _plan(joined)
    assert joined.count() == expected


def test_shj_completes_when_stats_underestimate_the_build(spark):
    """A filter + generator inflates the build side far past what the
    scan stats suggest (the 'stats-underestimated' hazard class): each
    build row explodes 32×. The planner's size gate sees the
    pre-explode estimate; the join must still complete exactly."""
    build = (
        spark.range(0, 20_000)
        .select(F.col("id").alias("k"))
        .select("k", F.explode(F.array(*[F.lit(i) for i in range(32)])).alias("j"))
        .select("k", F.concat(F.lit("y" * 100), F.col("j").cast("string")).alias("pay"))
    )
    probe = spark.range(0, 20_000).select(F.col("id").alias("k"))
    joined = probe.join(build.hint("shuffle_hash"), "k")
    assert joined.count() == 20_000 * 32
