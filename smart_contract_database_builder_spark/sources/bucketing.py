"""Bucketed-table layout: persist the shuffle once, join forever (S5/J3
at warehouse scale).

The scans in ``tables.py`` read plain parquet, so every fact⋈fact join
(lineitem⋈orders on the order key) pays a full shuffle of both sides
per query. For keys that carry MANY downstream joins, the 100 TB answer
is to pay that shuffle once at write time: ``bucketBy(k, key)`` hashes
rows into a fixed bucket count persisted in the table metadata, and two
tables bucketed the same way join with ZERO exchanges — Spark proves
co-partitioning from the catalog and plans a local sort-merge join per
bucket pair. ``sortBy`` additionally pre-orders within buckets so even
the sort may be elided.

Bucket-count rule: fixed at write time (it IS the physical layout), so
pick for the target scale — buckets ≈ table_bytes / 128 MiB, rounded to
a multiple of the cluster's parallelism; both join sides must use the
SAME count (or a divisor, with ``spark.sql.bucketing.coalesceBucketsInJoin``)
for the exchange-free plan. Writing N output files per task × buckets
is the known small-files hazard — repartition by the bucket key before
writing so each task owns whole buckets.

Demonstrated and plan-asserted (no Exchange in the joined plan) in
tests/test_bucketing_layout.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Persist ``df`` as a bucketed+sorted catalog table at ``path``.

    The pre-write ``repartition(n_buckets, key)`` aligns tasks with
    buckets: without it every task writes a file into every bucket
    (tasks × buckets small files)."""
    (
        df.repartition(n_buckets, F.col(key))
        .write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def register_bucketed(
    spark: SparkSession,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Re-attach an EXISTING bucketed layout to the (in-memory) session
    catalog: the files survive across sessions, the catalog entry does
    not — without re-registration every new session would pay the full
    bucketed rewrite even though valid files sit on disk. The DDL
    declares the same bucket spec the writer used (the catalog's
    bucket metadata, not the files, is what lets the planner prove
    co-partitioning), and the column schema is read from the files
    themselves so a writer-side schema change can never silently
    register a mismatched table."""
    schema = spark.read.parquet(path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    spark.sql(
        f"CREATE TABLE `{table}` ({cols}) USING parquet "
        f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — the
    catalog metadata lets Spark prove co-partitioning, so the plan
    carries no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)
