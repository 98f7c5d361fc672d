"""Parquet scans of the driver-generated testdata tables (SURVEY.md S13).

All loaders declare the schema explicitly — no inference pass — so the
scan plans show full column pruning (``ReadSchema``) and predicate
pushdown (``PushedFilters``) when queries project/filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TABLE_NAMES, TESTDATA_SCHEMAS


def _events_ts_is_nanos(spark: SparkSession, path: str) -> bool:
    """Detect whether ``ts`` is stored as parquet TIMESTAMP(NANOS).

    Spark cannot decode NANOS as a TimestampType; under
    ``spark.sql.legacy.parquet.nanosAsLong`` a NANOS column *infers* as
    LongType while MICROS/MILLIS infer as TimestampType — so one
    footer-only inference read tells us the physical unit. Inference
    reads parquet footers (distributed, merge-schema off), so this stays
    cheap on a many-file dataset; the result is memoized per path
    because the unit is a property of the files, not the query.
    """
    cache = getattr(spark, "_scdb_events_nanos", None)
    if cache is None:
        cache = spark._scdb_events_nanos = {}
    if path not in cache:
        inferred = spark.read.parquet(path).schema["ts"].dataType
        cache[path] = isinstance(inferred, T.LongType)
    return cache[path]


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load ``events`` with unit-correct ``ts`` decoding.

    The testdata generator has shipped ``events.ts`` as both parquet
    TIMESTAMP(NANOS) (rounds 1-3) and TIMESTAMP(MICROS) (round 4+), so
    the loader detects the physical unit instead of hard-coding one:

    - MICROS/MILLIS: Spark decodes natively — read with the declared
      TimestampType schema, no conversion.
    - NANOS: read ``ts`` as LONG nanoseconds (via ``nanosAsLong``) and
      floor-convert to a µs TimestampType.

    A hard-coded unit silently shifts every event 1000× in time (see
    VERDICT round 4); ``tests/test_tables.py`` pins a 2024-date fixture
    so a future unit flip fails loudly.
    """
    # Defensive: the conf is runtime-settable, and sessions built outside
    # session.get_spark (e.g. the driver's harness) won't have it. Needed
    # both for the inference probe and the NANOS read path.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    if not _events_ts_is_nanos(spark, path):
        return spark.read.schema(TESTDATA_SCHEMAS["events"]).parquet(path)
    raw_schema = T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.LongType())
            for f in TESTDATA_SCHEMAS["events"].fields
        ]
    )
    raw = spark.read.schema(raw_schema).parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))).select(
        *[f.name for f in TESTDATA_SCHEMAS["events"].fields]
    )


def _ensure_session_confs(spark: SparkSession) -> None:
    """Pin runtime-settable confs the engine's semantics depend on.

    The driver's harness imports ``__spark_entry__`` with a vanilla
    session (no ``session.get_spark`` defaults), so timestamp semantics
    (year/month/date_format, timestamp-literal casts) would otherwise
    follow the host JVM timezone and diverge from DuckDB's naive
    timestamps on non-UTC hosts. Memoized per session so repeated
    ``load_table`` calls don't re-issue conf RPCs.
    """
    if getattr(spark, "_scdb_confs_pinned", False):
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark._scdb_confs_pinned = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table from ``{sf_dir}/{name}.parquet``."""
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    _ensure_session_confs(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    # Schema is passed for contract/pruning clarity; parquet is self-describing
    # so this also acts as an assertion that the file matches expectations.
    return (
        spark.read.schema(TESTDATA_SCHEMAS[name])
        .parquet(f"{sf_dir}/{name}.parquet")
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for ``spark.sql`` queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
