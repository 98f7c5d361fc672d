"""Incremental hourly rollup: three out-of-order refreshes must land on
exactly the one-shot full aggregate (and DuckDB's own full-history
aggregate), and a replayed refresh must no-op (rows-only — the sink is
a side effect; the in-Spark aggregate itself is the oracle-checked
tumbling family)."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_contract_database_builder_spark.sinks.rollup import (
    read_rollup,
    refresh_rollup,
)
from smart_contract_database_builder_spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_incremental_refresh_equals_full_rollup(spark, tmp_path):
    db = str(tmp_path / "rollup.duckdb")
    events = load_table(spark, SF_SMOKE, "events")

    # three slices, deliberately NOT time-ordered: slice 2 carries the
    # middle of the timeline last, so late data must merge into buckets
    # earlier refreshes already created
    s0 = events.filter(F.col("event_id") % 3 == 0)
    s1 = events.filter(F.col("event_id") % 3 == 1)
    s2 = events.filter(F.col("event_id") % 3 == 2)
    refresh_rollup(s0, db, batch_id=0)
    refresh_rollup(s2, db, batch_id=1)
    refresh_rollup(s1, db, batch_id=2)

    got = read_rollup(db)

    # the one-shot truth straight from DuckDB over the full history
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS VARCHAR),
               event_type,
               COUNT(*),
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]

    # replayed refresh (same batch id, same data): additive merge would
    # double-count — the ledger must no-op it
    refresh_rollup(s1, db, batch_id=2)
    assert read_rollup(db) == got
