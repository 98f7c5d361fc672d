"""Exactly-once streaming sink: replayed epochs and replayed keys must
both leave the DuckDB sink duplicate-free (rows-only — the sink is a
side effect, not a comparable relation; the STREAM's correctness is
covered by the batch-twin oracle queries)."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_contract_database_builder_spark.sinks.streaming_duckdb import (
    exactly_once_upsert,
    stream_events_to_duckdb,
)

from conftest import SF_SMOKE


def _count(db, table):
    con = duckdb.connect(db)
    try:
        return con.execute(f"SELECT COUNT(*) FROM {table}").fetchone()[0]
    finally:
        con.close()


def test_stream_drain_and_epoch_replay_idempotent(spark, tmp_path):
    db = str(tmp_path / "sink.duckdb")

    n = stream_events_to_duckdb(
        spark, SF_SMOKE, db, str(tmp_path / "ckpt")
    )
    assert n > 0
    # the sink equals the batch-side dedup of the same input
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    distinct_ids = events.select("event_id").distinct().count()
    assert n == distinct_ids

    # FORCED EPOCH REPLAY: re-deliver an already-committed batch id with
    # the full input (what foreachBatch does after a crash between sink
    # write and checkpoint commit) — the ledger must no-op it
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    writer = exactly_once_upsert(db, "events_sink", ["event_id"])
    writer(batch, 0)  # batch_id 0 was committed by the drain
    assert _count(db, "events_sink") == n

    # CROSS-EPOCH KEY REPLAY: a NEW batch id carrying already-seen keys
    # (source rewound past the checkpoint) — the unique index must
    # swallow every duplicate key
    writer(batch, 999_999)
    assert _count(db, "events_sink") == n

    # the ledger recorded the no-op epoch with zero inserted rows
    con = duckdb.connect(db)
    try:
        inserted = con.execute(
            "SELECT n_rows FROM _stream_ledger WHERE batch_id = 999999"
        ).fetchone()[0]
    finally:
        con.close()
    assert inserted == 0


def test_fresh_keys_in_new_epoch_do_insert(spark, tmp_path):
    db = str(tmp_path / "sink2.duckdb")
    writer = exactly_once_upsert(db, "events_sink", ["event_id"])
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(50)
    first = events.limit(30)
    writer(first, 0)
    base = _count(db, "events_sink")
    assert base == first.select("event_id").distinct().count()
    writer(events, 1)  # overlaps the first 30, adds the rest
    assert _count(db, "events_sink") == events.select(
        "event_id"
    ).distinct().count()
