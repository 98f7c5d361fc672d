"""Sessionization pair equality (r8 VERDICT item #7): the batch
gaps-and-islands sessionization (``window_session_stats_batch``, W11)
and the streaming session window (T3) must assign the SAME sessions at
the shared 30-minute gap — including the boundary: both split when the
silence is ≥ the gap (Spark's half-open ``session_window`` span
[first, last + gap)), which is why W11 flags ``gap >= 30min``, not >.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.sources.tables import load_table
from smart_contract_database_builder_spark.streaming import jobs

from conftest import SF_ORACLE

_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _session_windows(ev):
    from smart_contract_database_builder_spark.functions.numeric import dsum

    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _FMT).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def _key_rows(df):
    return sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["total_value"])
        for r in df.collect()
    )


def test_batch_sessionization_equals_session_window_batch(spark):
    """Same engine, two formulations: the windowed gaps-and-islands
    assignment must produce the identical session set (start, size,
    value) as ``session_window`` — every event in the same session on
    both sides."""
    batch = plans.QUERIES["window_session_stats_batch"].fn(spark, SF_ORACLE)
    want = _key_rows(
        _session_windows(load_table(spark, SF_ORACLE, "events"))
    )
    got = _key_rows(
        batch.select("user_id", "session_start", "n_events", "total_value")
    )
    assert got == want and got


def test_batch_sessionization_equals_true_streamed_sessions(spark):
    """The T9/T11/T12 pattern closed over the session pair: a TRUE
    streaming run (availableNow, 1 h watermark, memory sink) of the
    30-minute session window must equal the batch gaps-and-islands
    sessions exactly — the corpus stream ends, the drain completes,
    and every session below the final watermark has emitted."""
    got = jobs.run_to_memory(
        _session_windows(
            jobs.read_events_stream(spark, SF_ORACLE).withWatermark(
                "ts", "1 hour"
            )
        ),
        "t_sessions_w11",
    )
    batch = plans.QUERIES["window_session_stats_batch"].fn(spark, SF_ORACLE)
    assert _key_rows(got) == _key_rows(
        batch.select("user_id", "session_start", "n_events", "total_value")
    )
