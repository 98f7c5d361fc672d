"""True-streaming SCD2 build (jobs.scd2_closed_versions): the
incremental history builder must agree exactly with the batch window
below the watermark, and obey streaming semantics above it."""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from smart_contract_database_builder_spark import plans
from smart_contract_database_builder_spark.sources.tables import load_table
from smart_contract_database_builder_spark.streaming import jobs

from conftest import SF_ORACLE


def test_streamed_closed_versions_equal_batch_below_watermark(spark):
    """Soundness + completeness: the streamed closed-version rows must
    equal EXACTLY the batch SCD2's closed rows whose valid_to lies
    below the final watermark (max event time − 1 h) — same keys, same
    ops/values, same microsecond boundaries."""
    got = {
        (r["user_id"], r["op"], r["value"], r["valid_from"], r["valid_to"])
        for r in plans.QUERIES["stream_true_scd2_closed"]
        .fn(spark, SF_ORACLE)
        .collect()
    }
    ev = load_table(spark, SF_ORACLE, "events")
    wm = ev.agg(F.max("ts")).collect()[0][0] - datetime.timedelta(hours=1)
    batch = (
        plans.QUERIES["cdc_scd2_history"]
        .fn(spark, SF_ORACLE)
        .filter(F.col("valid_to").isNotNull())
        .filter(F.col("valid_to") < wm.strftime("%Y-%m-%d %H:%M:%S.%f"))
    )
    want = {
        (r["user_id"], r["op"], r["value"], r["valid_from"], r["valid_to"])
        for r in batch.collect()
    }
    assert got == want and got


def test_late_record_is_dropped_not_rewritten(spark, tmp_path):
    """Streaming semantics beyond the batch twin: a change record
    arriving AFTER the watermark passed its event time must be dropped
    — already-emitted closed versions are immutable (the batch window
    over the same files would rewrite history; the stream must not).
    In-watermark out-of-order records, by contrast, must land in the
    correct history position."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def mk(rows):
        # ONE file per write: with maxFilesPerTrigger=1 a multi-file
        # write splits one logical batch across micro-batches in
        # arbitrary file order, letting the watermark-driver row race
        # ahead and drop same-batch data rows as late
        return spark.createDataFrame(
            [
                (i, t0 + datetime.timedelta(minutes=m), u, o, v)
                for i, m, u, o, v in rows
            ],
            schema,
        ).coalesce(1)

    src = str(tmp_path / "changes")
    ck = str(tmp_path / "ck")
    outdir = str(tmp_path / "out")
    # batch 1: user 7's v1/v3 arrive (v2 missing), plus a far-future
    # watermark driver on user 99 that finalizes everything below
    # t0+600−60 = t0+540
    mk(
        [
            (1, 0, 7, "signup", 1.0),
            (3, 120, 7, "upgrade", 3.0),
            (90, 600, 99, "noise", 0.0),
        ]
    ).write.mode("append").parquet(src)

    def drain():
        ev = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = (
            jobs.scd2_closed_versions(ev)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["user_id"], r["op"], r["valid_from_us"], r["valid_to_us"])
            for r in spark.read.parquet(outdir).collect()
        }

    first = drain()

    def us(minute):
        return int(
            (t0 + datetime.timedelta(minutes=minute)).replace(
                tzinfo=datetime.timezone.utc
            ).timestamp()
            * 1_000_000
        )

    # v1 closed by v3 — both below the watermark
    assert first == {(7, "signup", us(0), us(120))}

    # batch 2: v2 at minute 60 — BELOW the t0+540 watermark, so it must
    # be DROPPED: v1's already-emitted closure at v3 stands, and no
    # (signup → update) or (update → upgrade) rows may appear
    mk([(2, 60, 7, "update", 2.0)]).write.mode("append").parquet(src)
    second = drain()
    assert second == {(7, "signup", us(0), us(120))}, (
        "late record rewrote already-final history"
    )

    # batch 3: an in-watermark out-of-order record at minute 570 (above
    # the t0+540 watermark, below the new driver at minute 1200 that
    # moves the watermark to t0+1140) plus a later v5 at minute 700:
    # both close, in correct (ts) order
    mk(
        [
            (5, 700, 7, "renew", 5.0),
            (4, 570, 7, "downgrade", 4.0),
            (91, 1200, 99, "noise", 0.0),
        ]
    ).write.mode("append").parquet(src)
    third = drain()
    assert third == {
        (7, "signup", us(0), us(120)),
        (7, "upgrade", us(120), us(570)),
        (7, "downgrade", us(570), us(700)),
    }
