"""True Structured Streaming runs (availableNow → memory sink) asserted
equal to their batch twins — the unified-model guarantee the engine
relies on (SURVEY.md T1-T5)."""

from __future__ import annotations

from smart_contract_database_builder_spark.sources.tables import load_table
from smart_contract_database_builder_spark.streaming import jobs

from conftest import SF_ORACLE, SF_SMOKE


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumbling_equals_batch(spark):
    ev_stream = jobs.read_events_stream(spark, SF_ORACLE)
    got = jobs.run_to_memory(
        jobs.tumbling_counts(ev_stream.withWatermark("ts", "10 minutes")),
        "t_tumbling",
    )
    ev_batch = load_table(spark, SF_ORACLE, "events")
    want = jobs.tumbling_counts(ev_batch)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_stream_dedup_within_watermark(spark):
    ev_stream = jobs.read_events_stream(spark, SF_ORACLE)
    got = jobs.run_to_memory(
        jobs.dedup_events_within_watermark(ev_stream), "t_dedup"
    )
    ev_batch = load_table(spark, SF_ORACLE, "events")
    # event_id is unique in the corpus: dedup must be a no-op in count,
    # and ids must round-trip exactly
    assert got.count() == ev_batch.count()
    assert _sorted_rows(got.select("event_id")) == _sorted_rows(
        ev_batch.select("event_id")
    )


def test_stream_session_windows_equal_batch(spark):
    """T3 true streaming: session windows (30-min gap) drained with
    availableNow must equal the batch session_window aggregation."""
    from pyspark.sql import functions as F

    from smart_contract_database_builder_spark.functions.numeric import dsum

    def sessions(ev):
        return (
            ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dsum("value").alias("total_value"),
            )
            .select("user_id", "w.start", "w.end", "n_events", "total_value")
        )

    ev_stream = jobs.read_events_stream(spark, SF_ORACLE)
    got = jobs.run_to_memory(
        sessions(ev_stream.withWatermark("ts", "1 hour")), "t_sessions"
    )
    ev_batch = load_table(spark, SF_ORACLE, "events")
    assert _sorted_rows(got) == _sorted_rows(sessions(ev_batch))


def test_stream_stateful_running_totals_equals_batch(spark):
    """applyInPandasWithState per-user running totals: the final
    emission per user must equal the batch aggregation bit-for-bit
    (integer-cent state ⇒ decimal-exact doubles)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from smart_contract_database_builder_spark.functions.numeric import dsum

    ev_stream = jobs.read_events_stream(spark, SF_ORACLE)
    updates = jobs.run_to_memory(
        jobs.running_user_totals(ev_stream), "t_stateful", mode="update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    got = (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )
    ev_batch = load_table(spark, SF_ORACLE, "events")
    want = ev_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )
    assert _sorted_rows(got) == _sorted_rows(want)


def test_stream_static_join_equals_batch(spark):
    ev_stream = jobs.read_events_stream(spark, SF_ORACLE)
    cust = load_table(spark, SF_ORACLE, "customer")
    got = jobs.run_to_memory(
        jobs.enrich_with_customers(ev_stream, cust), "t_enrich"
    )
    ev_batch = load_table(spark, SF_ORACLE, "events")
    want = jobs.enrich_with_customers(ev_batch, cust)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_stream_stream_join_equals_batch(spark):
    """T6: the watermarked stream-stream band join (self-joined event
    stream) must emit exactly the batch join's rows — inner joins emit
    only matched pairs, so the availableNow drain equals the batch twin
    row-for-row."""
    from pyspark.sql import functions as F

    got = jobs.run_to_memory(
        jobs.attribution_stream(spark, SF_ORACLE), "t_ss_join"
    )
    ev = load_table(spark, SF_ORACLE, "events")
    want = jobs.click_purchase_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    assert _sorted_rows(got) == _sorted_rows(want)
    assert got.count() > 0  # the corpus must actually exercise the band


def test_stream_stream_join_drops_late_purchase(spark, tmp_path):
    """T6 streaming semantics, not just the batch twin: two independent
    file-source streams joined under watermarks. A purchase arriving
    AFTER the watermark has advanced past its event time must be
    dropped — the batch join over the same files would match it, the
    stream must not. This is the state-bounding contract that keeps the
    join's memory finite on an unbounded stream."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(i, t0 + datetime.timedelta(minutes=m), u, v) for i, m, u, v in rows],
            schema,
        )

    clicks_dir = str(tmp_path / "clicks")
    purch_dir = str(tmp_path / "purchases")
    ck = str(tmp_path / "ck")
    # batch 1: a click at t0 and a matching purchase 10 min later, plus a
    # far-future row on EACH side: the global watermark is the MIN across
    # all watermarked inputs, so both sides must advance for it to reach
    # t0+4h - 1h = t0+3h (users 8/9 match nothing — they only move time)
    mk([(1, 0, 7, 0.0), (2, 240, 8, 0.0)]).write.mode("append").parquet(clicks_dir)
    mk([(100, 10, 7, 9.99), (102, 240, 9, 1.0)]).write.mode("append").parquet(
        purch_dir
    )

    def drain():
        clicks = (
            spark.readStream.schema(schema).parquet(clicks_dir)
        ).withWatermark("ts", "1 hour")
        purchases = (
            spark.readStream.schema(schema).parquet(purch_dir)
        ).withWatermark("ts", "1 hour")
        q = (
            jobs.click_purchase_attribution(clicks, purchases)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(tmp_path / "out"))

    first = drain()
    assert {(r.click_id, r.purchase_id) for r in first.collect()} == {(1, 100)}

    # batch 2 (same checkpoint — watermark state persisted): a LATE
    # purchase at t0+5min, far behind the t0+3h watermark. Batch
    # semantics would attribute it to click 1; the stream must drop it.
    mk([(101, 5, 7, 4.99)]).write.mode("append").parquet(purch_dir)
    second = drain()
    assert {(r.click_id, r.purchase_id) for r in second.collect()} == {(1, 100)}, (
        "late purchase leaked through the watermark"
    )
    # sanity: the batch twin over the same files DOES match the late row,
    # so the absence above is watermark semantics, not a missed join
    batch = jobs.click_purchase_attribution(
        spark.read.schema(schema).parquet(clicks_dir),
        spark.read.schema(schema).parquet(purch_dir),
    )
    assert {(r.click_id, r.purchase_id) for r in batch.collect()} == {
        (1, 100),
        (1, 101),
    }


def test_rocksdb_state_store_matches_default_provider(spark):
    """The deployment-scale state backend: at 100 TB of stream state the
    default in-memory (HDFS-backed) store OOMs executors — RocksDB
    spills keyed state to local disk with the same semantics. Run the
    most state-heavy operator (watermarked dedup) under BOTH providers
    and require identical results, so the config swap is proven safe,
    not assumed."""

    def drain(name):
        ev = jobs.read_events_stream(spark, SF_SMOKE)
        dedup = jobs.dedup_events_within_watermark(ev)
        return {
            (r.event_id, r.ts)
            for r in jobs.run_to_memory(dedup, name).select("event_id", "ts").collect()
        }

    key = "spark.sql.streaming.stateStore.providerClass"
    default = drain("t_state_default")
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        rocks = drain("t_state_rocksdb")
    finally:
        if prev:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)
    assert rocks == default and len(rocks) > 0


def test_checkpointed_rerun_is_exactly_once(spark, tmp_path):
    """Operational guarantee: a file-backed sink + checkpointLocation
    makes availableNow drains idempotent — a rerun over the same input
    replays NOTHING (source offsets live in the checkpoint), which is
    the exactly-once contract a 100 TB landing-zone job leans on when
    it restarts."""
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def drain():
        ev = jobs.read_events_stream(spark, SF_ORACLE)
        dedup = jobs.dedup_events_within_watermark(ev)
        q = (
            dedup.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n_first = spark.read.parquet(out).count()
    assert n_first > 0
    drain()  # same checkpoint, same input: must be a no-op
    n_second = spark.read.parquet(out).count()
    assert n_second == n_first


def test_stream_stream_left_outer_matches_batch_below_watermark(spark):
    """T6 EXT: the LEFT-OUTER watermarked stream-stream join. Matched
    rows must equal the batch left-join's matched rows exactly; NULL
    (drop-off) rows are only guaranteed for clicks whose 30-minute band
    closed before the stream's final watermark — Spark documents that
    outer results trail the watermark, so the equivalence is asserted
    on that provable region, and every emitted null row must also be a
    null row of the batch twin (no spurious drop-offs, ever)."""
    import datetime

    from pyspark.sql import functions as F

    got = jobs.run_to_memory(
        jobs.left_outer_attribution_stream(spark, SF_ORACLE), "t_ss_louter"
    )
    ev = load_table(spark, SF_ORACLE, "events")
    want = jobs.click_purchase_left_outer(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    got_matched = got.filter(F.col("purchase_id").isNotNull())
    want_matched = want.filter(F.col("purchase_id").isNotNull())
    assert _sorted_rows(got_matched) == _sorted_rows(want_matched)
    assert got_matched.count() > 0

    # Null rows: sound everywhere (subset of the batch twin's nulls)...
    got_nulls = {
        r["click_id"]
        for r in got.filter(F.col("purchase_id").isNull()).collect()
    }
    want_nulls = {
        r["click_id"]
        for r in want.filter(F.col("purchase_id").isNull()).collect()
    }
    assert got_nulls <= want_nulls
    # ...and complete below the final watermark (max ts − 1 h delay −
    # the 30 min band: every click whose band provably closed).
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - datetime.timedelta(hours=1, minutes=30)
    want_nulls_closed = {
        r["click_id"]
        for r in want.filter(
            F.col("purchase_id").isNull() & (F.col("click_ts") < cutoff)
        ).collect()
    }
    assert want_nulls_closed <= got_nulls
    assert len(want_nulls_closed) > 0  # the corpus exercises drop-offs


def test_stream_hourly_ohlc_equals_batch(spark):
    """OHLC bars computed as a TRUE stream (availableNow, watermark,
    struct-extrema state) must equal the batch twin row-for-row —
    including open/close picks, which depend on the deterministic
    (ts, event_id) tie-break surviving out-of-order arrival."""
    ev_stream = jobs.read_events_stream(spark, SF_ORACLE)
    got = jobs.run_to_memory(
        jobs.hourly_ohlc(ev_stream.withWatermark("ts", "10 minutes")),
        "t_ohlc",
    )
    ev_batch = load_table(spark, SF_ORACLE, "events")
    want = jobs.hourly_ohlc(ev_batch)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_stream_point_in_time_matches_batch_in_band(spark):
    """T10 true-run twin (r7 VERDICT item #7): the streaming
    point-in-time join (stream-stream candidate join → windowed max_by
    version pick) must agree with the batch SCD2 consumption
    (`cdc_point_in_time_join`) on the provable region — purchases whose
    prior version lies within the join's look-back band. Soundness
    everywhere (every emitted row is a batch row with age ≤ band, same
    version pick, same exact age); completeness for purchases whose
    1-hour aggregation window provably closed below the final
    watermark. The version pick depends on the (valid_from, event_id)
    tie-break surviving the source's out-of-order arrival."""
    import datetime

    from pyspark.sql import functions as F

    from smart_contract_database_builder_spark.plans.registry import QUERIES

    got = {
        r["event_id"]: r
        for r in jobs.run_to_memory(
            jobs.point_in_time_stream(spark, SF_ORACLE), "t_pit", mode="append"
        ).collect()
    }
    band_minutes = 120.0
    want = {
        r["event_id"]: r
        for r in QUERIES["cdc_point_in_time_join"]
        .fn(spark, SF_ORACLE)
        .filter(F.col("state_age_minutes") <= band_minutes)
        .collect()
    }

    # sound: every streamed row is the batch row, bit-for-bit
    assert len(got) > 0
    for eid, g in got.items():
        w = want[eid]
        assert (
            g["user_id"] == w["user_id"]
            and g["prev_op"] == w["prev_op"]
            and g["prev_value"] == w["prev_value"]
            and g["state_age_minutes"] == w["state_age_minutes"]
        ), eid

    # complete below the cutoff where the purchase's 1 h window provably
    # closed. With CHAINED stateful operators the aggregation does not
    # see the global watermark: the upstream join may still emit rows
    # with p_ts up to `band` behind it (its state holds versions until
    # watermark ≥ valid_from + band), so the agg finalizes a window only
    # when global_watermark − band ≥ window_end. Final watermark =
    # max_ts − 1 h delay; band = 2 h; window_end ≤ p_ts + 1 h ⇒ every
    # purchase with p_ts < max_ts − 4 h is provably emitted.
    ev = load_table(spark, SF_ORACLE, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - datetime.timedelta(hours=4)
    closed = {
        r["event_id"]
        for r in ev.filter(
            (F.col("event_type") == "purchase") & (F.col("ts") < cutoff)
        ).collect()
    }
    missing = [e for e in want if e in closed and e not in got]
    assert missing == []
    assert any(e in closed for e in want)  # the region is non-trivial


def test_stream_window_topk_equals_batch(spark):
    """T14: the hourly type counts run as a TRUE stream (watermark +
    availableNow into memory); the top-k rank runs on the drained
    aggregate (the foreachBatch position). Must equal the registered
    batch twin exactly."""
    from smart_contract_database_builder_spark import plans
    from pyspark.sql import functions as F

    ev_stream = jobs.read_events_stream(spark, SF_ORACLE)
    counts = jobs.run_to_memory(
        jobs.hourly_type_counts(ev_stream.withWatermark("ts", "1 hour")),
        "t14_counts",
    )
    got = jobs.topk_types_per_window(counts).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n_events",
        "rnk",
    )
    want = plans.QUERIES["stream_window_topk_events"].fn(spark, SF_ORACLE)
    assert _sorted_rows(got) == _sorted_rows(want)
    assert got.count() > 0


def test_watermark_audit_predicts_true_streaming_drops(spark, tmp_path):
    """T15 equivalence witness (VERDICT r13 #7): the BATCH
    watermark-lateness audit (`stream_watermark_late_audit`) claims to
    report how many rows a watermarked streaming job would DROP at a
    given delay. Prove it against a TRUE Structured Streaming run: an
    engineered arrival sequence drains availableNow (one file per
    micro-batch, so the watermark advances between arrival chunks
    exactly as the audit's arrival-order prefix max does), and the
    stateful operator's own `numRowsDroppedByWatermark` must equal
    the audit's n_late at the 1-hour delay — and 0 at 6 hours.

    The fixture keeps every lateness far from both engines' boundary
    predicates (on-time rows are strictly increasing maxima, late
    rows lag the running max by exactly 3 h >> 1 h + window width),
    so the equality tests semantics, not tie-breaking."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from smart_contract_database_builder_spark import plans
    from smart_contract_database_builder_spark.sources.tables import (
        TESTDATA_SCHEMAS,
    )

    t0 = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC, micros
    chunks, per_chunk = 12, 10
    late_positions = {3, 7}
    late_chunks = set(range(4, 10))
    rows, max_us = [], t0
    for c in range(chunks):
        chunk_rows = []
        for i in range(per_chunk):
            eid = c * per_chunk + i
            if c in late_chunks and i in late_positions:
                us = max_us - 3 * 3_600_000_000  # 3 h late
            else:
                max_us += 120_000_000  # fresh maximum every on-time row
                us = max_us
            chunk_rows.append((eid, us))
        rows.append(chunk_rows)
    n_total = chunks * per_chunk
    n_late_expected = len(late_chunks) * len(late_positions)

    def table(chunk_rows):
        return pa.table(
            {
                "event_id": pa.array([r[0] for r in chunk_rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in chunk_rows], pa.timestamp("us")
                ),
                "user_id": pa.array(
                    [r[0] % 7 for r in chunk_rows], pa.int64()
                ),
                "event_type": pa.array(["click"] * len(chunk_rows)),
                "value": pa.array([1.0] * len(chunk_rows), pa.float64()),
                "props": pa.array(["{}"] * len(chunk_rows)),
            }
        )

    # audit input: the whole sequence as one events.parquet
    audit_dir = tmp_path / "audit"
    audit_dir.mkdir()
    pq.write_table(
        table([r for ch in rows for r in ch]), audit_dir / "events.parquet"
    )
    audit = {
        r["w_hours"]: r["n_late"]
        for r in plans.QUERIES["stream_watermark_late_audit"]
        .fn(spark, str(audit_dir))
        .collect()
    }
    assert audit[1] == n_late_expected  # non-vacuous: real drops at 1 h
    assert audit[6] == 0 and audit[24] == 0

    # streaming input: one file per arrival chunk, mtimes in arrival
    # order (the file source processes oldest-first)
    stream_dir = tmp_path / "arrivals"
    stream_dir.mkdir()
    for c, chunk_rows in enumerate(rows):
        p = stream_dir / f"chunk_{c:03d}.parquet"
        pq.write_table(table(chunk_rows), p)
        os.utime(p, (1_700_000_000 + 10 * c, 1_700_000_000 + 10 * c))

    def drops_at(delay: str, qname: str) -> tuple[int, int]:
        stream = (
            spark.readStream.schema(TESTDATA_SCHEMAS["events"])
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
            .withWatermark("ts", delay)
            .groupBy(F.window("ts", "60 seconds").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in json.loads(p.json).get("stateOperators", [])
        )
        final = (
            spark.table(qname)
            .groupBy("w")
            .agg(F.max("n").alias("n"))
            .agg(F.sum("n").alias("total"))
            .collect()[0]["total"]
        )
        return dropped, final

    dropped_1h, retained_1h = drops_at("1 hour", "t_wm_audit_1h")
    assert dropped_1h == audit[1], (
        f"streaming dropped {dropped_1h}, audit predicted {audit[1]}"
    )
    assert retained_1h == n_total - audit[1]

    dropped_6h, retained_6h = drops_at("6 hours", "t_wm_audit_6h")
    assert dropped_6h == audit[6] == 0
    assert retained_6h == n_total


def test_state_audit_matches_true_streaming_state_rows(spark, tmp_path):
    """T16 true-streaming witness (the T15 pattern, VERDICT r14 #6):
    the watermark STATE-SIZE audit (`stream_watermark_state_audit`)
    claims to report how many 1-hour windows a watermarked streaming
    aggregation still HOLDS in its state store once the stream's
    high-water mark reaches the corpus max. Prove it against a TRUE
    Structured Streaming run: drain an engineered arrival sequence
    with availableNow (one file per micro-batch), finish with a FLUSH
    file that does not advance the event-time max (so the final
    batch's eviction runs at watermark = max - delay, exactly the
    audit's predicate window.end <= max - delay), and the last
    progress event's `stateOperators[].numRowsTotal` must equal the
    audit's n_windows_open — at both the 1-hour and 6-hour delays.

    The fixture keeps every window end far from the watermark
    boundary (events at :07/:27/:47 past the hour, max at :47, so
    end == watermark is impossible) — the equality tests semantics,
    not tie-breaking."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from smart_contract_database_builder_spark import plans
    from smart_contract_database_builder_spark.sources.tables import (
        TESTDATA_SCHEMAS,
    )

    t0 = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC, micros
    hours = 30
    offsets_min = (7, 27, 47)
    all_rows = [
        (h * len(offsets_min) + i, t0 + h * 3_600_000_000 + m * 60_000_000)
        for h in range(hours)
        for i, m in enumerate(offsets_min)
    ]
    max_us = max(us for _eid, us in all_rows)

    def table(chunk_rows):
        return pa.table(
            {
                "event_id": pa.array([r[0] for r in chunk_rows], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in chunk_rows], pa.timestamp("us")
                ),
                "user_id": pa.array(
                    [r[0] % 7 for r in chunk_rows], pa.int64()
                ),
                "event_type": pa.array(["click"] * len(chunk_rows)),
                "value": pa.array([1.0] * len(chunk_rows), pa.float64()),
                "props": pa.array(["{}"] * len(chunk_rows)),
            }
        )

    # audit input: the whole sequence as one events.parquet
    audit_dir = tmp_path / "audit"
    audit_dir.mkdir()
    pq.write_table(table(all_rows), audit_dir / "events.parquet")
    audit = {
        r["w_hours"]: r.asDict()
        for r in plans.QUERIES["stream_watermark_state_audit"]
        .fn(spark, str(audit_dir))
        .collect()
    }
    # non-vacuous: the delays hold different, non-trivial state sizes
    assert audit[1]["n_windows_total"] == hours
    assert 0 < audit[1]["n_windows_open"] < audit[6]["n_windows_open"] < hours

    # streaming input: strictly-increasing chunks, then a FLUSH chunk
    # repeating the final timestamp (does not advance the max, so the
    # last batch evicts at the fully-advanced watermark)
    stream_dir = tmp_path / "arrivals"
    stream_dir.mkdir()
    per_chunk = 15
    chunks = [
        all_rows[i:i + per_chunk] for i in range(0, len(all_rows), per_chunk)
    ]
    chunks.append([(10_000, max_us), (10_001, max_us)])
    for c, chunk_rows in enumerate(chunks):
        p = stream_dir / f"chunk_{c:03d}.parquet"
        pq.write_table(table(chunk_rows), p)
        os.utime(p, (1_700_000_000 + 10 * c, 1_700_000_000 + 10 * c))

    def state_rows_at(delay: str, qname: str) -> int:
        stream = (
            spark.readStream.schema(TESTDATA_SCHEMAS["events"])
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
            .withWatermark("ts", delay)
            .groupBy(F.window("ts", "60 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        states = [
            op["numRowsTotal"]
            for p in q.recentProgress
            for op in json.loads(p.json).get("stateOperators", [])
        ]
        return states[-1]

    assert state_rows_at("1 hour", "t_state_audit_1h") == (
        audit[1]["n_windows_open"]
    )
    assert state_rows_at("6 hours", "t_state_audit_6h") == (
        audit[6]["n_windows_open"]
    )
