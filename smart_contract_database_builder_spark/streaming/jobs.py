"""Structured Streaming jobs over the events table (SURVEY.md T1-T5).

The transformations here are plain DataFrame functions shared with the
batch-equivalent queries in ``plans/streaming_batch.py`` — under Spark's
unified model the identical plan runs bounded or unbounded. The
streaming-only concerns live here:

- ``read_events_stream``: the parquet file source as an unbounded
  stream (at 100 TB this is the landing-zone directory new files drop
  into; locally it's the one testdata file);
- watermarks (T1) bound state for window aggs and dedup;
- ``dropDuplicatesWithinWatermark`` (T4) — keyed state dedup;
- stream-static join (T5) — the static dim is re-broadcast per
  micro-batch;
- ``run_to_memory``: drain with an availableNow trigger into a memory
  sink — exactly-once over the current input, used by tests to assert
  stream results equal their batch twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import dsum
from ..schemas import TESTDATA_SCHEMAS


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream (S14): parquet file source with an
    explicit user schema (file-source streams require one). The physical
    timestamp unit of ``ts`` is detected with the batch loader's
    footer probe (`sources.tables._events_ts_is_nanos`) so the stream
    decodes NANOS-era and MICROS-era files identically to batch."""
    from ..sources.tables import _events_ts_is_nanos

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    is_nanos = _events_ts_is_nanos(spark, f"{sf_dir}/events.parquet")
    if is_nanos:
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in TESTDATA_SCHEMAS["events"].fields
            ]
        )
    else:
        schema = TESTDATA_SCHEMAS["events"]
    # the file-source base path must be a DIRECTORY; select the events
    # file(s) within it via glob — in production this is the landing
    # zone new event files drop into
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if not is_nanos:
        return raw
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))).select(
        *[f.name for f in TESTDATA_SCHEMAS["events"].fields]
    )


def tumbling_counts(events: DataFrame) -> DataFrame:
    """T2: 5-minute tumbling windows per event type (shared batch/stream)."""
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def hourly_type_counts(events: DataFrame) -> DataFrame:
    """T14 stage 1: hourly tumbling counts per event type (shared
    batch/stream) — the mergeable aggregate whose streaming state is
    one count per open (window, type)."""
    return (
        events.groupBy(F.window("ts", "60 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def topk_types_per_window(counts: DataFrame, k: int = 3) -> DataFrame:
    """T14 stage 2: deterministic top-k rank over the AGGREGATE
    relation (count DESC, type ASC). Rank-after-aggregate is not an
    append-mode streaming operator, so in a true stream this stage
    runs per micro-batch on the drained aggregate (foreachBatch /
    post-drain) — the standard pattern; the test asserts the drained
    form equals the batch twin exactly."""
    from pyspark.sql.window import Window

    rank_w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), "event_type"
    )
    return (
        counts.select(
            "window_start",
            "event_type",
            "n_events",
            F.row_number().over(rank_w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= k)
    )


def hourly_ohlc(events: DataFrame) -> DataFrame:
    """T2-EXT: per-hour OHLC downsampling (shared batch/stream).

    Open/close are STRUCT-EXTREMA aggregates over (ts, event_id,
    value) — mergeable, so under readStream the per-window state is
    ONE struct pair however many events the hour holds (the property
    that makes OHLC safe as streaming state; a row_number() window
    would be unbounded)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("o"),
            F.max("value").alias("px_high"),
            F.min("value").alias("px_low"),
            F.max(F.struct("ts", "event_id", "value")).alias("c"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("o.value").alias("px_open"),
            "px_high",
            "px_low",
            F.col("c.value").alias("px_close"),
            "n_events",
        )
    )


def dedup_events_within_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """T4: stateful streaming dedup on event_id — state is dropped once
    the watermark passes, so memory stays bounded on an infinite stream."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_with_customers(events: DataFrame, customers: DataFrame) -> DataFrame:
    """T5: stream-static join — events enriched with the customer dim,
    rolled up by market segment (shared batch/stream shape)."""
    return (
        events.join(
            F.broadcast(customers.select("c_custkey", "c_mktsegment")),
            events.user_id == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


def click_purchase_attribution(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """T6 (EXT): stream-stream join — attribute each purchase to the
    clicks that preceded it by ≤30 minutes for the same user (the
    classic ad-attribution shape). Shared batch/stream plan: under
    ``readStream`` both sides carry watermarks and the time-range
    predicate bounds the join state (rows age out of the state store
    once the watermark passes click_ts + 30 min — without the band the
    state would grow forever).

    Scale shape: the join shuffles both streams on user_id (uniform);
    within a key the band predicate prunes by time. At 100 TB the same
    plan runs continuously with state bounded by watermark delay ×
    arrival rate.
    """
    c, p = clicks.alias("c"), purchases.alias("p")
    return c.join(
        p,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("p.value").alias("purchase_value"),
    )


def attribution_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The T6 join as a true stream-stream join: one unbounded event
    source split into two watermarked streams (a supported self-join),
    joined under the band predicate."""
    ev = read_events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").withWatermark(
        "ts", "1 hour"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", "1 hour"
    )
    return click_purchase_attribution(clicks, purchases)


def purchase_point_in_time(
    state: DataFrame,
    purchases: DataFrame,
    band: str = "INTERVAL 2 HOURS",
) -> DataFrame:
    """T10 as a TRUE stream (r7 VERDICT item #7): enrich each purchase
    with the user's immediately-prior state version — the streaming
    consumption side of the SCD2 history that ``cdc_point_in_time_join``
    computes in batch.

    Plan: a watermarked stream-stream self-join generates the
    candidate prior versions inside a bounded look-back band (the band
    is what lets the state store evict — an unbounded "any prior
    version" join can never age out rows, so the streaming contract is
    band-limited by construction, and the equality test asserts against
    the batch twin restricted to the same band), then a second stateful
    operator — a windowed max_by aggregation on the purchase's event
    time — picks the LATEST prior version per purchase with the same
    (valid_from, event_id) tie-break the batch SCD2 window uses, so the
    version pick survives out-of-order arrival. Chained stream-stream
    join → windowed agg is the multiple-stateful-operators shape Spark
    supports natively in append mode.

    Scale shape: both streams shuffle once on the uniform user key;
    join state is bounded by band × arrival rate, agg state by one row
    per open purchase window.
    """
    s = state.select(
        F.col("user_id").alias("s_user"),
        F.col("event_type").alias("op"),
        F.col("value").alias("s_value"),
        F.col("ts").alias("valid_from"),
        F.col("event_id").alias("s_event_id"),
    )
    p = purchases.select("event_id", "user_id", F.col("ts").alias("p_ts"))
    cand = p.join(
        s,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("valid_from") < F.col("p_ts"))
        & (F.col("valid_from") >= F.col("p_ts") - F.expr(band)),
    )
    # the purchase timestamp cannot sit in the grouping key next to the
    # window (two event-time columns in one stateful operator); it is
    # functionally determined by event_id, so recover it as max()
    picked = (
        cand.groupBy(
            F.window("p_ts", "1 hour").alias("w"),
            "event_id",
            "user_id",
        )
        .agg(
            F.max("p_ts").alias("p_ts"),
            F.max_by(
                F.struct("op", "s_value", "valid_from"),
                F.struct("valid_from", "s_event_id"),
            ).alias("v"),
        )
        .select(
            "event_id",
            "user_id",
            F.col("v.op").alias("prev_op"),
            F.col("v.s_value").alias("prev_value"),
            (
                (
                    F.unix_micros("p_ts") - F.unix_micros("v.valid_from")
                ).cast("double")
                / F.lit(60000000.0)
            ).alias("state_age_minutes"),
        )
    )
    return picked


def point_in_time_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``purchase_point_in_time`` wired to the unbounded event source:
    the full event stream is the version stream (every event is a state
    version, exactly as the batch SCD2 build treats it) and its
    purchase filter is the probe stream — a supported watermarked
    self-join."""
    ev = read_events_stream(spark, sf_dir)
    state = ev.withWatermark("ts", "1 hour")
    purchases = ev.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", "1 hour"
    )
    return purchase_point_in_time(state, purchases)


def click_purchase_left_outer(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """T6 EXT: LEFT-OUTER stream-stream join — every click is emitted,
    with its attributed purchases when they exist and NULLs when the
    30-minute band closes without one (the funnel-drop-off view the
    inner join cannot give). Under ``readStream`` both sides carry
    watermarks; Spark holds an unmatched click in state until the
    watermark passes click_ts + 30 min, then emits the NULL row — so
    the null results trail the matched ones by exactly the state-expiry
    bound, and state stays bounded like the inner form.
    """
    c, p = clicks.alias("c"), purchases.alias("p")
    return c.join(
        p,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("p.value").alias("purchase_value"),
    )


def left_outer_attribution_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The left-outer T6 join as a true watermarked stream-stream join
    (same self-split shape as ``attribution_stream``)."""
    ev = read_events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").withWatermark(
        "ts", "1 hour"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", "1 hour"
    )
    return click_purchase_left_outer(clicks, purchases)


def running_user_totals(events: DataFrame) -> DataFrame:
    """T-EXT: custom stateful operator via ``applyInPandasWithState`` —
    per-user running (event count, exact value total), the operator
    family Spark's built-in streaming aggregates can't express (the
    state transition is arbitrary Python over Arrow batches).

    Exactness: values are 2-decimal; state accumulates integer cents
    (int64), so the emitted double equals the batch twin's
    decimal-sum-to-double bit-for-bit regardless of batch boundaries.

    Scale shape: state is keyed by user_id (the shuffle key), one small
    fixed-size tuple per user; Arrow moves each group's batch rows once
    per trigger. Unbounded-key growth is the deployment concern — wire
    a timeout (``GroupStateTimeout.ProcessingTimeTimeout``) when user
    cardinality is open-ended.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, cents bigint"

    def update(key, pdfs, state):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str | None = None) -> DataFrame:
    """Drain a streaming DataFrame with an availableNow trigger into a
    memory sink and return the materialized table (complete mode for
    aggregates, append otherwise; pass ``mode`` explicitly for stateful
    operators that declare their own output mode)."""
    if mode is None:
        mode = (
            "complete"
            if stream_df.isStreaming and _has_aggregate(stream_df)
            else "append"
        )
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)


def _has_aggregate(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan


def scd2_closed_versions(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """T-EXT TRUE-STREAMING SCD2 build — the incremental form of the
    batch ``cdc_scd2_history`` window: each arriving change record
    buffers in per-key state; a version's ``valid_to`` becomes FINAL
    only once the watermark passes its successor's event time (below
    the watermark nothing can insert between two versions, above it a
    late record still could), at which point the closed version row
    emits in append mode. Open rows (the key's last version) never
    emit — they are not final on an unbounded stream by definition,
    which is exactly the "outer results trail the watermark" semantics
    of Spark's own stateful operators.

    This is ``applyInPandasWithState`` with EVENT-TIME TIMEOUTS: when
    a key holds a closable-but-not-yet-final pair, its timeout is set
    to the successor's timestamp, so the group re-fires — in a
    no-data micro-batch if need be — as soon as the watermark passes,
    without waiting for more data on that key. State per key is the
    buffered not-yet-final version list, bounded by delay × that key's
    change rate.

    Exactness: versions order by (ts, event_id) — the batch window's
    exact sort key — and values ride through untouched, so every
    emitted row equals the batch twin's row bit-for-bit (pinned in
    tests/test_streaming_scd2.py: sound everywhere, complete below
    the final watermark).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id bigint, op string, value double, "
        "valid_from_us bigint, valid_to_us bigint"
    )
    state_schema = (
        "ts array<bigint>, eid array<bigint>, "
        "op array<string>, val array<double>"
    )

    def update(key, pdfs, state):
        if state.exists:
            ts, eid, op, val = state.get
            buf = [
                (int(t), int(e), o, float(v))
                for t, e, o, v in zip(ts, eid, op, val)
            ]
        else:
            buf = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                micros = pdf["ts"].astype("int64") // 1000
                for t, e, o, v in zip(
                    micros, pdf["event_id"], pdf["event_type"], pdf["value"]
                ):
                    buf.append((int(t), int(e), str(o), float(v)))
        buf.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        out = []
        # a closed pair (v, next) is FINAL once next.ts < watermark:
        # nothing can arrive below the watermark, so no record can ever
        # insert between them and v's valid_to cannot change again
        while len(buf) >= 2 and buf[1][0] < wm_us:
            v = buf.pop(0)
            out.append((key[0], v[2], v[3], v[0], buf[0][0]))
        if buf:
            state.update(
                (
                    [b[0] for b in buf],
                    [b[1] for b in buf],
                    [b[2] for b in buf],
                    [b[3] for b in buf],
                )
            )
        else:
            state.remove()
        if len(buf) >= 2:
            # re-fire when the watermark passes the earliest pending
            # successor (must be strictly beyond the current watermark)
            state.setTimeoutTimestamp(
                max(buf[1][0] // 1000 + 1, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(
            out,
            columns=["user_id", "op", "value", "valid_from_us", "valid_to_us"],
        )

    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def scd2_closed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``scd2_closed_versions`` wired to the unbounded event source —
    the full event stream is the change stream, exactly as the batch
    SCD2 build treats it."""
    return scd2_closed_versions(read_events_stream(spark, sf_dir))
