"""Event-time streaming operators over the `events` stream shape
(event_id, ts, user_id, event_type, value, props).

Scale notes (100 TB / 1000-executor posture):
 - every stateful op below keys its state by a bounded-cardinality key
   (window × event_type, user_id) so state partitions evenly;
 - watermarks bound state size — late rows past the watermark are
   dropped, so state never grows with stream length;
 - on a real cluster pair these with the RocksDB state store
   (spark.sql.streaming.stateStore.providerClass) so state spills off
   heap; the operator code is identical.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-stream source of event JSON-lines — the hermetic stand-in
    for a Kafka topic of product events (same downstream plan)."""
    return (spark.readStream
            .schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .json(path))


def tumbling_window_counts(events: DataFrame, size: str = "1 hour",
                           watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time windows with a watermark: count + value sum
    per (window, event_type); late rows past the watermark are dropped.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n", "total_value")
    )


def sliding_window_counts(events: DataFrame, size: str = "1 hour",
                          slide: str = "30 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Sliding windows: each event lands in size/slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "n")
    )


def tumbling_ohlc_bars(events: DataFrame, size: str = "1 hour",
                       watermark: str = "30 minutes") -> DataFrame:
    """Streaming OHLC bars: per (tumbling window, event_type)
    open/high/low/close/volume over `value`, open/close picked by
    `min_by`/`max_by` on the same unique BIGINT ordering key as the
    batch twin (`timeseries.ts_ohlc_bars`) — declarative aggregates,
    so the streaming state per bar is O(1) (current extreme + key),
    never a buffered window. Late rows past the watermark drop; bars
    finalize when the watermark passes window end (append mode).
    Batch parity is pinned by the `streaming_ohlc_replay` registry
    twin and tests/test_streaming.py."""
    okey = (F.unix_timestamp("ts") * F.lit(10000000)
            + F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.round(F.min_by("value", okey), 6).alias("open"),
             F.round(F.max("value"), 6).alias("high"),
             F.round(F.min("value"), 6).alias("low"),
             F.round(F.max_by("value", okey), 6).alias("close"),
             F.count(F.lit(1)).alias("volume"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "open", "high", "low", "close", "volume")
    )


def session_window_stats(events: DataFrame, gap: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Session windows (gap-based, per user): Spark's native
    session_window — windows merge as events arrive, close after `gap`
    of event-time silence."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 4).alias("session_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "session_value")
    )


def streaming_dedup(events: DataFrame,
                    watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: state holds
    one entry per event_id and is purged as the watermark advances —
    bounded state, unlike an unbounded dropDuplicates."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def stream_static_enrich(events: DataFrame,
                         customers: DataFrame) -> DataFrame:
    """Stream-static join: enrich each event with the (slowly-changing)
    customer dimension. The static side re-resolves per micro-batch;
    Spark broadcasts it when small — no stream state at all."""
    dim = customers.select(F.col("c_custkey").alias("user_id"),
                           "c_name", "c_mktsegment")
    return events.join(F.broadcast(dim), "user_id", "left")


def stream_stream_self_join(events: DataFrame, other: DataFrame,
                            within: str = "30 minutes",
                            watermark: str = "1 hour",
                            how: str = "inner") -> DataFrame:
    """Stream-stream interval join: purchases joined to the same user's
    clicks within `within` before the purchase. Both sides are
    watermarked so join state is purged once the interval expires.

    how="left_outer" emits unmatched purchases (null click columns) when
    the watermark passes the end of their join interval — i.e. once the
    engine can PROVE no matching click can still arrive. Outer emission
    is therefore delayed by `watermark`, the standard completeness/
    latency trade.

    Watermark caveat: Catalyst pushes each branch's event_type filter
    down into the scan, BELOW the EventTimeWatermark node, so each
    side's watermark advances only on events that survive its own
    filter; the global (min) watermark — and hence outer emission —
    stalls if one event type stops flowing. Feed both types or lower
    the stalled side's watermark expectation accordingly."""
    clicks = (other.filter(F.col("event_type") == "click")
              .withWatermark("ts", watermark)
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id")))
    buys = (events.withWatermark("ts", watermark)
            .filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("b_user"),
                    F.col("ts").alias("buy_ts"),
                    F.col("event_id").alias("buy_id"), "value"))
    cond = (
        (F.col("c_user") == F.col("b_user"))
        & (F.col("click_ts") <= F.col("buy_ts"))
        & (F.col("click_ts") >= F.col("buy_ts") - F.expr(
            f"INTERVAL {within}"))
    )
    return buys.join(clicks, cond, how).select(
        F.col("b_user").alias("user_id"), "buy_id", "click_id",
        "buy_ts", "click_ts", "value")


_SESSION_GAP_MS = 30 * 60 * 1000  # close a session after 30 min idle
_SESSION_STATE_SCHEMA = "n_events LONG, total DOUBLE, start_ms LONG, last_ms LONG"
_SESSION_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
])


def _session_fn(key: Any, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator with an EVENT-time idle timeout —
    the applyInPandasWithState extension point for operators Spark's
    built-ins can't express (custom eviction / merge / emit policy).
    Emits one summary row when the watermark passes last_event + gap;
    nothing is emitted while the session is open (append semantics)."""
    (user_id,) = key
    if state.hasTimedOut:
        n, total, start_ms, last_ms = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "n_events": n, "total_value": total,
            "session_start": pd.Timestamp(start_ms, unit="ms"),
            "session_end": pd.Timestamp(last_ms, unit="ms"),
        }])
        return
    n, total = 0, 0.0
    start_ms = last_ms = None
    if state.exists:
        n, total, start_ms, last_ms = state.get
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        ms = (pdf["ts"].astype("int64") // 1_000_000)
        lo, hi = int(ms.min()), int(ms.max())
        start_ms = lo if start_ms is None else min(start_ms, lo)
        last_ms = hi if last_ms is None else max(last_ms, hi)
    state.update((n, total, start_ms, last_ms))
    state.setTimeoutTimestamp(last_ms + _SESSION_GAP_MS)
    return
    yield  # pragma: no cover - makes this a generator on the update path


def user_session_state(events: DataFrame) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState:
    per-user (count, value-sum, first/last ts) accumulated across
    batches; the session closes and emits when the event-time watermark
    passes last_event + 30 min. State is 4 scalars per live user —
    tiny, evenly keyed, watermark-bounded, RocksDB-spillable: the
    100 TB-safe shape for custom streaming state."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def first_touch_cohorts(events: DataFrame,
                        watermark: str = "1 day") -> DataFrame:
    """Streaming first-touch state: MIN(activity day) per user — the
    stateful stage behind every retention dashboard (user → cohort
    day). Runs as an update-mode streaming aggregation whose state is
    one row per user; the retention readout (offset counts / blended
    curve) is sink-side arithmetic over this state plus the activity
    dedup, exactly what the batch replay twin
    `streaming_retention_curve_replay` computes over the same frames.
    """
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .agg(F.min(F.date_trunc("day", "ts")).alias("cohort")))


def variant_window_counts(events: DataFrame,
                          size: str = "1 day",
                          watermark: str = "1 day") -> DataFrame:
    """Streaming experiment-monitor state: per (tumbling event-time
    window, variant) event/purchase/spend-cents counts, variant
    assigned by the repo's md5 hash-split convention (first hex < '8'
    = control). This is the stateful stage of a live uplift
    dashboard — state is one row per (window, variant), bounded by
    the experiment's runtime; the cumulative readout (running
    treat-vs-control uplift as the experiment accumulates) is
    sink-side arithmetic over the closed windows, exactly what the
    batch replay twin `streaming_uplift_monitor_replay` computes
    over the same frames. Spend accumulates EXACT integer cents so
    the sink's divisions are deterministic."""
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
        < "8", 0).otherwise(1)
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", size).alias("w"),
                     variant.alias("t"))
            .agg(F.count(F.lit(1)).alias("n_ev"),
                 F.sum(F.when(F.col("event_type") == "purchase", 1)
                       .otherwise(0)).alias("n_pur"),
                 F.sum(F.when(F.col("event_type") == "purchase",
                              F.round(F.col("value") * 100)
                              .cast("bigint")).otherwise(0))
                 .alias("cents")))
