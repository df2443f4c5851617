"""Streaming analytics (SURVEY.md §7 M2): watermarks, event-time
windows, streaming dedup, stream-static / stream-stream joins, and
custom stateful processing via applyInPandasWithState.

The reference is a stateless record-at-a-time relay (/root/reference/
main.go:103-155) — it has none of these; they are the declared engine
surface from SURVEY.md §2.2 rows "Streaming: watermarks / windows /
stateful ops". Every operator here takes an unbounded DataFrame and
returns an unbounded DataFrame, so they compose with the CDC relay
sources in mongo_cdc_spark.cdc.pipeline.
"""

from mongo_cdc_spark.streaming.analytics import (  # noqa: F401
    read_events_stream,
    session_window_stats,
    sliding_window_counts,
    stream_static_enrich,
    stream_stream_self_join,
    streaming_dedup,
    tumbling_ohlc_bars,
    tumbling_window_counts,
    user_session_state,
)
from mongo_cdc_spark.streaming.stateful_v2 import (  # noqa: F401
    ROCKSDB_PROVIDER,
    user_running_stats_v2,
)
