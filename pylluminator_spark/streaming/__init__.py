"""Structured Streaming surface (SURVEY §2.9 / §7 M7).

The reference (eliopato/pylluminator) is batch-only — no watermarks, windows,
stateful ops, or late-data handling anywhere. This package adds the streaming
analogue of its ordered/windowed operators on the `events` surface:
tumbling/sliding/session windows with watermarks, streaming deduplication,
and a custom stateful change-point operator (the streaming form of the DMR
segmentation window, reference dm.py:565-596).
"""

from pylluminator_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    tumbling_window_counts,
    sliding_window_counts,
    session_window_agg,
    streaming_dedup,
    stateful_sessionize,
    stream_static_enrich,
    stream_stream_interval_join,
    run_available_now,
    parquet_sink,
)
