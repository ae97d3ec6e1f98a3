"""Structured Streaming operators (E41–E45).

Batch-mode equivalents of the windowed aggregations live in
``plans.events_windows`` (where DuckDB can verify them); this module
runs the REAL streaming path: ``readStream`` → event-time windows /
watermark / stateful ops → sink. Tests drive them with the
``availableNow`` trigger, which drains a static directory as a stream
and terminates — the recommended pattern for deterministic streaming
tests.

At production scale the same topology reads Kafka: swap
``read_events_stream`` for ``spark.readStream.format("kafka")`` and the
transformations are unchanged.
"""

from .ops import (  # noqa: F401
    read_events_stream,
    run_stream_to_memory,
    tumbling_counts,
    sliding_counts,
    session_counts,
    dedup_events_within_watermark,
    running_count_per_user,
    click_purchase_join,
    streaming_cusum,
)
