"""Structured Streaming extension.

The reference contains **no streaming code** (SURVEY.md §0 — exhaustive
module listing: core/jts/spatial/spatial-index only), so this package is
an extension, not a port: the same event-rollup and sessionization
semantics our batch queries define, expressed as incremental streaming
plans with watermarks, plus spatial enrichment (the ST surface is pandas
UDFs + native exprs, so it composes with streaming DataFrames unchanged).
"""

from geomesa_hive_spark.streaming.events import (
    enrich_stream_spatial,
    enrich_with_dim,
    hourly_rollup,
    normalize_event_ts,
    read_events_stream,
    run_to_memory,
    session_rollup,
    streaming_contamination_filter,
    streaming_dedup,
    stateful_sessions,
    stateful_anomaly,
    stateful_anomaly_tws,
    stream_interval_join,
    batch_anomaly,
    batch_sessions,
    batch_dedup,
    dedup_fingerprint,
)

__all__ = [
    "read_events_stream",
    "hourly_rollup",
    "session_rollup",
    "stateful_sessions",
    "stateful_anomaly",
    "stateful_anomaly_tws",
    "stream_interval_join",
    "batch_anomaly",
    "batch_sessions",
    "batch_dedup",
    "dedup_fingerprint",
    "enrich_stream_spatial",
    "enrich_with_dim",
    "streaming_dedup",
    "streaming_contamination_filter",
    "run_to_memory",
]
