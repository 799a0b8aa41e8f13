"""Structured Streaming surface: the reference's incremental loop (W1-W3)
as a real streaming query, for deployments that want push-based ingestion
instead of the batch driver loop."""

from .incremental import (  # noqa: F401
    stream_bundle_counts,
    stream_dedup_events,
    stream_events,
    stream_sessionize,
)
