"""Structured Streaming layer (SURVEY.md §2.13 — pure extension; the
reference has no streaming support)."""

from bubbles_spark.streaming.events import (
    read_event_stream,
    run_batchlike,
    windowed_agg_stream,
)

__all__ = ["read_event_stream", "windowed_agg_stream", "run_batchlike"]
