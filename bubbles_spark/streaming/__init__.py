"""Structured Streaming layer (SURVEY.md §2.13 — pure extension; the
reference has no streaming support)."""

from bubbles_spark.streaming.events import (
    dedup_stream,
    docs_ingest_dedup_stream,
    read_event_stream,
    read_testdata_event_stream,
    read_testdata_table_stream,
    run_batchlike,
    sessionize_stream,
    stream_to_parquet,
    windowed_agg_stream,
)

__all__ = [
    "read_event_stream",
    "read_testdata_event_stream",
    "read_testdata_table_stream",
    "windowed_agg_stream",
    "dedup_stream",
    "sessionize_stream",
    "docs_ingest_dedup_stream",
    "stream_to_parquet",
    "run_batchlike",
]
