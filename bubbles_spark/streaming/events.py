"""Structured Streaming operators over the events shape.

The batch window operators (bubbles_spark.ops.events) and these share
the same groupBy(F.window(...)) plan — that is the design: write the
aggregation once, run it in batch for backfill and in streaming for
the live path.  Watermarks bound state for late data.

Local testing drives a parquet-directory stream to completion with
``run_batchlike`` (availableNow trigger + memory sink) — the
documented pattern for deterministic streaming tests.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory (swap for kafka in
    production — the downstream plan is identical)."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_agg_stream(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str | None = None,
    keys: Sequence[str] = ("event_type",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregation — the streaming twin of
    ops.events.tumbling_window/sliding_window.  State for a window is
    dropped once the watermark passes its end (bounded state at any
    uptime)."""
    win = (
        F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
    )
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("__w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.sum("value").alias("value_sum"),
        )
    )
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *keys,
        "record_count",
        "value_sum",
    )


def run_batchlike(
    stream_df: DataFrame,
    query_name: str = "stream_out",
    timeout_s: int = 120,
    output_mode: str = "append",
) -> DataFrame:
    """Drive a streaming query over all currently-available input and
    return the result as a batch DataFrame (availableNow + memory
    sink).  Deterministic: processes everything, then stops.

    For windowed aggregations use output_mode="complete": in append
    mode a window only emits once the watermark passes its end, so the
    final windows of a finite input never appear.
    """
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
