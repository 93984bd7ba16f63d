"""Batch event-time window operators (SURVEY.md §2.13).

The reference has NO streaming/window support at all — these are
pure-Spark extensions over the `events` table shape
(event_id, ts, user_id, event_type, value, props-json).

Batch mode here; the same groupBy(window(...)) plans run unchanged
as Structured Streaming queries (see bubbles_spark/streaming/) with a
watermark added — that's the point of designing on F.window /
F.session_window rather than hand-rolled bucketing.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bubbles_spark.ops.core import _AGG_FUNCS


def _window_aggs(measures: Sequence[tuple[str, str]], include_count: bool):
    aggs = []
    for field, func in measures:
        fn = _AGG_FUNCS[func.lower()]
        aggs.append(fn(field).alias(f"{field}_{func.lower()}"))
    if include_count:
        aggs.append(F.count(F.lit(1)).alias("record_count"))
    return aggs


def tumbling_window(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    measures: Sequence[tuple[str, str]] = (),
    include_count: bool = True,
) -> DataFrame:
    """Fixed-width event-time windows: groupBy(F.window(ts, duration)).
    Output: window_start, window_end, *keys, measures."""
    g = df.groupBy(F.window(ts_col, duration).alias("__w"), *keys)
    out = g.agg(*_window_aggs(measures, include_count))
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c != "__w" and c not in keys],
    )


def sliding_window(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    measures: Sequence[tuple[str, str]] = (),
    include_count: bool = True,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows.
    Spark expands the window assignment inline (no self-join)."""
    g = df.groupBy(F.window(ts_col, duration, slide).alias("__w"), *keys)
    out = g.agg(*_window_aggs(measures, include_count))
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c != "__w" and c not in keys],
    )


def session_window(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    measures: Sequence[tuple[str, str]] = (),
    include_count: bool = True,
) -> DataFrame:
    """Session windows (gap-based): F.session_window in batch mode.
    A session closes when no event arrives within ``gap``."""
    g = df.groupBy(F.session_window(ts_col, gap).alias("__w"), *keys)
    out = g.agg(*_window_aggs(measures, include_count))
    return out.select(
        F.col("__w.start").alias("session_start"),
        F.col("__w.end").alias("session_end"),
        *keys,
        *[c for c in out.columns if c != "__w" and c not in keys],
    )


def sessionize(
    df: DataFrame, ts_col: str, user_col: str, gap_minutes: float
) -> DataFrame:
    """Assign a session_id per user via gap-and-island (lag + running
    count of gap breaks).  Unlike session_window this keeps the
    original rows (one output row per event, labeled).  One shuffle on
    user, ordered within partition — the classic sessionization plan.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60.0
    prev = F.lag(ts_col).over(w)
    # >= gap starts a new session — the same closure as
    # F.session_window, whose [start, last+gap) interval is half-open
    is_new = F.when(
        prev.isNull()
        | (F.col(ts_col).cast("double") - prev.cast("double") >= gap_s),
        1,
    ).otherwise(0)
    return df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w)
    ).drop("__new")


def parse_props(
    df: DataFrame, props_col: str = "props", schema: str = "k INT"
) -> DataFrame:
    """Parse the JSON props column into typed fields (SURVEY.md §7.5:
    the reference era carried nesting as strings; from_json with an
    explicit schema is the scale path — no schema inference scan)."""
    return df.withColumn("__p", F.from_json(F.col(props_col), schema)).select(
        *df.columns, "__p.*"
    ).drop("__p")
