"""Reshaping / statistical normalization operators (engine
extensions — the reference's field-operation catalog stops at
projection/rename, SURVEY.md §2.2; these cover the melt/bin/scale
trio every analytics pipeline reinvents).

All pure Column expressions — codegen'd, shuffle-free except where a
grouped aggregate is semantically required.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    ids: str | Sequence[str],
    values: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long (melt): one output row per (id row, value column).

    Uses the native ``DataFrame.unpivot`` (Expand physical node) — a
    map-side row generator, no shuffle, no UDF; at 100 TB output is
    |values|× the input rows but each scan row is visited once.
    Value columns must share a least-common type (Spark enforces);
    cast beforehand when mixing decimals/doubles.
    """
    id_list = [ids] if isinstance(ids, str) else list(ids)
    return df.unpivot(id_list, list(values), var_name, value_name)


def histogram(
    df: DataFrame,
    field: str,
    lo: float,
    hi: float,
    bins: int,
    out: str = "bin",
    closed_upper: bool = True,
) -> DataFrame:
    """Fixed-width binning: adds an integer bin index in [0, bins) for
    ``field`` values in [lo, hi); values outside land in -1 / ``bins``
    (width_bucket convention shifted to 0-base).  With
    ``closed_upper`` the exact upper bound folds into the last bin
    (histogram convention).

    A single arithmetic expression — codegen'd, no shuffle; the usual
    follow-up ``groupBy(bin).count()`` partial-aggregates map-side to
    at most ``bins`` rows per task, so the shuffle is metadata-sized
    even at 100 TB.
    """
    if bins <= 0 or not hi > lo:
        raise ValueError("need bins > 0 and hi > lo")
    width = (hi - lo) / bins
    x = F.col(field).cast("double")
    idx = F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("long")
    idx = F.when(x < lo, F.lit(-1)).when(x >= hi, F.lit(bins)).otherwise(idx)
    if closed_upper:
        idx = F.when(x == hi, F.lit(bins - 1)).otherwise(idx)
    return df.withColumn(out, idx.cast("long"))


def zscore_normalize(
    df: DataFrame,
    fields: str | Sequence[str],
    by: str | Sequence[str] | None = None,
    suffix: str = "_z",
    ddof: int = 1,
) -> DataFrame:
    """Standard-score normalization: (x - mean) / stddev per field,
    optionally within ``by`` groups (the feature-scaling primitive).

    Global case: one tiny aggregate row cross-joined back (Spark plans
    a broadcast nested loop of a 1-row side — effectively free) — NOT
    a Window over an unpartitioned frame, which would serialize the
    whole input through one task.  Grouped case: groupBy + broadcast
    the per-group stats back onto the input — two scans but both
    shuffle only the small stats side; AQE broadcasts it.

    Zero-variance fields yield NULL z-scores (SQL division semantics:
    x/0.0 on doubles is NULL under try_divide; we guard explicitly so
    ANSI mode doesn't raise).
    """
    field_list = [fields] if isinstance(fields, str) else list(fields)
    by_list = [] if by is None else [by] if isinstance(by, str) else list(by)
    std_fn = F.stddev_samp if ddof == 1 else F.stddev_pop

    stats = [
        c
        for f in field_list
        for c in (F.avg(f).alias(f"__mu_{f}"), std_fn(f).alias(f"__sd_{f}"))
    ]
    if by_list:
        # no forced broadcast: the stats side is |groups| rows — tiny
        # for typical segmentations (AQE broadcasts it), but a forced
        # hint would OOM on million-group keys (round-1 lesson: size-
        # gate hints, don't hardcode them)
        agg = df.groupBy(*by_list).agg(*stats)
        joined = df.join(agg, by_list, "left")
    else:
        joined = df.crossJoin(F.broadcast(df.agg(*stats)))
    for f in field_list:
        sd = F.col(f"__sd_{f}")
        joined = joined.withColumn(
            f"{f}{suffix}",
            F.when(sd > 0, (F.col(f) - F.col(f"__mu_{f}")) / sd),
        )
    drop = [c for f in field_list for c in (f"__mu_{f}", f"__sd_{f}")]
    return joined.drop(*drop)


def flatten_struct(
    df: DataFrame, sep: str = "_", max_depth: int = 8
) -> DataFrame:
    """Flatten every struct column to top-level scalar columns
    (``a.b.c`` → ``a_b_c``), recursively to ``max_depth`` — the
    ingestion normalizer for nested sources (JSON events, protobuf
    exports, the media struct's meta) so downstream relational ops
    and parquet column pruning see plain columns.  Arrays are left
    intact (explode is a row-multiplying decision the caller owns).
    Pure projection — map-only, no shuffle, prunes at the scan."""
    import pyspark.sql.types as T

    def expand(prefix: str, dt, path: str, depth: int):
        if isinstance(dt, T.StructType) and depth < max_depth:
            out = []
            for f in dt.fields:
                out += expand(
                    f"{prefix}{sep}{f.name}", f.dataType, f"{path}.{f.name}",
                    depth + 1,
                )
            return out
        return [F.col(path).alias(prefix)]

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            cols += expand(f.name, f.dataType, f.name, 0)
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def one_hot(
    df: DataFrame,
    col: str,
    categories: Sequence[str],
    prefix: str | None = None,
    other_col: bool = True,
) -> DataFrame:
    """One-hot encode a categorical column against an EXPLICIT
    category list — the ML-feature transform, with the vocabulary
    pinned by the caller (a data-derived vocabulary would make the
    output schema nondeterministic across refreshes, which breaks
    both serving contracts and oracle checks; mine the list once with
    ``audit.top_values``).

    Unlisted / NULL values set every indicator to 0 and (with
    ``other_col``) flag ``{prefix}_other`` = 1.  Map-only codegen —
    one CASE per category, no shuffle.

    Output: input columns + ``{prefix}_{category}`` int indicators
    (+ ``{prefix}_other``)."""
    if not categories:
        raise ValueError("one_hot: categories must be non-empty")
    p = prefix if prefix is not None else col
    c = F.col(col)
    out = df
    for cat in categories:
        out = out.withColumn(
            f"{p}_{cat}", (c == cat).cast("int")
        )
        # NULL == cat is NULL, not false — pin indicators to 0/1
        out = out.withColumn(
            f"{p}_{cat}", F.coalesce(F.col(f"{p}_{cat}"), F.lit(0))
        )
    if other_col:
        known = c.isin(list(categories))
        out = out.withColumn(
            f"{p}_other",
            F.when(known, F.lit(0)).otherwise(F.lit(1)).cast("int"),
        )
    return out


def histogram2d(
    df,
    x_col: str,
    y_col: str,
    x_bounds: tuple,
    y_bounds: tuple,
    x_bins: int = 10,
    y_bins: int = 10,
):
    """2-D histogram (heatmap binning): joint counts of two numeric
    columns over a FIXED [lo, hi) × [lo, hi) grid, out-of-range
    values clamped to the edge bins — the joint-distribution view
    beside the 1-D ``histogram`` and ``drift.psi_report``'s bins.

    Caller-pinned bounds (the psi_report discipline): a reproducible
    heatmap needs a pinned domain; derive one with
    ``drift.suggest_bounds`` per axis.  Bin index is
    ``floor((v − lo) / w)`` clamped to [0, bins-1] — the same fixed
    IEEE steps per value in any engine.  Empty cells are absent
    (sparse output); share is one IEEE division by the broadcast
    1-row total.

    Scale: map-only binning + ONE keyed count — the output is at most
    x_bins·y_bins rows regardless of input size.

    Output: x_bin, y_bin, n, share."""
    from pyspark.sql import functions as F

    def _bin(col, lo, hi, bins):
        lo_f, hi_f = float(lo), float(hi)
        if not hi_f > lo_f:
            raise ValueError(f"histogram2d: need hi > lo, got [{lo}, {hi}]")
        wdt = (hi_f - lo_f) / float(bins)
        raw = F.floor((F.col(col).cast("double") - F.lit(lo_f)) / F.lit(wdt))
        return F.least(
            F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1)
        ).cast("bigint")

    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    per = (
        base.select(
            _bin(x_col, x_bounds[0], x_bounds[1], x_bins).alias("x_bin"),
            _bin(y_col, y_bounds[0], y_bounds[1], y_bins).alias("y_bin"),
        )
        .groupBy("x_bin", "y_bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = per.agg(F.sum("n").cast("bigint").alias("__t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "x_bin",
        "y_bin",
        "n",
        (F.col("n").cast("double") / F.col("__t").cast("double")).alias("share"),
    )
