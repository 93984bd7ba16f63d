"""Physical data layout: Z-order clustering for file skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet readers prune row groups / files whose min-max stats exclude
the predicate.  Plain insertion order gives every file nearly the
full value range on every column (no pruning); sorting clusters ONE
column perfectly and destroys the others.  A Z-order (Morton) key
interleaves the bits of several columns so each file covers a small
hyper-rectangle of the combined domain — multi-column pruning, the
same layout Delta OPTIMIZE ZORDER BY and Iceberg sort orders build
(public engine feature, re-expressed as a plain DataFrame transform
that works on vanilla parquet).

Scale shape: two scalar aggregates per column for the domain probe,
then one range-shuffle on the codegen'd key — the same single
shuffle any clustered write pays.  No UDFs.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(df: DataFrame, col: str, bits: int, bounds) -> Column:
    """Map a column into [0, 2^bits) as a long.

    Numerics scale linearly between (lo, hi) — Delta-style rank
    binning without the per-column range job; strings/binary hash
    into the grid (no range locality, but equality lookups still
    cluster).  NULLs land in cell 0 (they cluster together, and
    min-max stats can't prune NULL predicates anyway)."""
    n_cells = 1 << bits
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    if dt in ("string", "binary"):
        return F.pmod(F.xxhash64(c), F.lit(n_cells)).cast("long")
    if dt.startswith(("date", "timestamp")):
        c = F.unix_timestamp(c.cast("timestamp")).cast("double")
    else:
        c = c.cast("double")
    if bounds is not None:
        lo, hi = float(bounds[0]), float(bounds[1])
    else:
        row = df.select(F.min(c).alias("lo"), F.max(c).alias("hi")).first()
        lo = float(row["lo"]) if row["lo"] is not None else 0.0
        hi = float(row["hi"]) if row["hi"] is not None else 0.0
    if not hi > lo:
        return F.lit(0).cast("long")
    step = (hi - lo) / n_cells
    cell = F.floor((c - F.lit(lo)) / F.lit(step)).cast("long")
    return F.coalesce(
        F.least(F.greatest(cell, F.lit(0)), F.lit(n_cells - 1)), F.lit(0)
    )


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    bounds: Mapping[str, tuple[float, float]] | None = None,
) -> Column:
    """Morton (bit-interleaved) clustering key over ``cols``.

    Each column is gridded into 2^bits cells (``_scaled``), then bit b
    of column c lands at position b·n_cols + c of the key — the
    standard Z-curve, unrolled into int-literal shift/mask codegen
    expressions (no HOFs, no UDFs).  bits·n_cols must fit a signed
    long (≤ 62)."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(
            f"bits*cols = {bits * len(cols)} exceeds a signed long (max 62)"
        )
    cells = [_scaled(df, c, bits, (bounds or {}).get(c)) for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for ci, cell in enumerate(cells):
            bit = F.shiftright(cell, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cells) + ci))
    return z


def zorder_by(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    num_partitions: int | None = None,
    bounds: Mapping[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Cluster rows along the Z-curve of ``cols``: range-partition on
    the Morton key, sort within partitions, drop the key.  Writing
    the result gives every output file a tight min-max envelope on
    EVERY clustered column, so selective scans skip most files —
    measured in tests/test_layout.py via parquet row-group stats.

    One range shuffle (sampled boundaries, no global sort task); the
    within-partition sort spills, never collects."""
    key = zorder_key(df, cols, bits, bounds)
    tagged = df.withColumn("__zkey", key)
    if num_partitions:
        tagged = tagged.repartitionByRange(num_partitions, "__zkey")
    else:
        tagged = tagged.repartitionByRange("__zkey")
    return tagged.sortWithinPartitions("__zkey").drop("__zkey")


def row_group_stats(
    spark,
    path: str,
    path_glob: str = "*.parquet",
) -> DataFrame:
    """Per-row-group parquet footer statistics for every file under
    ``path``: (file_name, row_group_id, num_rows, num_columns,
    total_bytes) — the observability half of the maintenance family.
    Fragmented output (many small row groups) says run ``compact``;
    fat value envelopes after filtering say the table wants
    ``zorder_by``; per-file row skew says revisit partitioning.
    ``total_bytes`` is the row group's uncompressed byte size,
    byte-identical to DuckDB's ``parquet_metadata.row_group_bytes``
    and pyarrow's ``total_byte_size`` (tests pin all three).

    Plan: the driver lists files RECURSIVELY (Hadoop FS metadata —
    any scheme; recursion so ``partitionBy`` layouts, whose data
    files all live under ``key=value/`` subdirectories, are seen),
    then ONE task per file reads just the footer via pyarrow
    (`bubbles_spark.warc._open_input_at`, so s3a/hdfs work) — data
    pages are never touched, cost is one footer read per file."""
    from bubbles_spark.warc import _hadoop_list_files

    files = [p for p, _size in _hadoop_list_files(spark, path, path_glob)]
    schema = (
        "file_name string, row_group_id bigint, num_rows bigint, "
        "num_columns bigint, total_bytes bigint"
    )
    if not files:
        return spark.createDataFrame([], schema)

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        from bubbles_spark.warc import _open_input_at

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.ParquetFile(_open_input_at(p, 0)).metadata
                base = p.rsplit("/", 1)[-1]
                for i in range(md.num_row_groups):
                    rg = md.row_group(i)
                    out.append(
                        (base, i, rg.num_rows, rg.num_columns, rg.total_byte_size)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "file_name", "row_group_id", "num_rows",
                    "num_columns", "total_bytes",
                ],
            )

    fdf = spark.createDataFrame([(p,) for p in files], "path string").repartition(
        len(files)
    )
    return fdf.mapInPandas(read_footers, schema)
