"""Z-order clustering (ops/layout.py): key correctness and the thing
that actually matters — tighter per-file min-max envelopes, i.e.
file skipping."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from bubbles_spark.ops import layout


def _morton2(x: int, y: int, bits: int = 4) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_reference_morton(spark):
    # bounds pinned to the cell grid so _scaled is the identity on
    # 0..15, making the key comparable to a hand-rolled Morton code
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.withColumn(
        "z",
        layout.zorder_key(df, ["x", "y"], bits=4, bounds={"x": (0, 16), "y": (0, 16)}),
    ).collect()
    for r in out:
        assert r.z == _morton2(r.x, r.y), (r.x, r.y)


def test_zorder_key_validation(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        layout.zorder_key(df, [])
    with pytest.raises(ValueError):
        layout.zorder_key(df, ["x", "y"], bits=32)


def test_zorder_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (3, 5.0), (7, 5.0)], "x long, c double"
    )
    out = df.withColumn("z", layout.zorder_key(df, ["x", "c"], bits=4)).collect()
    assert all(r.z is not None for r in out)


def test_zorder_preserves_rows(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    z = layout.zorder_by(df, ["o_custkey", "o_totalprice"], num_partitions=4)
    assert z.count() == df.count()
    a = {r.o_orderkey for r in df.select("o_orderkey").collect()}
    b = {r.o_orderkey for r in z.select("o_orderkey").collect()}
    assert a == b


def _file_ranges(path: str, cols):
    """Per-parquet-file (min, max) of each column via footer stats —
    exactly the metadata a reader prunes on."""
    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                col = g.column(i)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    mn, mx = col.statistics.min, col.statistics.max
                    mins[name] = mn if mins[name] is None else min(mins[name], mn)
                    maxs[name] = mx if maxs[name] is None else max(maxs[name], mx)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def test_zorder_tightens_file_envelopes(spark, tmp_path):
    """The point of the op: after z-ordering on (custkey, totalprice),
    each output file covers a small slice of BOTH domains, so the sum
    of per-file ranges collapses vs insertion order."""
    df = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    cols = ["o_custkey", "o_totalprice"]
    lo_hi = {
        c: (row["mn"], row["mx"])
        for c in cols
        for row in [df.select(F.min(c).alias("mn"), F.max(c).alias("mx")).first()]
    }

    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zorder")
    df.repartition(8).write.parquet(plain_dir)
    layout.zorder_by(df, cols, num_partitions=8).write.parquet(z_dir)

    def mean_coverage(path):
        # mean fraction of the full domain a file's envelope spans,
        # averaged over both columns (1.0 = no pruning possible)
        ranges = _file_ranges(path, cols)
        fracs = []
        for r in ranges:
            for c in cols:
                mn, mx = r[c]
                lo, hi = lo_hi[c]
                fracs.append((mx - mn) / (hi - lo))
        return sum(fracs) / len(fracs)

    plain_cov = mean_coverage(plain_dir)
    z_cov = mean_coverage(z_dir)
    # random partitioning covers ~the whole domain per file; z-order
    # must cut the average envelope at least in half on this data
    assert plain_cov > 0.8, plain_cov
    assert z_cov < plain_cov / 2, (z_cov, plain_cov)


def test_zorder_equality_clustering_for_strings(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    z = layout.zorder_by(df, ["c_mktsegment", "c_acctbal"], num_partitions=4)
    assert z.count() == df.count()


def test_filestore_create_zorder(spark, tmp_path):
    from bubbles_spark.io import FileStore

    store = FileStore(spark, str(tmp_path))
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    store.create("orders_z", from_obj=df, zorder=["o_custkey", "o_totalprice"])
    back = store.get_object("orders_z")
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_row_group_stats_matches_duckdb_and_pyarrow(spark, tmp_path):
    """Footer stats byte-identical to DuckDB parquet_metadata AND
    pyarrow, across multiple files and row groups."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bubbles_spark.ops import layout

    for f, n in (("a.parquet", 700), ("b.parquet", 250)):
        t = pa.table({"x": list(range(n)), "s": [f"v{i}" for i in range(n)]})
        pq.write_table(t, str(tmp_path / f), row_group_size=300)

    got = sorted(
        map(tuple, layout.row_group_stats(spark, str(tmp_path)).collect())
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"""
            SELECT DISTINCT regexp_extract(file_name, '([^/]+)$', 1),
                   row_group_id, row_group_num_rows,
                   row_group_num_columns, row_group_bytes
            FROM parquet_metadata('{tmp_path}/*.parquet')
            """
        ).fetchall()
    )
    assert got == want
    # and against pyarrow directly
    pa_rows = []
    for f in ("a.parquet", "b.parquet"):
        md = pq.ParquetFile(str(tmp_path / f)).metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            pa_rows.append((f, i, rg.num_rows, rg.num_columns, rg.total_byte_size))
    assert got == sorted(pa_rows)
    # a.parquet: 700 rows at row_group_size=300 -> 3 row groups
    assert sum(1 for r in got if r[0] == "a.parquet") == 3


def test_row_group_stats_recurses_into_partitioned_layout(spark, tmp_path):
    """partitionBy tables keep every data file under key=value/
    subdirectories; the lister must recurse (and skip _SUCCESS) or
    the diagnostic silently reports an empty — 'healthy' — layout."""
    from bubbles_spark.ops import layout

    tbl = str(tmp_path / "tbl")
    spark.range(100).selectExpr("id", "id % 3 AS k").write.partitionBy(
        "k"
    ).parquet(tbl)
    got = layout.row_group_stats(spark, tbl).collect()
    assert sum(r["num_rows"] for r in got) == 100
    assert all(r["file_name"].endswith(".parquet") for r in got)
