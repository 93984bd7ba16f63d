"""S6/S7/S8 store tests: the datapackage source reads for real
(stdlib JSON + Spark CSV); XLS/Mongo verify the gated plumbing."""

from __future__ import annotations

import json
import os

import pytest

from bubbles_spark import io as bio


def test_mongo_store_plumbing(spark):
    store = bio.open_store(
        "mongo", spark=spark, uri="mongodb://localhost:0/", database="d"
    )
    # no connector jar in this env: the load must fail with the Spark
    # data-source-not-found error, proving the wiring reaches Spark
    with pytest.raises(Exception):
        store.get_object("c").count()


def _write_min_xlsx(path, sheet_name="data"):
    """Handcraft a minimal ECMA-376 workbook: shared + inline strings,
    ints, floats, a gap cell — the shapes the stdlib reader covers."""
    import zipfile

    wb = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{sheet_name}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    ss = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><t>id</t></si><si><t>name</t></si><si><t>score</t></si>"
        "<si><t>ann</t></si></sst>"
    )
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="s"><v>2</v></c></row>'
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c>'
        '<c r="C2"><v>2.5</v></c></row>'
        '<row r="3"><c r="A3"><v>2</v></c><c r="B3" t="inlineStr">'
        '<is><t>bo</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", ss)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_xlsx_store_stdlib_read(spark, tmp_path):
    """S6: .xlsx reads for real on the stdlib (no openpyxl/xlrd in
    this container) — OOXML zip+XML parse to a typed DataFrame."""
    _write_min_xlsx(tmp_path / "book.xlsx")
    store = bio.open_store("xls", path=str(tmp_path), spark=spark)
    assert store.objects() == ["book"]
    df = store.get_object("book")
    rows = {r["name"]: (r["id"], r["score"]) for r in df.collect()}
    assert rows == {"ann": (1, 2.5), "bo": (2, None)}
    # sheet addressable by name too
    assert store.get_object("book", sheet="data").count() == 2


def test_xls_corrupt_and_readonly(spark, tmp_path):
    """Legacy .xls now parses on the stdlib (tests/test_xls_biff.py);
    a corrupt container fails loudly, and the store stays read-only
    as in the reference."""
    (tmp_path / "old.xls").write_bytes(b"\xd0\xcf\x11\xe0 not parseable")
    store = bio.open_store("xls", path=str(tmp_path), spark=spark)
    with pytest.raises(ValueError, match="magic"):
        store.get_object("old")
    with pytest.raises(NotImplementedError):
        store.create("x")


def test_datapackage_store(spark, tmp_path):
    import json

    from bubbles_spark import io as bio

    (tmp_path / "people.csv").write_text("id,name,score\n1,ann,2.5\n2,bo,3.5\n")
    desc = {
        "name": "tiny",
        "resources": [
            {
                "name": "people",
                "path": "people.csv",
                "schema": {
                    "fields": [
                        {"name": "id", "type": "integer"},
                        {"name": "name", "type": "string"},
                        {"name": "score", "type": "number"},
                    ]
                },
            }
        ],
    }
    (tmp_path / "datapackage.json").write_text(json.dumps(desc))
    store = bio.open_store("datapackage", path=str(tmp_path), spark=spark)
    assert store.objects() == ["people"]
    df = store.get_object("people")
    # Table Schema mapped to an explicit StructType — no inferSchema scan
    assert dict(df.dtypes) == {"id": "bigint", "name": "string", "score": "double"}
    assert df.count() == 2
    import pytest

    with pytest.raises(NotImplementedError):
        store.create("x", from_obj=df)


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with
    no Exchange on either side — the co-located-join contract."""
    from pyspark.sql import functions as F

    from bubbles_spark import io as bio

    store = bio.open_store("parquet", path=str(tmp_path), spark=spark)
    a = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("w", F.col("id") * 3)
    store.create_bucketed("bt_a", a, "id", num_buckets=8, replace=True)
    store.create_bucketed("bt_b", b, "id", num_buckets=8, replace=True)
    ta, tb = store.get_bucketed("bt_a"), store.get_bucketed("bt_b")
    # tiny tables would broadcast (bucketing "disabled by query
    # planner"); force the sort-merge regime bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """partition_by writes hive-style directories; a filter on the
    partition column must become a PartitionFilter (pruned listing),
    not a data filter over every file."""
    from pyspark.sql import functions as F

    from bubbles_spark import io as bio

    store = bio.open_store("parquet", path=str(tmp_path), spark=spark)
    df = spark.range(0, 300).withColumn(
        "bucket", F.when(F.col("id") % 3 == 0, "a").when(F.col("id") % 3 == 1, "b").otherwise("c")
    )
    store.create("parts", from_obj=df, replace=True, partition_by=["bucket"])
    back = store.get_object("parts").filter(F.col("bucket") == "a")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:120]
    assert back.count() == 100


def test_filestore_upsert(spark, tmp_path):
    """SCD1 merge: matched keys replaced, new keys appended, others
    kept; a repeated identical upsert is idempotent."""
    from bubbles_spark.io import ParquetStore

    store = ParquetStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, x double"
    )
    store.create("dim", from_obj=base)

    ups = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, v string, x double"
    )
    store.upsert("dim", ups, "k")
    got = {r["k"]: (r["v"], r["x"]) for r in store.get_object("dim").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    store.upsert("dim", ups, "k")  # idempotent
    again = {r["k"]: (r["v"], r["x"]) for r in store.get_object("dim").collect()}
    assert again == got

    # upsert into a missing object just creates it
    store.upsert("fresh", ups, "k")
    assert store.get_object("fresh").count() == 2


# --- S3/S4/S5: real JDBC round-trip against the Derby embedded -------
# driver that ships inside Spark's own jars (no network, no install).

DERBY_OPTS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def jdbc_store(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    url = f"jdbc:derby:{db};create=true"
    store = bio.open_store("sql", spark=spark, url=url, **DERBY_OPTS)
    df = spark.createDataFrame(
        [(1, "ann", 2.5), (2, "bo", 3.5), (3, "cy", None)],
        "id int, name string, score double",
    )
    store.create("people", from_obj=df, replace=True)
    return store


def test_jdbc_roundtrip(spark, jdbc_store):
    """create → objects → get_object: S5 write + S3 table read."""
    assert "PEOPLE" in jdbc_store.objects()  # Derby upper-cases identifiers
    back = jdbc_store.get_object("people")
    assert back.count() == 3
    assert {r["name"] for r in back.collect()} == {"ann", "bo", "cy"}
    assert dict(back.dtypes)["score"] == "double"


def test_jdbc_statement_pushdown(spark, jdbc_store):
    """S4: arbitrary SQL executes IN the database, not in Spark.
    Spark's JDBC writer quotes column identifiers, so Derby stores
    them case-sensitively — statements must quote them back."""
    got = jdbc_store.statement(
        'SELECT "name", "score" * 2 AS dbl FROM people WHERE "id" < 3'
    )
    rows = {r["name"]: r["DBL"] for r in got.collect()}
    assert rows == {"ann": 5.0, "bo": 7.0}


def test_jdbc_partitioned_read(spark, jdbc_store):
    """Scale path: partitionColumn fans the read out over N parallel
    JDBC cursors — one per executor slice, not one global cursor."""
    url = jdbc_store.url
    big = spark.range(0, 1000).selectExpr("CAST(id AS INT) AS id", "id * 2.0 AS v")
    jdbc_store.create("wide", from_obj=big, replace=True)
    part = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "wide")
        .option("partitionColumn", "id")
        .option("lowerBound", "0")
        .option("upperBound", "1000")
        .option("numPartitions", "4")
        .options(**DERBY_OPTS)
        .load()
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 1000
    assert part.agg({"v": "sum"}).collect()[0][0] == sum(i * 2.0 for i in range(1000))


def test_jdbc_create_errorifexists(spark, jdbc_store):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(Exception):
        jdbc_store.create("people", from_obj=df)  # replace not passed


def test_filestore_upsert_partition_pruned(spark, tmp_path):
    """Partitioned upsert rewrites ONLY the partitions the updates
    touch: untouched partition files keep their inode (mtime check),
    and the merge semantics match the full-rewrite form."""
    import os
    import time

    from bubbles_spark.io import ParquetStore

    store = ParquetStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "k long, part string, x double",
    )
    store.create("dim", from_obj=base, partition_by=["part"])
    obj_dir = os.path.join(str(tmp_path), "dim.parquet")
    untouched = os.path.join(obj_dir, "part=c")
    before = max(
        os.path.getmtime(os.path.join(untouched, f)) for f in os.listdir(untouched)
    )
    time.sleep(1.1)

    ups = spark.createDataFrame(
        [(2, "a", 99.0), (5, "b", 50.0)], "k long, part string, x double"
    )
    store.upsert("dim", ups, "k", partition_by=["part"])
    got = {r["k"]: (r["part"], r["x"]) for r in store.get_object("dim").collect()}
    assert got == {
        1: ("a", 10.0), 2: ("a", 99.0), 3: ("b", 30.0), 4: ("c", 40.0), 5: ("b", 50.0),
    }
    after = max(
        os.path.getmtime(os.path.join(untouched, f)) for f in os.listdir(untouched)
    )
    assert after == before  # partition c was never rewritten

    # idempotent like the full-rewrite form
    store.upsert("dim", ups, "k", partition_by=["part"])
    assert {r["k"] for r in store.get_object("dim").collect()} == {1, 2, 3, 4, 5}


def test_overwrite_partitions_touches_only_updated(spark, tmp_path):
    from pyspark.sql import functions as F

    from bubbles_spark.io import ParquetStore

    store = ParquetStore(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, part string, v double",
    )
    store.create("t", from_obj=df, partition_by=["part"])
    import glob
    import os

    b_files_before = sorted(glob.glob(os.path.join(str(tmp_path), "t.parquet", "part=b", "*")))

    upd = spark.createDataFrame([(9, "a", 99.0)], "id long, part string, v double")
    store.overwrite_partitions("t", upd, ["part"])
    got = {(r.id, r.part, r.v) for r in store.get_object("t").collect()}
    assert got == {(9, "a", 99.0), (3, "b", 30.0)}  # a replaced, b intact
    b_files_after = sorted(glob.glob(os.path.join(str(tmp_path), "t.parquet", "part=b", "*")))
    assert b_files_before == b_files_after  # b's files untouched

    # creating-from-nothing path
    store.overwrite_partitions("fresh", upd, ["part"])
    assert store.get_object("fresh").count() == 1


def test_compact_reduces_file_count(spark, tmp_path):
    import glob
    import os

    from bubbles_spark.io import ParquetStore

    store = ParquetStore(spark, str(tmp_path))
    df = spark.range(10000).selectExpr("id", "id * 2 AS v").repartition(64)
    store.create("many", from_obj=df)
    before = len(glob.glob(os.path.join(str(tmp_path), "many.parquet", "*.parquet")))
    assert before >= 32
    n = store.compact("many", target_mb=128)
    after = len(glob.glob(os.path.join(str(tmp_path), "many.parquet", "*.parquet")))
    assert n == 1 and after == 1
    assert store.get_object("many").count() == 10000

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        store.compact("missing")


def test_orc_store_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from bubbles_spark.io import ORCStore

    store = ORCStore(spark, str(tmp_path / "orc"))
    df = spark.createDataFrame(
        [(1, "a", 1.5, "2024-01-01 00:00:00")],
        "id long, name string, x double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    store.create("t", from_obj=df)
    back = store.get_object("t")
    assert back.count() == 1
    # ORC preserves the full type set, NTZ included
    assert dict(back.dtypes) == dict(df.dtypes)
    r = back.collect()[0]
    assert (r["id"], r["name"], r["x"]) == (1, "a", 1.5)
    assert store.exists("t") and "t" in store.objects()


def test_json_store_roundtrip(spark, tmp_path):
    from bubbles_spark.io import JSONStore

    store = JSONStore(spark, str(tmp_path / "json"))
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    store.create("t", from_obj=df)
    back = store.get_object("t")
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_avro_store_gates_cleanly_without_jar(spark, tmp_path):
    import pytest as _pytest

    from bubbles_spark.io import AvroStore

    # either the datasource is deployable and the store roundtrips,
    # or construction raises the clear jar-naming error — never a
    # late AnalysisException from the write path
    try:
        store = AvroStore(spark, str(tmp_path / "avro"))
    except RuntimeError as err:
        assert "spark-avro" in str(err)
        return
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    store.create("t", from_obj=df)
    assert store.get_object("t").count() == 1


def test_orc_store_roundtrip_and_pushdown(spark, tmp_path):
    from bubbles_spark.io import ORCStore

    store = ORCStore(spark, str(tmp_path / "orc"))
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) * 1.5) for i in range(100)],
        "id long, name string, v double",
    )
    store.create("t", from_obj=df)
    back = store.get_object("t")
    assert back.count() == 100
    assert sorted(r["id"] for r in back.filter("id < 3").collect()) == [0, 1, 2]
    # predicate pushdown reaches the ORC scan (same contract as parquet)
    plan = back.filter("id < 3")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "id" in plan


def test_fixed_width_store(spark, tmp_path):
    from bubbles_spark.io import FixedWidthStore, open_store

    p = tmp_path / "ledger.txt"
    p.write_text(
        "000001Widget A            0001999\n"
        "000002Gadget              0025000\n"
        "\n"
        "00000XBroken              notanum\n"
    )
    store = FixedWidthStore(
        spark,
        str(p),
        colspecs=[("id", 0, 6), ("name", 6, 26), ("cents", 26, 33)],
        fields={"id": "long", "cents": "long"},
    )
    rows = {r["id"]: r for r in store.get_object().collect()}
    assert rows[1]["name"] == "Widget A" and rows[1]["cents"] == 1999
    assert rows[2]["cents"] == 25000
    # malformed row: try_cast yields NULLs instead of an ANSI abort
    assert None in rows and rows[None]["cents"] is None
    assert len(rows) == 3  # blank line skipped

    via_factory = open_store(
        "fixed_width", spark, path=str(p),
        colspecs=[("id", 0, 6)], fields={"id": "long"},
    )
    assert via_factory.get_object().count() == 3

    import pytest as _pytest
    with _pytest.raises(ValueError):
        FixedWidthStore(spark, str(p), colspecs=[("bad", 5, 5)])


def test_filestore_snapshot_restore(spark, tmp_path):
    import pytest as _pt

    from bubbles_spark.io import FileStore

    store = FileStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, k string, v double",
    )
    store.create("t", from_obj=base)
    tag1 = store.snapshot("t")
    assert tag1 == "v0001" and store.list_snapshots("t") == ["v0001"]

    # mutate the live object via the staged-rewrite upsert path
    upd = spark.createDataFrame([(2, "B", 99.0), (4, "d", 40.0)],
                                "id long, k string, v double")
    store.upsert("t", upd, keys="id")
    live = {r["id"]: (r["k"], r["v"]) for r in store.get_object("t").collect()}
    assert live[2] == ("B", 99.0) and 4 in live

    # the snapshot still reads the ORIGINAL rows (hardlinked files
    # survived the rmtree of the live directory)
    snap = {r["id"]: (r["k"], r["v"])
            for r in store.get_snapshot("t", tag1).collect()}
    assert snap == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", 30.0)}

    # second snapshot of the mutated state, then roll back to v0001
    tag2 = store.snapshot("t")
    assert store.list_snapshots("t") == ["v0001", "v0002"]
    store.restore("t", tag1)
    back = {r["id"]: (r["k"], r["v"]) for r in store.get_object("t").collect()}
    assert back == snap
    # roll FORWARD again: restore is non-destructive of snapshots
    store.restore("t", tag2)
    fwd = {r["id"]: (r["k"], r["v"]) for r in store.get_object("t").collect()}
    assert fwd == live

    store.drop_snapshot("t", tag1)
    assert store.list_snapshots("t") == ["v0002"]
    with _pt.raises(FileNotFoundError):
        store.get_snapshot("t", "v0001")
    with _pt.raises(FileExistsError):
        store.snapshot("t", tag2)
    with _pt.raises(ValueError):
        store.snapshot("t", "../evil")


def test_filestore_snapshot_partitioned(spark, tmp_path):
    from bubbles_spark.io import FileStore

    store = FileStore(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, p int, v double"
    )
    store.create("pt", from_obj=df, partition_by=["p"])
    tag = store.snapshot("pt", "before")
    store.overwrite_partitions(
        "pt",
        spark.createDataFrame([(100, 1, 999.0)], "id long, p int, v double"),
        partition_by=["p"],
    )
    assert store.get_object("pt").filter("p = 1").count() == 1
    snap = store.get_snapshot("pt", tag)
    assert snap.count() == 30 and snap.filter("p = 1").count() == 10
    store.restore("pt", tag)
    assert store.get_object("pt").count() == 30


def test_filestore_restore_parks_then_swaps(spark, tmp_path):
    """restore() must never delete the live object before the staged
    copy is in place: the old version is renamed aside, the staged
    dir renames in, and only then is the parked dir removed — so no
    park/stage residue survives a successful restore, and a STALE
    parked dir from an interrupted earlier attempt is cleaned up
    rather than crashing the swap."""
    import os

    from bubbles_spark.io import FileStore

    store = FileStore(spark, str(tmp_path))
    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    store.create("t", from_obj=base)
    tag = store.snapshot("t")
    store.upsert(
        "t",
        spark.createDataFrame([(1, 99.0)], "id long, v double"),
        keys="id",
    )

    # plant a stale parked dir (simulates a crash after the park
    # rename of an interrupted restore)
    stale = store._file("__restore_old_t")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "junk"), "w") as f:
        f.write("stale")

    store.restore("t", tag)
    got = {r["id"]: r["v"] for r in store.get_object("t").collect()}
    assert got == {1: 10.0, 2: 20.0}
    # successful restore leaves neither the parked dir nor the
    # staging dir behind
    assert not os.path.exists(store._file("__restore_old_t"))
    assert not os.path.exists(store._file("__restore_tmp_t"))
