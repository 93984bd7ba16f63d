"""Scalar transforms (T1–T6), audit (A3/A4), probes (Q1–Q3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bubbles_spark.ops import audit, text
from bubbles_spark import probes


def test_string_strip(spark):
    df = spark.createDataFrame([(1, "  hi  ", "xxay")], "id long, a string, b string")
    out = text.string_strip(df, ["a"]).collect()[0]
    assert out["a"] == "hi"
    out = text.string_strip(df, ["b"], chars="x").collect()[0]
    assert out["b"] == "ay"


def test_text_substitute(spark):
    df = spark.createDataFrame([(1, "a1b22c")], "id long, s string")
    out = text.text_substitute(df, "s", [(r"\d+", "#"), ("#", "N")]).collect()[0]
    assert out["s"] == "aNbNc"


def test_split_date(spark):
    df = spark.createDataFrame([(1, "2024-03-15 10:30:00")], "id long, d string")
    df = df.withColumn("d", F.to_timestamp("d"))
    out = text.split_date(df, "d", ["year", "month", "day", "hour"]).collect()[0]
    assert (out["d_year"], out["d_month"], out["d_day"], out["d_hour"]) == (
        2024, 3, 15, 10,
    )


def test_empty_to_missing(spark):
    df = spark.createDataFrame([(1, ""), (2, " "), (3, "x")], "id long, s string")
    vals = {r["id"]: r["s"] for r in text.empty_to_missing(df, ["s"]).collect()}
    assert vals == {1: None, 2: " ", 3: "x"}
    strict = {r["id"]: r["s"] for r in text.empty_to_missing(df, ["s"], strict=True).collect()}
    assert strict == {1: None, 2: None, 3: "x"}


def test_threshold(spark):
    df = spark.createDataFrame(
        [(1, -5.0), (2, 3.0), (3, 100.0), (4, None)], "id long, x double"
    )
    out = {r["id"]: r["x_bin"] for r in text.threshold(df, "x", 0, 10).collect()}
    assert out == {1: "low", 2: "normal", 3: "high", 4: None}


def test_transliterate(spark):
    df = spark.createDataFrame([(1, "Çafé Ñoño")], "id long, s string")
    assert text.transliterate(df, "s").collect()[0]["s"] == "Cafe Nono"


def test_basic_audit(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, ""), (3, None), (4, "x")], "id long, s string"
    )
    rows = {r["field"]: r for r in audit.basic_audit(df, ["s"]).collect()}
    r = rows["s"]
    assert r["record_count"] == 4
    assert r["null_count"] == 1
    assert r["empty_string_count"] == 1
    assert r["distinct_count"] == 2  # 'x', '' (NULL not counted)
    assert r["null_ratio"] == 0.25


def test_basic_audit_numeric_stats(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (3.0, "b"), (None, "c")], "v double, s string"
    )
    rows = {
        r["field"]: r
        for r in audit.basic_audit(df, numeric_stats=True).collect()
    }
    v = rows["v"]
    assert (v["min_value"], v["max_value"], v["mean"]) == (1.0, 3.0, 2.0)
    assert abs(v["stddev"] - 1.4142) < 1e-9
    # non-numeric fields carry NULL stats, same schema
    s = rows["s"]
    assert s["min_value"] is None and s["mean"] is None


def test_grouped_audit(spark):
    df = spark.createDataFrame(
        [
            ("a", 1.0, "x"), ("a", 3.0, None), ("a", None, ""),
            ("b", 10.0, "y"),
        ],
        "grp string, v double, s string",
    )
    out = audit.grouped_audit(df, "grp", ["v", "s"], numeric_stats=True)
    rows = {(r["grp"], r["field"]): r for r in out.collect()}
    a_v = rows[("a", "v")]
    assert a_v["record_count"] == 3
    assert a_v["null_count"] == 1
    assert (a_v["min_value"], a_v["max_value"], a_v["mean"]) == (1.0, 3.0, 2.0)
    a_s = rows[("a", "s")]
    assert a_s["empty_string_count"] == 1 and a_s["null_count"] == 1
    b_v = rows[("b", "v")]
    assert b_v["record_count"] == 1 and b_v["mean"] == 10.0
    assert b_v["stddev"] is None  # stddev_samp of 1 row
    # the group key never audits itself
    assert ("a", "grp") not in rows


def test_infer_types(spark):
    df = spark.createDataFrame(
        [("1", "1.5", "true", "2024-01-02", "zzz")],
        "i string, f string, b string, d string, s string",
    )
    got = {r["field"]: r["inferred_type"] for r in audit.infer_types(df).collect()}
    assert got == {
        "i": "integer", "f": "number", "b": "boolean", "d": "date", "s": "string",
    }


def test_probes(people):
    with pytest.raises(probes.ProbeAssertionError):
        probes.assert_unique(people, "label")
    assert probes.assert_unique(people, "id") is people
    assert probes.assert_contains(people, "label", "a") is people
    with pytest.raises(probes.ProbeAssertionError):
        probes.assert_contains(people, "label", "zz")
    assert probes.assert_missing(people, "label", "zz") is people
    with pytest.raises(probes.ProbeAssertionError):
        probes.assert_missing(people, "label", "a")


def test_fill_missing_retype_parse_date(spark):
    from bubbles_spark.ops import text as tx

    df = spark.createDataFrame(
        [(1, None, "12", "2024-01-31"), (2, "x", "bad", "nope")],
        "id long, s string, num string, d string",
    )
    filled = {r["id"]: r["s"] for r in tx.fill_missing(df, {"s": "?"}).collect()}
    assert filled == {1: "?", 2: "x"}

    typed = {r["id"]: r["num"] for r in tx.retype(df, {"num": "int"}).collect()}
    assert typed == {1: 12, 2: None}  # lenient: bad cast -> NULL, not ANSI error

    parsed = {r["id"]: r["d"] for r in tx.parse_date(df, "d").collect()}
    import datetime as dt

    assert parsed == {1: dt.date(2024, 1, 31), 2: None}


def test_skew_report_orders_hot_keys(spark):
    from bubbles_spark.ops import audit

    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 5 + ["b"] * 3 + ["c"] * 2], "k string"
    )
    rows = audit.skew_report(df, "k", k=2).collect()
    assert [(r.k, r.key_count, r.fraction) for r in rows] == [
        ("a", 5, 0.5),
        ("b", 3, 0.3),
    ]


def test_table_fingerprint_order_insensitive(spark):
    from bubbles_spark.ops import audit

    df = spark.createDataFrame([(1, "x"), (2, None)], "id long, s string")
    a = audit.table_fingerprint(df).first()
    b = audit.table_fingerprint(df.orderBy(F.col("id").desc()).repartition(3)).first()
    assert (a.record_count, a.checksum) == (b.record_count, b.checksum)
    c = audit.table_fingerprint(
        spark.createDataFrame([(1, "x"), (2, "")], "id long, s string")
    ).first()
    assert c.checksum != a.checksum  # NULL != empty string


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from bubbles_spark.ops import audit as audit_ops

    data = [(float(i), float(i * 2 + 1), float((-1) ** i * i)) for i in range(20)]
    df = spark.createDataFrame(data, "a double, b double, c double")
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in audit_ops.correlation_matrix(df, ["a", "b", "c"]).collect()
    }
    arr = np.array(data)
    for i, x in enumerate("abc"):
        for j, y in enumerate("abc"):
            if i <= j:
                exp = np.corrcoef(arr[:, i], arr[:, j])[0, 1]
                assert abs(got[(x, y)] - exp) < 1e-6, (x, y)
    assert got[("a", "b")] == 1.0  # perfectly linear


def test_correlation_matrix_rejects_spearman(spark):
    import pytest

    from bubbles_spark.ops import audit as audit_ops

    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    with pytest.raises(ValueError):
        audit_ops.correlation_matrix(df, ["a", "b"], method="spearman")


def test_key_profile_uniqueness_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")],
        "id long, grp string",
    )
    got = {r["col"]: r.asDict() for r in audit.key_profile(df, ["id", "grp"]).collect()}
    assert got["id"] == {
        "col": "id", "n_rows": 4, "n_distinct": 4, "n_null": 0,
        "max_group": 1, "is_unique": True,
    }
    assert got["grp"] == {
        "col": "grp", "n_rows": 4, "n_distinct": 2, "n_null": 1,
        "max_group": 2, "is_unique": False,
    }


def test_referential_integrity_orphans_and_unreferenced(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = audit.referential_integrity_report(child, parent, "fk", "pk").first()
    assert row.asDict() == {
        "child_rows": 4, "parent_rows": 2, "null_fk_rows": 1,
        "orphan_rows": 1, "orphan_keys": 1, "unreferenced_parents": 1,
    }


def test_benford_report_exact(spark):
    import math

    from pyspark.sql import functions as F

    from bubbles_spark.ops import audit

    vals = [1.5, 19.0, 123.0, 2.0, 0.5, 9.0]  # 0.5 drops (< 1)
    df = spark.createDataFrame(
        [(v,) for v in vals], "v double"
    ).select(F.col("v").cast("decimal(10,2)").alias("v"))
    got = {r["digit"]: r for r in audit.benford_report(df, "v").collect()}
    assert len(got) == 9
    assert got[1]["n"] == 3 and got[2]["n"] == 1 and got[9]["n"] == 1
    assert got[3]["n"] == 0 and got[1]["share"] == 3.0 / 5.0
    assert got[1]["expected_share"] == math.log10(2.0)
    assert got[1]["deviation"] == 3.0 / 5.0 - math.log10(2.0)


def test_schema_drift_report_statuses(spark):
    from pyspark.sql import functions as F

    from bubbles_spark.ops import audit

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5)], "id long, name string, x double"
    )
    new = (
        old.drop("name")
        .withColumn("x", F.col("x").cast("string"))
        .withColumn("flag", F.lit(True))
    )
    got = {r["col_name"]: r for r in audit.schema_drift_report(old, new).collect()}
    assert got["id"]["status"] == "kept"
    assert got["name"]["status"] == "removed" and got["name"]["new_type"] is None
    assert got["x"]["status"] == "type_changed"
    assert (got["x"]["old_type"], got["x"]["new_type"]) == ("double", "string")
    assert got["x"]["old_nulls"] == 1 and got["x"]["old_null_rate"] == 0.5
    assert got["flag"]["status"] == "added" and got["flag"]["old_rows"] is None
    assert got["flag"]["new_nulls"] == 0 and got["flag"]["new_rows"] == 2


def test_top_values_tie_break_and_nulls(spark):
    from bubbles_spark.ops import audit

    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",), (None,)], "v string"
    )
    got = audit.top_values(df, "v", k=3).collect()
    ranked = [(r["rank"], r["value"], r["n"]) for r in got]
    # count desc, value asc: a(2) before b(2); null counts as a value
    assert ranked == [(1, "a", 2), (2, "b", 2), (3, "c", 1)]
    assert got[0]["share"] == 2.0 / 6.0


def test_id_gaps_islands(spark):
    from bubbles_spark.ops import audit

    df = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 7, 8, 15, 2, 3]], "id long"
    )
    got = sorted(
        (r["gap_start"], r["gap_end"], r["gap_size"])
        for r in audit.id_gaps(df, "id").collect()
    )
    assert got == [(4, 6, 3), (9, 14, 6)]
    dense = spark.createDataFrame([(i,) for i in range(5)], "id long")
    assert audit.id_gaps(dense, "id").count() == 0


def test_date_dimension_calendar(spark):
    from bubbles_spark.ops import events as bevents

    dd = bevents.date_dimension(spark, "2024-02-27", "2024-03-02")
    rows = {str(r["date"]): r for r in dd.collect()}
    assert len(rows) == 5          # leap day included
    assert "2024-02-29" in rows
    assert rows["2024-02-29"]["is_month_end"] is True
    assert rows["2024-03-01"]["is_month_start"] is True
    assert rows["2024-03-02"]["weekday"] == 5  # Saturday, 0=Monday
    assert rows["2024-03-02"]["is_weekend"] is True
