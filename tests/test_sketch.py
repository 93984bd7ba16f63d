"""Sketch / bound-check operator unit tests."""

from pyspark.sql import functions as F

from bubbles_spark.ops import sketch


def _nums(spark, n=2000):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 100).alias("mod100"),
        (F.col("id").cast("double") * 1.5).alias("x"),
    )


def test_approx_distinct_stats_shape_and_bounds(spark):
    df = _nums(spark)
    stats = {r["field"]: r for r in sketch.approx_distinct_stats(df, ["id", "mod100"]).collect()}
    assert stats["id"]["exact_distinct"] == 2000
    assert stats["mod100"]["exact_distinct"] == 100
    assert stats["id"]["rel_err"] < 0.2
    assert sketch.approx_distinct_violations(df, ["id", "mod100"]).count() == 0


def test_approx_quantile_ranks_exactness(spark):
    df = _nums(spark)
    out = {r["prob"]: r for r in sketch.approx_quantile_ranks(df, "x", [0.5], accuracy=10000).collect()}
    r = out[0.5]
    assert r["n_rows"] == 2000
    # accuracy >> n ⇒ the sketch is exact: rank within 1 of p*n
    assert abs(r["true_rank"] - 1000) <= 1
    assert sketch.approx_quantile_violations(df, "x", [0.1, 0.5, 0.9], accuracy=100).count() == 0


def test_heavy_hitters(spark):
    rows = [("a",)] * 60 + [("b",)] * 35 + [("c",)] * 5
    df = spark.createDataFrame(rows, "v string")
    got = {r["value"]: (r["record_count"], r["share"]) for r in sketch.heavy_hitters(df, "v", 0.10).collect()}
    assert got == {"a": (60, 0.6), "b": (35, 0.35)}  # c below 10% share


def test_quantile_bins_shape(spark):
    df = _nums(spark, 1000)
    out = sketch.quantile_bins(df, "x", 4, accuracy=100000)
    counts = {r["qbin"]: r["cnt"] for r in out.groupBy("qbin").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    for c in counts.values():
        assert abs(c - 250) <= 2
    assert sketch.quantile_bin_violations(df, "x", 4, accuracy=1000).count() == 0


def test_quantile_bins_rejects_k1(spark):
    df = _nums(spark, 10)
    import pytest
    with pytest.raises(ValueError):
        sketch.quantile_bins(df, "x", 1)
