"""Reshape / range-join / rollup / SCD2 operator unit tests (tiny
createDataFrame fixtures, SURVEY.md §5 style)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bubbles_spark.ops import core, events, reshape


def test_unpivot_round_trip_counts(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 30.0, 40.0)], "id long, a double, b double"
    )
    out = reshape.unpivot(df, "id", ["a", "b"], "var", "val").collect()
    assert len(out) == 4
    got = {(r["id"], r["var"]): r["val"] for r in out}
    assert got == {(1, "a"): 10.0, (1, "b"): 20.0, (2, "a"): 30.0, (2, "b"): 40.0}


def test_histogram_bin_edges(spark):
    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (9.99,), (10.0,), (99.9,), (100.0,), (150.0,)],
        "x double",
    )
    out = {r["x"]: r["bin"] for r in reshape.histogram(df, "x", 0.0, 100.0, 10).collect()}
    assert out[-1.0] == -1          # below range
    assert out[0.0] == 0            # inclusive lower edge
    assert out[9.99] == 0
    assert out[10.0] == 1           # bin boundary goes up
    assert out[99.9] == 9
    assert out[100.0] == 9          # closed upper bound folds into last bin
    assert out[150.0] == 10         # above range

    open_out = {
        r["x"]: r["bin"]
        for r in reshape.histogram(df, "x", 0.0, 100.0, 10, closed_upper=False).collect()
    }
    assert open_out[100.0] == 10


def test_histogram_rejects_bad_args(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        reshape.histogram(df, "x", 0.0, 100.0, 0)
    with pytest.raises(ValueError):
        reshape.histogram(df, "x", 5.0, 5.0, 3)


def test_zscore_global_and_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)], "g string, x double"
    )
    glob = {
        (r["g"], r["x"]): r["x_z"]
        for r in reshape.zscore_normalize(df, "x").collect()
    }
    # global mean 6, sd = sqrt((25+9+16+16)/3)
    assert abs(glob[("a", 1.0)] - (1.0 - 6.0) / 4.69041575982343) < 1e-9

    grp = {
        (r["g"], r["x"]): r["x_z"]
        for r in reshape.zscore_normalize(df, "x", by="g").collect()
    }
    assert abs(grp[("a", 1.0)] - (-1.0 / 2.0**0.5)) < 1e-9  # (1-2)/sqrt(2), sd=sqrt(2)
    assert grp[("b", 10.0)] is None  # zero variance → NULL, not error


def test_range_join_closed_modes(spark):
    facts = spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "v double")
    dims = spark.createDataFrame([("lo", 0.0, 5.0), ("hi", 5.0, 10.0)], "t string, lo double, hi double")
    left = {(r["v"], r["t"]) for r in core.range_join(facts, dims, "v", "lo", "hi").collect()}
    assert left == {(0.0, "lo"), (5.0, "hi")}  # [lo, hi): 10.0 unmatched
    both = {(r["v"], r["t"]) for r in core.range_join(facts, dims, "v", "lo", "hi", closed="both").collect()}
    assert (5.0, "lo") in both and (5.0, "hi") in both and (10.0, "hi") in both
    outer = core.range_join(facts, dims, "v", "lo", "hi", how="left").collect()
    assert sum(1 for r in outer if r["t"] is None) == 1  # 10.0 kept with NULLs
    with pytest.raises(ValueError):
        core.range_join(facts, dims, "v", "lo", "hi", how="full")


def test_range_join_plan_broadcasts(spark):
    facts = spark.createDataFrame([(1.0,)], "v double")
    dims = spark.createDataFrame([("a", 0.0, 2.0)], "t string, lo double, hi double")
    plan = core.range_join(facts, dims, "v", "lo", "hi")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_time_bucket_rollup_pyramid_matches_direct(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(minutes=37 * i), float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = events.time_bucket_rollup(df, "ts", ["1 hour", "1 day"], measures=[("value", "sum")])
    day = {r["window_start"]: (r["value_sum"], r["record_count"])
           for r in out.filter(F.col("grain") == "1 day").collect()}
    direct = {
        r["window_start"]: (r["value_sum"], r["record_count"])
        for r in events.tumbling_window(df, "ts", "1 day", measures=[("value", "sum")]).collect()
    }
    assert day == direct
    # fine grain record counts add up to the input size
    hour_counts = [r["record_count"] for r in out.filter(F.col("grain") == "1 hour").collect()]
    assert sum(hour_counts) == 40


def test_time_bucket_rollup_quantiles_pyramid(spark):
    """Mergeability: the day-grain quantiles rolled up from hour-bin
    counts must equal quantiles computed directly at day grain with
    the same bins (bin counts sum exactly — the sketch is lossless
    across grains).  Accuracy: each estimate is within one bin width
    of the exact quantile."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=13 * i), float((i * 37) % 500))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = events.time_bucket_rollup_quantiles(
        df, "ts", ["1 hour", "1 day"], "value", qs=(0.5, 0.9), bins=256
    )
    day = {
        r["window_start"]: (r["p50"], r["p90"], r["record_count"])
        for r in out.filter(F.col("grain") == "1 day").collect()
    }
    direct = {
        r["window_start"]: (r["p50"], r["p90"], r["record_count"])
        for r in events.time_bucket_rollup_quantiles(
            df, "ts", ["1 day"], "value", qs=(0.5, 0.9), bins=256
        ).collect()
    }
    assert day == direct
    # error bound: one bin width of the exact ceil(q·N)-th order
    # statistic (the discrete quantile the estimator is defined on)
    import math as _math

    lo, hi = 0.0, max(v for _, v in rows)
    width = (hi - lo) / 256
    per_day: dict = {}
    for ts, v in rows:
        day_start = dt.datetime(ts.year, ts.month, ts.day)
        per_day.setdefault(day_start, []).append(v)
    for ws, (p50, _, _) in day.items():
        vals = sorted(per_day[ws])
        exact50 = vals[_math.ceil(0.5 * len(vals)) - 1]
        assert abs(p50 - exact50) <= width + 1e-9
    # record counts survive the pyramid
    assert sum(r[2] for r in day.values()) == 300
    # null values are excluded, constant column degenerates safely
    df2 = spark.createDataFrame(
        [(base, 5.0), (base, 5.0), (base, None)], "ts timestamp, value double"
    )
    got = events.time_bucket_rollup_quantiles(
        df2, "ts", ["1 hour"], "value", qs=(0.5,), bins=16
    ).collect()
    assert len(got) == 1
    assert got[0]["p50"] == 5.0 and got[0]["record_count"] == 2


def test_time_bucket_rollup_rejects_avg(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 1, 1), 1.0)], "ts timestamp, value double")
    with pytest.raises(ValueError):
        events.time_bucket_rollup(df, "ts", ["1 hour", "1 day"], measures=[("value", "avg")])


def _scd_fixture(spark):
    dim = spark.createDataFrame(
        [
            # k=1: history row + current row (attr "v2")
            (1, "v1", dt.date(2019, 1, 1), dt.date(2020, 1, 1), False),
            (1, "v2", dt.date(2020, 1, 1), None, True),
            # k=2: unchanged current
            (2, "x", dt.date(2020, 1, 1), None, True),
            # k=3: will vanish from the snapshot
            (3, "y", dt.date(2020, 1, 1), None, True),
        ],
        "k long, attr string, valid_from date, valid_to date, is_current boolean",
    )
    snap = spark.createDataFrame(
        [(1, "v3"), (2, "x"), (4, "new")], "k long, attr string"
    )
    return dim, snap


def test_scd2_merge_semantics(spark):
    dim, snap = _scd_fixture(spark)
    out = core.scd2_merge(dim, snap, "k", ["attr"], dt.date(2021, 1, 1))
    rows = {(r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in out.collect()}
    assert rows == {
        (1, "v1", dt.date(2019, 1, 1), dt.date(2020, 1, 1), False),  # history untouched
        (1, "v2", dt.date(2020, 1, 1), dt.date(2021, 1, 1), False),  # changed → closed
        (1, "v3", dt.date(2021, 1, 1), None, True),                  # new version
        (2, "x", dt.date(2020, 1, 1), None, True),                   # unchanged
        (3, "y", dt.date(2020, 1, 1), dt.date(2021, 1, 1), False),   # vanished → closed
        (4, "new", dt.date(2021, 1, 1), None, True),                 # brand new
    }


def test_scd2_merge_idempotent(spark):
    """Re-merging the same snapshot is a no-op (keys already current)."""
    dim, snap = _scd_fixture(spark)
    once = core.scd2_merge(dim, snap, "k", ["attr"], dt.date(2021, 1, 1))
    twice = core.scd2_merge(once, snap, "k", ["attr"], dt.date(2022, 1, 1))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_flatten_struct_recursive(spark):
    from bubbles_spark.ops import reshape

    df = spark.createDataFrame(
        [(1, {"a": 2, "b": {"c": "x"}}, [1, 2])],
        "id long, s struct<a: long, b: struct<c: string>>, arr array<long>",
    )
    out = reshape.flatten_struct(df)
    assert out.columns == ["id", "s_a", "s_b_c", "arr"]
    [r] = out.collect()
    assert (r.id, r.s_a, r.s_b_c, list(r.arr)) == (1, 2, "x", [1, 2])


def test_flatten_struct_depth_cap(spark):
    from bubbles_spark.ops import reshape

    df = spark.createDataFrame(
        [({"x": {"y": 1}},)], "s struct<x: struct<y: long>>"
    )
    out = reshape.flatten_struct(df, max_depth=1)
    assert out.columns == ["s_x"]  # stops before y


def test_one_hot_pinned_vocab_and_other(spark):
    import pytest as _pytest

    from bubbles_spark.ops import reshape

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zz"), (4, None)],
        "id long, c string",
    )
    got = {r["id"]: r for r in reshape.one_hot(df, "c", ["a", "b"]).collect()}
    assert (got[1]["c_a"], got[1]["c_b"], got[1]["c_other"]) == (1, 0, 0)
    assert (got[2]["c_a"], got[2]["c_b"], got[2]["c_other"]) == (0, 1, 0)
    assert (got[3]["c_a"], got[3]["c_b"], got[3]["c_other"]) == (0, 0, 1)
    # NULL: every indicator 0, flagged other
    assert (got[4]["c_a"], got[4]["c_b"], got[4]["c_other"]) == (0, 0, 1)
    with _pytest.raises(ValueError, match="categories"):
        reshape.one_hot(df, "c", [])
