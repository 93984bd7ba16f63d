"""User-activity analytics (ops/activity.py): new-vs-returning,
churn, stickiness, segment overlap — plus the round-6 additions that
share their fixtures (events.period_over_period, drift.minmax_scale,
insights.theil_sen)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bubbles_spark.ops import activity, drift, insights
from bubbles_spark.ops.events import period_over_period


def _acts(spark, rows):
    return spark.createDataFrame(
        rows, "uid long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_new_vs_returning_first_ever_semantics(spark):
    df = _acts(
        spark,
        [
            (1, "2024-01-01 09:00:00"),
            (1, "2024-01-01 17:00:00"),  # same day, still one active
            (1, "2024-01-02 09:00:00"),
            (2, "2024-01-02 09:00:00"),
            (2, "2024-01-03 09:00:00"),
        ],
    )
    rows = {
        str(r["bucket_date"]): r
        for r in activity.new_vs_returning(df, "uid", "ts").collect()
    }
    assert rows["2024-01-01"]["new_users"] == 1
    assert rows["2024-01-01"]["returning_users"] == 0
    assert rows["2024-01-02"]["new_users"] == 1  # user 2 first seen
    assert rows["2024-01-02"]["returning_users"] == 1  # user 1 back
    assert rows["2024-01-03"]["new_users"] == 0
    assert rows["2024-01-03"]["returning_users"] == 1
    for r in rows.values():
        assert r["active_users"] == r["new_users"] + r["returning_users"]


def test_new_vs_returning_bad_bucket(spark):
    df = _acts(spark, [(1, "2024-01-01 09:00:00")])
    with pytest.raises(ValueError, match="bucket"):
        activity.new_vs_returning(df, "uid", "ts", bucket="hour")


def test_churn_report_weekly(spark):
    # weeks of 2024-01: Mon 01-01, 01-08, 01-15
    df = _acts(
        spark,
        [
            (1, "2024-01-02 09:00:00"),  # w1
            (1, "2024-01-09 09:00:00"),  # w2 → retained from w1
            (2, "2024-01-03 09:00:00"),  # w1 only → churned after w1
            (3, "2024-01-10 09:00:00"),  # w2 only
        ],
    )
    rows = {
        str(r["bucket_date"]): r
        for r in activity.churn_report(df, "uid", "ts", bucket="week").collect()
    }
    w1, w2 = rows["2024-01-01"], rows["2024-01-08"]
    assert w1["active_users"] == 2
    assert w1["retained_next"] == 1 and w1["churned_next"] == 1
    # final bucket: no next period exists yet — all counted churned
    assert w2["active_users"] == 2
    assert w2["retained_next"] == 0 and w2["churned_next"] == 2


def test_stickiness_active_days_denominator(spark):
    # month with 2 active days: day1 DAU=2, day2 DAU=1; 2 distinct actives
    df = _acts(
        spark,
        [
            (1, "2024-03-01 01:00:00"),
            (2, "2024-03-01 02:00:00"),
            (1, "2024-03-02 03:00:00"),
            (1, "2024-03-02 04:00:00"),  # dup within day collapses
        ],
    )
    r = activity.stickiness(df, "uid", "ts", bucket="month").collect()[0]
    assert str(r["bucket_date"]) == "2024-03-01"
    assert r["bucket_actives"] == 2
    assert r["dau_sum"] == 3 and r["active_days"] == 2
    assert r["avg_dau"] == 3.0 / 2.0
    # one division on the exact integer product, not avg_dau/actives
    assert r["stickiness"] == 3.0 / float(2 * 2)


def test_segment_overlap_exact_and_zero_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "a"), (2, "a"), (3, "a"),
            (2, "b"), (3, "b"),
            (9, "c"),  # disjoint from both
        ],
        "id long, seg string",
    )
    rows = {
        (r["seg_a"], r["seg_b"]): r
        for r in activity.segment_overlap(df, "id", "seg").collect()
    }
    ab = rows[("a", "b")]
    assert ab["size_a"] == 3 and ab["size_b"] == 2
    assert ab["intersection"] == 2
    assert ab["jaccard"] == 2.0 / 3.0
    assert ab["containment"] == 1.0  # b ⊂ a
    # zero-overlap pairs still present on the spine
    assert rows[("a", "c")]["intersection"] == 0
    assert rows[("a", "c")]["jaccard"] == 0.0
    assert len(rows) == 3  # unordered pairs of {a,b,c}


def test_period_over_period_wow(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01", 10.0),
            ("2024-01-02", 20.0),   # w1 total 30
            ("2024-01-08", 45.0),   # w2 total 45
            ("2024-01-22", 5.0),    # w4 (w3 missing → NULL prev)
        ],
        "d string, v double",
    ).withColumn("d", F.col("d").cast("date"))
    rows = {
        str(r["bucket_date"]): r
        for r in period_over_period(df, "d", "v", bucket="week").collect()
    }
    assert rows["2024-01-01"]["prev_value"] is None
    w2 = rows["2024-01-08"]
    assert float(w2["value"]) == 45.0 and float(w2["prev_value"]) == 30.0
    assert float(w2["delta"]) == 15.0
    assert w2["pct_change"] == 15.0 / 30.0
    assert rows["2024-01-22"]["prev_value"] is None  # gap ≠ zero


def test_period_over_period_validation(spark):
    df = spark.createDataFrame([("2024-01-01", 1.0)], "d string, v double")
    with pytest.raises(ValueError, match="bucket"):
        period_over_period(df, "d", "v", bucket="hour")
    with pytest.raises(ValueError, match="lag"):
        period_over_period(df, "d", "v", lag=0)


def test_minmax_scale_global_and_grouped(spark):
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 5.0), ("a", 10.0), ("b", 7.0), ("b", 7.0),
         ("a", None)],
        "g string, v double",
    )
    glob = {
        (r["g"], r["v"]): r["scaled"]
        for r in drift.minmax_scale(df, "v", out_col="scaled").collect()
    }
    assert glob[("a", 0.0)] == 0.0 and glob[("a", 10.0)] == 1.0
    assert glob[("b", 7.0)] == 0.7
    assert glob[("a", None)] is None
    by = {
        (r["g"], r["v"]): r["scaled"]
        for r in drift.minmax_scale(df, "v", by="g", out_col="scaled").collect()
    }
    assert by[("a", 5.0)] == 0.5
    # degenerate group (one distinct value) → NULL, not 0/0
    assert by[("b", 7.0)] is None


def test_theil_sen_robust_to_outlier(spark):
    # y = 2x + 1 with one wild outlier; OLS would bend, Theil–Sen holds
    pts = [(1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 9.0), (5.0, 100.0)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "grp string, x double, y double"
    )
    r = insights.theil_sen(df, "grp", "x", "y").collect()[0]
    assert r["n_points"] == 5 and r["n_pairs"] == 10
    assert r["slope"] == 2.0  # lower median of pairwise slopes
    assert r["intercept"] == 1.0  # lower median of y − 2x
    # group with a single distinct x → NULL slope, still emitted
    one = spark.createDataFrame(
        [("h", 1.0, 2.0), ("h", 1.0, 4.0)], "grp string, x double, y double"
    )
    r1 = insights.theil_sen(one, "grp", "x", "y").collect()[0]
    assert r1["n_pairs"] == 0 and r1["slope"] is None


def test_growth_accounting_identities(spark):
    """active = new + retained + resurrected, and
    delta-active = new + resurrected - churned, on a hand-built
    timeline with a resurrection and a churn."""
    from bubbles_spark.ops import activity

    rows = [
        # u1 active w1, w2, w4 (resurrects in w4); u2 active w1 only
        # (churns into w2); u3 joins w2, retained w3
        (1, "2024-01-01"), (1, "2024-01-08"), (1, "2024-01-22"),
        (2, "2024-01-02"),
        (3, "2024-01-09"), (3, "2024-01-15"),
    ]
    df = spark.createDataFrame(rows, "user_id long, d string").selectExpr(
        "user_id", "CAST(d AS TIMESTAMP_NTZ) AS ts"
    )
    out = {str(r["bucket_date"]): r for r in activity.growth_accounting(
        df, "user_id", "ts", "week"
    ).collect()}
    w1, w2, w3, w4 = "2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22"
    assert out[w1]["active_users"] == 2 and out[w1]["new_users"] == 2
    assert out[w2]["new_users"] == 1          # u3
    assert out[w2]["retained"] == 1           # u1
    assert out[w2]["churned"] == 1            # u2 didn't return
    assert out[w3]["retained"] == 1           # u3
    assert out[w4]["resurrected"] == 1        # u1 back after a gap
    # identities hold on every bucket
    prev_active = 0
    for k in sorted(out):
        r = out[k]
        assert r["active_users"] == (
            r["new_users"] + r["retained"] + r["resurrected"]
        )
        assert r["active_users"] - prev_active == (
            r["new_users"] + r["resurrected"] - r["churned"]
        )
        prev_active = r["active_users"]
    # no phantom bucket past the last OBSERVED one: w4's actives are
    # not "churned" into a w5 with no data yet (round-7 advisory)
    assert max(out) == w4
