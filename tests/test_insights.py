"""Customer/population analytics (ops/insights.py): RFM, Lorenz,
Kaplan-Meier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bubbles_spark.ops import insights


def test_rfm_scores_and_cell(spark):
    # 4 customers, clean ordering on all three dims
    df = spark.createDataFrame(
        [
            # id, ts, amount  (cust 1 most recent/frequent/valuable)
            (1, "2024-01-10 00:00:00", 100.0),
            (1, "2024-01-20 00:00:00", 100.0),
            (1, "2024-01-28 00:00:00", 100.0),
            (2, "2024-01-25 00:00:00", 50.0),
            (2, "2024-01-26 00:00:00", 50.0),
            (3, "2024-01-05 00:00:00", 30.0),
            (4, "2024-01-01 00:00:00", 1.0),
        ],
        "id long, ts string, amount double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = insights.rfm_segments(
        df, "id", "ts", "amount", ref_date="2024-02-01", n_bins=4
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["recency_days"] == 4
    assert rows[1]["frequency"] == 3
    assert float(rows[1]["monetary"]) == 300.0
    # with 4 bins over 4 customers each rank gets its own bin
    assert rows[1]["f_score"] == 4 and rows[1]["m_score"] == 4
    assert rows[4]["f_score"] == 1 and rows[4]["m_score"] == 1
    # recency best-first: cust 2 (6d) > cust 1 (4d)? no — smaller days
    # = better: cust 2 last bought 01-26 (6d), cust 1 01-28 (4d)
    assert rows[1]["r_score"] == 4 and rows[2]["r_score"] == 3
    r, f, m = rows[3]["r_score"], rows[3]["f_score"], rows[3]["m_score"]
    assert rows[3]["rfm_cell"] == r * 100 + f * 10 + m


def test_rfm_null_amounts_count_toward_frequency(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00", None), (1, "2024-01-11 00:00:00", 5.0)],
        "id long, ts string, amount double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    row = insights.rfm_segments(
        df, "id", "ts", "amount", ref_date="2024-02-01", n_bins=2
    ).collect()[0]
    assert row["frequency"] == 2 and float(row["monetary"]) == 5.0


def test_lorenz_shares_monotone_and_complete(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, v double"
    )
    out = insights.lorenz_curve(df, "v", "id", n_buckets=5).collect()
    assert [r["bucket"] for r in out] == [1, 2, 3, 4, 5]
    assert all(r["n_rows"] == 20 for r in out)
    # poorest-first: curve below the diagonal, both shares end at 1.0
    shares = [r["cum_value_share"] for r in out]
    pops = [r["cum_pop_share"] for r in out]
    assert shares == sorted(shares) and shares[-1] == 1.0
    assert pops[-1] == 1.0
    assert all(s <= p + 1e-12 for s, p in zip(shares, pops))
    # bottom 20% of a 1..100 uniform holds (1+..+20)/5050 of the value
    assert abs(shares[0] - (210 / 5050)) < 1e-12


def test_km_matches_hand_computation(spark):
    # classic toy: durations [1,1,2,3,3,4], events [1,1,0,1,1,0]
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 0), (3, 1), (3, 1), (4, 0)],
        "dur int, ev int",
    )
    out = {r["t"]: r for r in insights.km_risk_table(df, "dur", "ev").collect()}
    assert out[1]["n_risk"] == 6 and out[1]["n_event"] == 2
    assert out[2]["n_risk"] == 4 and out[2]["n_censored"] == 1
    assert out[3]["n_risk"] == 3 and out[3]["n_event"] == 2
    assert out[4]["n_risk"] == 1 and out[4]["n_censored"] == 1
    # product-limit: S(1)=4/6, S(2)=4/6, S(3)=4/6 * 1/3, S(4) same
    s1 = 1.0 - 2.0 / 6.0
    s3 = s1 * (1.0 - 2.0 / 3.0)
    assert out[1]["survival"] == pytest.approx(s1, abs=0)
    assert out[2]["survival"] == pytest.approx(s1, abs=0)
    assert out[3]["survival"] == pytest.approx(s3, rel=1e-15)
    assert out[4]["survival"] == pytest.approx(s3, rel=1e-15)


def test_km_grouped_curves_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("b", 1, 0), ("b", 5, 1)],
        "arm string, dur int, ev int",
    )
    out = insights.km_risk_table(df, "dur", "ev", by=["arm"]).collect()
    a = {r["t"]: r for r in out if r["arm"] == "a"}
    b = {r["t"]: r for r in out if r["arm"] == "b"}
    assert a[1]["n_risk"] == 2 and a[2]["n_risk"] == 1
    assert b[1]["n_risk"] == 2 and b[1]["n_event"] == 0
    assert b[5]["n_risk"] == 1 and b[5]["n_event"] == 1
    assert b[5]["survival"] == pytest.approx(0.0, abs=0)
