"""Interval / event-stream analytics: sweep-line concurrency, state
dwell, greedy debounce (ops/events.py) and cohort LTV curves
(ops/activity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bubbles_spark.ops import activity
from bubbles_spark.ops import events as ev


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in df.dtypes:
        if t == "string" and c in ("s", "e", "ts"):
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def test_concurrency_report_global(spark):
    df = _ts(
        spark,
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 00:10:00"),
            (2, "2024-01-01 00:05:00", "2024-01-01 00:15:00"),
            (3, "2024-01-01 00:05:00", "2024-01-01 00:08:00"),
        ],
        "id long, s string, e string",
    )
    rows = ev.concurrency_report(df, "s", "e").collect()
    curve = [(str(r["ts"]), r["delta"], r["concurrent"]) for r in rows]
    assert curve == [
        ("2024-01-01 00:00:00", 1, 1),
        ("2024-01-01 00:05:00", 2, 3),
        ("2024-01-01 00:08:00", -1, 2),
        ("2024-01-01 00:10:00", -1, 1),
        ("2024-01-01 00:15:00", -1, 0),
    ]


def test_concurrency_half_open_and_degenerate(spark):
    # [0,5) then [5,10): end frees the slot exactly at the start of
    # the next — concurrency never reaches 2; zero-length and
    # inverted intervals vanish
    df = _ts(
        spark,
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 00:05:00"),
            (2, "2024-01-01 00:05:00", "2024-01-01 00:10:00"),
            (3, "2024-01-01 00:07:00", "2024-01-01 00:07:00"),  # zero-len
            (4, "2024-01-01 00:09:00", "2024-01-01 00:01:00"),  # inverted
        ],
        "id long, s string, e string",
    )
    rows = ev.concurrency_report(df, "s", "e").collect()
    assert max(r["concurrent"] for r in rows) == 1
    assert all(str(r["ts"])[14:16] != "07" for r in rows)


def test_concurrency_report_by_key(spark):
    df = _ts(
        spark,
        [
            ("a", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
            ("a", "2024-01-01 00:30:00", "2024-01-01 02:00:00"),
            ("b", "2024-01-01 00:30:00", "2024-01-01 00:45:00"),
        ],
        "k string, s string, e string",
    )
    rows = ev.concurrency_report(df, "s", "e", by="k").collect()
    peaks = {}
    for r in rows:
        peaks[r["k"]] = max(peaks.get(r["k"], 0), r["concurrent"])
    assert peaks == {"a": 2, "b": 1}


def test_state_dwell_report(spark):
    df = _ts(
        spark,
        [
            (1, "2024-01-01 00:00:00", "a", 1),
            (1, "2024-01-01 00:00:10", "b", 2),
            (1, "2024-01-01 00:00:25", "a", 3),  # open-ended: excluded
            (2, "2024-01-01 00:00:00", "a", 4),
            (2, "2024-01-01 00:00:05", "a", 5),  # open-ended: excluded
        ],
        "u long, ts string, st string, eid long",
    )
    rows = {
        r["state"]: r
        for r in ev.state_dwell_report(df, "u", "ts", "st", "eid").collect()
    }
    assert rows["a"]["visits"] == 2  # u1@0 (10s) + u2@0 (5s)
    assert rows["a"]["total_dwell_ms"] == 15000
    assert rows["a"]["avg_dwell_ms"] == 7500.0
    assert rows["b"]["visits"] == 1 and rows["b"]["total_dwell_ms"] == 15000


def test_state_dwell_tiebreak_deterministic(spark):
    # two same-instant events: the (ts, tiebreak) order pins which
    # state absorbs the following dwell
    df = _ts(
        spark,
        [
            (1, "2024-01-01 00:00:00", "x", 1),
            (1, "2024-01-01 00:00:00", "y", 2),
            (1, "2024-01-01 00:00:10", "z", 3),
        ],
        "u long, ts string, st string, eid long",
    )
    rows = {
        r["state"]: r
        for r in ev.state_dwell_report(df, "u", "ts", "st", "eid").collect()
    }
    assert rows["x"]["total_dwell_ms"] == 0  # x → y at the same instant
    assert rows["y"]["total_dwell_ms"] == 10000


def test_debounce_greedy_vs_sessionize(spark):
    # 0/3/6/9 with 5s guard: debounce keeps {0, 6} — NOT sessionize's
    # first-of-session {0}
    df = _ts(
        spark,
        [(1, f"2024-01-01 00:00:0{t}", t) for t in (0, 3, 6, 9)],
        "u long, ts string, eid long",
    )
    kept = sorted(
        r["eid"] for r in ev.debounce(df, "u", "ts", 5.0, "eid").collect()
    )
    assert kept == [0, 6]


def test_debounce_per_key_and_tiebreak(spark):
    df = _ts(
        spark,
        [
            (1, "2024-01-01 00:00:00", 2),
            (1, "2024-01-01 00:00:00", 1),  # same instant: eid 1 first
            (2, "2024-01-01 00:00:00", 3),
        ],
        "u long, ts string, eid long",
    )
    kept = {
        (r["u"], r["eid"])
        for r in ev.debounce(df, "u", "ts", 1.0, "eid").collect()
    }
    assert kept == {(1, 1), (2, 3)}


def test_cohort_ltv_monthly(spark):
    df = _ts(
        spark,
        [
            (1, "2024-01-05 00:00:00", 10.0),
            (2, "2024-01-20 00:00:00", 20.0),
            (1, "2024-02-10 00:00:00", 30.0),
            (3, "2024-03-01 00:00:00", 5.0),
        ],
        "u long, ts string, v double",
    )
    rows = {
        (str(r["cohort_date"]), r["age"]): r
        for r in activity.cohort_ltv(df, "u", "ts", "v").collect()
    }
    jan0 = rows[("2024-01-01", 0)]
    assert jan0["cohort_users"] == 2 and jan0["active_users"] == 2
    assert float(jan0["revenue"]) == 30.0
    assert float(jan0["cum_revenue"]) == 30.0
    assert jan0["cum_ltv_per_user"] == 15.0
    jan1 = rows[("2024-01-01", 1)]
    assert jan1["active_users"] == 1 and float(jan1["cum_revenue"]) == 60.0
    assert jan1["cum_ltv_per_user"] == 30.0
    assert rows[("2024-03-01", 0)]["cohort_users"] == 1
    assert len(rows) == 3


def test_cohort_ltv_gap_free_spine(spark):
    # active at age 0 and age 2 only: age 1 still emitted, zero rev
    df = _ts(
        spark,
        [
            (1, "2024-01-05 00:00:00", 10.0),
            (1, "2024-03-05 00:00:00", 20.0),
        ],
        "u long, ts string, v double",
    )
    rows = {
        r["age"]: r for r in activity.cohort_ltv(df, "u", "ts", "v").collect()
    }
    assert sorted(rows) == [0, 1, 2]
    assert rows[1]["active_users"] == 0 and float(rows[1]["revenue"]) == 0.0
    assert float(rows[1]["cum_revenue"]) == 10.0
    assert float(rows[2]["cum_revenue"]) == 30.0


def test_fifo_match_closed_form(spark):
    # lots 10,5 vs draws 4,8,10: classic FIFO split {4,6},{2,3}
    ins = spark.createDataFrame(
        [("u", 1, 10.0), ("u", 2, 5.0)], "k string, seq long, q double"
    )
    outs = spark.createDataFrame(
        [("u", 1, 4.0), ("u", 2, 8.0), ("u", 3, 10.0)],
        "k string, seq long, q double",
    )
    rows = {
        (r["in_seq"], r["out_seq"]): float(r["qty"])
        for r in ev.fifo_match(ins, outs, "k", "seq", "q").collect()
    }
    assert rows == {(1, 1): 4.0, (1, 2): 6.0, (2, 2): 2.0, (2, 3): 3.0}
    # conservation: matched total = min(sum_in, sum_out) = 15
    assert sum(rows.values()) == 15.0


def test_fifo_match_drops_nonpositive_and_isolates_keys(spark):
    ins = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, -3.0), ("b", 1, 2.0)],
        "k string, seq long, q double",
    )
    outs = spark.createDataFrame(
        [("a", 9, 5.0), ("b", 9, 9.0)], "k string, seq long, q double"
    )
    rows = {
        (r["k"], r["in_seq"], r["out_seq"]): float(r["qty"])
        for r in ev.fifo_match(ins, outs, "k", "seq", "q").collect()
    }
    # negative lot ignored; b's draw only partially filled (2 of 9)
    assert rows == {("a", 1, 9): 5.0, ("b", 1, 9): 2.0}


def test_rolling_active_users_islands_and_curve(spark):
    df = _ts(
        spark,
        [
            (1, "2024-01-01 05:00:00"),
            (1, "2024-01-03 06:00:00"),  # gap 2 <= W=2: merged island
            (2, "2024-01-02 01:00:00"),
            (2, "2024-01-10 01:00:00"),  # gap 8 > 2: new island
        ],
        "u long, ts string",
    )
    rows = [
        (str(r["ts"]), r["delta"], r["rolling_actives"])
        for r in activity.rolling_active_users(df, "u", "ts", 2).collect()
    ]
    assert rows == [
        ("2024-01-01", 1, 1),
        ("2024-01-02", 1, 2),
        ("2024-01-04", -1, 1),
        ("2024-01-05", -1, 0),
        ("2024-01-10", 1, 1),
        ("2024-01-12", -1, 0),
    ]
    with pytest.raises(ValueError, match="window_days"):
        activity.rolling_active_users(df, "u", "ts", 0)


def test_haversine_join_known_distance(spark):
    import math

    from bubbles_spark.ops import spatial

    # JFK-LGA is ~17.1 km; LHR is ~5500 km away from both
    df = spark.createDataFrame(
        [
            ("JFK", 40.6413, -73.7781),
            ("LGA", 40.7769, -73.8740),
            ("LHR", 51.4700, -0.4543),
        ],
        "id string, lat double, lon double",
    )
    rows = spatial.haversine_join(df, "id", "lat", "lon", 30.0).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == ("JFK", "LGA")
    # pin the haversine value against the straight-line math mirror
    R = 6371.0088
    p1, p2 = math.radians(40.6413), math.radians(40.7769)
    dphi = math.radians(40.7769 - 40.6413) / 2
    dlam = math.radians(-73.8740 - -73.7781) / 2
    h = math.sin(dphi) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlam) ** 2
    want = 2 * R * math.asin(math.sqrt(h))
    assert r["dist_km"] == pytest.approx(want, rel=1e-12)
    assert 17.0 < r["dist_km"] < 17.3


def test_haversine_join_antimeridian_wrap(spark):
    from bubbles_spark.ops import spatial

    # 0.2 deg of lon apart across the ±180 seam (~22 km at equator)
    df = spark.createDataFrame(
        [("W", 0.0, 179.9), ("E", 0.0, -179.9), ("FAR", 0.0, 0.0)],
        "id string, lat double, lon double",
    )
    rows = spatial.haversine_join(df, "id", "lat", "lon", 30.0).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {("E", "W")}
    assert rows[0]["dist_km"] < 25.0


def test_haversine_join_validation(spark):
    from bubbles_spark.ops import spatial

    df = spark.createDataFrame([("a", 0.0, 0.0)], "id string, lat double, lon double")
    with pytest.raises(ValueError, match="radius"):
        spatial.haversine_join(df, "id", "lat", "lon", 0.0)
    with pytest.raises(ValueError, match="banding"):
        spatial.haversine_join(df, "id", "lat", "lon", 9000.0)
