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


def test_kaplan_meier_matches_hand(spark):
    # same classic toy as km_risk_table: the integer fixed-point curve
    # (1e-15 units, floor each step) is exactly predictable by hand
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 0), (3, 1), (3, 1), (4, 0)],
        "dur int, ev int",
    )
    out = {r["t"]: r for r in insights.kaplan_meier(df, "dur", "ev").collect()}
    assert out[1]["survival_q"] == 10**15 * 4 // 6
    assert out[2]["survival_q"] == out[1]["survival_q"]  # censor-only step
    assert out[3]["survival_q"] == out[1]["survival_q"] * 1 // 3
    assert out[4]["survival_q"] == out[3]["survival_q"]
    assert out[1]["survival"] == out[1]["survival_q"] / 1e15
    # greenwood at t=1: term = 2/(6*4), quantized 1e-12
    gq1 = int(2.0 / (6.0 * 4.0) * 1e12)
    assert out[1]["gw_q"] == gq1
    sv1 = out[1]["survival"]
    assert out[1]["greenwood_var"] == (sv1 * sv1) * (gq1 / 1e12)
    assert out[2]["gw_q"] == gq1  # d=0 adds 0


def test_kaplan_meier_matches_km_risk_table(spark):
    # the quantized curve tracks the float product-limit to ~1e-12,
    # and the integer risk-table columns are identical
    rows = [(int(i % 7) + 1, int(i % 3 != 0)) for i in range(200)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    km = {r["t"]: r for r in insights.kaplan_meier(df, "dur", "ev").collect()}
    rt = {r["t"]: r for r in insights.km_risk_table(df, "dur", "ev").collect()}
    assert set(km) == set(rt)
    for t in km:
        for c in ("n_risk", "n_event", "n_censored"):
            assert km[t][c] == rt[t][c], (t, c)
        assert km[t]["survival"] == pytest.approx(
            rt[t]["survival"], abs=1e-11
        )


def test_kaplan_meier_no_censoring_telescopes(spark):
    # no censoring: the product telescopes, S(t) = (N - cum deaths)/N
    # exactly — and with N=10 every fixed-point division is exact
    rows = [(1, 1)] * 2 + [(2, 1)] * 3 + [(3, 1)] * 5
    df = spark.createDataFrame(rows, "dur int, ev int")
    out = {r["t"]: r for r in insights.kaplan_meier(df, "dur", "ev").collect()}
    assert out[1]["survival"] == 0.8
    assert out[2]["survival"] == 0.5
    assert out[3]["survival"] == 0.0
    # greenwood undefined once the whole risk set dies (n = d)
    assert out[3]["greenwood_var"] is None
    assert out[3]["greenwood_se"] is None
    assert out[2]["greenwood_var"] is not None


def test_kaplan_meier_log_rank_consistency(spark):
    # identical arms: log-rank z ~ 0 AND the by-arm KM curves are
    # bit-identical at every step
    arm = [(1, 1), (2, 1), (3, 0), (4, 1), (6, 1), (7, 0)]
    rows = [("a", t, e) for t, e in arm] + [("b", t, e) for t, e in arm]
    same = spark.createDataFrame(rows, "g string, t int, e int")
    z0 = insights.log_rank_test(same, "t", "e", "g").collect()[0]
    assert z0["z"] == pytest.approx(0.0, abs=1e-9)
    curves = insights.kaplan_meier(same, "t", "e", by=["g"]).collect()
    a = {r["t"]: r["survival_q"] for r in curves if r["g"] == "a"}
    b = {r["t"]: r["survival_q"] for r in curves if r["g"] == "b"}
    assert a == b

    # arm a dies early, arm b late: a's curve sits below b's wherever
    # both are defined, and log-rank agrees (o_a > e_a => z > 0)
    early = [("a", t, 1) for t in (1, 1, 2, 2, 3)]
    late = [("b", t, 1) for t in (7, 8, 8, 9, 10)]
    dom = spark.createDataFrame(early + late, "g string, t int, e int")
    lr = insights.log_rank_test(dom, "t", "e", "g").collect()[0]
    assert lr["group_a"] == "a" and lr["z"] > 2.0
    kc = insights.kaplan_meier(dom, "t", "e", by=["g"]).collect()
    sa = sorted((r["t"], r["survival"]) for r in kc if r["g"] == "a")
    sb = sorted((r["t"], r["survival"]) for r in kc if r["g"] == "b")

    def step_at(curve, t):
        s = 1.0
        for ct, cs in curve:
            if ct <= t:
                s = cs
        return s

    for t in range(1, 11):
        assert step_at(sa, t) <= step_at(sb, t) + 1e-15


def test_kaplan_meier_max_steps_guard(spark):
    df = spark.createDataFrame(
        [(t, 1) for t in range(1, 6)], "dur int, ev int"
    )
    with pytest.raises(Exception, match="max_steps"):
        insights.kaplan_meier(df, "dur", "ev", max_steps=2).collect()
    with pytest.raises(ValueError):
        insights.kaplan_meier(df, "dur", "ev", scale=25)


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


def test_grid_distance_join_matches_bruteforce(spark):
    from bubbles_spark.ops import spatial

    pts = [(i, (i * 37) % 50, (i * 91) % 50) for i in range(120)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        (r["id_a"], r["id_b"], r["dist_sq"])
        for r in spatial.grid_distance_join(df, "id", "x", "y", 7.0).collect()
    }
    want = set()
    for i, xi, yi in pts:
        for j, xj, yj in pts:
            if i < j and (xi - xj) ** 2 + (yi - yj) ** 2 <= 49:
                want.add((i, j, (xi - xj) ** 2 + (yi - yj) ** 2))
    assert got == want


def test_grid_distance_join_negative_coords(spark):
    from bubbles_spark.ops import spatial

    df = spark.createDataFrame(
        [(1, -3, -3), (2, -1, -1), (3, 10, 10)], "id long, x long, y long"
    )
    got = {(r["id_a"], r["id_b"]) for r in
           spatial.grid_distance_join(df, "id", "x", "y", 3.0).collect()}
    assert got == {(1, 2)}


def test_join_cardinality_audit_products(spark):
    from bubbles_spark.ops import audit

    left = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), (None,)], "k string"
    )
    right = spark.createDataFrame([("a",), ("b",), ("b",), (None,)], "k string")
    rows = {r["k"]: r for r in
            audit.join_cardinality_audit(left, right, ["k"], k=10).collect()}
    assert int(rows["a"]["n_out"]) == 3 and int(rows["b"]["n_out"]) == 2
    assert None not in rows  # NULL keys never join


def test_ab_test_z_and_degenerate(spark):
    from bubbles_spark.ops import drift

    rows = [("control", 1)] * 30 + [("control", 0)] * 70
    rows += [("t1", 1)] * 50 + [("t1", 0)] * 50
    rows += [("t2", 1)] * 100  # everyone converts -> se=0 vs control? no:
    # pooled(control,t2) is 130/200, se>0; make t3 the degenerate pair
    df = spark.createDataFrame(rows, "variant string, s int")
    out = {r["variant"]: r for r in
           drift.ab_test_report(df, "variant", "s", "control").collect()}
    r = out["t1"]
    assert r["n_control"] == 100 and r["conv_variant"] == 50
    import math
    p = (30 + 50) / 200.0
    se = math.sqrt(p * (1 - p) * (1 / 100.0 + 1 / 100.0))
    assert r["z_score"] == pytest.approx((0.5 - 0.3) / se, rel=1e-15)

    both_one = spark.createDataFrame(
        [("control", 1)] * 5 + [("x", 1)] * 5, "variant string, s int"
    )
    z = drift.ab_test_report(both_one, "variant", "s", "control").collect()[0]
    assert z["z_score"] is None  # zero pooled variance -> NULL, not error


def test_cumulative_distinct_first_seen(spark):
    from bubbles_spark.ops import events as ev
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", 1),
            ("2024-01-01 11:00:00", 2),
            ("2024-01-02 10:00:00", 1),  # returning only -> new=0
            ("2024-01-03 10:00:00", 3),
        ],
        "ts string, uid long",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {str(r["day"]): r for r in
           ev.cumulative_distinct(df, "ts", "uid").collect()}
    assert out["2024-01-01"]["new_entities"] == 2
    assert out["2024-01-02"]["new_entities"] == 0
    assert out["2024-01-02"]["cum_entities"] == 2
    assert out["2024-01-03"]["cum_entities"] == 3


def test_ewma_matches_explicit_loop(spark):
    from bubbles_spark.ops import events as ev

    xs = [3.17, 9.42, 0.55, 7.01, 2.2, 8.88]
    rows = [("k", i, float(x)) for i, x in enumerate(xs)]
    rows += [("j", 0, 5.0), ("j", 1, None)]  # NULL dropped, not poisoned
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = ev.ewma(df, "k", "t", "v", alpha=0.3, tiebreak_col="t")
    got = {(r["k"], r["t"]): r["ewma"] for r in out.collect()}
    lvl = xs[0]
    expect = [lvl]
    for x in xs[1:]:
        lvl = (1 - 0.3) * lvl + 0.3 * x
        expect.append(lvl)
    for i, e in enumerate(expect):
        assert got[("k", i)] == e  # bitwise
    assert got[("j", 0)] == 5.0 and ("j", 1) not in got


def test_ewma_alpha_validation(spark):
    from bubbles_spark.ops import events as ev

    df = spark.createDataFrame([("k", 0, 1.0)], "k string, t long, v double")
    with pytest.raises(ValueError):
        ev.ewma(df, "k", "t", "v", alpha=0.0)


def test_expectations_report_counts(spark):
    from bubbles_spark.ops import audit

    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -2.0), (2, None, 50.0), (3, "zz", 7.0)],
        "id long, s string, v double",
    )
    out = {r["rule"]: r for r in audit.expectations_report(
        df,
        [
            {"name": "u", "kind": "unique", "cols": ["id"]},
            {"name": "nn", "kind": "not_null", "col": "s"},
            {"name": "set", "kind": "in_set", "col": "s", "values": ["a", "b"]},
            {"name": "rng", "kind": "in_range", "col": "v", "lo": 0, "hi": 10},
            {"name": "fmt", "kind": "matches", "col": "s", "pattern": "^[ab]$"},
        ],
    ).collect()}
    assert out["u"]["n_checked"] == 4 and out["u"]["n_violations"] == 2
    assert out["nn"]["n_violations"] == 1 and not out["nn"]["passed"]
    # NULL not checked by per-value rules
    assert out["set"]["n_checked"] == 3 and out["set"]["n_violations"] == 1
    assert out["rng"]["n_violations"] == 2  # -2 and 50
    assert out["fmt"]["n_violations"] == 1  # "zz"


def test_expectations_unknown_kind(spark):
    from bubbles_spark.ops import audit

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        audit.expectations_report(df, [{"kind": "nope", "col": "id"}])


def test_holt_forecast_matches_loop(spark):
    from bubbles_spark.ops import events as ev

    xs = [10.0, 12.5, 11.1, 14.0, 15.75]
    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)], "k string, t long, v double"
    )
    row = ev.holt_forecast(
        df, "k", "t", "v", alpha=0.4, beta=0.2, horizon=3
    ).collect()[0]
    lvl, trd = xs[0], 0.0
    for x in xs[1:]:
        prev = lvl
        lvl = 0.4 * x + (1.0 - 0.4) * (lvl + trd)
        trd = 0.2 * (lvl - prev) + (1.0 - 0.2) * trd
    assert row["n_obs"] == 5
    assert row["level"] == lvl and row["trend"] == trd  # bitwise
    assert row["forecast"] == lvl + 3 * trd


def test_linear_trend_exact_line_and_degenerate(spark):
    from bubbles_spark.ops import insights as ins

    rows = [("a", x, 2.0 * x + 1.0) for x in range(10)]  # perfect line
    rows += [("b", 5, 3.0), ("b", 5, 9.0)]  # zero x-variance
    df = spark.createDataFrame(rows, "k string, x int, y double")
    out = {r["k"]: r for r in ins.linear_trend(df, "k", "x", "y").collect()}
    a = out["a"]
    assert a["slope"] == pytest.approx(2.0, rel=1e-14)
    assert a["intercept"] == pytest.approx(1.0, rel=1e-12)
    assert a["r2"] == pytest.approx(1.0, rel=1e-14)
    b = out["b"]
    assert b["slope"] is None and b["intercept"] is None and b["r2"] is None


def test_qq_table_exact_type1(spark):
    from bubbles_spark.ops import drift

    a = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    b = spark.createDataFrame([(float(2 * i),) for i in range(1, 101)], "v double")
    out = {r["p"]: r for r in drift.qq_table(a, b, "v", [0.5, 0.99]).collect()}
    assert out[0.5]["q_a"] == 50.0 and out[0.5]["q_b"] == 100.0
    assert out[0.5]["diff"] == -50.0
    assert out[0.99]["q_a"] == 99.0  # ceil(0.99*100)=99 -> type-1, no interp


def test_bounded_running_sum_saturates(spark):
    from bubbles_spark.ops import events as ev

    rows = [("k", 0, 60), ("k", 1, 60), ("k", 2, -30), ("k", 3, -200),
            ("k", 4, 10)]
    df = spark.createDataFrame(rows, "k string, t long, d long")
    out = {r["t"]: r["balance"] for r in ev.bounded_running_sum(
        df, "k", "t", "d", lo=0, hi=100, tiebreak_col="t"
    ).collect()}
    # 60 -> cap(120)=100 -> 70 -> floor(-130)=0 -> 10
    assert [out[i] for i in range(5)] == [60, 100, 70, 0, 10]
    # saturation is NON-associative: a plain cumsum would give 60,120,
    # 90,-110,-100 — clamping at the end would NOT equal this


def test_freshness_report_lag(spark):
    from bubbles_spark.ops import audit
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("a", "2024-01-02 06:30:00"),
         ("b", "2024-01-31 23:59:59")],
        "src string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["src"]: r for r in audit.freshness_report(
        df, "ts", ["src"], "2024-02-01 00:00:00"
    ).collect()}
    assert out["a"]["n_rows"] == 2
    assert out["a"]["lag_us"] == (29 * 86400 + 17 * 3600 + 1800) * 1_000_000
    assert out["b"]["lag_us"] == 1_000_000


def test_keep_latest_one_row_per_key(spark):
    from bubbles_spark.ops import core

    df = spark.createDataFrame(
        [(1, 2, "a"), (1, 5, "b"), (1, 5, "c"), (2, 1, "d")],
        "k long, v long, tag string",
    )
    out = {r["k"]: r for r in core.keep_latest(
        df, "k", [("v", "desc"), ("tag", "desc")]
    ).collect()}
    assert len(out) == 2
    assert out[1]["tag"] == "c"  # (5,'c') beats (5,'b') on the tiebreak
    assert out[2]["tag"] == "d"


def test_rolling_corr_perfect_and_degenerate(spark):
    from bubbles_spark.ops import events as ev
    from pyspark.sql import functions as F

    # y = 2x within the window -> corr 1; first row frame is single -> NULL
    rows = [("k", f"2024-01-01 00:0{i}:00", float(i + 1), 2.0 * (i + 1))
            for i in range(5)]
    df = spark.createDataFrame(
        rows, "k string, ts string, x double, y double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = ev.rolling_corr(df, "ts", "k", "x", "y", 3600.0).collect()
    vals = [r["rolling_corr"] for r in sorted(out, key=lambda r: r["ts"])]
    assert vals[0] is None  # single-point frame: zero variance
    assert all(v == pytest.approx(1.0, abs=1e-12) for v in vals[1:])


def test_histogram2d_clamps_and_shares(spark):
    from bubbles_spark.ops import reshape

    rows = [(5.0, 5.0)] * 3 + [(95.0, 5.0)] + [(-10.0, 200.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = {(r["x_bin"], r["y_bin"]): r for r in reshape.histogram2d(
        df, "x", "y", (0, 10), (0, 10), x_bins=5, y_bins=5
    ).collect()}
    assert out[(2, 2)]["n"] == 3          # 5.0 -> bin 2 of 5 on [0,10)
    assert out[(4, 2)]["n"] == 1          # 95 clamps to top x bin
    assert out[(0, 4)]["n"] == 1          # -10/200 clamp to edges
    assert sum(r["n"] for r in out.values()) == 5
    assert out[(2, 2)]["share"] == 0.6


def test_abc_classification_prefix_semantics(spark):
    from bubbles_spark.ops import insights as ins

    # values 50, 30, 15, 5 (total 100): A covers 50+30 (prior shares
    # 0.0, 0.5 < 0.8), rank 3 prior=0.8 -> B, rank 4 prior=0.95 -> C
    df = spark.createDataFrame(
        [(1, 50.0), (2, 30.0), (3, 15.0), (4, 5.0)], "id long, v double"
    )
    out = {r["id"]: r for r in ins.abc_classification(df, "id", "v").collect()}
    assert out[1]["abc_class"] == "A" and out[2]["abc_class"] == "A"
    assert out[3]["abc_class"] == "B" and out[4]["abc_class"] == "C"
    assert out[4]["cum_share"] == 1.0
    assert [out[i]["rank"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]


def test_abc_tie_break_deterministic(spark):
    from bubbles_spark.ops import insights as ins

    df = spark.createDataFrame(
        [(i, 10.0) for i in range(1, 11)], "id long, v double"
    )
    out = {r["id"]: r for r in ins.abc_classification(df, "id", "v").collect()}
    # equal values: id ascending breaks ties -> ranks 1..10 by id
    assert [out[i]["rank"] for i in range(1, 11)] == list(range(1, 11))
    # prior shares 0.0,0.1,...,0.9 -> A while prior<0.8 (ids 1-8),
    # then B for priors 0.8 and 0.9 (both < 0.95)
    assert [out[i]["abc_class"] for i in range(1, 11)] == ["A"] * 8 + ["B"] * 2


def test_weighted_median_crosses_half_weight(spark):
    from bubbles_spark.ops import insights as ins

    # values 1..4 with weights 1,1,1,10: half of 13 = 6.5 -> value 4
    rows = [("k", 1.0, 1.0), ("k", 2.0, 1.0), ("k", 3.0, 1.0),
            ("k", 4.0, 10.0), ("j", 5.0, 2.0), ("j", 9.0, 1.0)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    out = {r["k"]: r for r in ins.weighted_median(df, "k", "v", "w").collect()}
    assert out["k"]["weighted_median"] == 4.0
    assert float(out["k"]["total_weight"]) == 13.0
    # j: weights 2,1 -> cum 2 >= 1.5 at value 5
    assert out["j"]["weighted_median"] == 5.0


def test_group_mode_tiebreak(spark):
    from bubbles_spark.ops import core

    rows = [("u", "a"), ("u", "a"), ("u", "b"), ("u", "b"), ("u", "c"),
            ("v", None), ("v", "z")]
    df = spark.createDataFrame(rows, "k string, val string")
    out = {r["k"]: r for r in core.group_mode(df, "k", "val").collect()}
    assert out["u"]["val"] == "a" and out["u"]["n_occurrences"] == 2
    assert out["v"]["val"] == "z"  # NULLs never win


def test_calendar_features_iso_weekday(spark):
    from bubbles_spark.ops import events as ev
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-01 13:45:00"),   # Monday
         (2, "2024-01-06 00:00:00"),   # Saturday
         (3, "2024-01-07 23:59:59")],  # Sunday
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["id"]: r for r in ev.calendar_features(df, "ts").collect()}
    assert out[1]["weekday"] == 0 and not out[1]["is_weekend"]
    assert out[2]["weekday"] == 5 and out[2]["is_weekend"]
    assert out[3]["weekday"] == 6 and out[3]["is_weekend"]
    assert out[1]["hour"] == 13 and out[1]["month"] == 1


def test_mix_shift_identity_and_semantics(spark):
    """Sum of (mix+rate) effects equals the KPI delta; a pure mix
    move (rates unchanged, weights shifted) shows zero rate effect."""
    from bubbles_spark.ops import insights

    rows = []
    # prev: A 10 rows at rate 1.0, B 10 rows at rate 3.0 -> R=2.0
    rows += [("A", "prev", 1.0)] * 10 + [("B", "prev", 3.0)] * 10
    # cur: A 5 rows at 1.0, B 15 rows at 3.0 -> R=2.5 (pure mix)
    rows += [("A", "cur", 1.0)] * 5 + [("B", "cur", 3.0)] * 15
    df = spark.createDataFrame(rows, "k string, p string, v double")
    got = {r["key"]: r for r in insights.mix_shift_report(
        df, "k", "v", 1, "p", "prev", "cur"
    ).collect()}
    assert all(abs(r["rate_effect"]) < 1e-12 for r in got.values())
    delta = sum(r["total_effect"] for r in got.values())
    assert abs(delta - 0.5) < 1e-9          # R: 2.0 -> 2.5
    # shifting weight AWAY from the below-average segment (A) and
    # TOWARD the above-average one (B) both raise the KPI
    assert got["A"]["mix_effect"] > 0 and got["B"]["mix_effect"] > 0
    assert abs(got["A"]["mix_effect"] - 0.25) < 1e-9
    assert abs(got["B"]["mix_effect"] - 0.25) < 1e-9
    # a segment new in cur keeps the identity
    rows2 = rows + [("C", "cur", 10.0)] * 4
    df2 = spark.createDataFrame(rows2, "k string, p string, v double")
    out2 = insights.mix_shift_report(
        df2, "k", "v", 1, "p", "prev", "cur"
    ).collect()
    r_prev_all = 2.0
    r_cur_all = (5 * 1.0 + 15 * 3.0 + 4 * 10.0) / 24.0
    delta2 = sum(r["total_effect"] for r in out2)
    assert abs(delta2 - (r_cur_all - r_prev_all)) < 1e-9
    c = {r["key"]: r for r in out2}["C"]
    assert c["w_prev"] == 0.0 and c["den_prev"] is None


def test_gini_by_known_values(spark):
    """Equal values -> 0; one-holder extreme -> (n-1)/n; ties are
    rank-order invariant."""
    from bubbles_spark.ops import insights

    rows = [("eq", 5.0)] * 4
    rows += [("ex", 0.0), ("ex", 0.0), ("ex", 0.0), ("ex", 12.0)]
    rows += [("mix", 1.0), ("mix", 2.0), ("mix", 3.0), ("mix", 2.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in insights.gini_by(df, "g", "v").collect()}
    assert got["eq"]["gini"] == 0.0
    assert abs(got["ex"]["gini"] - 0.75) < 1e-12      # (n-1)/n, n=4
    # mix: sorted 1,2,2,3 -> W = 1+4+6+12 = 23; G = 46/(4*8) - 5/4
    assert abs(got["mix"]["gini"] - (46.0 / 32.0 - 1.25)) < 1e-12
    assert got["mix"]["n_rows"] == 4


def test_pareto_front_dominance_and_ties(spark):
    from bubbles_spark.ops.insights import pareto_front

    rows = [
        ("g", 1, 10), ("g", 2, 9), ("g", 3, 9), ("g", 3, 5), ("g", 2, 9),
        ("g", 1, 11), ("h", 5, 5), ("h", 5, 5), ("h", 4, 6), ("h", 6, 1),
        ("g", None, 99), ("g", 99, None), (None, 9, 9),
    ]
    df = spark.createDataFrame(rows, "grp string, x int, y int")

    # max/max: brute-force skyline per group
    out = sorted((r.grp, r.x, r.y)
                 for r in pareto_front(df, "x", "y", "grp").collect())
    assert out == [("g", 1, 11), ("g", 3, 9),
                   ("h", 4, 6), ("h", 5, 5), ("h", 5, 5), ("h", 6, 1)]

    # min/min flips every comparison; exact ties both survive
    out2 = sorted((r.grp, r.x, r.y)
                  for r in pareto_front(
                      df, "x", "y", "grp", directions=("min", "min")
                  ).collect())
    assert out2 == [("g", 1, 10), ("g", 2, 9), ("g", 2, 9), ("g", 3, 5),
                    ("h", 4, 6), ("h", 5, 5), ("h", 5, 5), ("h", 6, 1)]

    # global mode (no group) and direction validation
    out3 = sorted((r.x, r.y) for r in
                  pareto_front(df.filter("grp = 'h'"), "x", "y").collect())
    assert out3 == [(4, 6), (5, 5), (5, 5), (6, 1)]
    with pytest.raises(ValueError):
        pareto_front(df, "x", "y", directions=("max", "up"))


def test_concentration_report_hand_computed(spark):
    from bubbles_spark.ops.insights import concentration_report

    # group g: entities with totals 50, 30, 20 → shares .5 .3 .2
    rows = [("g", 1, 20.0), ("g", 1, 30.0), ("g", 2, 30.0), ("g", 3, 20.0),
            ("h", 9, 10.0)]
    df = spark.createDataFrame(rows, "grp string, ent long, v double")
    out = {r["grp"]: r for r in concentration_report(
        df, "grp", "ent", "v", top_k=2).collect()}
    g = out["g"]
    assert g["n_entities"] == 3 and g["total"] == 100.0
    assert g["hhi"] == 0.5**2 + 0.3**2 + 0.2**2
    assert g["cr_k"] == 0.8  # top-2 = 50 + 30
    h = out["h"]  # single entity: hhi = 1, cr = 1
    assert h["hhi"] == 1.0 and h["cr_k"] == 1.0
    with pytest.raises(ValueError):
        concentration_report(df, "grp", "ent", "v", top_k=0)
    # cents must clear value_decimal's scale or the integer-cents
    # exactness claim silently breaks: decimal(18,4) with cents=100
    # would round away residual fractional units
    with pytest.raises(ValueError):
        concentration_report(
            df, "grp", "ent", "v", value_decimal="decimal(18,4)", cents=100
        )
    # a clearing multiple works, including a non-power-of-ten scale
    ok = concentration_report(
        df, "grp", "ent", "v", value_decimal="decimal(18,4)", cents=10_000
    ).collect()
    assert {r["grp"] for r in ok} == {"g", "h"}
    with pytest.raises(ValueError):
        concentration_report(df, "grp", "ent", "v", cents=150)


def test_nelson_aalen_hand_computed(spark):
    import math

    from bubbles_spark.ops.insights import nelson_aalen

    # durations: t=1 (2 events, 1 censored), t=3 (1 event), n=4 total
    rows = [(1, 1), (1, 1), (1, 0), (3, 1)]
    df = spark.createDataFrame(rows, "t int, ev int")
    out = {r["t"]: r for r in nelson_aalen(df, "t", "ev").collect()}
    assert out[1]["n_risk"] == 4 and out[1]["n_event"] == 2
    assert out[3]["n_risk"] == 1 and out[3]["n_event"] == 1
    up = 1e12
    h1 = math.floor(2.0 / 4.0 * up)
    h3 = math.floor(1.0 / 1.0 * up)
    v1 = math.floor(2.0 / 16.0 * up)
    assert out[1]["hazard_q"] == h1 and out[3]["hazard_q"] == h3
    assert out[1]["cum_hazard"] == h1 / up
    assert out[3]["cum_hazard"] == (h1 + h3) / up
    assert out[1]["cum_hazard_var"] == v1 / up

    # grouped: each arm gets its own curve and totals
    g = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 0), ("b", 1, 1)], "arm string, t int, ev int"
    )
    got = {(r["arm"], r["t"]): r for r in
           nelson_aalen(g, "t", "ev", by=["arm"]).collect()}
    assert got[("a", 1)]["n_risk"] == 2 and got[("b", 1)]["n_risk"] == 1
    assert got[("a", 1)]["cum_hazard"] == math.floor(0.5 * up) / up


def test_weighted_quantile_generalizes_median(spark):
    from bubbles_spark.ops.insights import weighted_median, weighted_quantile

    rows = [("g", 10.0, 1.0), ("g", 20.0, 1.0), ("g", 30.0, 2.0),
            ("g", 40.0, 4.0), ("h", 5.0, 3.0)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    # q = 1/2 must equal weighted_median exactly
    wm = {r["k"]: r["weighted_median"]
          for r in weighted_median(df, "k", "v", "w").collect()}
    wq = {r["k"]: r["weighted_quantile"]
          for r in weighted_quantile(df, "k", "v", "w", 1, 2).collect()}
    assert wq == wm
    # hand: total w(g)=8; q=3/4 -> first v with cum*4 >= 3*8=24:
    # cum(10)=1,cum(20)=2,cum(30)=4,cum(40)=8 -> 8*4=32>=24 at v=40
    q75 = {r["k"]: r for r in
           weighted_quantile(df, "k", "v", "w", 3, 4).collect()}
    assert q75["g"]["weighted_quantile"] == 40.0
    assert float(q75["g"]["total_weight"]) == 8.0 and q75["g"]["q"] == 0.75
    # q = 1 -> max value; q=1/8 -> first value
    assert {r["k"]: r["weighted_quantile"] for r in
            weighted_quantile(df, "k", "v", "w", 1, 1).collect()}["g"] == 40.0
    assert {r["k"]: r["weighted_quantile"] for r in
            weighted_quantile(df, "k", "v", "w", 1, 8).collect()}["g"] == 10.0

    import pytest as _pt
    with _pt.raises(ValueError):
        weighted_quantile(df, "k", "v", "w", 0, 4)
    with _pt.raises(ValueError):
        weighted_quantile(df, "k", "v", "w", 5, 4)
    with _pt.raises(TypeError):
        weighted_quantile(df, "k", "v", "w", 0.5, 1)


def test_capture_recapture_hand_computed(spark):
    from bubbles_spark.ops.insights import capture_recapture

    a = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 2]], "id long")
    b = spark.createDataFrame([(i,) for i in [3, 4, 5, 6]], "id long")
    r = capture_recapture(a, b, "id").collect()[0]
    # distinct a = {1,2,3,4}, b = {3,4,5,6}, overlap = {3,4}
    assert r["n_a"] == 4 and r["n_b"] == 4 and r["n_overlap"] == 2
    assert r["chapman"] == (5.0 * 5.0) / 3.0 - 1.0
    assert r["lincoln_petersen"] == (4.0 * 4.0) / 2.0

    # disjoint samples: Chapman stays finite, LP is NULL
    c = spark.createDataFrame([(10,), (11,)], "id long")
    rd = capture_recapture(a, c, "id").collect()[0]
    assert rd["n_overlap"] == 0
    assert rd["chapman"] == (5.0 * 3.0) / 1.0 - 1.0
    assert rd["lincoln_petersen"] is None


def test_diversity_report_hand_computed(spark):
    import math

    from bubbles_spark.ops.insights import diversity_report

    rows = (
        [("s1", "en")] * 3 + [("s1", "fr")] * 1
        + [("s2", "en")] * 2
        + [("s3", "en"), ("s3", "fr"), ("s3", "de")]
    )
    df = spark.createDataFrame(rows, "src string, lang string")
    got = {r["src"]: r for r in diversity_report(df, "lang", by="src").collect()}
    # s1: counts {en:3, fr:1}, n=4 -> simpson = (6+0)/12 = 0.5
    s1 = got["s1"]
    assert s1["n_rows"] == 4 and s1["k_categories"] == 2
    assert s1["simpson"] == (3.0 * 2.0) / (4.0 * 3.0)
    assert s1["gini_simpson"] == 1.0 - s1["simpson"]
    assert s1["berger_parker"] == 3.0 / 4.0
    assert s1["shannon"] == pytest.approx(
        -(0.75 * math.log(0.75) + 0.25 * math.log(0.25)), rel=1e-12
    )
    # s2: monoculture -> simpson 1, dominance 1, entropy 0
    s2 = got["s2"]
    assert s2["simpson"] == 1.0 and s2["berger_parker"] == 1.0
    assert s2["shannon"] == pytest.approx(0.0, abs=1e-15)
    # s3: all singletons -> simpson 0 (no repeated draw possible)
    s3 = got["s3"]
    assert s3["simpson"] == 0.0 and s3["k_categories"] == 3

    # ungrouped + n=1 degenerate
    solo = spark.createDataFrame([("s", "en")], "src string, lang string")
    r1 = diversity_report(solo, "lang").collect()[0]
    assert r1["n_rows"] == 1 and r1["simpson"] is None
    assert r1["gini_simpson"] is None and r1["berger_parker"] == 1.0


def test_log_rank_matches_hand(spark):
    import math

    import pytest

    from bubbles_spark.ops import insights

    a = [(6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1),
         (10, 0), (11, 0), (13, 1)]
    b = [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (8, 1), (8, 1),
         (11, 1), (12, 1), (15, 1)]
    rows = [("a", t, e) for t, e in a] + [("b", t, e) for t, e in b]
    df = spark.createDataFrame(rows, "g string, t int, e int")
    out = insights.log_rank_test(df, "t", "e", "g").collect()[0]
    subj = rows
    times = sorted({t for _, t, e in subj if e == 1})
    obs = exp = var = 0.0
    for t in times:
        na = sum(1 for g, d, _ in subj if g == "a" and d >= t)
        nb = sum(1 for g, d, _ in subj if g == "b" and d >= t)
        da = sum(1 for g, d, e in subj if g == "a" and d == t and e == 1)
        db = sum(1 for g, d, e in subj if g == "b" and d == t and e == 1)
        nt, dt = na + nb, da + db
        obs += da
        exp += dt * na / nt
        if nt > 1:
            var += dt * (na / nt) * (1 - na / nt) * (nt - dt) / (nt - 1)
    z = (obs - exp) / math.sqrt(var)
    assert out["group_a"] == "a" and out["n_total"] == 20
    assert out["o_a"] == int(obs)
    assert out["e_a"] == pytest.approx(exp, abs=1e-5)
    assert out["v_a"] == pytest.approx(var, abs=1e-5)
    assert out["z"] == pytest.approx(z, abs=1e-5)
    assert out["chi2"] == pytest.approx(z * z, abs=1e-4)

    # not-2-groups contract is loud
    three = spark.createDataFrame(
        [("a", 1, 1), ("b", 2, 1), ("c", 3, 1)], "g string, t int, e int"
    )
    with pytest.raises(ValueError):
        insights.log_rank_test(three, "t", "e", "g")

    # identical arms -> z ~ 0 (and never NULL when deaths exist)
    same = spark.createDataFrame(
        [("a", t, 1) for t in (1, 2, 3)] + [("b", t, 1) for t in (1, 2, 3)],
        "g string, t int, e int",
    )
    r = insights.log_rank_test(same, "t", "e", "g").collect()[0]
    assert r["z"] == pytest.approx(0.0, abs=1e-9)
