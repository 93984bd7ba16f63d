

def test_decompose_additive_identity_and_flat(spark):
    """On a flat series: trend == value, seasonal == 0, residual == 0;
    and always value == trend + (seasonal + residual) + quantization.
    """
    from pyspark.sql import functions as F

    from bubbles_spark.ops import events

    rows = [(i, f"2024-01-01 {i:02d}:00:00", 10.0) for i in range(24)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = events.decompose_additive(
        df, "ts", "value", trend_halfwidth_seconds=7200
    ).collect()
    assert len(out) == 24
    for r in out:
        assert r["trend"] == 10.0
        assert r["seasonal"] == 0.0
        assert r["residual"] == 0.0


def test_decompose_additive_seasonal_pattern(spark):
    """Two days of a pure hour-of-day pattern with a constant level:
    with a +/-12h trend window the trend is flat at the level except
    edges, and seasonal captures the hourly offsets."""
    from pyspark.sql import functions as F

    from bubbles_spark.ops import events

    # level 100, hourly offset +5 at even hours, -5 at odd hours
    rows = []
    for d in range(1, 3):
        for h in range(24):
            rows.append(
                (d * 100 + h, f"2024-01-0{d} {h:02d}:00:00",
                 100.0 + (5.0 if h % 2 == 0 else -5.0))
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["event_id"]: r for r in events.decompose_additive(
        df, "ts", "value", trend_halfwidth_seconds=43200
    ).collect()}
    # interior rows (full +/-12h window = 25 points, 13 even + 12 odd
    # or vice versa): trend stays within the offset band around 100
    mid = out[112]  # day 1 hour 12
    assert abs(mid["trend"] - 100.0) < 1.0
    # every row decomposes exactly: value = trend + det,
    # det = seasonal + residual (residual defined on full-precision det)
    for r in out.values():
        det = r["value"] - r["trend"]
        assert r["residual"] == det - r["seasonal"]


def test_twap_step_interpolation_exact(spark):
    from pyspark.sql import functions as F

    from bubbles_spark.ops import events

    # 10.0 held 1000ms, 20.0 held 3000ms, 99.0 has no holding interval
    rows = [
        (1, "2024-01-01 00:00:00.000", 10.0),
        (1, "2024-01-01 00:00:01.000", 20.0),
        (1, "2024-01-01 00:00:04.000", 99.0),
        (2, "2024-01-01 00:00:00.000", 5.0),  # single sample: drops
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {r["user_id"]: r for r in events.twap(
        df, "ts", "value", key_col="user_id"
    ).collect()}
    assert set(got) == {1}
    r = got[1]
    assert r["n_intervals"] == 2 and r["total_ms"] == 4000
    assert r["twap"] == (10.0 * 1000 + 20.0 * 3000) / 4000.0


def test_conversion_latency_first_pair_only(spark):
    from pyspark.sql import functions as F

    from bubbles_spark.ops import events

    rows = [
        # user 1: purchase BEFORE first view never counts; the one
        # after does, and only the FIRST one
        (1, "2024-01-01 00:00:00", "purchase"),
        (1, "2024-01-02 00:00:00", "view"),
        (1, "2024-01-02 00:00:30", "purchase"),
        (1, "2024-01-03 00:00:00", "purchase"),
        # user 2: view only -> drops
        (2, "2024-01-01 00:00:00", "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = events.conversion_latency(df, "ts", "user_id", "view", "purchase").collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["latency_ms"] == 30_000
    assert r["from_ts"].day == 2 and r["to_ts"].second == 30


def test_coalesce_intervals_merges_overlaps_and_touching(spark):
    from bubbles_spark.ops import events

    rows = [
        (1, 0, 10), (1, 5, 12), (1, 12, 20),   # overlap + touching -> one
        (1, 25, 30),                            # gap -> separate
        (2, 0, 1),
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = sorted(
        (r["k"], r["s"], r["e"], r["n_merged"])
        for r in events.coalesce_intervals(df, "s", "e", key_col="k").collect()
    )
    assert got == [(1, 0, 20, 3), (1, 25, 30, 1), (2, 0, 1, 1)]


def test_coalesce_intervals_contained_interval(spark):
    from bubbles_spark.ops import events

    # an interval fully inside an earlier one must not split the island
    rows = [(1, 0, 100), (1, 10, 20), (1, 50, 120)]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = events.coalesce_intervals(df, "s", "e", key_col="k").collect()
    assert [(r["s"], r["e"], r["n_merged"]) for r in got] == [(0, 120, 3)]


def test_gap_report_threshold_and_edges(spark):
    from pyspark.sql import functions as F

    from bubbles_spark.ops import events

    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 02:00:00"),   # 2h gap -> reported at thr 1h
        (1, "2024-01-01 02:30:00"),   # 30m -> not reported
        (2, "2024-01-01 00:00:00"),   # single event: no gap
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = events.gap_report(df, "ts", "user_id", 3600.0).collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["gap_ms"] == 7_200_000
    assert r["gap_start"].hour == 0 and r["gap_end"].hour == 2


def test_acf_by_lag_alternating_series(spark):
    """A perfectly alternating hourly series has acf(1) = -1 and
    acf(2) = +1; pairs align on bucket index across gaps."""
    import datetime as dt

    from bubbles_spark.ops import events as bevents

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(hours=h), 10.0 if h % 2 == 0 else 20.0)
        for h in range(24)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in bevents.acf_by_lag(
            df, "ts", "value", lags=[1, 2], interval_seconds=3600
        ).collect()
    }
    assert got[1][0] == 23 and abs(got[1][1] + 1.0) < 1e-12
    assert got[2][0] == 22 and abs(got[2][1] - 1.0) < 1e-12
    # constant series -> NULL acf (zero variance)
    const = spark.createDataFrame(
        [(base + dt.timedelta(hours=h), 5.0) for h in range(6)],
        "ts timestamp, value double",
    )
    out = {r["lag"]: r["acf"] for r in bevents.acf_by_lag(
        const, "ts", "value", lags=[1]
    ).collect()}
    assert out[1] is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lags"):
        bevents.acf_by_lag(df, "ts", "value", lags=[0])


def test_xcf_by_lag_shifted_copy(spark):
    """Series y is x shifted forward one hour: xcf peaks (=1) at
    lag 1, and is computed over index-aligned pairs only."""
    import datetime as dt

    from bubbles_spark.ops import events as bevents

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 30.0, 20.0, 40.0, 15.0, 35.0, 25.0, 45.0]
    rows = [(base + dt.timedelta(hours=h), "x", v)
            for h, v in enumerate(vals)]
    rows += [(base + dt.timedelta(hours=h + 1), "y", v)
             for h, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "ts timestamp, lab string, value double")
    got = {r["lag"]: (r["n_pairs"], r["xcf"]) for r in bevents.xcf_by_lag(
        df, "ts", "value", "lab", "x", "y", lags=[0, 1]
    ).collect()}
    assert got[1][0] == 8 and abs(got[1][1] - 1.0) < 1e-12
    assert got[0][0] == 7 and got[0][1] < 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lags"):
        bevents.xcf_by_lag(df, "ts", "value", "lab", "x", "y", lags=[-1])


def test_decomposition_strength_extremes(spark):
    """A pure daily-seasonal series (no trend, no noise) scores
    seasonal_strength ~1; pure noise around a constant scores ~0 on
    both; strengths are clamped to [0, 1]."""
    import datetime as dt

    from bubbles_spark.ops import events as bevents

    base = dt.datetime(2024, 1, 1)
    # 4 days of a clean hour-of-day pattern
    seasonal = [
        (base + dt.timedelta(hours=h), 100.0 + 50.0 * (h % 24 < 12))
        for h in range(96)
    ]
    df = spark.createDataFrame(seasonal, "ts timestamp, value double")
    row = bevents.decomposition_strength(
        df, "ts", "value", trend_halfwidth_seconds=43200
    ).collect()[0]
    assert row["n_rows"] == 96
    assert row["seasonal_strength"] > 0.95
    for v in (row["trend_strength"], row["seasonal_strength"]):
        if v is not None:
            assert 0.0 <= v <= 1.0


def test_frequent_sequences_trigrams(spark):
    from datetime import datetime

    import pytest

    from bubbles_spark.ops import events

    rows = [
        # user 1: a b c a b c  → abc ×2, bca ×1, cab ×1
        *[(1, datetime(2024, 1, 1, 0, i), t, i)
          for i, t in enumerate("abcabc")],
        # user 2: a b c → abc ×1
        *[(2, datetime(2024, 1, 1, 1, i), t, 10 + i)
          for i, t in enumerate("abc")],
        # NULL state rows are dropped before gram construction
        (1, datetime(2024, 1, 1, 2, 0), None, 99),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, event_id long"
    )
    out = {
        (r["step_1"], r["step_2"], r["step_3"]): (r["n_occurrences"], r["n_keys"])
        for r in events.frequent_sequences(
            df, "ts", "user_id", "event_type", k=3,
            tiebreak_col="event_id", min_count=1,
        ).collect()
    }
    assert out[("a", "b", "c")] == (3, 2)
    assert out[("b", "c", "a")] == (1, 1)
    assert out[("c", "a", "b")] == (1, 1)
    assert len(out) == 3

    # min_count filters rare grams
    filtered = events.frequent_sequences(
        df, "ts", "user_id", "event_type", k=3,
        tiebreak_col="event_id", min_count=2,
    ).collect()
    assert len(filtered) == 1

    with pytest.raises(ValueError):
        events.frequent_sequences(df, "ts", "user_id", "event_type", k=1)


def test_cusum_alarms_matches_recurrence(spark):
    import pytest
    from pyspark.sql import functions as F

    from bubbles_spark.ops import events

    # two keys with different shift patterns, plus a NULL value row
    # that must be dropped before any prefix touches it
    series_a = [5, 5, 6, 4, 5, 9, 9, 9, 2, 1, 5, 5]
    series_b = [5, 5, 5, 1, 1, 1, 1, 8, 8]
    rows = [("a", i, float(v)) for i, v in enumerate(series_a)]
    rows += [("b", i, float(v)) for i, v in enumerate(series_b)]
    rows += [("a", 100, None)]
    df = spark.createDataFrame(rows, "k string, ts int, value double")
    out = events.cusum_alarms(
        df, "k", "ts", "value", target=5.0, allowance=0.5, threshold=3.0
    )

    def reference(series):
        sp = sn = 0.0
        exp = []
        for v in series:
            sp = max(0.0, sp + v - 5.5)
            sn = max(0.0, sn + 4.5 - v)
            exp.append((sp, sn, sp > 3.0, sn > 3.0))
        return exp

    for key, series in (("a", series_a), ("b", series_b)):
        got = [
            (r["cusum_pos"], r["cusum_neg"], r["alarm_pos"], r["alarm_neg"])
            for r in out.filter(F.col("k") == key).orderBy("ts").collect()
        ]
        exp = reference(series)
        assert len(got) == len(series)  # NULL row dropped
        for g, e in zip(got, exp):
            assert g[0] == pytest.approx(e[0], abs=1e-12)
            assert g[1] == pytest.approx(e[1], abs=1e-12)
            assert (g[2], g[3]) == (e[2], e[3])

    # the reflection identity resets after recovery: key a ends calm
    last_a = out.filter(F.col("k") == "a").orderBy("ts").collect()[-1]
    assert not last_a["alarm_pos"]
    # key b's level shift down then up trips both sides at some point
    b_rows = out.filter(F.col("k") == "b").collect()
    assert any(r["alarm_neg"] for r in b_rows)


def test_cusum_alarms_preserves_scale8(spark):
    # regression (r12): the prefix-sum subtraction used to land at
    # decimal(38,8)-(38,8) -> Spark silently rounded to scale 7; the
    # staged (37,8) cast keeps the 8th decimal exact.  Values exercise
    # the full 8-decimal scale so a scale-7 rounding would shift the
    # result by up to 5e-8 (caught by the 1e-12 tolerance).
    import pytest

    from bubbles_spark.ops import events

    series = [0.10000001, 0.09999999, 0.10000003, 0.09999997]
    rows = [("k", i, v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "k string, ts int, value double")
    # threshold must be representable at scale 8 (operator params
    # quantize to decimal(28,8)) and OFF any reachable state (states
    # here are 0 or 2e-8) so float-reference alarm decisions agree
    # with the engine's exact-decimal ones
    out = (
        events.cusum_alarms(
            df, "k", "ts", "value",
            target=0.1, allowance=0.00000001, threshold=0.00000001,
        )
        .orderBy("ts")
        .collect()
    )
    hi = 0.1 + 0.00000001
    lo = 0.1 - 0.00000001
    sp = sn = 0.0
    for r, v in zip(out, series):
        sp = max(0.0, sp + v - hi)
        sn = max(0.0, sn + lo - v)
        assert r["cusum_pos"] == pytest.approx(sp, abs=1e-12)
        assert r["cusum_neg"] == pytest.approx(sn, abs=1e-12)
        assert r["alarm_pos"] == (sp > 0.00000001)
        assert r["alarm_neg"] == (sn > 0.00000001)
    # and at least one state actually reached the 8th decimal
    assert any(r["cusum_pos"] > 0 or r["cusum_neg"] > 0 for r in out)


def test_pettitt_matches_bruteforce(spark):
    from collections import Counter
    from datetime import datetime, timedelta

    from bubbles_spark.ops import events

    # level shift at bucket 10, with tied values and an outlier the
    # rank statistic must shrug off
    vals = [5.0] * 6 + [5.0, 6.0, 5.0, 900.0] + [9.0] * 10
    rows = [
        (datetime(2024, 1, 1) + timedelta(hours=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz, value double")
    out = events.pettitt_test(df, "ts", "value", "1 hour").collect()[0]

    # brute-force sgn-pair U_t over interior boundaries
    n = len(vals)
    best = None
    for t in range(1, n):
        u = sum(
            (vals[i] > vals[j]) - (vals[i] < vals[j])
            for i in range(t)
            for j in range(t, n)
        )
        if best is None or abs(u) > best[0]:
            best = (abs(u), t, u)
    assert out["n_buckets"] == n
    assert out["k_stat"] == best[0]
    assert out["u_at_split"] == best[2]
    # split_ts = last bucket of the left segment = index t-1
    assert out["split_ts"] == datetime(2024, 1, 1) + timedelta(
        hours=best[1] - 1
    )


def test_runs_test_matches_hand(spark):
    import math
    from datetime import datetime, timedelta

    from bubbles_spark.ops import events

    vals = [5.0, 7.0, 5.0, 7.0, 7.0, 3.0, 9.0, 2.0, 8.0, 8.0, 1.0,
            6.0, 6.0, 4.0, 9.0, 2.0]
    rows = [
        (datetime(2024, 1, 1) + timedelta(hours=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz, value double")
    out = events.runs_test(df, "ts", "value", "1 hour").collect()[0]
    sv = sorted(vals)
    med = sv[(len(sv) + 1) // 2 - 1]
    seq = [v > med for v in vals if v != med]  # median values dropped
    n1, n2 = sum(seq), len(seq) - sum(seq)
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    n = n1 + n2
    mean = 2 * n1 * n2 / n + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    assert out["n_buckets"] == len(seq)
    assert out["n_above"] == n1 and out["n_below"] == n2
    assert out["n_runs"] == runs
    assert abs(out["z"] - (runs - mean) / math.sqrt(var)) < 1e-12

    # constant series: everything equals the median -> degenerate
    const = spark.createDataFrame(
        [(datetime(2024, 1, 1) + timedelta(hours=i), 5.0) for i in range(6)],
        "ts timestamp_ntz, value double",
    )
    r0 = events.runs_test(const, "ts", "value", "1 hour").collect()[0]
    assert r0["z"] is None


def test_durbin_watson_matches_hand(spark):
    from datetime import datetime, timedelta

    from bubbles_spark.ops import events

    vals = [5.0, 7.0, 5.0, 7.0, 7.0, 3.0, 9.0, 2.0, 8.0, 8.0, 1.0, 6.0]
    rows = [
        (datetime(2024, 1, 1) + timedelta(hours=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp_ntz, value double")
    out = events.durbin_watson(df, "ts", "value", "1 hour").collect()[0]
    gm = sum(vals) / len(vals)
    e = [v - gm for v in vals]
    dw = sum(
        (a - b) ** 2 for a, b in zip(e[1:], e[:-1])
    ) / sum(x * x for x in e)
    assert out["n_buckets"] == len(vals)
    assert abs(out["dw_stat"] - dw) < 1e-5

    # perfectly alternating series -> strong negative autocorr, DW -> 4
    alt = spark.createDataFrame(
        [(datetime(2024, 1, 1) + timedelta(hours=i),
          1.0 if i % 2 else -1.0) for i in range(20)],
        "ts timestamp_ntz, value double",
    )
    d2 = events.durbin_watson(alt, "ts", "value", "1 hour").collect()[0]
    assert d2["dw_stat"] > 3.5
    # constant series -> zero variance -> NULL
    const = spark.createDataFrame(
        [(datetime(2024, 1, 1) + timedelta(hours=i), 5.0) for i in range(6)],
        "ts timestamp_ntz, value double",
    )
    assert events.durbin_watson(const, "ts", "value").collect()[0][
        "dw_stat"
    ] is None
