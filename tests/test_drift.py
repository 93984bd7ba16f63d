"""Drift & robust-stats family (ops/drift.py) + fuzzy_join +
attribution — unit fixtures in the reference's tiny-rows style."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bubbles_spark.ops import core, drift, events


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_exact_quantiles_type1(spark):
    df = _vals(spark, range(1, 101))
    assert drift.exact_quantiles(df, "v", [0.05, 0.5, 0.95, 1.0]) == [
        5.0,
        50.0,
        95.0,
        100.0,
    ]
    # rank formula, not interpolation: q=0.5 of [1..4] is ceil(2)=rank 2
    assert drift.exact_quantiles(_vals(spark, [1, 2, 3, 4]), "v", [0.5]) == [2.0]


def test_exact_quantiles_drops_nulls_and_raises_empty(spark):
    df = spark.createDataFrame([(None,), (7.0,)], "v double")
    assert drift.exact_quantiles(df, "v", [0.5]) == [7.0]
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError):
        drift.exact_quantiles(empty, "v", [0.5])


def test_winsorize_clamps_tails_only(spark):
    df = _vals(spark, range(1, 101))
    w = drift.winsorize(df, "v", 0.05, 0.95)
    got = sorted(r["v"] for r in w.collect())
    assert got[0] == 5.0 and got[-1] == 95.0
    assert got.count(5.0) == 5 and got.count(95.0) == 6  # 95..100 clamp
    assert 50.0 in got  # interior untouched


def test_mad_outliers_robust_to_the_outlier_itself(spark):
    # one wild value: median/MAD barely move, z-score's mean/std would
    df = _vals(spark, list(range(1, 100)) + [10_000])
    out = drift.mad_outliers(df, "v", k=3.0)
    flagged = [r["v"] for r in out.filter("is_outlier").collect()]
    assert flagged == [10_000.0]


def test_psi_report_shares_and_identity(spark):
    ref = _vals(spark, [1, 1, 2, 2, 3, 3])
    same = drift.psi_report(ref, ref, "v", 0.0, 4.0, bins=4)
    rows = {r["bin"]: r for r in same.collect()}
    assert len(rows) == 4
    assert all(
        r["psi_bin"] == 0.0 for r in rows.values() if r["count_ref"] > 0
    )
    assert rows[0]["count_ref"] == 0 and rows[0]["psi_bin"] is None
    # shifted: mass moves, psi strictly positive
    cur = _vals(spark, [2, 2, 3, 3, 3, 3])
    moved = drift.psi_report(ref, cur, "v", 0.0, 4.0, bins=4)
    total = moved.agg(F.sum("psi_bin")).collect()[0][0]
    assert total and total > 0.0


def test_psi_report_clamps_out_of_range(spark):
    ref = _vals(spark, [-5, 0.5, 99])  # below lo and above hi
    rep = drift.psi_report(ref, ref, "v", 0.0, 1.0, bins=2)
    rows = {r["bin"]: r["count_ref"] for r in rep.collect()}
    assert rows == {0: 1, 1: 2}  # -5 clamps into bin 0; 99 into bin 1


def test_ks_distance_known_value(spark):
    ref = _vals(spark, [1, 2, 3, 4])
    cur = _vals(spark, [3, 4, 5, 6])
    row = drift.ks_distance(ref, cur, "v").collect()[0]
    # at v=2: F_ref=0.5, F_cur=0 -> D=0.5
    assert row["ks"] == 0.5
    assert (row["n_ref"], row["n_cur"]) == (4, 4)
    # identical samples -> 0
    assert drift.ks_distance(ref, ref, "v").collect()[0]["ks"] == 0.0


def test_fuzzy_join_matches_and_blocks(spark):
    L = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, name string"
    )
    R = spark.createDataFrame(
        [(10, "alphx"), (11, "bets"), (12, "delta"), (13, "gamma")],
        "id long, name string",
    )
    got = sorted(
        (r["id"], r["id_r"])
        for r in core.fuzzy_join(L, R, "name", "name", max_dist=1).collect()
    )
    # alpha~alphx (sub), beta~bets (del), gamma~gamma (0); delta is 2+
    assert got == [(1, 10), (2, 11), (3, 13)]


def test_fuzzy_join_block_on_restricts(spark):
    L = spark.createDataFrame(
        [(1, "abc", "us"), (2, "abc", "de")], "id long, name string, cc string"
    )
    R = spark.createDataFrame(
        [(9, "abd", "us")], "id long, name string, cc string"
    )
    free = core.fuzzy_join(L, R, "name", "name", max_dist=1)
    assert free.count() == 2
    blocked = core.fuzzy_join(
        L, R, "name", "name", max_dist=1, block_on=[("cc", "cc")]
    )
    assert [r["id"] for r in blocked.collect()] == [1]


def test_fuzzy_join_max_dist_zero_is_exact(spark):
    L = spark.createDataFrame([(1, "x"), (2, "y")], "id long, name string")
    got = core.fuzzy_join(L, L, "name", "name", max_dist=0)
    assert sorted((r["id"], r["id_r"]) for r in got.collect()) == [
        (1, 1),
        (2, 2),
    ]


def _attr_events(spark):
    rows = [
        # user 1: view -> click -> purchase (both in window)
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-02 00:00:00", 1, "click"),
        (3, "2024-01-03 00:00:00", 1, "purchase"),
        # user 2: only touch is OUTSIDE the 7-day lookback
        (4, "2024-01-01 00:00:00", 2, "view"),
        (5, "2024-01-20 00:00:00", 2, "purchase"),
        # user 3: touch AFTER conversion never credited
        (6, "2024-01-05 00:00:00", 3, "purchase"),
        (7, "2024-01-06 00:00:00", 3, "click"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_attribution_first_vs_last_touch(spark):
    e = _attr_events(spark)
    first = events.attribution(e, conversion="purchase", model="first_touch")
    rows = {r["conversion_id"]: r["channel"] for r in first.collect()}
    assert rows == {3: "view"}  # user2 out of window, user3 touch too late
    last = events.attribution(e, conversion="purchase", model="last_touch")
    rows = {r["conversion_id"]: r["channel"] for r in last.collect()}
    assert rows == {3: "click"}


def test_attribution_deterministic_tie_break(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 00:00:00", 1, "click"),  # same ts, higher id
        (3, "2024-01-02 00:00:00", 1, "purchase"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    first = events.attribution(e, conversion="purchase", model="first_touch")
    assert first.collect()[0]["channel"] == "view"  # event_id breaks the tie
    last = events.attribution(e, conversion="purchase", model="last_touch")
    assert last.collect()[0]["channel"] == "click"


def test_attribution_rejects_unknown_model(spark):
    with pytest.raises(ValueError):
        events.attribution(_attr_events(spark), model="not_a_model")


def test_auc_score_perfect_and_random(spark):
    # perfectly separating score -> AUC 1; anti-separating -> 0
    d = spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)], "s double, y int"
    )
    assert drift.auc_score(d, "s", "y").collect()[0]["auc"] == 1.0
    flipped = d.withColumn("y", 1 - F.col("y"))
    assert drift.auc_score(flipped, "s", "y").collect()[0]["auc"] == 0.0


def test_auc_score_midrank_ties(spark):
    # all scores identical -> every pair is a tie -> AUC exactly 0.5
    d = spark.createDataFrame(
        [(5.0, 0), (5.0, 0), (5.0, 1), (5.0, 1)], "s double, y int"
    )
    row = drift.auc_score(d, "s", "y").collect()[0]
    assert row["auc"] == 0.5 and row["n_pos"] == 2 and row["n_neg"] == 2


def test_auc_score_matches_sklearn_formula(spark):
    # hand-checked: scores [1,2,3,4], labels [0,1,0,1]
    # rank-sum of positives = 2 + 4 = 6; AUC = (6 - 3)/(2*2) = 0.75
    d = spark.createDataFrame(
        [(1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)], "s double, y int"
    )
    assert drift.auc_score(d, "s", "y").collect()[0]["auc"] == 0.75


def test_auc_score_single_class_raises(spark):
    d = spark.createDataFrame([(1.0, 1), (2.0, 1)], "s double, y int")
    with pytest.raises(ValueError):
        drift.auc_score(d, "s", "y")


def test_calibration_report_bins(spark):
    d = spark.createDataFrame(
        [(0.1, 0), (0.15, 0), (0.9, 1), (0.85, 1), (0.8, 0)],
        "s double, y int",
    )
    rows = {
        r["bin"]: r
        for r in drift.calibration_report(d, "s", "y", 0.0, 1.0, bins=2).collect()
    }
    assert rows[0]["n"] == 2 and rows[0]["pos_rate"] == 0.0
    assert rows[1]["n"] == 3 and rows[1]["pos_rate"] == 2.0 / 3.0
    assert abs(rows[0]["mean_score"] - 0.125) < 1e-12


def test_isotonic_calibration_matches_pav(spark):
    import random

    import pytest

    # a noisy but broadly increasing score->label relationship so PAV
    # has real violators to pool
    rng = random.Random(7)
    rows = []
    for _ in range(400):
        s = rng.random()
        y = 1 if rng.random() < (0.15 + 0.7 * s) else 0
        rows.append((s, y))
    d = spark.createDataFrame(rows, "s double, y int")
    out = drift.isotonic_calibration(d, "s", "y", 0.0, 1.0, bins=10).collect()

    # sequential weighted PAV reference over the same bins
    binned = {}
    for s, y in rows:
        b = min(max(int(s / 0.1), 0), 9)
        n, p = binned.get(b, (0, 0))
        binned[b] = (n + 1, p + y)
    # classic adjacent-violator pooling: each stack block carries the
    # bins it pooled; pool while the previous block's rate >= ours
    stack = []  # [n, pos, [bins...]]
    for b, (n, p) in sorted(binned.items()):
        stack.append([n, p, [b]])
        while len(stack) > 1 and (
            stack[-2][1] * stack[-1][0] >= stack[-1][1] * stack[-2][0]
        ):
            n2, p2, bs2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += p2
            stack[-1][2].extend(bs2)
    fitted = {}
    for n, p, bs in stack:
        for b in bs:
            fitted[b] = p / n

    got = {r["bin"]: r for r in out}
    assert set(got) == set(binned)
    # iso_rate matches the pooled PAV fit bin by bin
    for b in sorted(binned):
        assert got[b]["n"] == binned[b][0]
        assert got[b]["pos"] == binned[b][1]
        assert got[b]["pos_rate"] == pytest.approx(
            binned[b][1] / binned[b][0], abs=1e-15
        )
        assert got[b]["iso_rate"] == pytest.approx(fitted[b], abs=1e-12)
    # monotone by construction
    rates = [got[b]["iso_rate"] for b in sorted(got)]
    assert rates == sorted(rates)
    # degenerate guards
    with pytest.raises(ValueError):
        drift.isotonic_calibration(d, "s", "y", 0.0, 1.0, bins=0)
    with pytest.raises(ValueError):
        drift.isotonic_calibration(d, "s", "y", 0.0, 1.0, bins=5000)


def test_brier_decomposition_matches_reference(spark):
    import random

    import pytest

    rng = random.Random(11)
    rows = []
    for _ in range(500):
        # scores at 4dp (well inside the 1e-6 quantization), labels
        # drawn from a miscalibrated true rate so REL > 0
        s = round(rng.random(), 4)
        y = 1 if rng.random() < min(1.0, 0.2 + 0.5 * s) else 0
        rows.append((s, y))
    d = spark.createDataFrame(rows, "s double, y int")
    out = drift.brier_decomposition(d, "s", "y", bins=10).collect()
    assert len(out) == 1
    r = out[0]

    n = len(rows)
    brier = sum((s - y) ** 2 for s, y in rows) / n
    ybar = sum(y for _, y in rows) / n
    binned = {}
    for s, y in rows:
        # the operator's exact semantics: micro-quantize to 1e-6
        # units then integer-divide (float int(s*10) would misbin
        # exact boundaries like 0.3, whose double sits below 3.0)
        b = min((round(s * 1e6) * 10) // 10**6, 9)
        nb, pb, sb = binned.get(b, (0, 0, 0.0))
        binned[b] = (nb + 1, pb + y, sb + s)
    rel = sum(nb * (sb / nb - pb / nb) ** 2 for nb, pb, sb in binned.values()) / n
    res = sum(nb * (pb / nb - ybar) ** 2 for nb, pb, sb in binned.values()) / n
    ece = sum(nb * abs(sb / nb - pb / nb) for nb, pb, sb in binned.values()) / n

    assert r["n"] == n
    assert r["brier"] == pytest.approx(brier, abs=1e-9)
    assert r["uncertainty"] == pytest.approx(ybar * (1 - ybar), abs=1e-12)
    assert r["reliability"] == pytest.approx(rel, abs=1e-8)
    assert r["resolution"] == pytest.approx(res, abs=1e-8)
    assert r["ece"] == pytest.approx(ece, abs=1e-8)
    # Murphy identity holds for the BINNED forecast: REL - RES + UNC
    # equals the Brier of the bin-mean forecast (within-bin variance
    # is the gap to the raw Brier) — sanity: all components sane
    assert 0.0 <= r["resolution"] <= r["uncertainty"] + 1e-9
    assert r["reliability"] >= 0.0

    # empty input -> one row, n=0, NULL decomposition
    empty = spark.createDataFrame([], "s double, y int")
    r0 = drift.brier_decomposition(empty, "s", "y").collect()
    assert len(r0) == 1
    assert r0[0]["n"] == 0 and r0[0]["brier"] is None

    # perfectly calibrated constant forecast: REL 0, RES 0, BS = UNC
    const = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)], "s double, y int"
    )
    rc = drift.brier_decomposition(const, "s", "y").collect()[0]
    assert rc["reliability"] == 0.0 and rc["resolution"] == 0.0
    assert rc["brier"] == pytest.approx(0.25, abs=1e-12)
    assert rc["uncertainty"] == pytest.approx(0.25, abs=1e-12)

    with pytest.raises(ValueError):
        drift.brier_decomposition(d, "s", "y", bins=0)


def test_hosmer_lemeshow_matches_reference(spark):
    import random

    import pytest

    rng = random.Random(23)
    rows = []
    for _ in range(600):
        s = round(0.05 + 0.9 * rng.random(), 4)  # keep bins non-degenerate
        y = 1 if rng.random() < s else 0
        rows.append((s, y))
    d = spark.createDataFrame(rows, "s double, y int")
    r = drift.hosmer_lemeshow(d, "s", "y", bins=10).collect()[0]

    binned = {}
    for s, y in rows:
        b = min((round(s * 1e6) * 10) // 10**6, 9)
        nb, ob, eb = binned.get(b, (0, 0, 0.0))
        binned[b] = (nb + 1, ob + y, eb + round(s * 1e6) / 1e6)
    h = sum(
        (ob - eb) ** 2 / (eb * (1 - eb / nb))
        for nb, ob, eb in binned.values()
    )
    assert r["n"] == 600
    assert r["g_bins"] == len(binned)
    assert r["h_stat"] == pytest.approx(h, abs=1e-7)
    assert r["df_hl"] == len(binned) - 2

    # a calibrated forecast scores low; an anti-calibrated one high
    anti = spark.createDataFrame(
        [(s, 1 - y) for s, y in rows], "s double, y int"
    )
    ra = drift.hosmer_lemeshow(anti, "s", "y", bins=10).collect()[0]
    assert ra["h_stat"] > r["h_stat"]

    # degenerate bin (all predictions 0 in a bin) -> NULL h, count kept
    dg = spark.createDataFrame(
        [(0.0, 0), (0.0, 1), (0.55, 1), (0.55, 0), (0.95, 1), (0.95, 0)],
        "s double, y int",
    )
    rd = drift.hosmer_lemeshow(dg, "s", "y", bins=10).collect()[0]
    assert rd["h_stat"] is None and rd["g_bins"] == 3

    # empty input -> one row, zeros + NULLs
    empty = spark.createDataFrame([], "s double, y int")
    r0 = drift.hosmer_lemeshow(empty, "s", "y").collect()[0]
    assert r0["n"] == 0 and r0["g_bins"] == 0 and r0["h_stat"] is None

    with pytest.raises(ValueError):
        drift.hosmer_lemeshow(d, "s", "y", bins=0)


def test_attribution_linear_splits_credit(spark):
    e = _attr_events(spark)
    lin = events.attribution(e, conversion="purchase", model="linear")
    rows = [
        (r["conversion_id"], r["channel"], r["credit"]) for r in lin.collect()
    ]
    # conversion 3 (user 1) has two in-window touches -> 0.5 each
    assert sorted(rows) == [(3, "click", 0.5), (3, "view", 0.5)]


def test_winsorize_by_group_independent_envelopes(spark):
    rows = [("a", float(v)) for v in range(1, 11)] + [
        ("b", float(v)) for v in range(101, 111)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    w = drift.winsorize_by(df, "v", "g", 0.1, 0.9)
    got = {g: sorted(r["v"] for r in w.filter(F.col("g") == g).collect())
           for g in ("a", "b")}
    # each group clamps at ITS OWN 10/90 ranks (1 and 9 of 10)
    assert got["a"][0] == 1.0 and got["a"][-1] == 9.0
    assert got["b"][0] == 101.0 and got["b"][-1] == 109.0


def test_winsorize_by_keeps_nulls_and_null_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("c", None)],
        "g string, v double",
    )
    w = drift.winsorize_by(df, "v", "g", 0.25, 0.75)
    rows = [(r["g"], r["v"]) for r in w.collect()]
    assert ("a", None) in rows and ("c", None) in rows
    assert len(rows) == 4  # left join keeps every input row


def test_attribution_time_decay_step_weights(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view"),    # 2 whole days before
        (2, "2024-01-02 12:00:00", 1, "click"),   # 0.5 day before
        (3, "2024-01-03 00:00:00", 1, "purchase"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = events.attribution(
        e, conversion="purchase", model="time_decay",
        half_life_seconds=86400.0,
    )
    got = {r["channel"]: r["credit"] for r in out.collect()}
    assert got == {"view": 0.25, "click": 1.0}  # floor(2)=2, floor(0.5)=0


def test_psi_bin_arithmetic_pinned(spark):
    # ln is engine-consistent but not cross-engine bit-exact, so the
    # oracle drops psi_bin; pin the arithmetic here instead
    ref = _vals(spark, [1, 1, 2, 3])
    cur = _vals(spark, [1, 2, 2, 3])
    rep = drift.psi_report(ref, cur, "v", 0.0, 4.0, bins=4).collect()
    for r in rep:
        if r["count_ref"] > 0 and r["count_cur"] > 0:
            expect = (r["share_ref"] - r["share_cur"]) * math.log(
                r["share_ref"] / r["share_cur"]
            )
            assert abs(r["psi_bin"] - expect) <= 1e-15 * max(1.0, abs(expect))
        else:
            assert r["psi_bin"] is None


def test_finish_psi_matches_batch_psi_report(spark):
    # streamed histogram + finish_psi over ONE window == psi_report
    # over the same rows with the same grid
    from bubbles_spark.streaming import events as sevents

    rows = [(i, float(v)) for i, v in enumerate([1, 1, 2, 5, 7, 7, 9])]
    df = spark.createDataFrame(rows, "id long, value double")
    ref = _vals(spark, [1, 2, 3, 8])
    # build the sunk histogram shape directly via histogram_batch + a
    # constant window column (finish_psi only reads window_start/bin/
    # bin_count)
    sunk = sevents.histogram_batch(df, "value", bins=5, bounds=(0.0, 10.0)) \
        .withColumn("window_start",
                    F.lit("2024-01-01 00:00:00").cast("timestamp"))
    got = sevents.finish_psi(
        sunk, sevents.histogram_batch(ref, "v", bins=5, bounds=(0.0, 10.0)),
        bins=5,
    ).orderBy("bin").collect()
    want = drift.psi_report(
        ref.select(F.col("v").alias("value")), df.select("value"),
        "value", 0.0, 10.0, bins=5,
    ).orderBy("bin").collect()
    assert [(g["bin"], g["count_ref"], g["count_cur"], g["share_ref"],
             g["share_cur"], g["psi_bin"]) for g in got] == \
           [(w["bin"], w["count_ref"], w["count_cur"], w["share_ref"],
             w["share_cur"], w["psi_bin"]) for w in want]


def test_finish_divergence_matches_batch_report(spark):
    # streamed histogram + finish_divergence over ONE window must
    # equal divergence_report over the same rows with the same grid
    # (including the ln-based kl/js columns — same engine here)
    from bubbles_spark.streaming import events as sevents

    rows = [(i, float(v)) for i, v in enumerate([1, 1, 2, 5, 7, 7, 9])]
    df = spark.createDataFrame(rows, "id long, value double")
    ref = _vals(spark, [1, 2, 3, 8])
    sunk = sevents.histogram_batch(df, "value", bins=5, bounds=(0.0, 10.0)) \
        .withColumn("window_start",
                    F.lit("2024-01-01 00:00:00").cast("timestamp"))
    got = sevents.finish_divergence(
        sunk, sevents.histogram_batch(ref, "v", bins=5, bounds=(0.0, 10.0)),
        bins=5,
    ).orderBy("bin").collect()
    want = drift.divergence_report(
        ref.select(F.col("v").alias("value")), df.select("value"),
        "value", 0.0, 10.0, bins=5,
    ).orderBy("bin").collect()
    cols = ["bin", "count_ref", "count_cur", "share_ref", "share_cur",
            "kl_bin", "js_bin", "hellinger_bin", "tvd_bin"]
    assert [[g[c] for c in cols] for g in got] == \
           [[w[c] for c in cols] for w in want]


def test_rollup_upsert_incremental_equals_full(spark, tmp_path):
    """Feeding batches through the persisted-rollup loop must equal
    the one-shot rollup exactly (mergeable measures, decimal sums)."""
    from bubbles_spark.io import FileStore

    rows = [
        (i, f"2024-01-01 {h:02d}:{m:02d}:00", float(v))
        for i, (h, m, v) in enumerate(
            [(0, 5, 10), (0, 40, 20), (1, 10, 30), (1, 50, 5), (2, 0, 7)]
        )
    ]
    df = (
        spark.createDataFrame(rows, "event_id long, ts string, value double")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("value_dec", F.col("value").cast("decimal(14,4)"))
    )
    measures = [("value_dec", "sum"), ("value", "min"), ("value", "max")]
    store = FileStore(spark, str(tmp_path))
    for half in (0, 1):
        events.rollup_upsert(
            store, "agg", df.filter(F.col("event_id") % 2 == half),
            "ts", ["1 hour", "1 day"], measures=measures,
        )
    got = sorted(
        map(tuple, store.get_object("agg").collect())
    )
    want = sorted(
        map(
            tuple,
            events.time_bucket_rollup(
                df, "ts", ["1 hour", "1 day"], measures=measures
            ).collect(),
        )
    )
    assert got == want
    # third batch: replay batch 1 — NOT idempotent by design (rollup
    # merge adds); callers dedupe upstream.  Just assert it grows.
    events.rollup_upsert(
        store, "agg", df.filter(F.col("event_id") % 2 == 0),
        "ts", ["1 hour", "1 day"], measures=measures,
    )
    rc = {
        (r["grain"], r["window_start"]): r["record_count"]
        for r in store.get_object("agg").collect()
    }
    assert rc[("1 day", want[0][1].replace(hour=0, minute=0))] == 5 + 3


def test_merge_rollups_folds_measures(spark):
    a = spark.createDataFrame(
        [("1 hour", "w1", 10.0, 1.0, 5.0, 3)],
        "grain string, window_start string, v_sum double, v_min double, v_max double, record_count long",
    )
    b = spark.createDataFrame(
        [("1 hour", "w1", 4.0, 0.5, 9.0, 2), ("1 hour", "w2", 1.0, 1.0, 1.0, 1)],
        "grain string, window_start string, v_sum double, v_min double, v_max double, record_count long",
    )
    got = {
        r["window_start"]: (r["v_sum"], r["v_min"], r["v_max"], r["record_count"])
        for r in events.merge_rollups(
            a, b, ["grain", "window_start"],
            [("v", "sum"), ("v", "min"), ("v", "max")],
        ).collect()
    }
    assert got == {"w1": (14.0, 0.5, 9.0, 5), "w2": (1.0, 1.0, 1.0, 1)}


def test_attribution_u_shaped_split(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-02 00:00:00", 1, "click"),
        (3, "2024-01-03 00:00:00", 1, "email"),
        (4, "2024-01-04 00:00:00", 1, "ad"),
        (5, "2024-01-05 00:00:00", 1, "purchase"),
        # user 2: single touch -> full credit
        (6, "2024-01-01 00:00:00", 2, "view"),
        (7, "2024-01-02 00:00:00", 2, "purchase"),
        # user 3: exactly two touches -> 0.5 each
        (8, "2024-01-01 00:00:00", 3, "view"),
        (9, "2024-01-02 00:00:00", 3, "click"),
        (10, "2024-01-03 00:00:00", 3, "purchase"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = events.attribution(e, conversion="purchase", model="u_shaped")
    got = {(r["conversion_id"], r["channel"]): r["credit"] for r in out.collect()}
    assert got[(5, "view")] == 0.4 and got[(5, "ad")] == 0.4
    assert got[(5, "click")] == 0.1 and got[(5, "email")] == 0.1
    assert got[(7, "view")] == 1.0
    assert got[(10, "view")] == 0.5 and got[(10, "click")] == 0.5


def test_quantile_normalize_ecdf(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 20.0), (4, 40.0), (5, None)],
        "id long, v double",
    )
    out = {r["id"]: r["v"] for r in drift.quantile_normalize(df, "v").collect()}
    # ties share #(<= v)/n over NON-NULL values: n=4
    assert out[1] == 0.25
    assert out[2] == 0.75 and out[3] == 0.75
    assert out[4] == 1.0
    assert out[5] is None


def test_psi_report_categorical_union_spine(spark):
    ref = spark.createDataFrame(
        [("en",), ("en",), ("de",)], "lang string"
    )
    cur = spark.createDataFrame(
        [("en",), ("fr",), ("fr",)], "lang string"
    )
    rows = {r["category"]: r for r in
            drift.psi_report_categorical(ref, cur, "lang").collect()}
    # union spine: de only in ref, fr only in cur — zero rows, not
    # omissions; psi NULL where a side is empty
    assert rows["de"]["count_cur"] == 0 and rows["de"]["psi_bin"] is None
    assert rows["fr"]["count_ref"] == 0 and rows["fr"]["psi_bin"] is None
    en = rows["en"]
    assert (en["share_ref"], en["share_cur"]) == (2.0 / 3.0, 1.0 / 3.0)
    expect = (en["share_ref"] - en["share_cur"]) * math.log(
        en["share_ref"] / en["share_cur"]
    )
    assert abs(en["psi_bin"] - expect) <= 1e-15


def test_merge_rollups_rejects_non_pyramid_measure(spark):
    a = spark.createDataFrame([("w1", 1.0, 1)], "w string, v_avg double, record_count long")
    with pytest.raises(ValueError, match="pyramid-safe"):
        events.merge_rollups(a, a, ["w"], [("v", "avg")])


def test_attribution_ntz_lookback_is_wallclock_across_dst(spark):
    """NTZ lookback membership is decided in WALL-CLOCK space: a touch
    24h15m before the conversion stays out of a 24h window even when
    the session zone's DST transition (America/New_York 2024-03-10)
    shrinks the instant difference to 23h15m (ADVICE r5: a bare
    NTZ->LTZ cast made in-window membership zone-dependent)."""
    rows = [
        (1, "2024-03-09 06:45:00", 1, "ad"),        # 24h15m before conv
        (2, "2024-03-10 07:00:00", 1, "purchase"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            out = events.attribution(
                e, conversion="purchase", model="last_touch",
                lookback_seconds=86400.0,
            )
            assert out.count() == 0, f"touch leaked into the window under {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_fuzzy_join_rejects_reserved_column_names(spark):
    L = spark.createDataFrame([("ann", 1)], "name string, __len int")
    R = spark.createDataFrame([("anne",)], "name string")
    with pytest.raises(ValueError, match="__len"):
        core.fuzzy_join(L, R, "name", "name", max_dist=2)


def test_shuffle_partitions_survives_non_numeric_conf():
    class _Conf:
        def get(self, k, d=None):
            return "auto"

    class _SC:
        defaultParallelism = 7

    class _Spark:
        conf = _Conf()
        sparkContext = _SC()

    assert core.shuffle_partitions(_Spark()) == 7
    assert core.shuffle_partitions(_Spark(), default=5) == 5


def test_winsorize_by_dominant_group_scale_safe(spark):
    """One group holding ~99% of the rows must still clamp at its own
    exact type-1 quantiles, WITHOUT a per-group row-level sort (the
    ranks now come from distinct-value counts + the two-phase cumsum;
    a row_number window over the dominant group would be the
    single-task stage the 100 TB posture forbids)."""
    import random

    rng = random.Random(7)
    rows = [("big", float(rng.randint(0, 999))) for _ in range(5000)]
    rows += [("small", float(v)) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)]
    df = spark.createDataFrame(rows, "seg string, v double")
    out = drift.winsorize_by(df, "v", "seg", 0.1, 0.9, out_col="w")

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan.lower()

    # type-1 quantiles per group, computed independently
    def t1(vals, q):
        s = sorted(vals)
        return s[max(0, math.ceil(q * len(s)) - 1)]

    by_seg = {"big": [], "small": []}
    for seg, v in rows:
        by_seg[seg].append(v)
    got = {(r["seg"], r["v"]): r["w"] for r in out.collect()}
    for seg, vals in by_seg.items():
        lo, hi = t1(vals, 0.1), t1(vals, 0.9)
        for v in set(vals):
            assert got[(seg, v)] == min(max(v, lo), hi), (seg, v)


def test_suggest_bounds_outward_decade_grid(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in range(3, 487)], "v double"
    )
    lo, hi = drift.suggest_bounds(df, "v", coverage=1.0)
    # span 3..486 -> decade step 100; rounded outward
    assert lo <= 3.0 and hi >= 486.0
    assert lo == 0.0 and hi == 500.0
    with pytest.raises(ValueError, match="coverage"):
        drift.suggest_bounds(df, "v", coverage=0.0)
    empty = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="no non-null"):
        drift.suggest_bounds(empty, "v")


def test_rolling_features_multi_horizon_one_window(spark):
    """All (horizon, func) frames ride ONE Window node (one shuffle +
    one sort); values match hand-computed trailing aggregates."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, 10.0),
        (2, "2024-01-01 00:30:00", 1, 20.0),
        (3, "2024-01-01 02:00:00", 1, 40.0),
        (4, "2024-01-01 00:10:00", 2, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = events.rolling_features(
        df, "ts", "user_id", "value",
        windows_seconds=(3600, 86400), funcs=("sum", "count"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window ") == 1, plan
    got = {r["event_id"]: r.asDict() for r in out.collect()}
    assert got[2]["value_sum_1h"] == 30.0 and got[2]["value_count_1h"] == 2
    assert got[3]["value_sum_1h"] == 40.0  # 00:00/00:30 fall outside [01:00, 02:00]
    assert got[3]["value_sum_1d"] == 70.0 and got[3]["value_count_1d"] == 3
    assert got[4]["value_sum_1h"] == 5.0

    with pytest.raises(ValueError, match="supports"):
        events.rolling_features(df, "ts", "user_id", "value", funcs=("median",))


def test_cohens_kappa_known_value(spark):
    """Textbook 2x2 example: po=0.7, pe=0.5 -> kappa=0.4 exactly."""
    rows = (
        [("y", "y")] * 40 + [("y", "n")] * 10
        + [("n", "y")] * 20 + [("n", "n")] * 30
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = drift.cohens_kappa(df, "a", "b").first()
    assert r["n_items"] == 100
    assert r["observed_agreement"] == 0.7
    # pe = 0.5*0.6 + 0.5*0.4 = 0.5
    assert r["expected_agreement"] == 0.5
    assert abs(r["kappa"] - 0.4) < 1e-15


def test_cohens_kappa_degenerate_and_empty(spark):
    const = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    r = drift.cohens_kappa(const, "a", "b").first()
    assert r["kappa"] is None  # pe = 1 -> undefined
    empty = spark.createDataFrame([], "a string, b string")
    r2 = drift.cohens_kappa(empty, "a", "b").first()
    assert r2["n_items"] == 0 and r2["kappa"] is None


def test_transition_matrix_counts_and_shares(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "a"),
        (2, "2024-01-01 00:01:00", 1, "b"),
        (3, "2024-01-01 00:02:00", 1, "a"),
        (4, "2024-01-01 00:00:00", 2, "a"),
        (5, "2024-01-01 00:01:00", 2, "b"),
        (6, "2024-01-01 00:05:00", 3, "c"),  # lone event: no transition
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        (r["prev_state"], r["next_state"]): (r["n_transitions"], r["share"])
        for r in events.transition_matrix(
            e, "ts", "user_id", "event_type", tiebreak_col="event_id"
        ).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_seasonal_anomalies_flags_per_bucket(spark):
    # hour 0 centers at 10 with one wild 100; hour 1 centers at 100
    # where 100 is perfectly normal — a flat zscore would flag both
    rows = [(i, f"2024-01-01 00:{i:02d}:00", 10.0) for i in range(10)]
    rows += [(99, "2024-01-08 00:30:00", 100.0)]       # same hour-of-week
    rows += [(200 + i, f"2024-01-01 01:{i:02d}:00", 100.0) for i in range(10)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = events.seasonal_anomalies(df, "ts", "value", k=3.0)
    assert [r["event_id"] for r in out.collect()] == [99]
    with pytest.raises(ValueError, match="bucket"):
        events.seasonal_anomalies(df, "ts", "value", bucket="minute")


def test_mixture_plan_binding_group_and_missing_group(spark):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [("web", 100), ("web", 100), ("code", 50)],
        "source string, ntok long",
    )
    plan = {
        r["group"]: r.asDict()
        for r in textprep.mixture_plan(
            df, {"web": 0.5, "code": 0.5}, token_col="ntok"
        ).collect()
    }
    # code binds: T = 50/.5 = 100 -> web budget 50 of 200 (rate .25)
    assert plan["code"]["sample_rate"] == 1.0
    assert plan["web"]["token_budget"] == 50.0
    assert plan["web"]["sample_rate"] == 0.25
    # a weighted group with no rows pins T to 0
    zero = {
        r["group"]: r["token_budget"]
        for r in textprep.mixture_plan(
            df, {"web": 0.5, "nope": 0.5}, token_col="ntok"
        ).collect()
    }
    assert zero == {"web": 0.0, "nope": 0.0}
    with pytest.raises(ValueError, match="positive"):
        textprep.mixture_plan(df, {"web": -1.0}, token_col="ntok")


def test_top_paths_deterministic_topk(spark):
    rows = []
    eid = 0
    for u, seq in [(1, "abcabc"), (2, "abc"), (3, "abd")]:
        for i, st in enumerate(seq):
            eid += 1
            rows.append((eid, f"2024-01-01 00:{i:02d}:00", u, st))
    e = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = [
        (r["path"], r["n_occurrences"])
        for r in events.top_paths(
            e, "ts", "user_id", "event_type", n=3, k=3, tiebreak_col="event_id"
        ).collect()
    ]
    # user1 windows: abc, bca, cab, abc; user2: abc; user3: abd
    assert got == [("a>b>c", 3), ("a>b>d", 1), ("b>c>a", 1)]
    with pytest.raises(ValueError, match="n must"):
        events.top_paths(e, "ts", "user_id", "event_type", n=1)


def test_changepoint_finds_planted_shift(spark):
    rows = []
    eid = 0
    for h in range(48):
        level = 10.0 if h < 30 else 50.0
        for m in (0, 30):
            eid += 1
            rows.append((eid, f"2024-01-{1 + h // 24:02d} {h % 24:02d}:{m:02d}:00", level))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    r = events.changepoint_report(df, "ts", "value", "1 hour").first()
    # split after hour 29 (the last low bucket)
    assert r["split_ts"].hour == 5 and r["split_ts"].day == 2  # hour 29
    assert r["n_left"] == 60 and r["n_right"] == 36
    assert r["mean_left"] == 10.0 and r["mean_right"] == 50.0


def test_woe_iv_exact_counts_and_pinned_ln(spark):
    import math

    # 4 bins over [0,4): bin1 = {1,1}, bin2 = {2}, bin3 = {3,3}
    rows = [(1.0, 1), (1.0, 0), (2.0, 0), (3.0, 1), (3.0, 1)]
    df = spark.createDataFrame(rows, "v double, lab int")
    got = {r["bin"]: r for r in drift.woe_iv(
        df, "v", "lab", 0.0, 4.0, bins=4
    ).collect()}
    assert (got[1]["count_event"], got[1]["count_nonevent"]) == (1, 1)
    assert (got[3]["count_event"], got[3]["count_nonevent"]) == (2, 0)
    assert got[1]["share_event"] == 1.0 / 3.0
    assert got[1]["share_nonevent"] == 1.0 / 2.0
    # pinned ln arithmetic engine-side (the oracle drops woe/iv)
    se, sn = 1.0 / 3.0, 1.0 / 2.0
    assert got[1]["woe_bin"] == math.log(se / sn)
    assert got[1]["iv_bin"] == (se - sn) * math.log(se / sn)
    # empty / one-sided bins -> NULL woe/iv
    assert got[0]["woe_bin"] is None          # empty bin
    assert got[2]["woe_bin"] is None          # event side empty
    assert got[3]["woe_bin"] is None          # nonevent side empty


def test_woe_iv_validates_args(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1.0, 1)], "v double, lab int")
    with _pytest.raises(ValueError, match="woe_iv"):
        drift.woe_iv(df, "v", "lab", 5.0, 5.0)


def test_target_encode_shrinks_to_prior(spark):
    rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)]
    df = spark.createDataFrame(rows, "cat string, t int")
    got = {r["category"]: r for r in drift.target_encode(
        df, "cat", "t", smoothing=10.0
    ).collect()}
    prior = 9.0 / 11.0
    assert got["a"]["n_rows"] == 10 and got["a"]["target_sum"] == 8.0
    assert got["a"]["te"] == (8.0 + 10.0 * prior) / (10.0 + 10.0)
    # 1-row category sits almost at the prior
    assert got["b"]["te"] == (1.0 + 10.0 * prior) / (1.0 + 10.0)
    assert abs(got["b"]["te"] - prior) < abs(got["a"]["te"] - prior) + 1


def test_chi_square_report_exact_cells(spark):
    # independent 2x2 with known marginals: chi2 contributions exact
    rows = (
        [("x", "l")] * 30 + [("x", "h")] * 10
        + [("y", "l")] * 15 + [("y", "h")] * 45
    )
    df = spark.createDataFrame(rows, "r string, c string")
    got = {(r["row_cat"], r["col_cat"]): r for r in
           drift.chi_square_report(df, "r", "c").collect()}
    cell = got[("x", "l")]
    assert cell["observed"] == 30
    assert (cell["row_total"], cell["col_total"], cell["n_total"]) == (40, 45, 100)
    e = (40.0 * 45.0) / 100.0
    assert cell["expected"] == e
    assert cell["chi2_cell"] == (30.0 - e) * (30.0 - e) / e


def test_gains_table_exact_deciles(spark):
    # 20 rows, scores 20..1, events on the top 5 scores -> first two
    # quintile buckets capture everything
    rows = [(i, float(21 - i), 1 if i <= 5 else 0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    got = {r["bucket"]: r for r in drift.gains_table(
        df, "s", "y", "id", n_buckets=5
    ).collect()}
    assert [got[b]["n_rows"] for b in range(1, 6)] == [4] * 5
    assert [got[b]["n_events"] for b in range(1, 6)] == [4, 1, 0, 0, 0]
    assert got[1]["event_rate"] == 1.0
    assert got[2]["cum_events"] == 5 and got[2]["cum_capture"] == 1.0
    # top bucket lift = (4/4)/(5/20) = 4x
    assert got[1]["lift"] == (4.0 / 4.0) / (5.0 / 20.0)


def test_gains_table_tie_break_total_order(spark):
    # all scores equal: buckets cut purely by id order - deterministic
    rows = [(i, 1.0, 1 if i <= 2 else 0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    got = {r["bucket"]: r["n_events"] for r in drift.gains_table(
        df, "s", "y", "id", n_buckets=2
    ).collect()}
    assert got == {1: 2, 2: 0}


def test_group_quantiles_type1_exact(spark):
    """Per-group type-1 quantiles: value at rank ceil(q*n), ties and
    NULLs handled, q=1.0 is the group max."""
    rows = [("a", float(v)) for v in range(1, 11)]
    rows += [("b", 5.0), ("b", 5.0), ("b", 7.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["q"]): (r["value"], r["n_rows"])
        for r in drift.group_quantiles(
            df, "g", "v", [0.5, 0.9, 1.0]
        ).collect()
    }
    assert got[("a", 0.5)] == (5.0, 10)   # ceil(0.5*10)=5 -> 5.0
    assert got[("a", 0.9)] == (9.0, 10)
    assert got[("a", 1.0)] == (10.0, 10)
    assert got[("b", 0.5)] == (5.0, 3)    # ceil(1.5)=2 -> tied 5.0
    assert got[("b", 1.0)] == (7.0, 3)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="qs"):
        drift.group_quantiles(df, "g", "v", [0.0])


def test_cuped_report_perfect_covariate(spark):
    """y = 2x exactly: theta = 2, adjusted variance collapses to 0,
    and mean_adjusted shifts each arm's mean by -theta*(mean_x - xbar)."""
    rows = [("a", 2.0 * x, x) for x in (1.0, 2.0, 3.0)]
    rows += [("b", 2.0 * x, x) for x in (4.0, 5.0, 6.0)]
    df = spark.createDataFrame(rows, "variant string, y double, x double")
    got = {r["variant"]: r for r in drift.cuped_report(
        df, "variant", "y", "x"
    ).collect()}
    assert got["a"]["n"] == 3 and got["b"]["n"] == 3
    assert abs(got["a"]["theta"] - 2.0) < 1e-12
    assert got["a"]["mean_metric"] == 4.0 and got["b"]["mean_metric"] == 10.0
    # xbar = 3.5: a's mean_x=2 -> adj = 4 - 2*(2-3.5) = 7; b: 10-2*(5-3.5)=7
    assert abs(got["a"]["mean_adjusted"] - 7.0) < 1e-9
    assert abs(got["b"]["mean_adjusted"] - 7.0) < 1e-9
    assert abs(got["a"]["var_adjusted"]) < 1e-9
    # zero covariate variance -> theta NULL, raw columns intact
    const = spark.createDataFrame(
        [("a", 1.0, 5.0), ("a", 2.0, 5.0), ("b", 3.0, 5.0)],
        "variant string, y double, x double",
    )
    out = {r["variant"]: r for r in drift.cuped_report(
        const, "variant", "y", "x"
    ).collect()}
    assert out["a"]["theta"] is None and out["a"]["mean_adjusted"] is None
    assert out["a"]["mean_metric"] == 1.5


def test_robust_scale_global_and_grouped(spark):
    rows = [("a", float(v)) for v in (1, 2, 3, 4, 100)]
    rows += [("b", 5.0), ("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    # global: n=8 -> q25=rank 2, med=rank 4, q75=rank 6
    out = {
        (r["g"], r["v"]): r["v_robust"]
        for r in drift.robust_scale(df, "v").collect()
    }
    # sorted: 1,2,3,4,5,5,5,100 -> q25=2, med=4, iqr=5-2=3
    assert out[("a", 1.0)] == (1.0 - 4.0) / 3.0
    assert out[("a", 100.0)] == (100.0 - 4.0) / 3.0
    # grouped: b's IQR is 0 -> NULL; a's quantiles from its own 5 rows
    g = {
        (r["g"], r["v"]): r["v_robust"]
        for r in drift.robust_scale(df, "v", group_col="g").collect()
    }
    assert all(v is None for (grp, _), v in g.items() if grp == "b")
    # a: q25=rank ceil(1.25)=2 -> 2.0, med=3.0, q75=rank 4 -> 4.0
    assert g[("a", 100.0)] == (100.0 - 3.0) / 2.0


def test_rate_confidence_wilson(spark):
    """Wilson interval matches the closed form and stays inside
    [0, 1] even at extreme rates where Wald would escape."""
    import math

    rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("x", 1)] * 5
    df = spark.createDataFrame(rows, "g string, s int")
    got = {r["g"]: r for r in drift.rate_confidence(df, "g", "s").collect()}
    r = got["a"]
    assert r["n"] == 10 and r["successes"] == 8 and r["rate"] == 0.8
    z, n, p = 1.96, 10.0, 0.8
    z2n = z * z / n
    denom = 1.0 + z2n
    center = (p + z2n / 2.0) / denom
    half = z * math.sqrt(p * (1 - p) / n + z2n / (4.0 * n)) / denom
    assert r["wilson_lo"] == center - half
    assert r["wilson_hi"] == center + half
    # all-success group: interval strictly inside (0, 1]
    x = got["x"]
    assert x["rate"] == 1.0 and 0.0 < x["wilson_lo"] < 1.0
    assert x["wilson_hi"] <= 1.0 + 1e-15


def test_cramers_v_perfect_and_independent(spark):
    # perfect association: row determines column exactly → V = 1
    perfect = spark.createDataFrame(
        [("a", "x")] * 10 + [("b", "y")] * 10, "r string, c string"
    )
    row = drift.cramers_v(perfect, "r", "c").collect()[0]
    assert row["n_total"] == 20 and row["dof"] == 1
    assert row["cramers_v"] == pytest.approx(1.0, abs=1e-9)

    # independence: uniform 2x2 → chi2 = 0 → V = 0
    indep = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")] * 5,
        "r string, c string",
    )
    row = drift.cramers_v(indep, "r", "c").collect()[0]
    assert row["chi2"] == 0.0 and row["cramers_v"] == 0.0

    # single-category column: k = 0 → NULL, not a zero division
    single = spark.createDataFrame(
        [("a", "x"), ("b", "x")], "r string, c string"
    )
    row = drift.cramers_v(single, "r", "c").collect()[0]
    assert row["cramers_v"] is None


def test_classification_report_known_confusion(spark):
    # labels: a a a b b c ; preds: a b a b b a
    rows = [("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "b"),
            ("c", "a"), ("a", None), (None, "b")]
    df = spark.createDataFrame(rows, "label string, pred string")
    out = {r["class"]: r for r in
           drift.classification_report(df, "label", "pred").collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["tp"], a["fp"], a["fn"], a["support"]) == (2, 1, 1, 3)
    assert a["precision"] == 2 / 3 and a["recall"] == 2 / 3
    assert a["f1"] == pytest.approx(2 / 3)
    assert (b["tp"], b["fp"], b["fn"]) == (2, 1, 0)
    assert b["recall"] == 1.0
    # c never predicted: precision NULL, recall 0, f1 NULL
    assert c["precision"] is None and c["recall"] == 0.0 and c["f1"] is None


def test_retrieval_metrics_hand_computed(spark):
    import math

    # one query, 5 candidates scored 5..1, relevant at ranks 1 and 3
    rows = [(1, i, 6 - i, 1 if i in (1, 3) else 0) for i in range(1, 6)]
    # second query with no positives
    rows += [(2, i, 6 - i, 0) for i in range(1, 4)]
    df = spark.createDataFrame(rows, "q long, cand long, score int, rel int")
    out = {r["q"]: r for r in drift.retrieval_metrics(
        df, "q", "score", "rel", k=2, tiebreak_col="cand").collect()}
    r1 = out[1]
    assert r1["n_pos"] == 2 and r1["pos_at_k"] == 1
    assert r1["precision_at_k"] == 0.5 and r1["recall_at_k"] == 0.5
    assert r1["mrr"] == 1.0
    t1, t2 = round(1e9 / math.log2(2)), round(1e9 / math.log2(3))
    assert r1["ndcg_at_k"] == t1 / (t1 + t2)
    r2 = out[2]
    assert r2["n_pos"] == 0
    assert r2["recall_at_k"] is None and r2["mrr"] is None
    assert r2["ndcg_at_k"] is None and r2["precision_at_k"] == 0.0


def test_trimmed_mean_hand_computed(spark):
    from bubbles_spark.ops.drift import trimmed_mean

    # 10 values incl. ties at the cut: k = floor(0.2*10) = 2 trimmed
    # each side; sorted [1,1,2,2,3,3,4,4,100,100] → keep 2..4 middle 6
    vals = [1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0, 100.0, 100.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = trimmed_mean(df, "v", trim=0.2,
                       value_decimal="decimal(18,1)").collect()[0]
    assert (out["n_rows"], out["k_trimmed"], out["n_kept"]) == (10, 2, 6)
    assert out["trimmed_mean"] == (2 + 2 + 3 + 3 + 4 + 4) / 6

    # trim=0 is the plain mean; degenerate over-trim yields NULL
    out0 = trimmed_mean(df, "v", trim=0.0,
                        value_decimal="decimal(18,1)").collect()[0]
    assert out0["trimmed_mean"] == sum(vals) / 10
    one = trimmed_mean(
        spark.createDataFrame([(5.0,)], "v double"), "v", trim=0.49
    ).collect()[0]
    assert one["trimmed_mean"] == 5.0  # k = floor(.49*1) = 0
    with pytest.raises(ValueError):
        trimmed_mean(df, "v", trim=0.5)


def test_trimmed_mean_grouped_equals_per_group_global(spark):
    from bubbles_spark.ops.drift import trimmed_mean

    rows = [("a", float(v)) for v in (1, 2, 3, 4, 100)] + [
        ("b", float(v)) for v in (10, 20, 20, 30, 40, 500, 600)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    grouped = {
        r["grp"]: r
        for r in trimmed_mean(
            df, "v", trim=0.2, group_col="grp",
            value_decimal="decimal(18,1)",
        ).collect()
    }
    for g in ("a", "b"):
        solo = trimmed_mean(
            df.filter(F.col("grp") == g), "v", trim=0.2,
            value_decimal="decimal(18,1)",
        ).collect()[0]
        got = grouped[g]
        for c in ("n_rows", "k_trimmed", "n_kept", "trimmed_mean"):
            assert got[c] == solo[c], (g, c)
    # a: k=1, keep [2,3,4] → 3 ; b: k=1, keep [20,20,30,40,500] → 122
    assert grouped["a"]["trimmed_mean"] == 3.0
    assert grouped["b"]["trimmed_mean"] == 122.0


def test_conformal_interval_rank_selection(spark):
    from bubbles_spark.ops.drift import conformal_interval

    cal = spark.createDataFrame(
        [(0.0, float(r)) for r in range(1, 11)], "pred double, label double"
    )  # residuals exactly 1..10
    scored = spark.createDataFrame([(100.0,), (50.0,)], "pred double")
    out = conformal_interval(cal, scored, "pred", "label", alpha=0.2).collect()
    # q = ceil(11*0.8) = 9th smallest residual = 9.0
    assert all(r["q_hat"] == 9.0 and r["n_cal"] == 10 for r in out)
    by_pred = {r["pred"]: r for r in out}
    assert by_pred[100.0]["pi_lo"] == 91.0 and by_pred[100.0]["pi_hi"] == 109.0

    # level too tight for n: ceil(11*0.95) = 11 > 10 -> unbounded (NULLs)
    out2 = conformal_interval(cal, scored, "pred", "label", alpha=0.05).collect()
    assert all(
        r["q_hat"] is None and r["pi_lo"] is None and r["pi_hi"] is None
        for r in out2
    )

    import pytest as _pt
    with _pt.raises(ValueError):
        conformal_interval(cal.filter("pred > 99"), scored, "pred", "label")


def test_divergence_report_hand_computed(spark):
    import math

    from bubbles_spark.ops.drift import divergence_report

    ref = spark.createDataFrame([(1.0,), (1.0,), (6.0,)], "v double")
    cur = spark.createDataFrame([(1.0,), (6.0,), (6.0,)], "v double")
    rows = {r["bin"]: r for r in divergence_report(
        ref, cur, "v", 0.0, 10.0, bins=2).collect()}
    p0, q0 = 2 / 3, 1 / 3
    m0 = (p0 + q0) / 2
    assert rows[0]["count_ref"] == 2 and rows[0]["count_cur"] == 1
    assert rows[0]["share_ref"] == p0 and rows[0]["share_cur"] == q0
    # ln columns: JVM Math.log vs libm can differ by 1 ulp — pin to
    # 1e-12 relative (the psi_bin policy), not bitwise
    import pytest as _pt

    assert rows[0]["kl_bin"] == _pt.approx(p0 * math.log(p0 / q0), rel=1e-12)
    assert rows[0]["js_bin"] == _pt.approx(
        (p0 * math.log(p0 / m0) + q0 * math.log(q0 / m0)) / 2.0, rel=1e-12
    )
    s = math.sqrt(p0) - math.sqrt(q0)
    assert rows[0]["hellinger_bin"] == s * s / 2.0
    assert rows[0]["tvd_bin"] == abs(p0 - q0) / 2.0

    # empty-cur bin -> NULL KL, finite JS; empty-ref bin -> zero KL
    ref2 = spark.createDataFrame([(1.0,), (6.0,)], "v double")
    cur2 = spark.createDataFrame([(1.0,)], "v double")
    r2 = {r["bin"]: r for r in divergence_report(
        ref2, cur2, "v", 0.0, 10.0, bins=2).collect()}
    assert r2[1]["kl_bin"] is None and r2[1]["js_bin"] is not None
    ref3 = spark.createDataFrame([(1.0,)], "v double")
    cur3 = spark.createDataFrame([(1.0,), (6.0,)], "v double")
    r3 = {r["bin"]: r for r in divergence_report(
        ref3, cur3, "v", 0.0, 10.0, bins=2).collect()}
    assert r3[1]["kl_bin"] == 0.0 and r3[1]["count_ref"] == 0


def test_conformal_interval_by_groups(spark):
    from bubbles_spark.ops.drift import conformal_interval_by

    # group g: residuals 1..10 (alpha=0.2 -> rank 9); group h: only 2
    # residuals (rank ceil(3*0.8)=3 > 2 -> NULL); group j: absent from
    # calibration entirely -> NULL
    cal = spark.createDataFrame(
        [("g", 0.0, float(r)) for r in range(1, 11)]
        + [("h", 0.0, 1.0), ("h", 0.0, 2.0)],
        "seg string, pred double, label double",
    )
    scored = spark.createDataFrame(
        [("g", 100.0), ("h", 10.0), ("j", 5.0)], "seg string, pred double"
    )
    rows = {r["seg"]: r for r in conformal_interval_by(
        cal, scored, "seg", "pred", "label", alpha=0.2).collect()}
    assert rows["g"]["q_hat"] == 9.0 and rows["g"]["n_cal"] == 10
    assert rows["g"]["pi_lo"] == 91.0 and rows["g"]["pi_hi"] == 109.0
    for seg in ("h", "j"):
        assert rows[seg]["q_hat"] is None and rows[seg]["pi_lo"] is None

    import pytest as _pt
    with _pt.raises(ValueError):
        conformal_interval_by(cal, scored, "seg", "pred", "label", alpha=0.0)


def test_uplift_curve_hand_computed(spark):
    from bubbles_spark.ops.drift import uplift_curve

    # 8 rows, score = 8..1 (id order), alternating treatment; treated
    # high-scorers convert, control never does -> positive uplift
    rows = [
        # id, score, treat, y
        (1, 8.0, 1, 1), (2, 7.0, 0, 0), (3, 6.0, 1, 1), (4, 5.0, 0, 0),
        (5, 4.0, 1, 0), (6, 3.0, 0, 1), (7, 2.0, 1, 0), (8, 1.0, 0, 0),
    ]
    df = spark.createDataFrame(rows, "id long, s double, t int, y int")
    out = {r["bucket"]: r for r in uplift_curve(
        df, "s", "t", "y", "id", n_buckets=4).collect()}
    # buckets of 2 by score desc: (1,2), (3,4), (5,6), (7,8)
    b1 = out[1]
    assert (b1["n_treat"], b1["n_ctrl"]) == (1, 1)
    assert (b1["resp_treat"], b1["resp_ctrl"]) == (1, 0)
    assert b1["cum_uplift"] == 1.0 and b1["qini"] == 1.0
    b3 = out[3]
    assert (b3["cum_n_treat"], b3["cum_n_ctrl"]) == (3, 3)
    assert (b3["cum_resp_treat"], b3["cum_resp_ctrl"]) == (2, 1)
    assert b3["cum_uplift"] == 2.0 / 3.0 - 1.0 / 3.0
    assert b3["qini"] == 2.0 - 1.0 * (3.0 / 3.0)
    # empty-arm degenerate: all rows treated -> NULL ratios
    allt = df.withColumn("t", F.lit(1))
    row = uplift_curve(allt, "s", "t", "y", "id", n_buckets=2).collect()[0]
    assert row["cum_uplift"] is None and row["qini"] is None

    import pytest as _pt
    with _pt.raises(ValueError):
        uplift_curve(df, "s", "t", "y", "id", n_buckets=0)
    with _pt.raises(ValueError):
        uplift_curve(df.filter("id > 99"), "s", "t", "y", "id")


def test_conformal_rank_exact_rational_boundary(spark):
    """n=9, alpha=0.1: IEEE (n+1)*(1-alpha) = 9.000000000000002 would
    ceil to a spurious rank 10 > n (NULL band); the exact rational
    rank is 9 — the largest residual — so the band must be defined."""
    from bubbles_spark.ops.drift import (
        conformal_interval,
        conformal_interval_by,
    )

    cal = spark.createDataFrame(
        [(0.0, float(r)) for r in range(1, 10)], "pred double, label double"
    )  # 9 residuals, exactly 1..9
    scored = spark.createDataFrame([(100.0,)], "pred double")
    row = conformal_interval(cal, scored, "pred", "label", alpha=0.1).collect()[0]
    assert row["q_hat"] == 9.0 and row["n_cal"] == 9
    assert row["pi_lo"] == 91.0 and row["pi_hi"] == 109.0

    calg = cal.withColumn("seg", F.lit("g"))
    scoredg = scored.withColumn("seg", F.lit("g"))
    rowg = conformal_interval_by(
        calg, scoredg, "seg", "pred", "label", alpha=0.1
    ).collect()[0]
    assert rowg["q_hat"] == 9.0 and rowg["n_cal"] == 9
    assert rowg["pi_lo"] == 91.0 and rowg["pi_hi"] == 109.0
