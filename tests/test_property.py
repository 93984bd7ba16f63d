"""Property-based differential tests (hypothesis) — small example
counts because every example runs Spark jobs; the value is the
adversarial shapes hypothesis finds (empty sides, singleton groups,
all-equal keys), not volume.

Set PROP_EXAMPLES=50 (etc.) for an occasional deep fuzz pass — CI
stays fast at the default 8."""

from __future__ import annotations

import os

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bubbles_spark.ops import core

_slow = settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (uid, t, v) rows; t unique per (side, uid) to keep tie semantics
# deterministic in both engines
_rows = st.lists(
    st.tuples(
        st.integers(0, 2),  # uid
        st.integers(0, 50),  # t
        st.integers(-5, 5),  # v
    ),
    max_size=12,
).map(lambda rs: list({(u, t): (u, t, v) for u, t, v in rs}.values()))


@_slow
@given(left=_rows, right=_rows, direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction):
    ldf = spark.createDataFrame(left, "uid long, t long, lv long")
    rdf = spark.createDataFrame(right, "uid long, t long, rv long")
    got = {
        (r["uid"], r["t"]): r["r_rv"]
        for r in core.asof_join(
            ldf, rdf, on="t", by="uid", direction=direction
        ).collect()
    }

    lp = pd.DataFrame(left, columns=["uid", "t", "lv"]).sort_values("t")
    rp = pd.DataFrame(right, columns=["uid", "t", "rv"]).sort_values("t")
    if len(lp) == 0:
        assert got == {}
        return
    if len(rp) == 0:
        expect = {(u, t): None for u, t, _ in left}
    else:
        m = pd.merge_asof(lp, rp, on="t", by="uid", direction=direction)
        expect = {
            (r.uid, r.t): (None if pd.isna(r.rv) else int(r.rv))
            for r in m.itertuples()
        }
    assert got == expect


@_slow
@given(rows=_rows, low=st.integers(-2, 3), span=st.integers(0, 4))
def test_filter_range_partition_property(spark, rows, low, span):
    """keep + discard == total for arbitrary range bounds."""
    if not rows:
        return
    df = spark.createDataFrame(rows, "uid long, t long, v long")
    keep = core.filter_by_range(df, "v", low, low + span).count()
    disc = core.filter_by_range(df, "v", low, low + span, discard=True).count()
    assert keep + disc == df.count()


@_slow
@given(rows=_rows)
def test_distinct_dedup_agreement(spark, rows):
    """distinct-by-key row count == number of distinct keys, and
    duplicates-op surplus accounts for the difference."""
    if not rows:
        return
    df = spark.createDataFrame(rows, "uid long, t long, v long")
    n_keys = len({u for u, _, _ in rows})
    assert core.distinct(df, "uid").count() == n_keys
    dups = core.duplicate_stats(df, "uid").collect()[0]
    assert dups["surplus_record_count"] == df.count() - n_keys


_docs = st.lists(
    st.tuples(
        st.integers(0, 20),                       # doc id (dups possible pre-dedup)
        st.sampled_from(["a", "b"]),              # source
        st.lists(st.sampled_from("xyz"), max_size=6).map(" ".join),
    ),
    max_size=12,
).map(lambda rs: [(i, s, t) for i, (_, s, t) in enumerate(rs)])  # unique ids


@_slow
@given(docs=_docs, max_tokens=st.integers(1, 8))
def test_pack_sequences_matches_greedy(spark, docs, max_tokens):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r["seq_id"]
        for r in textprep.pack_sequences(df, max_tokens).collect()
    }
    expect = {}
    for src in {s for _, s, _ in docs}:
        prefix = 0
        for i, s, t in sorted(docs):
            if s != src:
                continue
            ntok = len(t.split()) if t.strip() else 0
            expect[i] = prefix // max_tokens
            prefix += ntok
    assert got == expect


@_slow
@given(
    vals=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=20),
    bins=st.integers(1, 5),
)
def test_histogram_matches_numpy_convention(spark, vals, bins):
    import math

    from bubbles_spark.ops import reshape

    lo, hi = -100.0, 100.0
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["x"]: r["bin"] for r in reshape.histogram(df, "x", lo, hi, bins).collect()}
    width = (hi - lo) / bins
    for v in vals:
        if v == hi:
            expect = bins - 1
        elif v < lo:
            expect = -1
        elif v >= hi:
            expect = bins
        else:
            expect = int(math.floor((v - lo) / width))
        assert got[v] == expect, (v, got[v], expect)


@_slow
@given(
    rows=st.lists(
        st.tuples(st.sampled_from("pq"), st.integers(-50, 50)), max_size=14
    )
)
def test_zscore_matches_pandas(spark, rows):
    import math

    from bubbles_spark.ops import reshape

    data = [(i, g, float(v)) for i, (g, v) in enumerate(rows)]
    if not data:
        return
    df = spark.createDataFrame(data, "i long, g string, x double")
    got = {r["i"]: r["x_z"] for r in reshape.zscore_normalize(df, "x", by="g").collect()}
    pdf = pd.DataFrame(data, columns=["i", "g", "x"])
    for g, grp in pdf.groupby("g"):
        sd = grp["x"].std(ddof=1)
        for _, r in grp.iterrows():
            if pd.isna(sd) or sd == 0:
                assert got[r["i"]] is None
            else:
                assert got[r["i"]] is not None
                assert math.isclose(got[r["i"]], (r["x"] - grp["x"].mean()) / sd, rel_tol=1e-9, abs_tol=1e-12)


_scd_rows = st.lists(
    st.tuples(st.integers(0, 4), st.sampled_from(["a", "b", "c"])), max_size=8
).map(lambda rs: list({k: (k, v) for k, v in rs}.values()))  # unique keys


@_slow
@given(dim0=_scd_rows, snap=_scd_rows)
def test_scd2_merge_matches_brute_force(spark, dim0, snap):
    import datetime as dt

    from bubbles_spark.ops import core

    t0, t1 = dt.date(2020, 1, 1), dt.date(2021, 1, 1)
    dim = spark.createDataFrame(
        [(k, v, t0, None, True) for k, v in dim0],
        "k long, attr string, valid_from date, valid_to date, is_current boolean",
    )
    sdf = spark.createDataFrame(snap or [(99, "z")], "k long, attr string")
    if not snap:
        sdf = sdf.limit(0)
    got = {tuple(r) for r in core.scd2_merge(dim, sdf, "k", ["attr"], t1).collect()}

    cur = dict(dim0)
    new = dict(snap)
    expect = set()
    for k, v in cur.items():
        if k in new and new[k] == v:
            expect.add((k, v, t0, None, True))          # unchanged
        else:
            expect.add((k, v, t0, t1, False))           # changed or gone → closed
            if k in new:
                expect.add((k, new[k], t1, None, True)) # new version
    for k, v in new.items():
        if k not in cur:
            expect.add((k, v, t1, None, True))          # brand new
    assert got == expect


@_slow
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["p", "q", "r", "s"]), min_size=1, max_size=4),
        max_size=6,
    )
)
def test_paragraph_dedup_matches_brute_force(spark, docs):
    from bubbles_spark.ops import textprep

    sep = "\n\n"
    rows = [(i, sep.join(ps)) for i, ps in enumerate(docs)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in textprep.paragraph_dedup(df).collect()}

    seen = set()
    expect = {}
    for i, ps in enumerate(docs):
        kept = []
        for p in ps:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        expect[i] = sep.join(kept)
    assert got == expect


@_slow
@given(
    left=_rows,
    right=_rows,
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.integers(0, 10),
)
def test_asof_tolerance_matches_pandas(spark, left, right, direction, tol):
    """tolerance_seconds mirrors pandas merge_asof(tolerance=...):
    matches farther than the window are nulled, rows kept."""
    ldf = spark.createDataFrame(left, "uid long, t long, lv long")
    rdf = spark.createDataFrame(right, "uid long, t long, rv long")
    got = {
        (r["uid"], r["t"]): r["r_rv"]
        for r in core.asof_join(
            ldf, rdf, on="t", by="uid", direction=direction,
            tolerance_seconds=float(tol),
        ).collect()
    }
    lp = pd.DataFrame(left, columns=["uid", "t", "lv"]).sort_values("t")
    rp = pd.DataFrame(right, columns=["uid", "t", "rv"]).sort_values("t")
    if len(lp) == 0:
        assert got == {}
        return
    if len(rp) == 0:
        expect = {(u, t): None for u, t, _ in left}
    else:
        m = pd.merge_asof(
            lp, rp, on="t", by="uid", direction=direction, tolerance=tol
        )
        expect = {
            (r.uid, r.t): (None if pd.isna(r.rv) else int(r.rv))
            for r in m.itertuples()
        }
    assert got == expect


@_slow
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)),  # (user, ts seconds)
        max_size=20,
    ).map(lambda rs: list({(u, t) for u, t in rs})),
    gap_minutes=st.floats(0.5, 5.0),
)
def test_sessionize_matches_python_reference(spark, events, gap_minutes):
    """Gap-and-island session ids match a brute-force single-threaded
    pass (the reference-style iterator semantics sessionize re-expresses
    as one window per user)."""
    import datetime as dt

    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t)) for u, t in events
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    from bubbles_spark.ops.events import sessionize

    got = {
        (r["uid"], r["ts"]): r["session_id"]
        for r in sessionize(df, "ts", "uid", gap_minutes).collect()
    }

    gap_s = gap_minutes * 60.0
    expect = {}
    by_user: dict[int, list] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        sid, prev = 0, None
        for ts in sorted(tss):
            if prev is None or (ts - prev).total_seconds() >= gap_s:
                sid += 1
            expect[(u, ts)] = sid
            prev = ts
    assert got == expect


@_slow
@given(
    sigs=st.lists(st.integers(-(2**63), 2**63 - 1), max_size=10, unique=True),
    max_hamming=st.integers(0, 8),
    bands=st.sampled_from([1, 2, 4, 8]),
)
def test_hamming_pairs_matches_brute_force(spark, sigs, max_hamming, bands):
    """The banded pigeonhole join finds EXACTLY the brute-force pair
    set whenever the guarantee holds (hamming <= bands-1 … relaxed:
    banding may legitimately MISS pairs above the pigeonhole bound, so
    assert equality only when bands > max_hamming, and soundness —
    no false pairs — always)."""
    from bubbles_spark.ops import dedup

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "id long, sig long"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.hamming_pairs(
            df, "id", "sig", max_hamming=max_hamming, bands=bands
        ).collect()
    }
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    truth = {
        (i, j): ham(a, b)
        for i, a in enumerate(sigs)
        for j, b in enumerate(sigs)
        if i < j and ham(a, b) <= max_hamming
    }
    for pair, h in got.items():
        assert truth.get(pair) == h  # soundness: every reported pair real
    if bands > max_hamming:
        assert got == truth          # completeness under pigeonhole


@_slow
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), max_size=20
    ),
)
def test_zorder_key_locality_and_determinism(spark, pts):
    """Morton keys are deterministic, and equal cells get equal keys."""
    from bubbles_spark.ops import layout

    if not pts:
        return
    df = spark.createDataFrame(pts, "x long, y long")
    b = {"x": (0, 16), "y": (0, 16)}
    k1 = [r.z for r in df.withColumn(
        "z", layout.zorder_key(df, ["x", "y"], bits=4, bounds=b)).collect()]
    k2 = [r.z for r in df.withColumn(
        "z", layout.zorder_key(df, ["x", "y"], bits=4, bounds=b)).collect()]
    assert k1 == k2
    by_pt = {}
    for (x, y), z in zip(pts, k1):
        by_pt.setdefault((x, y), set()).add(z)
    assert all(len(zs) == 1 for zs in by_pt.values())


@_slow
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 2),           # user
            st.integers(0, 30),          # ts minute
            st.sampled_from(["a", "b", "c"]),
        ),
        max_size=16,
    ),
    within=st.sampled_from([None, 300.0, 600.0]),
)
def test_funnel_matches_python_reference(spark, events, within):
    """Batch funnel == a direct python implementation of the
    first-touch stepwise-min definition."""
    from bubbles_spark.ops import events as ev

    rows = [
        (i, f"2024-01-01 10:{t:02d}:00", u, s)
        for i, (u, t, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    )
    steps = ["a", "b", "c"]
    got = {
        r.step: r.users
        for r in ev.funnel(df, steps, within_seconds=within).collect()
    }

    import datetime as dt

    by_user: dict = {}
    for _i, (u, t, s) in enumerate(events):
        by_user.setdefault(u, []).append(
            (dt.datetime(2024, 1, 1, 10, t), steps.index(s))
        )
    counts = [0, 0, 0]
    for u, evs in by_user.items():
        times: list = []
        for ts, si in sorted(evs):
            if si != len(times) or len(times) >= 3:
                continue
            if times and not ts > times[-1]:
                continue
            if (
                within is not None
                and times
                and (ts - times[0]).total_seconds() > within
            ):
                continue
            times.append(ts)
        for i in range(len(times)):
            counts[i] += 1
    assert got == {i: counts[i] for i in range(3)}


# messy URL generator: optional scheme-case, www, default/explicit
# port, path, tracking + real params in random order, fragment
_url_parts = st.tuples(
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.booleans(),  # www
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/a", "/a/b", "/a/"]),
    st.lists(
        st.sampled_from(
            ["utm_source=x", "utm_b=2", "gclid=g", "id=3", "q=spark", "ref=r"]
        ),
        max_size=4,
        unique=True,
    ),
    st.sampled_from(["", "#frag", "#x/y?z"]),
)


def _mk_url(parts):
    scheme, www, port, path, params, frag = parts
    host = ("WWW." if www else "") + "Example.COM"
    q = ("?" + "&".join(params)) if params else ""
    return f"{scheme}://{host}{port}{path}{q}{frag}"


@_slow
@given(parts=st.lists(_url_parts, min_size=1, max_size=6))
def test_canonicalize_url_idempotent(spark, parts):
    from bubbles_spark.ops import textprep

    urls = [(i, _mk_url(p)) for i, p in enumerate(parts)]
    df = spark.createDataFrame(urls, "id long, url string")
    once = textprep.canonicalize_url(df).collect()
    twice = textprep.canonicalize_url(
        textprep.canonicalize_url(df)
    ).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))
    for r in once:
        u = r["url"]
        assert "#" not in u
        assert "utm_" not in u and "gclid" not in u
        assert not u.endswith("?") and not u.endswith("&") and not u.endswith("/")
        assert "://www." not in u
        # default ports strip only for THEIR scheme (:80 on https is
        # a real non-default port and must survive)
        bare = u.replace(":8080", "")
        if u.startswith("http://"):
            assert ":80" not in bare
        if u.startswith("https://"):
            assert ":443" not in bare


@_slow
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab <>&;!/\"'=xyz\n")), max_size=60
        ),
        min_size=1,
        max_size=5,
    )
)
def test_html_to_text_never_leaves_complete_tags(spark, texts):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    for r in textprep.html_to_text(df).collect():
        t = r["text"] or ""
        # no complete <...> tag can survive the strip chain
        import re

        assert not re.search(r"<[^<>]*>", t), (t,)
        assert t == t.strip()


# --- WARC byte-range split ownership (pure Python, no Spark) ----------

_warc_bodies = st.lists(
    st.binary(min_size=0, max_size=120).filter(
        # a payload embedding the boundary anchor is the DOCUMENTED
        # heuristic limitation of split alignment — excluded here
        lambda b: b"\r\n\r\nWARC/" not in b
    ),
    min_size=1,
    max_size=12,
)


@_slow
@given(bodies=_warc_bodies, nsplits=st.integers(1, 7), data=st.data())
def test_warc_split_ownership_partition(bodies, nsplits, data):
    """For ANY archive and ANY split boundaries, every record is
    yielded by exactly one split (the one whose [start, end) contains
    its header start) and the concatenation equals the whole-stream
    parse."""
    import io

    from bubbles_spark import warc as bw

    recs = []
    for i, body in enumerate(bodies):
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: r{i}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        recs.append(head + body + b"\r\n\r\n")
    archive = b"".join(recs)
    whole = [
        r["headers"]["warc-record-id"]
        for r in bw.parse_warc_stream(io.BytesIO(archive))
    ]
    assert whole == [f"r{i}" for i in range(len(bodies))]

    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(1, max(1, len(archive) - 1)),
                min_size=nsplits - 1,
                max_size=nsplits - 1,
                unique=True,
            )
        )
    )
    bounds = [0, *cuts, len(archive)]
    got = []
    for s, e in zip(bounds, bounds[1:]):
        pos = max(0, s - len(bw._ANCHOR))
        fh = io.BytesIO(archive)
        fh.seek(pos)
        got.extend(
            r["headers"]["warc-record-id"]
            for r in bw.parse_warc_range(fh, pos, s, e)
        )
    assert got == whole


_word = st.sampled_from(["ant", "bee", "cat", "dog", "elk", "fox"])
_doc_texts = st.lists(
    st.lists(_word, min_size=0, max_size=8).map(" ".join),
    min_size=0,
    max_size=8,
)


@_slow
@given(texts=_doc_texts, threshold=st.sampled_from([0.2, 0.34, 0.5, 0.75, 1.0]))
def test_prefix_jaccard_lossless_property(spark, texts, threshold):
    """The prefix filter must be LOSSLESS: for any corpus and any
    threshold, prefix_jaccard_pairs equals a brute-force exact
    Jaccard over distinct unigram sets (subsuming the uncapped
    inverted-index join)."""
    import itertools

    from bubbles_spark.ops import dedup

    rows = list(enumerate(texts))
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.prefix_jaccard_pairs(
            df, n=1, threshold=threshold
        ).collect()
    }
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        sa, sb = set(ta.lower().split()), set(tb.lower().split())
        if not sa or not sb:
            continue
        jac = round(len(sa & sb) / len(sa | sb), 6)
        if jac >= threshold:
            want[(ia, ib)] = jac
    assert got == want


_pvals = st.lists(
    st.integers(1, 1000), min_size=1, max_size=12
).map(lambda xs: [x / 1000.0 for x in xs])


@_slow
@given(ps=_pvals, alpha=st.sampled_from([0.01, 0.05, 0.2]))
def test_fdr_methods_ordering_properties(spark, ps, alpha):
    """Classical dominance invariants on ANY p-value table:
    bonferroni-rejected ⊆ holm-rejected ⊆ bh-rejected, every
    adjusted p is >= its raw p and <= 1, and the adjusted-p
    envelopes are monotone along the rank order."""
    from bubbles_spark.ops.stattests import fdr_correct

    df = spark.createDataFrame(
        [(str(i), p) for i, p in enumerate(ps)], "id string, p double"
    )
    res = {
        m: {r["id"]: r for r in fdr_correct(df, "p", "id", alpha, m).collect()}
        for m in ("bonferroni", "holm", "bh")
    }
    bon = {k for k, r in res["bonferroni"].items() if r["rejected"]}
    holm = {k for k, r in res["holm"].items() if r["rejected"]}
    bh = {k for k, r in res["bh"].items() if r["rejected"]}
    assert bon <= holm <= bh
    for m, rows in res.items():
        by_rank = sorted(rows.values(), key=lambda r: r["rank"])
        for r in by_rank:
            assert r["p"] - 1e-15 <= r["p_adj"] <= 1.0
        adj = [r["p_adj"] for r in by_rank]
        if m in ("bh", "holm"):
            assert adj == sorted(adj)  # monotone envelopes


@_slow
@given(
    pairs=st.lists(
        st.tuples(st.integers(-20, 20), st.integers(-20, 20)),
        min_size=2,
        max_size=15,
    )
)
def test_spearman_bounds_and_monotone_invariance(spark, pairs):
    """rho ∈ [-1, 1] (or NULL on zero rank variance), is invariant
    under strictly monotone transforms of either column, and equals
    +1 on any strictly co-monotone tie-free sample."""
    from bubbles_spark.ops.stattests import spearman_corr

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pairs], "x double, y double"
    )
    rho = spearman_corr(df, "x", "y").collect()[0]["rho"]
    if rho is not None:
        assert -1.0 - 1e-12 <= rho <= 1.0 + 1e-12
    # strictly monotone transform of x: rank structure unchanged
    df2 = df.selectExpr("CAST(x * 3 + 100 AS DOUBLE) AS x", "y")
    assert spearman_corr(df2, "x", "y").collect()[0]["rho"] == rho
    # co-monotone tie-free -> exactly 1
    xs = sorted({x for x, _ in pairs})
    if len(xs) >= 2:
        mono = spark.createDataFrame(
            [(float(x), float(i)) for i, x in enumerate(xs)],
            "x double, y double",
        )
        assert spearman_corr(mono, "x", "y").collect()[0]["rho"] == 1.0


@_slow
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), st.booleans()),  # (duration, event)
        min_size=1,
        max_size=14,
    )
)
def test_nelson_aalen_matches_python_reference(spark, rows):
    import math

    from bubbles_spark.ops.insights import nelson_aalen

    df = spark.createDataFrame(
        [(t, int(e)) for t, e in rows], "t int, ev int"
    )
    got = {r["t"]: r for r in nelson_aalen(df, "t", "ev").collect()}
    # python reference on the same definition
    from collections import Counter
    d = Counter(t for t, e in rows if e)
    c = Counter(t for t, e in rows if not e)
    ts = sorted(set(d) | set(c))
    at_risk = len(rows)
    cum_h = 0
    up = 1e12
    for t in ts:
        hq = math.floor(d[t] / at_risk * up)
        cum_h += hq
        assert got[t]["n_risk"] == at_risk
        assert got[t]["n_event"] == d[t]
        assert got[t]["hazard_q"] == hq
        assert got[t]["cum_hazard"] == cum_h / up
        at_risk -= d[t] + c[t]


_series = st.lists(st.integers(-5, 9), min_size=0, max_size=14)


@_slow
@given(vals=_series)
def test_cusum_alarms_matches_recurrence_property(spark, vals):
    from bubbles_spark.ops import events

    rows = [("k", i, float(v)) for i, v in enumerate(vals)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "k string, ts int, value double")
    got = [
        (r["cusum_pos"], r["cusum_neg"])
        for r in events.cusum_alarms(
            df, "k", "ts", "value", target=2.0, allowance=0.5, threshold=4.0
        ).orderBy("ts").collect()
    ]
    sp = sn = 0.0
    for v, (gp, gn) in zip(vals, got):
        sp = max(0.0, sp + v - 2.5)
        sn = max(0.0, sn + 1.5 - v)
        assert gp == sp and gn == sn


@_slow
@given(pairs=st.lists(
    st.tuples(st.integers(-4, 4), st.integers(-4, 4)), max_size=14
))
def test_wilcoxon_matches_python_reference(spark, pairs):
    import math
    from collections import Counter

    from bubbles_spark.ops import stattests

    rows = [(float(a), float(b)) for a, b in pairs]
    if not rows:
        return
    df = spark.createDataFrame(rows, "a double, b double")
    out = stattests.wilcoxon_signed_rank(df, "a", "b").collect()[0]
    ds = [a - b for a, b in rows if a != b]
    n = len(ds)
    assert out["n"] == n
    if n == 0:
        assert out["z"] is None
        return
    cnt = Counter(abs(d) for d in ds)
    cum = 0
    rank = {}
    for v in sorted(cnt):
        rank[v] = (2 * cum + cnt[v] + 1) / 2
        cum += cnt[v]
    w = sum(rank[abs(d)] for d in ds if d > 0)
    assert out["w2_plus"] == int(2 * w)
    tie3 = sum(c ** 3 - c for c in cnt.values())
    var = n * (n + 1) * (2 * n + 1) / 24 - tie3 / 48
    if var > 0:
        assert abs(out["z"] - (w - n * (n + 1) / 4) / math.sqrt(var)) < 1e-9
    else:
        assert out["z"] is None


@_slow
@given(rows=st.lists(
    st.tuples(st.integers(0, 2), st.integers(-4, 6)), max_size=16
))
def test_jonckheere_matches_bruteforce_property(spark, rows):
    import itertools
    from collections import Counter, defaultdict

    from bubbles_spark.ops import stattests

    data = [(f"g{g}", float(v)) for g, v in rows]
    if not data:
        return
    df = spark.createDataFrame(data, "g string, v double")
    out = stattests.jonckheere_terpstra(df, "g", "v").collect()[0]
    groups = defaultdict(list)
    for g, v in data:
        groups[g].append(v)
    names = sorted(groups)
    j2 = 0
    for gi, gj in itertools.combinations(names, 2):
        for x in groups[gi]:
            for y in groups[gj]:
                j2 += 2 if x < y else (1 if x == y else 0)
    assert out["j2"] == j2
    assert out["k"] == len(names) and out["n"] == len(data)
    # z NULL exactly when variance degenerates
    tv = Counter(v for g, v in data)
    if out["k"] < 2 or out["n"] <= 2 or max(tv.values()) == len(data):
        assert out["z"] is None


@_slow
@given(votes=st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 2)), max_size=16
))
def test_krippendorff_matches_python_reference(spark, votes):
    from collections import Counter, defaultdict

    from bubbles_spark.ops import stattests

    data = [(u, f"c{c}") for u, c in votes]
    if not data:
        return
    df = spark.createDataFrame(data, "u int, l string")
    out = stattests.krippendorff_alpha(df, "u", "l").collect()[0]
    units = defaultdict(list)
    for u, c in data:
        units[u].append(c)
    pair = {u: ls for u, ls in units.items() if len(ls) >= 2}
    assert out["n_units"] == len(pair)
    if not pair:
        assert out["alpha"] is None
        return
    n = sum(len(ls) for ls in pair.values())
    d_o = sum(
        (len(ls) ** 2 - sum(c * c for c in Counter(ls).values()))
        / (len(ls) - 1)
        for ls in pair.values()
    ) / n
    nc = Counter(c for ls in pair.values() for c in ls)
    d_e = (n * n - sum(v * v for v in nc.values())) / (n * (n - 1))
    assert abs(out["d_o"] - d_o) < 1e-5
    if d_e > 0:
        assert abs(out["alpha"] - (1 - d_o / d_e)) < 1e-4
    else:
        assert out["alpha"] is None
