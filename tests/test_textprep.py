"""Text-cleaning operator unit tests (tiny fixtures)."""

import pytest

from bubbles_spark.ops import textprep


def test_pii_mask_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.com ssn 123-45-6789 tel +555-123-4567 ip 10.0.0.1 ok")],
        "id long, text string",
    )
    out = textprep.pii_mask(df).collect()[0]["text"]
    assert out == "mail <EMAIL> ssn <SSN> tel <PHONE> ip <IP> ok"


def test_pii_mask_order_ssn_before_phone(spark):
    # an SSN must not be half-eaten by the phone pattern
    df = spark.createDataFrame([(1, "078-05-1120")], "id long, text string")
    assert textprep.pii_mask(df).collect()[0]["text"] == "<SSN>"


def test_pii_mask_unknown_kind(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        textprep.pii_mask(df, kinds=("dna",))


def test_extract_urls_and_dedup(spark):
    df = spark.createDataFrame(
        [
            (1, "see http://a.com/x and https://b.org/y end"),
            (2, "again http://a.com/x here"),
            (3, "no links"),
        ],
        "doc_id long, text string",
    )
    urls = textprep.extract_urls(df)
    got = {(r["doc_id"], r["url"], r["domain"]) for r in urls.collect()}
    assert got == {
        (1, "http://a.com/x", "a.com"),
        (1, "https://b.org/y", "b.org"),
        (2, "http://a.com/x", "a.com"),
    }
    deduped = {(r["url"], r["doc_id"]) for r in textprep.url_dedup(urls).collect()}
    assert deduped == {("http://a.com/x", 1), ("https://b.org/y", 1)}


def test_repetition_ratio(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # bigrams: ab ba ab ba ab → 2 distinct of 5
            (2, "all words differ here now"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["repetition_ratio"]
           for r in textprep.repetition_ratio(df, n=2).collect()}
    assert abs(got[1] - (1 - 2 / 5)) < 1e-6
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_repetition_ratio_unigram(spark):
    df = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    got = textprep.repetition_ratio(df, n=1).collect()[0]["repetition_ratio"]
    assert abs(got - (1 - 2 / 3)) < 1e-6


def test_paragraph_dedup_keeps_first_occurrence(spark):
    sep = "\n\n"
    df = spark.createDataFrame(
        [
            (1, sep.join(["one", "COMMON", "two"])),
            (2, sep.join(["COMMON", "three"])),
            (3, "COMMON"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in textprep.paragraph_dedup(df).collect()}
    assert got[1] == sep.join(["one", "COMMON", "two"])   # first occurrence kept
    assert got[2] == "three"                              # COMMON dropped
    assert got[3] == ""                                   # fully-duplicate doc → empty


def test_decontaminate_flags_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally clean document with safe words"),
            (3, "prefix alpha beta gamma delta epsilon suffix"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "text string"
    )
    got = {r["doc_id"]: r["contaminated"]
           for r in textprep.decontaminate(docs, bench, n=5).collect()}
    assert got == {1: True, 2: False, 3: True}


def test_shuffle_rows_deterministic_permutation(spark):
    from pyspark.sql import functions as F

    df = spark.range(500).select("id", (F.col("id") * 3).alias("v"))
    a = [tuple(r) for r in textprep.shuffle_rows(df, seed=7).collect()]
    b = [tuple(r) for r in textprep.shuffle_rows(df, seed=7).collect()]
    c = [tuple(r) for r in textprep.shuffle_rows(df, seed=8).collect()]
    assert a == b                         # same seed -> same permutation
    assert sorted(a) == sorted(c)         # multiset preserved
    assert a != c                         # different seed -> different order
    assert a != sorted(a)                 # actually shuffled


def test_pack_sequences_greedy_bins(spark):
    rows = [(i, "g", " ".join(["w"] * 40)) for i in range(10)]  # 40 tokens each
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["seq_id"] for r in textprep.pack_sequences(df, 100).collect()}
    # prefix-exclusive tokens: 0,40,80,...,360 -> bins 0,0,0,1,1,2,2,2,3,3
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}


# --- normalize_text ---------------------------------------------------


def test_normalize_text_default(spark):
    df = spark.createDataFrame(
        [(1, "  Hello\t WORLD \n twice  ")], "id long, text string"
    )
    out = textprep.normalize_text(df).collect()[0]["text"]
    assert out == "hello world twice"


def test_normalize_text_punct_and_ascii(spark):
    df = spark.createDataFrame(
        [(1, "A, b! c? éé end.")], "id long, text string"
    )
    out = textprep.normalize_text(df, strip_punct=True, ascii_only=True).collect()[0][
        "text"
    ]
    assert out == "a b c end"


def test_normalize_text_strip_control(spark):
    df = spark.createDataFrame([(1, "a\x00b\x1fc")], "id long, text string")
    assert textprep.normalize_text(df).collect()[0]["text"] == "abc"


# --- chunk_documents --------------------------------------------------


def test_chunk_documents_offsets(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk"])
        for r in textprep.chunk_documents(df, chunk_size=4, overlap=1).collect()
    )
    # step 3: offsets 0,3,6 -> abcd, defg, ghij  (ceil((10-1)/3)=3 chunks)
    assert rows == [(0, "abcd"), (1, "defg"), (2, "ghij")]


def test_chunk_documents_short_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {(r["doc_id"], r["chunk_id"], r["chunk"])
            for r in textprep.chunk_documents(df, chunk_size=10).collect()}
    assert rows == {(1, 0, "ab"), (2, 0, ""), (3, 0, "")}


def test_chunk_documents_reconstruction(spark):
    # dropping each chunk's overlap prefix and concatenating restores
    # the document exactly
    text = "the quick brown fox jumps over the lazy dog" * 3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        (r["chunk_id"], r["chunk"])
        for r in textprep.chunk_documents(df, chunk_size=37, overlap=9).collect()
    )
    rebuilt = chunks[0][1] + "".join(c[9:] for _, c in chunks[1:])
    assert rebuilt == text


def test_chunk_documents_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textprep.chunk_documents(df, chunk_size=5, overlap=5)


# --- mixture_sample ---------------------------------------------------


def _mix_fixture(spark):
    rows = [(i, "tok " * (i % 7 + 1), "s%d" % (i % 3)) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_mixture_sample_budget_and_drop(spark):
    df = _mix_fixture(spark)
    out = textprep.mixture_sample(df, {"s0": 20, "s1": 5})
    got = out.collect()
    assert {r["source"] for r in got} <= {"s0", "s1"}  # s2 dropped
    # overflow rule: every admitted doc STARTS under budget, so the
    # pre-admission token sum per source stays below the budget
    from collections import defaultdict

    by_src = defaultdict(list)
    for r in got:
        by_src[r["source"]].append(len(r["text"].split()))
    budgets = {"s0": 20, "s1": 5}
    for src, toks in by_src.items():
        # admitted iff tokens-before-it < budget, so total admitted
        # tokens < budget + the largest single doc (order-free bound)
        assert len(toks) >= 1
        assert sum(toks) < budgets[src] + max(toks)


def test_mixture_sample_deterministic(spark):
    df = _mix_fixture(spark)
    a = {r["doc_id"] for r in textprep.mixture_sample(df, {"s0": 25}).collect()}
    b = {r["doc_id"] for r in textprep.mixture_sample(df, {"s0": 25}).collect()}
    assert a == b and len(a) >= 1
    # a different seed reorders the md5 admission order; it must run
    # and respect the same budget machinery (set may or may not differ)
    c = {r["doc_id"] for r in textprep.mixture_sample(df, {"s0": 25}, seed="x").collect()}
    assert len(c) >= 1


def test_domain_filter_modes(spark):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [
            (1, "go to http://bad.example/x now"),
            (2, "see https://ok.org/page"),
            (3, "both http://bad.example/y and https://ok.org/z"),
            (4, "no links at all"),
        ],
        "doc_id long, text string",
    )
    kept = textprep.domain_filter(df, ["bad.example"])
    assert {r["doc_id"] for r in kept.collect()} == {2, 4}
    only = textprep.domain_filter(df, ["bad.example"], mode="keep")
    assert {r["doc_id"] for r in only.collect()} == {1, 3}
    # DataFrame blocklist works too
    bl = spark.createDataFrame([("ok.org",)], "d string")
    assert {
        r["doc_id"] for r in textprep.domain_filter(df, bl).collect()
    } == {1, 4}
    import pytest

    with pytest.raises(ValueError):
        textprep.domain_filter(df, ["x"], mode="nope")


# --- duplicated_spans / top_duplicated_spans --------------------------


def test_duplicated_spans_basic(spark):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),     # spans(3): abc bcd cde def
            (2, "a b c x y z"),     # spans: abc bcx cxy xyz -> shares abc
            (3, "p q r s"),         # spans: pqr qrs -> unique
            (4, "a b"),             # too short: excluded
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["total_spans"], r["dup_spans"], r["dup_fraction"])
        for r in textprep.duplicated_spans(df, span_words=3).collect()
    }
    assert out == {
        1: (4, 1, 0.25),
        2: (4, 1, 0.25),
        3: (2, 0, 0.0),
    }


def test_duplicated_spans_within_doc_repeat_not_dup(spark):
    from bubbles_spark.ops import textprep

    # the same span repeated WITHIN one doc is not a cross-doc dup
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y z w v u")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["dup_spans"]
        for r in textprep.duplicated_spans(df, span_words=3).collect()
    }
    assert out == {1: 0, 2: 0}


def test_top_duplicated_spans(spark):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "a b c f"), (4, "b c d g")],
        "doc_id long, text string",
    )
    rows = textprep.top_duplicated_spans(df, span_words=3, k=5).collect()
    assert [(r["span"], r["doc_freq"]) for r in rows] == [("a b c", 3), ("b c d", 2)]


def test_duplicated_spans_lowercase_flag(spark):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [(1, "A b C d"), (2, "a B c e")],
        "doc_id long, text string",
    )
    cs = textprep.duplicated_spans(df, span_words=3)
    ci = textprep.duplicated_spans(df, span_words=3, lowercase=True)
    assert sum(r["dup_spans"] for r in cs.collect()) == 0
    assert sum(r["dup_spans"] for r in ci.collect()) == 2


# --- remove_duplicated_spans ------------------------------------------


def test_remove_duplicated_spans_basic(spark):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),      # winner: keeps text verbatim
            (2, "x a b c y"),      # loses "a b c" -> "x y"
            (3, "p q r s t"),      # untouched
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in textprep.remove_duplicated_spans(df, span_words=3).collect()
    }
    assert out[1] == ("a b c d e", 0)
    assert out[2] == ("x y", 3)
    assert out[3] == ("p q r s t", 0)


def test_remove_duplicated_spans_overlap_merges(spark):
    from bubbles_spark.ops import textprep

    # doc2 shares two overlapping spans ("a b c", "b c d") -> coverage
    # is the union {a b c d}, not 6 tokens
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "z a b c d z2")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in textprep.remove_duplicated_spans(df, span_words=3).collect()
    }
    assert out[1] == ("a b c d", 0)
    assert out[2] == ("z z2", 4)


def test_remove_duplicated_spans_full_coverage_empties(spark):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in textprep.remove_duplicated_spans(df, span_words=3).collect()
    }
    assert out[1] == ("a b c", 0)
    assert out[2] == ("", 3)


def test_remove_duplicated_spans_untouched_keeps_raw_whitespace(spark):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [(1, "  spaced   out  "), (2, "unrelated words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"]
           for r in textprep.remove_duplicated_spans(df, span_words=3).collect()}
    assert out[1] == "  spaced   out  "  # untouched docs stay verbatim


def test_remove_duplicated_spans_per_doc_coverage_isolated(spark):
    from bubbles_spark.ops import textprep

    # REGRESSION (ambiguous self-join): two losing docs with different
    # covered positions — doc2 must NOT lose tokens at positions that
    # are only covered in doc3, and vice versa
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c x1 x2"),   # loses pos 0-2 only
            (3, "y1 c d e y2"),   # loses pos 1-3 only
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in textprep.remove_duplicated_spans(df, span_words=3).collect()
    }
    assert out[1] == ("a b c d e", 0)
    assert out[2] == ("x1 x2", 3)
    assert out[3] == ("y1 y2", 3)


def _clean(spark, html):
    df = spark.createDataFrame([(1, html)], "id long, text string")
    return textprep.html_to_text(df).collect()[0]["text"]


def test_html_to_text_basic_page(spark):
    html = (
        "<html><head><style>b{c:d}</style><script>if(1<2){x()}</script>"
        "</head><body><h1>Title</h1><p>alpha <b>beta</b> gamma</p>"
        "<div>second</div></body></html>"
    )
    assert _clean(spark, html) == "Title\nalpha beta gamma\nsecond"


def test_html_to_text_entities_single_level(spark):
    # one decode level only: &amp;lt; -> &lt;, never <
    assert _clean(spark, "a &amp; b &lt;tag&gt; &amp;lt;x&amp;gt; &quot;q&quot;") == (
        'a & b <tag> &lt;x&gt; "q"'
    )


def test_html_to_text_script_content_removed_not_just_tags(spark):
    out = _clean(spark, "keep<script type='x'>var secret = 1 < 2;</script>this")
    assert out == "keep this"
    assert "secret" not in out


def test_html_to_text_comment_and_br(spark):
    assert _clean(spark, "a<!-- note\nspanning -->b<br>c<br/>d") == "a b\nc\nd"


def test_html_to_text_whitespace_collapse(spark):
    html = "<p>a    b</p>\n\n\n\n<p>  c\t d  </p>"
    assert _clean(spark, html) == "a b\n\nc d"


def test_html_to_text_inline_tags_do_not_glue_words(spark):
    assert _clean(spark, "one<span>two</span>three") == "one two three"


def test_html_to_text_malformed_unclosed_tag_backstop(spark):
    # unclosed <em never matches <[^>]*> … text after it survives as-is
    assert _clean(spark, "x <em broken y") == "x <em broken y"


def _canon(spark, url):
    df = spark.createDataFrame([(1, url)], "id long, url string")
    return textprep.canonicalize_url(df).collect()[0]["url"]


def test_canonicalize_url_host_scheme_port_www(spark):
    assert _canon(spark, "HTTP://WWW.Example.COM:80/Path/Stuff") == (
        "http://example.com/Path/Stuff"
    )
    assert _canon(spark, "https://Site.org:443/") == "https://site.org"
    # non-default port survives
    assert _canon(spark, "http://a.com:8080/x") == "http://a.com:8080/x"


def test_canonicalize_url_tracking_params(spark):
    assert _canon(spark, "http://a.com/p?utm_source=x&id=3") == "http://a.com/p?id=3"
    assert _canon(spark, "http://a.com/p?id=3&utm_source=x") == "http://a.com/p?id=3"
    assert _canon(spark, "http://a.com/p?utm_a=1&utm_b=2") == "http://a.com/p"
    assert _canon(spark, "http://a.com/p?gclid=zz") == "http://a.com/p"


def test_canonicalize_url_ref_kept_by_default(spark):
    # `ref` carries real semantics on many sites (?ref=<branch> on
    # code hosts) — stripping it by default would merge distinct URLs
    assert _canon(spark, "http://a.com/repo?ref=main") == "http://a.com/repo?ref=main"
    # opt-in via extra_params
    df = spark.createDataFrame(
        [(1, "http://a.com/repo?ref=main&utm_source=x")], "id long, url string"
    )
    got = textprep.canonicalize_url(df, extra_params=("ref",)).collect()[0]["url"]
    assert got == "http://a.com/repo"


def test_canonicalize_url_fragment_and_trailing(spark):
    assert _canon(spark, "http://a.com/x#section") == "http://a.com/x"
    assert _canon(spark, "http://a.com/x/") == "http://a.com/x"
    assert _canon(spark, "http://a.com/x?") == "http://a.com/x"


def test_canonicalize_url_schemeless_passthrough(spark):
    assert _canon(spark, "Example.com/Path?utm_a=1") == "Example.com/Path?utm_a=1"


def test_remove_stopwords_keeps_case_and_order(spark):
    df = spark.createDataFrame(
        [(1, "The quick fox AND the lazy dog"), (2, ""), (3, "the and of")],
        "id long, text string",
    )
    got = {r["id"]: r["text"] for r in textprep.remove_stopwords(df).collect()}
    assert got[1] == "quick fox lazy dog"
    assert got[2] == ""
    assert got[3] == ""


def test_remove_stopwords_custom_list(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma")], "id long, text string")
    out = textprep.remove_stopwords(df, stopwords=["BETA"]).collect()[0]["text"]
    assert out == "alpha gamma"


def test_remove_boilerplate_lines_threshold_and_order(spark):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [
            (1, "FOOTER\nalpha one\nshared"),
            (2, "FOOTER\nbeta two\nshared"),
            (3, "FOOTER\ngamma three\nshared"),
            (4, "FOOTER\ndelta four"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in textprep.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    # FOOTER in 4 docs -> gone; 'shared' in 3 docs -> gone (at
    # threshold); unique lines survive in position
    assert out == {
        1: "alpha one",
        2: "beta two",
        3: "gamma three",
        4: "delta four",
    }


def test_remove_boilerplate_lines_scoped_by_domain(spark):
    from bubbles_spark.ops import textprep

    rows = [(i, "a.com", "MENU\nbody a " + str(i)) for i in range(3)] + [
        (10, "b.com", "MENU\nbody b")
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in textprep.remove_boilerplate_lines(
            df, min_docs=3, scope_col="domain"
        ).collect()
    }
    # MENU is boilerplate within a.com (3 docs) but NOT within b.com
    # (1 doc) — global counting would wrongly strip b.com's copy
    assert out[0] == "body a 0"
    assert out[10] == "MENU\nbody b"


def test_remove_boilerplate_lines_all_boiler_doc_empty(spark):
    from bubbles_spark.ops import textprep

    df = spark.createDataFrame(
        [(1, "X\nY"), (2, "X\nY"), (3, "X\nY"), (4, "X\nkeep me")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in textprep.remove_boilerplate_lines(df, min_docs=3).collect()
    }
    assert out[1] == "" and out[2] == "" and out[3] == ""
    assert out[4] == "keep me"


def test_balance_classes_caps_majority_deterministically(spark):
    from pyspark.sql import functions as F

    from bubbles_spark.ops import textprep

    rows = [(i, "maj") for i in range(2000)] + [
        (10_000 + i, "min") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, label string")
    out = textprep.balance_classes(df, "label", ["doc_id"])
    got = {r["label"]: r["cnt"] for r in
           out.groupBy("label").agg(F.count("*").alias("cnt")).collect()}
    # minority passes untouched; majority lands binomially near 100
    assert got["min"] == 100
    assert 60 <= got["maj"] <= 140
    # deterministic: same call -> identical membership
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in textprep.balance_classes(df, "label", ["doc_id"]).collect()
    )
    assert a == b


def test_balance_classes_validates_ratio(spark):
    import pytest as _pytest

    from bubbles_spark.ops import textprep

    df = spark.createDataFrame([(1, "a")], "doc_id long, label string")
    with _pytest.raises(ValueError, match="target_ratio"):
        textprep.balance_classes(df, "label", ["doc_id"], target_ratio=0)


def test_negative_samples_deterministic_and_exclusive(spark):
    from bubbles_spark.ops import textprep

    pairs = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12)], "q long, p long"
    )
    cands = spark.createDataFrame(
        [(c,) for c in range(10, 20)], "c long"
    )
    out = textprep.negative_samples(
        pairs, cands, "q", "p", "c", k=3
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["q"], []).append((r["rank"], r["negative"]))
    # k negatives per query, none of them a positive of that query
    assert sorted(r for r, _ in by[1]) == [1, 2, 3]
    assert not {n for _, n in by[1]} & {10, 11}
    assert not {n for _, n in by[2]} & {12}
    # deterministic across runs; salt redraws
    again = textprep.negative_samples(
        pairs, cands, "q", "p", "c", k=3
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    other = textprep.negative_samples(
        pairs, cands, "q", "p", "c", k=3, salt=9
    ).collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, out))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k and oversample"):
        textprep.negative_samples(pairs, cands, "q", "p", "c", k=0)
