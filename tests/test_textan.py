"""Text-analysis operators: reference values computed by hand /
pure Python."""

from __future__ import annotations

import hashlib

import pytest

from bubbles_spark.ops import textan


def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "one two  three"), (2, ""), (3, "   "), (4, "x")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_tokens"] for r in textan.token_count(df).collect()}
    assert got == {1: 3, 2: 0, 3: 0, 4: 1}


def test_quality_score_values(spark):
    text = "the cat sat on the mat and looked at the dog ."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = textan.quality_score(df).collect()[0]
    toks = text.lower().split()
    assert r["n_tokens"] == len(toks)
    stop = sum(1 for t in toks if t in textan._STOPWORDS)
    assert r["stopword_ratio"] == round(stop / len(toks), 6)
    assert r["distinct_token_ratio"] == round(len(set(toks)) / len(toks), 6)
    assert r["mean_token_len"] == round(sum(len(t) for t in toks) / len(toks), 6)
    assert r["quality"] == 1.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it was good"),
            (2, "el perro es de la casa que en un dia"),
            (3, "der hund ist von der frau und das kind"),
            (4, "zzz qqq www"),
            (5, "这是中文文本"),
            (6, "это русский текст"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in textan.lang_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und", 5: "zh", 6: "ru"}


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "b a c"), (2, "c b a a"), (3, "a b x")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in textan.fingerprint(df).collect()}
    assert got[1] == got[2]  # order + repetition invariant
    assert got[1] != got[3]
    assert got[1] == hashlib.md5(b"a b c").hexdigest()


def test_content_hash(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    got = textan.content_hash(df).collect()[0]["content_hash"]
    assert got == hashlib.md5(b"hello").hexdigest()


def test_bpe_estimate_monotone(spark):
    df = spark.createDataFrame(
        [(1, "short words here"), (2, "extraordinarily incomprehensible")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in textan.bpe_token_estimate(df).collect()}
    # 3 pieces, no long words... 'short'(5)->1 extra, 'words'(5)->1
    assert got[1] == 3 + 2
    # 2 pieces + floor(16/4)... 'extraordinarily' len 15 -> 3, 'incomprehensible' 16 -> 3
    assert got[2] == 2 + 3 + 3


def test_term_doc_freq(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog"), (3, "THE the the")],
        "doc_id long, text string",
    )
    got = {r["term"]: r["doc_freq"] for r in textan.term_doc_freq(df).collect()}
    # per-doc distinct: doc 3 counts 'the' once
    assert got == {"the": 3, "cat": 1, "sat": 1, "dog": 1}


def test_tf_idf_values(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = {(r["doc_id"], r["term"]): r for r in textan.tf_idf(df).collect()}
    r = rows[(1, "a")]
    assert r["term_count"] == 2 and r["doc_len"] == 3 and r["doc_freq"] == 1
    expect = (2 / 3) * (math.log(3 / 2) + 1.0)
    assert abs(r["tf_idf"] - expect) < 1e-9
    # 'b' appears in both docs -> higher df, lower idf
    assert rows[(2, "b")]["doc_freq"] == 2


def test_unigram_perplexity_hand_computed(spark):
    """Tiny corpus where the smoothed LM is computable by hand:
    vocab cap forces an OOV bucket; a doc of only top tokens scores
    lower perplexity than one full of rare/OOV tokens."""
    import math

    from bubbles_spark.ops import textan

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b"), (3, "zz qq")],
        "doc_id long, text string",
    )
    # counts: a=4, b=2, zz=1, qq=1, N=8.  vocab_size=2 -> {a, b}, V=2
    # denom = 8 + 1*(2+1) = 11
    lp_a, lp_b = math.log(5 / 11), math.log(3 / 11)
    lp_oov = math.log(1 / 11)
    got = {
        r["doc_id"]: r["perplexity"]
        for r in textan.unigram_perplexity(df, vocab_size=2).collect()
    }
    exp1 = round(math.exp(-(3 * lp_a + lp_b) / 4), 6)
    exp2 = round(math.exp(-(lp_a + lp_b) / 2), 6)
    exp3 = round(math.exp(-lp_oov), 6)
    assert got == {1: exp1, 2: exp2, 3: exp3}
    assert got[1] < got[2] < got[3]  # fluent < mixed < OOV-only


def test_bpe_tokenize_greedy_merges(spark):
    """Classic BPE greedy merging: rank order wins, merges cascade,
    end-of-word marker participates, unknown pairs stay split."""
    from bubbles_spark.ops import textan

    merges = [("t", "h"), ("th", "e"), ("the", "</w>")]
    df = spark.createDataFrame(
        [(1, "the then tooth x"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bpe_tokens"] for r in textan.bpe_tokenize(df, merges).collect()}
    # "the": t,h,e,</w> -> th,e,</w> -> the,</w> -> the</w>
    # "then": t,h,e,n,</w> -> the,n,</w> (the+</w> not adjacent)
    # "tooth": t,o,o,t,h,</w> -> t,o,o,th,</w>
    assert got[1] == ["the</w>", "the", "n", "</w>", "t", "o", "o", "th", "</w>", "x", "</w>"]
    assert got[2] is None
    assert got[3] == []


def test_bpe_heap_matches_linear_scan_greedy():
    """The O(L log L) heap merge must reproduce the textbook
    linear-scan greedy on random words and random merge tables —
    including overlap chains like 'aaaa' where tie-breaking (leftmost
    occurrence of the lowest rank) is what defines the answer."""
    import itertools
    import random

    def scan_encode(word, ranks, eow="</w>"):
        symbols = list(word) + [eow]
        while len(symbols) > 1:
            best_rank, best_i = None, None
            for i in range(len(symbols) - 1):
                r = ranks.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
        return symbols

    rng = random.Random(7)
    alphabet = "abc"
    for trial in range(200):
        # random merge table over growing symbol strings
        units = list(alphabet) + ["</w>"]
        pairs = []
        for _ in range(rng.randint(1, 12)):
            a, b = rng.choice(units), rng.choice(units)
            if (a, b) not in pairs:
                pairs.append((a, b))
                units.append(a + b)
        ranks = {p: i for i, p in enumerate(pairs)}
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))

        # drive the shipped heap encoder via its closure
        captured = {}

        def fake_map_in_pandas(fn, schema):
            captured["fn"] = fn
            return None

        import types

        from bubbles_spark.ops import textan as ta

        df = types.SimpleNamespace(
            schema=types.SimpleNamespace(fields=[]),
            mapInPandas=fake_map_in_pandas,
        )
        ta.bpe_tokenize(df, pairs, text_col="text")
        import pandas as pd

        (out_pdf,) = list(
            captured["fn"](iter([pd.DataFrame({"text": [word]})]))
        )
        got = out_pdf["bpe_tokens"][0]
        assert list(got) == scan_encode(word, ranks), (
            trial,
            word,
            pairs,
            list(got),
            scan_encode(word, ranks),
        )


def test_bpe_tokenize_from_file(spark, tmp_path):
    from bubbles_spark.ops import textan

    p = tmp_path / "merges.txt"
    p.write_text("# version: test\na b\nab c\n")
    df = spark.createDataFrame([(1, "abc abd")], "doc_id long, text string")
    got = textan.bpe_tokenize(df, str(p)).collect()[0]["bpe_tokens"]
    # "abc": a,b,c,</w> -> ab,c,</w> -> abc,</w>; "abd": ab,d,</w>
    assert got == ["abc", "</w>", "ab", "d", "</w>"]


# --- trained quality classifier ---------------------------------------


def test_quality_classifier_planted_rule(spark):
    """LR over hashed BoW recovers a planted token rule on held-out
    docs (train on the first half, score the second)."""
    import pyspark.sql.functions as F

    from bubbles_spark.ops import textan

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat_ws(" ", F.col("text"), F.lit("qz7zq qz7zq qz7zq")),
        ).otherwise(F.col("text")),
    )
    train = d.filter(F.col("doc_id") < 250)
    test = d.filter(F.col("doc_id") >= 250)
    model = textan.train_quality_classifier(
        train.filter(F.col("doc_id") % 7 == 0),
        train.filter(F.col("doc_id") % 7 != 0),
    )
    scored = textan.quality_classifier_scores(test, model)
    wrong = scored.filter(
        (F.col("quality_pred") == 1.0) != (F.col("doc_id") % 7 == 0)
    ).count()
    assert wrong == 0
    probs = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    hi = [p for i, p in probs.items() if i % 7 == 0]
    lo = [p for i, p in probs.items() if i % 7 != 0]
    assert min(hi) > 0.5 > max(lo)


def test_linear_score_logistic_matches_python(spark):
    import math

    df = spark.createDataFrame(
        [(1, 2.0, 0.5), (2, -1.0, 0.0), (3, 0.0, 10.0)], "id long, a double, b double"
    )
    w = {"a": 0.7, "b": -0.2}
    out = {r["id"]: r["s"] for r in
           textan.linear_score(df, w, bias=0.1, out="s").collect()}
    for i, a, b in [(1, 2.0, 0.5), (2, -1.0, 0.0), (3, 0.0, 10.0)]:
        z = 0.1 + 0.7 * a - 0.2 * b
        assert out[i] == round(1.0 / (1.0 + math.exp(-z)), 6)


def test_linear_score_identity_and_bad_link(spark):
    df = spark.createDataFrame([(1, 3.0)], "id long, a double")
    got = textan.linear_score(df, {"a": 2.0}, bias=1.0, link="identity").collect()
    assert got[0]["score"] == 7.0
    with pytest.raises(ValueError):
        textan.linear_score(df, {"a": 1.0}, link="probit")


def test_script_profile_dominant_and_ratios(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "привет мир"),
            (3, "你好 世界"),
            (4, "12345 !!!"),
            (5, "abc привет"),  # tie at 3? latin=3, cyrillic=6 -> cyrillic
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in textan.script_profile(df).collect()}
    assert rows[1]["dominant_script"] == "latin"
    assert rows[1]["latin_ratio"] == 1.0
    assert rows[2]["dominant_script"] == "cyrillic"
    assert rows[3]["dominant_script"] == "cjk"
    assert rows[3]["cjk_ratio"] == 1.0
    assert rows[4]["dominant_script"] == "other"
    assert rows[5]["dominant_script"] == "cyrillic"


def test_script_profile_tie_prefers_declaration_order(spark):
    df = spark.createDataFrame([(1, "ab пр")], "id long, text string")
    r = textan.script_profile(df).collect()[0]
    assert r["dominant_script"] == "latin"  # 2 == 2, latin declared first


def test_dsir_logratio_prefers_target_domain(spark):
    # target domain talks about physics; raw corpus mixes physics and
    # cooking — physics docs must score strictly higher, and a doc of
    # pure OOV gibberish scores the (shared-bucket) OOV ratio exactly
    target = spark.createDataFrame(
        [(100 + i, "quantum field theory energy momentum") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "quantum energy momentum"),
            (2, "field theory energy"),
            (3, "butter flour sugar oven"),
            (4, "whisk dough oven butter"),
            (5, "zzqx vvrgh"),  # pure OOV
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["dsir_logratio"]
        for r in textan.dsir_logratio(raw, target, vocab_size=50).collect()
    }
    assert len(out) == 5
    assert min(out[1], out[2]) > max(out[3], out[4])
    # docs of ONLY out-of-vocabulary tokens (cooking words and
    # gibberish alike — neither appears in the target) all land on
    # the identical shared-bucket log ratio ln(denom_raw/denom_tgt)
    assert out[3] == out[4] == out[5]
    import math
    denom_t = 25 + 1.0 * (5 + 1)  # 25 target tokens, V=5 distinct
    denom_r = 16 + 1.0 * (5 + 1)  # 16 raw tokens
    assert out[5] == round(math.log(denom_r / denom_t), 6)


def test_dsir_logratio_empty_docs_absent(spark):
    target = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    got = textan.dsir_logratio(raw, target).collect()
    assert {r["doc_id"] for r in got} == {1}


def test_gopher_rules_each_rule_isolated(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "some more words follow here to pad this document out "
            "with enough length that every other published rule is "
            "satisfied by construction of this plain prose passage")
    df = spark.createDataFrame(
        [
            (1, base),                                  # passes everything
            (2, "too short to count"),                  # rule 1
            (3, base + " #### #### #### #### ####"),    # rule 3: symbols
            (4, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),  # rule 4
            (5, base + "\nwait...\nhmm...\nmaybe..."),  # rule 5: ellipses
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textan.gopher_rules(df, min_words=30).collect()}
    assert rows[1]["gopher_pass"] is True
    assert rows[2]["rule_word_count"] is False and not rows[2]["gopher_pass"]
    assert rows[3]["rule_symbol_ratio"] is False
    assert rows[4]["rule_bullet_lines"] is False  # 10/10 lines > 90%
    assert rows[5]["rule_ellipsis_lines"] is False  # 3/4 lines > 30%
    # symbols-only tokens also drag the alphabetic-word ratio down
    assert rows[3]["alpha_word_ratio"] < 1.0


def test_gopher_rules_stopword_and_empty(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(["lorem"] * 60)),               # 0 of the 8 words
            (2, " ".join(["lorem"] * 60) + " the with"), # exactly 2
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textan.gopher_rules(df).collect()}
    assert rows[1]["rule_stop"] is False and rows[1]["stopword_hits"] == 0
    assert rows[2]["rule_stop"] is True and rows[2]["stopword_hits"] == 2
    assert rows[3]["n_words"] == 0 and rows[3]["gopher_pass"] is False


def test_bpe_train_hand_computed_merges(spark):
    docs = spark.createDataFrame(
        [("aaab aaab ab",)], "text string"
    )
    from bubbles_spark.ops import textan

    merges = textan.bpe_train(docs, num_merges=10)
    assert merges == [
        ("a", "a"), ("a", "b"), ("ab", "</w>"), ("aa", "ab</w>"),
    ]
    # round-trip: the learned table reconstructs whole words
    out = textan.bpe_tokenize(docs, merges)
    assert out.collect()[0]["bpe_tokens"] == ["aaab</w>", "aaab</w>", "ab</w>"]


def test_bpe_train_tie_break_and_min_count(spark):
    from bubbles_spark.ops import textan

    docs = spark.createDataFrame([("xy zw xy zw",)], "text string")
    merges = textan.bpe_train(docs, num_merges=1)
    # (x,y), (z,w), (y,</w>), (w,</w>) all occur twice -> the
    # lexicographically smallest pair wins ('<' sorts before letters)
    assert merges == [("w", "</w>")]
    rare = spark.createDataFrame([("one two",)], "text string")
    assert textan.bpe_train(rare, num_merges=5, min_word_count=2) == []


def test_bm25_score_formula_pinned(spark):
    import math

    from bubbles_spark.ops import textan

    docs = spark.createDataFrame(
        [
            (1, "spark spark shuffle"),
            (2, "spark join"),
            (3, "window sort"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textan.bm25_score(
        docs, ["spark", "shuffle"], k1=1.2, b=0.75
    ).collect()}
    N, avgdl = 3, (3 + 2 + 2) / 3
    def idf(df_t):
        return math.log((N - df_t + 0.5) / (df_t + 0.5) + 1.0)
    def term(tf, dl, df_t):
        return idf(df_t) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert got[1]["score"] == term(2, 3, 2) + term(1, 3, 1)
    assert got[2]["score"] == term(1, 2, 2)
    assert got[3]["score"] == 0.0 and got[3]["n_hits"] == 0
    assert (got[1]["tf_spark"], got[1]["tf_shuffle"]) == (2, 1)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        textan.bm25_score(docs, [])


def test_inverted_index_postings_and_band(spark):
    from bubbles_spark.ops import textan

    docs = spark.createDataFrame(
        [
            (3, "the cat sat"),
            (1, "the cat"),
            (2, "the dog"),
            (4, ""),          # empty doc: no terms, still counts in N
        ],
        "doc_id long, text string",
    )
    got = {r["term"]: r for r in textan.inverted_index(
        docs, min_df=1, max_df_ratio=0.7
    ).collect()}
    # 'the' has df 3 > 0.7*4 = 2.8 -> banded out
    assert "the" not in got
    assert got["cat"]["df_docs"] == 2 and got["cat"]["total_tf"] == 2
    assert got["cat"]["postings"] == "1,3"          # id-ordered
    assert got["sat"]["postings"] == "3"
    stats_only = textan.inverted_index(
        docs, min_df=2, include_postings=False
    )
    assert "postings" not in stats_only.columns
    assert {r["term"] for r in stats_only.collect()} == {"the", "cat"}


def test_inverted_index_validates_args(spark):
    import pytest as _pytest
    from bubbles_spark.ops import textan

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="inverted_index"):
        textan.inverted_index(docs, min_df=0)


def test_collocations_counts_and_pinned_pmi(spark):
    import math

    from bubbles_spark.ops import textan

    docs = spark.createDataFrame(
        [("new york city",), ("new york",), ("york new",), ("solo",)],
        "text string",
    )
    got = {(r["w1"], r["w2"]): r for r in textan.collocations(
        docs, min_count=2
    ).collect()}
    assert set(got) == {("new", "york")}
    r = got[("new", "york")]
    # bigrams: (new,york)x2, (york,city), (york,new) -> T=4
    assert (r["pair_count"], r["total_bigrams"]) == (2, 4)
    assert (r["w1_count"], r["w2_count"]) == (3, 3)  # unigram occurrences
    assert r["pmi"] == math.log((2.0 * 4.0) / (3.0 * 3.0))


def test_reading_level_hand_computed(spark):
    from bubbles_spark.ops import textan

    docs = spark.createDataFrame(
        [(1, "The cat sat. It sat well!"), (2, ""), (3, "word")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textan.reading_level(docs).collect()}
    r = got[1]
    # words=6, sentences=2, vowel groups: e,a,a,i,a,e = 6
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    assert r["flesch"] == 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert got[2]["n_words"] == 0 and got[2]["flesch"] is None
    # fragment: sentence floor of 1, syllable floor of n_words
    assert got[3]["n_sentences"] == 1 and got[3]["n_syllables"] == 1


def test_top_terms_rank_and_ties(spark):
    """Top-k per doc under (tf_idf DESC, term) — distinctive terms
    rank above ubiquitous ones; rounded-score ties break on term."""
    from bubbles_spark.ops import textan

    docs = spark.createDataFrame(
        [(1, "apple apple banana shared"),
         (2, "cherry cherry shared shared"),
         (3, "shared banana")],
        "doc_id long, text string",
    )
    out = textan.top_terms(docs, k=2).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    for v in by.values():
        v.sort()
    # doc 1: apple (tf 2/4, df 1) clearly first
    assert by[1][0][1] == "apple"
    # doc 2: cherry (tf .5, df 1 -> idf 1.69) beats shared (tf .5, idf 1)
    assert by[2][0][1] == "cherry"
    assert all(len(v) <= 2 for v in by.values())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k"):
        textan.top_terms(docs, k=0)


def test_vocab_richness_hand_computed(spark):
    from bubbles_spark.ops.textan import vocab_richness

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "c B")], "doc_id long, text string"
    )
    r = vocab_richness(docs).collect()[0]
    # lowercase tokens: a x2, b x2, c x1
    assert r["n_tokens"] == 5 and r["d_observed"] == 3
    assert r["f1_singletons"] == 1 and r["f2_doubletons"] == 2
    assert r["chao1"] == 3.0  # f1*(f1-1) = 0 -> no correction

    # all singletons, no doubletons: bias-corrected form stays finite
    solo = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    rs = vocab_richness(solo).collect()[0]
    assert rs["d_observed"] == 3 and rs["f1_singletons"] == 3
    assert rs["f2_doubletons"] == 0
    assert rs["chao1"] == 3.0 + (3.0 * 2.0) / 2.0

    # empty / null corpus -> zeros
    empty = spark.createDataFrame(
        [(1, "   "), (2, None)], "doc_id long, text string"
    )
    re_ = vocab_richness(empty).collect()[0]
    assert re_["n_tokens"] == 0 and re_["d_observed"] == 0
    assert re_["chao1"] == 0.0


def test_distinctive_terms_odds_and_order(spark):
    df = spark.createDataFrame(
        [
            (1, "s1", "apple apple banana"),
            (2, "s1", "apple cherry"),
            (3, "s2", "banana banana cherry"),
            (4, "s2", "cherry cherry date"),
            (5, None, "ignored ignored ignored"),
            (6, "s2", "   "),
        ],
        "doc_id long, source string, text string",
    )
    out = textan.distinctive_terms(
        df, "source", "s1", min_count=1, top_k=10
    ).collect()
    # A = 5 target tokens, B = 6 rest tokens; NULL-label and blank
    # docs excluded
    rows = {r["term"]: r for r in out}
    assert set(rows) == {"apple", "banana", "cherry", "date"}
    a_tot, b_tot = 5, 6

    def ref(a, b):
        return ((a + 1) * (b_tot - b + 1)) / ((b + 1) * (a_tot - a + 1))

    assert rows["apple"]["n_target"] == 3 and rows["apple"]["n_rest"] == 0
    assert rows["apple"]["odds_ratio"] == ref(3, 0)
    assert rows["banana"]["odds_ratio"] == ref(1, 2)
    assert rows["cherry"]["odds_ratio"] == ref(1, 3)
    assert rows["date"]["odds_ratio"] == ref(0, 1)
    # ordering: ratio desc, term asc
    got_order = [r["term"] for r in out]
    exp_order = sorted(
        rows, key=lambda t: (-rows[t]["odds_ratio"], t)
    )
    assert got_order == exp_order
    # min_count prunes rare terms (date: 0+1 occurrences < 3)
    pruned = textan.distinctive_terms(
        df, "source", "s1", min_count=3, top_k=10
    ).collect()
    assert {r["term"] for r in pruned} == {"apple", "banana", "cherry"}


def test_compression_ratio_matches_zlib(spark):
    import zlib

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "spam spam spam spam spam spam spam spam spam"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in textan.compression_ratio(df, "doc_id", "text").collect()
    }
    for i, t in rows:
        t = t or ""
        b = t.encode("utf-8")
        c = zlib.compress(b, 6)
        r = out[i]
        assert r["byte_len"] == len(b)
        assert r["compressed_len"] == len(c)
        assert r["ratio"] == (len(c) / len(b) if b else None)
    # repeated text compresses deeper than prose
    assert out[2]["ratio"] < out[1]["ratio"]

    # regression (r12): the output schema follows the id column's
    # actual type — string ids used to hit a hardcoded `long` field
    sdf = spark.createDataFrame(
        [("u-1", "hello hello hello"), ("u-2", "entropy xyzzy")],
        "doc_id string, text string",
    )
    sout = textan.compression_ratio(sdf, "doc_id", "text")
    assert sout.schema["doc_id"].dataType.simpleString() == "string"
    got = {r["doc_id"]: r for r in sout.collect()}
    assert set(got) == {"u-1", "u-2"}
    assert got["u-1"]["ratio"] < got["u-2"]["ratio"]
