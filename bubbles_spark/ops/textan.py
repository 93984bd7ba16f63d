"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.14).

Not in the reference — these are the training-data-pipeline
extensions (language ID, quality scoring, token counting, document
fingerprinting) over the `documents` table shape
(doc_id, text, lang, source, n_chars).

Everything below is built-in Column expressions (JVM, codegen) — no
Python UDFs — so each operator is a map-only stage that scales
linearly with input splits at 100 TB.

CODEGEN RULE (round-2 lesson, measured): higher-order functions
(transform/filter/aggregate lambdas) are NEVER whole-stage-codegen'd;
they evaluate interpreted at ~10µs per lambda call, which is
milliseconds per row once a lambda runs per token.  Everything here
therefore uses regex counting (`regexp_extract_all` + `size`),
arithmetic on `length()`, and non-lambda collection expressions
(`split`, `array_distinct`, `array_sort`) — all JVM-codegen'd.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------
# tokens
# ---------------------------------------------------------------------


def _norm_ws(text: Column) -> Column:
    """Whitespace-normalized text: trimmed, runs collapsed to one
    space.  Token i is then the i-th space-separated piece — the
    shared normal form for every token-level expression below."""
    return F.regexp_replace(F.trim(text), r"\s+", " ")


def _tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed — codegen'd (split on the
    normalized form; no lambda filter)."""
    norm = _norm_ws(text)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def _token_count(text: Column) -> Column:
    """Token count without materializing the token array."""
    norm = _norm_ws(text)
    return F.when(norm == "", F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )


def _word_alt(words: list[str]) -> str:
    """Regex alternation matching any of ``words`` as a whole token
    (space-delimited, non-consuming lookahead on the right so two
    adjacent matches both count)."""
    return "(?:^| )(?:" + "|".join(words) + ")(?= |$)"


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count."""
    return df.withColumn(out, _token_count(F.col(text_col)).cast("long"))


def bpe_token_estimate(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """BPE-ish token-count estimate without a tokenizer model: count
    regex word/number pieces, then add a length correction
    (≈1 token per 4 chars within long words — the usual BPE budget
    heuristic).  Deterministic and cheap; swap in a real tokenizer via
    mapInPandas when the model file is available.

    ``pieces`` counts \\w+ runs directly (codegen'd regex scan); the
    long-word correction sums floor((len-1)/4) over words of 5+ word
    chars.  The fold is the one lambda here, but it runs over the few
    long words per doc, not every token."""
    text = F.col(text_col)
    pieces = F.size(F.regexp_extract_all(text, F.lit(r"\w+"), 0))
    long_words = F.regexp_extract_all(text, F.lit(r"\w{5,}"), 0)
    long_word_extra = F.aggregate(
        long_words,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.floor((F.length(t) - 1) / 4).cast("long"),
    )
    return df.withColumn(out, (pieces + long_word_extra).cast("long"))


# ---------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------

_STOPWORDS = (
    "a an and are as at be by for from has he in is it its of on that the to was were will with".split()
)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + composite score (the
    C4/Gopher-style cheap filters): length, token stats, stopword
    ratio, punctuation density, repetition (distinct-token ratio).

    Adds columns: n_tokens, mean_token_len, stopword_ratio,
    punct_ratio, distinct_token_ratio, quality.  All ratios rounded
    to 6dp for cross-engine comparability.

    Fully codegen'd: stopword hits are a regex count over the
    lowercased normal form; mean token length is arithmetic on the
    normalized length (total chars minus the n-1 single spaces);
    distinct ratio uses the non-lambda array_distinct.

    Shared subexpressions (norm, n_tok, the three ratios) are
    materialized as real columns BEFORE reuse — an expression
    referenced k times is re-inlined k times by Catalyst unless a
    column boundary with multiple non-cheap references stops
    CollapseProject.  Measured on sf0.1 documents: 1.19s inlined →
    0.39s materialized (3×), the same class of blowup as the round-1
    MinHash finding."""
    text = F.col(text_col)
    staged = df.withColumn("__norm", _norm_ws(F.lower(text)))
    norm = F.col("__norm")
    staged = staged.withColumn(
        "__ntok",
        F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " "))),
    )
    n_tok = F.col("__ntok")
    n_chars = F.length(text)
    stop_hits = F.size(F.regexp_extract_all(norm, F.lit(_word_alt(_STOPWORDS)), 0))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(F.split(norm, " "))) / n_tok
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    # sum of token lengths = len(norm) - (n_tok - 1) single spaces
    mean_tok = F.when(
        n_tok > 0, (F.length(norm) - (n_tok - 1)) / n_tok
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))

    staged = (
        staged.withColumn("__meantok", mean_tok)
        .withColumn("__stopr", stop_ratio)
        .withColumn("__distr", distinct_ratio)
    )
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), 0.25).otherwise(0.0)
        + F.when(
            (F.col("__meantok") >= 2.0) & (F.col("__meantok") <= 12.0), 0.25
        ).otherwise(0.0)
        + F.when(F.col("__stopr") >= 0.01, 0.25).otherwise(0.0)
        + F.when(F.col("__distr") >= 0.1, 0.25).otherwise(0.0)
    )
    return (
        staged.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("mean_token_len", F.round(F.col("__meantok"), 6))
        .withColumn("stopword_ratio", F.round(F.col("__stopr"), 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("distinct_token_ratio", F.round(F.col("__distr"), 6))
        .withColumn("quality", F.round(score, 6))
        .drop("__norm", "__ntok", "__meantok", "__stopr", "__distr")
    )


# the 8 "required" words of the Gopher rule set (Rae et al. 2021,
# Appendix A1) — a document must contain at least 2 of them
_GOPHER_STOPWORDS = "the be to of and that have with".split()


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    Appendix A1) as boolean flags + an overall ``gopher_pass`` — the
    named rule set, verbatim, where ``quality_score`` is the generic
    feature bundle:

      1. ``min_words`` ≤ word count ≤ ``max_words``
      2. mean word length in [3, 10]
      3. symbol-to-word ratio (# or ellipsis) ≤ 0.1
      4. ≤ 90% of lines start with a bullet (-, *, •)
      5. ≤ 30% of lines end with an ellipsis
      6. ≥ 80% of words contain at least one alphabetic character
      7. at least 2 of the 8 required words {the, be, to, of, and,
         that, have, with} appear (whole-word, case-insensitive)

    Adds the per-rule flags (``rule_word_count`` ... ``rule_stop``),
    the underlying ratios (rounded 6dp for cross-engine
    comparability), and ``gopher_pass`` = AND of all seven.  Empty
    documents fail rule 1 and carry zero ratios.

    Fully codegen'd column expressions — no UDFs, map-only, no
    shuffle; shared subexpressions are materialized as real columns
    (see ``quality_score``'s CollapseProject note).  At 100 TB this
    is scan-bandwidth-bound like every other row-local filter.
    """
    text = F.col(text_col)
    staged = df.withColumn("__norm", _norm_ws(F.lower(text)))
    norm = F.col("__norm")
    staged = staged.withColumn(
        "__ntok",
        F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " "))),
    )
    n_tok = F.col("__ntok")
    mean_len = F.when(
        n_tok > 0, (F.length(norm) - (n_tok - 1)) / n_tok
    ).otherwise(F.lit(0.0))
    n_sym = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\.|…"), 0))
    sym_ratio = F.when(n_tok > 0, n_sym / n_tok).otherwise(F.lit(0.0))
    # non-empty trimmed lines are the denominators for rules 4-5
    lines = F.filter(
        F.transform(F.split(text, F.lit("\n")), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    staged = staged.withColumn("__lines", lines)
    n_lines = F.size(F.col("__lines"))
    bullet_ratio = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                F.col("__lines"), lambda s: s.rlike(r"^[-*•]")
            )
        )
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                F.col("__lines"), lambda s: s.rlike(r"(\.\.\.|…)$")
            )
        )
        / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_tok > 0,
        F.size(
            F.filter(
                F.split(norm, " "), lambda w: w.rlike(r"[a-z]")
            )
        )
        / n_tok,
    ).otherwise(F.lit(0.0))
    stop_hits = sum(
        F.when(norm.rlike(rf"\b{w}\b"), F.lit(1)).otherwise(F.lit(0))
        for w in _GOPHER_STOPWORDS
    )
    staged = (
        staged.withColumn("__meanlen", mean_len)
        .withColumn("__symr", sym_ratio)
        .withColumn("__bullr", bullet_ratio)
        .withColumn("__ellr", ellipsis_ratio)
        .withColumn("__alphar", alpha_ratio)
        .withColumn("__stoph", stop_hits)
    )
    flags = {
        "rule_word_count": (n_tok >= min_words) & (n_tok <= max_words),
        "rule_mean_word_len": (F.col("__meanlen") >= 3.0)
        & (F.col("__meanlen") <= 10.0),
        "rule_symbol_ratio": F.col("__symr") <= 0.1,
        "rule_bullet_lines": F.col("__bullr") <= 0.9,
        "rule_ellipsis_lines": F.col("__ellr") <= 0.3,
        "rule_alpha_words": F.col("__alphar") >= 0.8,
        "rule_stop": F.col("__stoph") >= 2,
    }
    out = staged.withColumn("n_words", n_tok.cast("long"))
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    passed = None
    for name in flags:
        passed = F.col(name) if passed is None else (passed & F.col(name))
    return (
        out.withColumn("mean_word_len", F.round(F.col("__meanlen"), 6))
        .withColumn("symbol_ratio", F.round(F.col("__symr"), 6))
        .withColumn("bullet_line_ratio", F.round(F.col("__bullr"), 6))
        .withColumn("ellipsis_line_ratio", F.round(F.col("__ellr"), 6))
        .withColumn("alpha_word_ratio", F.round(F.col("__alphar"), 6))
        .withColumn("stopword_hits", F.col("__stoph").cast("long"))
        .withColumn("gopher_pass", passed)
        .drop(
            "__norm", "__ntok", "__lines", "__meanlen", "__symr",
            "__bullr", "__ellr", "__alphar", "__stoph",
        )
    )


# ---------------------------------------------------------------------
# language ID (marker-word/charset heuristic)
# ---------------------------------------------------------------------

# charset cues first (CJK, Cyrillic...), then tiny per-language marker
# vocabularies — the classic cheap lang-id cascade.  Deterministic,
# pure SQL expressions; precision is heuristic-grade by design.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": "the and is of to in that it was for with".split(),
    "es": "el la los las es de que en un una por".split(),
    "de": "der die das und ist von mit ein eine nicht".split(),
    "fr": "le la les est de que en un une pour".split(),
}


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Predict language: CJK/Cyrillic/Greek by script range, else the
    latin language whose marker-word hit-count is highest (ties break
    by fixed language order; no hits → 'und').  One codegen'd regex
    count per language.

    The normal form and the per-language counts are materialized as
    columns first: each count is referenced twice in the tie-break
    cascade (comparison + carry), and the when-chain would otherwise
    re-inline the norm → 4 regex scans × repeated normalization.
    Measured on sf0.1 documents: 1.58s inlined → materialized ~0.4s."""
    text = F.col(text_col)
    staged = df.withColumn("__norm", _norm_ws(F.lower(text)))
    langs = ["en", "es", "de", "fr"]
    for lang in langs:
        staged = staged.withColumn(
            f"__s_{lang}",
            F.size(
                F.regexp_extract_all(
                    F.col("__norm"), F.lit(_word_alt(_LANG_MARKERS[lang])), 0
                )
            ),
        )
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fixed iteration order = deterministic tie-break (> not >=)
    for lang in langs:
        score = F.col(f"__s_{lang}")
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)

    pred = (
        F.when(text.rlike("[一-鿿]"), F.lit("zh"))
        .when(text.rlike("[぀-ヿ]"), F.lit("ja"))
        .when(text.rlike("[Ѐ-ӿ]"), F.lit("ru"))
        .when(text.rlike("[Ͱ-Ͽ]"), F.lit("el"))
        .otherwise(best_lang)
    )
    return staged.withColumn(out, pred).drop(
        "__norm", *[f"__s_{lang}" for lang in langs]
    )


# ---------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------


def fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """Canonical document fingerprint: md5 of the sorted distinct
    token set (the "key collision" fingerprint — normalization + sort
    makes word order and repetition irrelevant, so it catches
    shuffled/duplicated-content docs that exact-hash misses).
    md5 (not xxhash) so external engines can reproduce it.
    array_sort/array_distinct are non-lambda collection expressions —
    codegen'd."""
    toks = F.array_sort(F.array_distinct(_tokens(F.lower(F.col(text_col)))))
    return df.withColumn(out, F.md5(F.array_join(toks, " ").cast("binary")))


def content_hash(df: DataFrame, text_col: str = "text", out: str = "content_hash") -> DataFrame:
    """Exact-content hash (md5 of raw text) — the exact-dedup key."""
    return df.withColumn(out, F.md5(F.col(text_col).cast("binary")))


# ---------------------------------------------------------------------
# corpus statistics: term frequency / document frequency / tf-idf
# ---------------------------------------------------------------------


def term_doc_freq(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 1,
) -> DataFrame:
    """Corpus document frequency per lowercase token: (term, doc_freq).

    explode(distinct tokens) → groupBy(term) — one shuffle keyed by
    term.  Zipf guarantees head-term skew, but a count-only aggregate
    partial-aggregates map-side, so each reducer receives at most one
    partial row per (term, mapper): skew-safe without salting."""
    toks = df.select(
        F.explode(F.array_distinct(_tokens(F.lower(F.col(text_col))))).alias("term")
    )
    out = toks.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    return out.filter(F.col("doc_freq") >= min_doc_freq)


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 1,
) -> DataFrame:
    """Per (doc, term) tf-idf over the corpus: tf = in-doc term count /
    doc token count; idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn
    convention).  Two shuffles total: (doc, term) counts, then the
    doc-frequency join — the idf side is tiny after aggregation, so
    Spark broadcasts it (AQE decides; no forced hint).

    The N (corpus size) scalar comes from a count() action — one job,
    driver-side scalar, broadcast with the plan; at 100 TB that is a
    metadata-cheap columnar count."""
    n_docs = df.count()
    terms = df.select(
        F.col(id_col),
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("term_count"))
    doc_len = terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("doc_len"))
    dfreq = terms.select(id_col, "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    if min_doc_freq > 1:
        dfreq = dfreq.filter(F.col("doc_freq") >= min_doc_freq)
    idf = F.log((F.lit(float(n_docs) + 1.0)) / (F.col("doc_freq") + 1.0)) + 1.0
    return (
        tf.join(doc_len, id_col)
        .join(dfreq.withColumn("idf", idf), "term")
        .withColumn(
            "tf_idf",
            F.round((F.col("term_count") / F.col("doc_len")) * F.col("idf"), 9),
        )
        .select(id_col, "term", "term_count", "doc_len", "doc_freq", "tf_idf")
    )


def top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_doc_freq: int = 1,
) -> DataFrame:
    """Top-``k`` tf-idf terms per document — keyword extraction for
    tagging, dedup blocking keys, and "what is this doc about?"
    search facets.  Ranking is DETERMINISTIC: tf_idf is already
    rounded to 9 decimals (which absorbs the engines' 1-ulp ln()
    disagreement), and rounded-score ties break on the term string —
    so the top-k SET is identical across runs and engines.

    Scale: ``tf_idf``'s two shuffles + one (doc, term)-keyed window
    (each doc's terms sort within its partition — docs are small;
    the corpus never globally sorts).  Output: id_col, rank, term,
    tf_idf."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    scored = tf_idf(df, id_col, text_col, min_doc_freq)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf_idf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(id_col, F.col("rank").cast("int").alias("rank"),
                "term", "tf_idf")
    )


def unigram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 65536,
    alpha: float = 1.0,
    out: str = "perplexity",
) -> DataFrame:
    """Per-document perplexity under a corpus-trained unigram LM —
    the CCNet-style cheap perplexity filter (docs far from the
    corpus distribution are boilerplate, menus, or noise).

    Model: add-``alpha`` smoothed unigram over the top-``vocab_size``
    lowercased tokens (ties at the cutoff broken by token string, so
    the vocabulary is deterministic); everything else shares one OOV
    bucket.  logp(t) = ln((c_t + alpha) / (N + alpha·(V+1))), and
    ppl(doc) = exp(-mean logp over its tokens).

    Scale shape (100 TB corpus):
      - token counts: one shuffle with map-side combine (the classic
        word-count), output ≈ vocabulary-sized;
      - vocabulary: global TakeOrdered of the counts — bounded by
        ``vocab_size``, never corpus-sized;
      - N and V are two metadata-sized driver scalars (same contract
        as tf_idf's corpus count);
      - scoring: tokens explode map-side and join the BROADCAST
        (token → logp) table, then groupBy(doc) partial-aggregates —
        the reduce shuffle carries per-doc partial sums, not tokens.

    Returns the skinny (id_col, out) frame; empty docs are absent
    (no tokens → no perplexity).  Join back to the corpus as needed.
    """
    import math

    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.lower(F.col(text_col)))).alias("__tok")
    )
    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    n_total = counts.agg(F.sum("__c")).collect()[0][0] or 0
    vocab = counts.orderBy(F.col("__c").desc(), F.col("__tok")).limit(vocab_size)
    v = vocab.count()
    denom = float(n_total) + alpha * (v + 1)
    vocab_lp = vocab.select(
        "__tok", F.log((F.col("__c") + F.lit(alpha)) / F.lit(denom)).alias("__lp")
    )
    oov_lp = math.log(alpha / denom)
    scored = toks.join(F.broadcast(vocab_lp), "__tok", "left").withColumn(
        "__lp", F.coalesce(F.col("__lp"), F.lit(oov_lp))
    )
    return scored.groupBy(id_col).agg(
        F.round(F.exp(-F.avg("__lp")), 6).alias(out)
    )


def dsir_logratio(
    df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 10000,
    alpha: float = 1.0,
    out: str = "dsir_logratio",
) -> DataFrame:
    """Per-document importance weight for domain-targeted data
    selection — the DSIR recipe (Data Selection via Importance
    Resampling, Xie et al. 2023): score raw documents by how much
    more likely they are under a TARGET-domain unigram LM than under
    the RAW-corpus LM, then keep the top slice (or Gumbel-sample
    proportionally) as domain-matched training data.

    Model: vocabulary = top-``vocab_size`` lowercased tokens of the
    TARGET corpus (ties at the cutoff broken by token string);
    add-``alpha`` smoothed unigram probabilities on both corpora
    share one OOV bucket.  score(doc) = mean over its tokens of
    ln(p_target(t) / p_raw(t)) — the length-normalized log
    importance ratio (DSIR's sum-form weight divided by doc length,
    so long documents don't dominate the cut).  Positive = more
    target-like than the corpus average.

    Scale shape (100 TB corpus):
      - two word-count shuffles (target + raw), each with map-side
        combine and vocabulary-bounded output;
      - the (token → log ratio) table is vocabulary-sized and
        BROADCASTS into the exploded raw tokens — the corpus never
        shuffles for the lookup;
      - per-doc mean partial-aggregates, so the reduce shuffle
        carries partial sums, not tokens;
      - N/V totals are metadata-sized driver scalars (same contract
        as ``unigram_perplexity``).

    Selection is deliberately separate: feed the returned
    (id, score) frame to ``core.top_k`` for the deterministic cut or
    ``core.sample(mode="weighted")`` for temperature sampling.

    Returns the skinny (id_col, out) frame; empty docs are absent.
    """
    import math

    raw_toks = df.select(
        F.col(id_col),
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("__tok"),
    )
    tgt_toks = target_df.select(
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("__tok")
    )

    tgt_counts = tgt_toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__ct"))
    n_tgt = tgt_counts.agg(F.sum("__ct")).collect()[0][0] or 0
    vocab = tgt_counts.orderBy(F.col("__ct").desc(), F.col("__tok")).limit(
        vocab_size
    )
    v = vocab.count()

    raw_counts = raw_toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cr"))
    n_raw = raw_counts.agg(F.sum("__cr")).collect()[0][0] or 0

    denom_t = float(n_tgt) + alpha * (v + 1)
    denom_r = float(n_raw) + alpha * (v + 1)
    # vocabulary-sized join: raw counts restricted to the target vocab
    ratio = (
        vocab.join(raw_counts, "__tok", "left")
        .select(
            "__tok",
            (
                F.log((F.col("__ct") + F.lit(alpha)) / F.lit(denom_t))
                - F.log(
                    (F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(alpha))
                    / F.lit(denom_r)
                )
            ).alias("__lr"),
        )
    )
    # OOV mass: all non-vocab tokens share one bucket in BOTH models
    oov_lr = math.log(alpha / denom_t) - math.log(alpha / denom_r)
    scored = raw_toks.join(F.broadcast(ratio), "__tok", "left").withColumn(
        "__lr", F.coalesce(F.col("__lr"), F.lit(oov_lr))
    )
    return scored.groupBy(id_col).agg(F.round(F.avg("__lr"), 6).alias(out))


def bm25_score(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a fixed query
    (Robertson/Spärck Jones; the Okapi formula every search engine
    and RAG retriever defaults to):

        score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t) = ln((N − df_t + 0.5)/(df_t + 0.5) + 1)

    Exactness: tf (term frequency), dl (doc length), df_t (docs
    containing t) and N are EXACT integer counts from codegen'd
    array expressions — hash-checkable cross-engine; the float
    score itself crosses ``ln``, whose libm implementations differ
    by 1 ulp between engines (the psi_bin precedent), so oracle
    queries compare the integer parts and pytest pins the score
    arithmetic.

    Scale shape: ONE map-only pass computes every per-doc tf (the
    query rides in the plan as ≤|Q| literals — no join); corpus
    stats (N, avgdl, df_t) are ONE wide aggregate collected as |Q|+2
    driver scalars; scoring is map-only codegen.  Two passes total,
    zero shuffles beyond the one-row agg.

    Output: id_col, dl, n_hits (query terms present), score —
    documents with no query term score 0 and are kept (filter
    `n_hits > 0` for a hit list)."""
    import math as _math

    terms = list(dict.fromkeys(query_terms))  # dedupe, keep order
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = _tokens(_norm_ws(F.lower(F.col(text_col))))
    # tf via size − size(array_remove(...)): non-lambda collection
    # exprs stay whole-stage-codegen'd (module CODEGEN RULE — a
    # filter() lambda would run interpreted per token)
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
    ).select(
        id_col,
        F.size("__toks").alias("dl"),
        *[
            (
                F.size("__toks")
                - F.size(F.array_remove("__toks", t))
            ).alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__N"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("__sumdl"),
        *[
            F.coalesce(
                F.sum((F.col(f"__tf_{i}") > 0).cast("bigint")), F.lit(0)
            ).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    ).first()
    n_docs = stats["__N"]
    avgdl = (stats["__sumdl"] / n_docs) if n_docs else 0.0
    score = F.lit(0.0)
    hits = F.lit(0)
    for i in range(len(terms)):
        df_t = stats[f"__df_{i}"]
        idf = _math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
        tf = F.col(f"__tf_{i}").cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl or 1.0)
        )
        score = score + F.lit(idf) * tf * F.lit(k1 + 1.0) / denom
        hits = hits + (F.col(f"__tf_{i}") > 0).cast("int")
    return base.select(
        id_col,
        "dl",
        hits.alias("n_hits"),
        score.alias("score"),
        *[F.col(f"__tf_{i}").alias(f"tf_{t}") for i, t in enumerate(terms)],
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_word_count: int = 1,
    max_vocab: int = 1_000_000,
    lowercase: bool = True,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """LEARN a BPE merge table from the corpus (Sennrich et al. 2016)
    — the training half of ``bpe_tokenize``; feed the returned list
    straight back into it.

    Spark does the corpus-scale work: ONE distributed pass folds the
    raw text into (word, count) — the Zipf-bounded word vocabulary,
    capped at the ``max_vocab`` most frequent words (a documented,
    bounded driver collect; industrial tokenizer trainers consume
    exactly this aggregate, not raw text, because merge statistics
    are a function of word counts alone).  The greedy merge loop then
    runs driver-side over that aggregate with an incrementally
    maintained pair index — O(pairs) per merge, not a full rescan.

    DETERMINISTIC: ties on pair frequency break to the
    lexicographically smallest pair (the reference implementation
    leaves ties arbitrary, which makes vocabularies
    irreproducible — pinned here so retrains are bit-stable).
    Stops early when no pair occurs twice."""
    from collections import Counter, defaultdict

    norm = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    wc_rows = (
        df.select(F.explode(_tokens(norm)).alias("__w"))
        .filter(F.col("__w") != "")
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_word_count)
        .orderBy(F.col("__n").desc(), F.col("__w"))
        .limit(max_vocab)
        .collect()
    )
    words: dict[tuple, int] = {
        tuple(r["__w"]) + ((end_of_word,) if end_of_word else ()): r["__n"]
        for r in wc_rows
    }

    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for w, n in words.items():
        for i in range(len(w) - 1):
            pair_counts[(w[i], w[i + 1])] += n
            pair_words[(w[i], w[i + 1])].add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for w in list(pair_words[best]):
            n = words.pop(w)
            # re-segment this word, updating the pair index
            for i in range(len(w) - 1):
                pair_counts[(w[i], w[i + 1])] -= n
                if pair_counts[(w[i], w[i + 1])] <= 0:
                    del pair_counts[(w[i], w[i + 1])]
                pair_words[(w[i], w[i + 1])].discard(w)
            new = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    new.append(joined)
                    i += 2
                else:
                    new.append(w[i])
                    i += 1
            nw = tuple(new)
            words[nw] = words.get(nw, 0) + n
            for i in range(len(nw) - 1):
                pair_counts[(nw[i], nw[i + 1])] += n
                pair_words[(nw[i], nw[i + 1])].add(nw)
    return merges


def bpe_tokenize(
    df: DataFrame,
    merges,
    text_col: str = "text",
    out: str = "bpe_tokens",
    lowercase: bool = True,
    end_of_word: str = "</w>",
) -> DataFrame:
    """REAL byte-pair-encoding tokenization from a user-supplied
    merge table — no tokenizer library needed; this is the standard
    greedy-merge algorithm (Sennrich et al.) every BPE vocabulary
    file encodes.

    ``merges``: an ordered list of (left, right) pairs — merge rank =
    list position — or a path to a merges.txt (one space-separated
    pair per line, '#' comments skipped; the GPT-2/RoBERTa layout).
    Each whitespace word splits to characters (+``end_of_word``
    marker), then the lowest-rank adjacent pair merges repeatedly
    until no listed pair remains.  Deterministic by construction.

    Scale shape: the merge table is a model artifact (≤ ~50k rows) —
    it rides to executors inside the task closure (one broadcast);
    tokenization runs in Arrow-batched mapInPandas, map-only, no
    shuffle.  Swap in a C-backed tokenizer via the same mapInPandas
    seam when throughput demands it; the semantics stay pinned by
    these tests.

    Output: ``out`` column, array<string> of BPE tokens.
    """
    if isinstance(merges, (str, bytes)):
        pairs = []
        with open(merges) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                a, b = line.split()[:2]
                pairs.append((a, b))
    else:
        pairs = [tuple(p) for p in merges]
    ranks = {p: i for i, p in enumerate(pairs)}

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out, T.ArrayType(T.StringType()))]
    )

    def _encode_word(word: str) -> tuple:
        # O(L log L) heap merge over a doubly-linked symbol list (vs
        # the naive O(L²) rescan per merge): pop the lowest-rank pair,
        # drop stale entries via per-node versions, merge, push the
        # two new neighbor pairs.  Ties break leftmost-first — (rank,
        # position) heap order — exactly like the linear-scan greedy.
        import heapq

        symbols = list(word) + ([end_of_word] if end_of_word else [])
        n = len(symbols)
        if n <= 1:
            return tuple(symbols)
        nxt = list(range(1, n)) + [-1]
        prv = [-1] + list(range(n - 1))
        alive = [True] * n
        ver = [0] * n
        heap = []
        for i in range(n - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None:
                heap.append((r, i, 0, 0, i + 1))
        heapq.heapify(heap)
        while heap:
            r, i, vi, vj, j = heapq.heappop(heap)
            if (
                not alive[i]
                or not alive[j]
                or nxt[i] != j
                or ver[i] != vi
                or ver[j] != vj
            ):
                continue  # stale: one endpoint already merged away
            symbols[i] += symbols[j]
            ver[i] += 1
            alive[j] = False
            nj = nxt[j]
            nxt[i] = nj
            if nj != -1:
                prv[nj] = i
                r2 = ranks.get((symbols[i], symbols[nj]))
                if r2 is not None:
                    heapq.heappush(heap, (r2, i, ver[i], ver[nj], nj))
            pi = prv[i]
            if pi != -1:
                r3 = ranks.get((symbols[pi], symbols[i]))
                if r3 is not None:
                    heapq.heappush(heap, (r3, pi, ver[pi], ver[i], i))
        return tuple(s for k, s in enumerate(symbols) if alive[k])

    def _tokenize(batches):
        # per-partition word cache: natural text repeats words heavily
        # (Zipf), so most words encode via one dict hit
        cache: dict = {}
        for pdf in batches:
            col = []
            for text in pdf[text_col]:
                if text is None:
                    col.append(None)
                    continue
                s = text.lower() if lowercase else text
                toks = []
                for w in s.split():
                    enc = cache.get(w)
                    if enc is None:
                        if len(cache) > 1_000_000:
                            cache.clear()  # bound executor memory
                        enc = cache[w] = _encode_word(w)
                    toks.extend(enc)
                col.append(toks)
            yield pdf.assign(**{out: col})

    return df.mapInPandas(_tokenize, schema=out_schema)


# ---------------------------------------------------------------------
# Trained quality filter (GPT-3 / CCNet style)
# ---------------------------------------------------------------------


def _hashed_token_features(
    df: DataFrame, text_col: str, num_features: int, out: str = "__features"
):
    """Hashed bag-of-words features over the shared whitespace
    tokenizer (HashingTF is a pure transformer — no fit, fully
    deterministic, map-only)."""
    from pyspark.ml.feature import HashingTF

    toks = df.withColumn("__toks", _tokens(_norm_ws(F.lower(F.col(text_col)))))
    tf = HashingTF(inputCol="__toks", outputCol=out, numFeatures=num_features)
    return tf.transform(toks).drop("__toks")


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 20,
    reg_param: float = 0.0,
    max_iter: int = 50,
):
    """Train the GPT-3-style document-quality filter (Brown et al.
    2020 appendix A; CCNet, Wenzek et al. 2020 — public literature):
    logistic regression over hashed bag-of-words, positive = curated
    reference corpus, negative = raw crawl sample.  Returns the
    fitted ``LogisticRegressionModel``.

    Spark-first shape: HashingTF is map-only (no vocabulary fit, no
    driver state), and MLlib's LogisticRegression optimizes with
    distributed treeAggregate gradient passes — both sides scale to
    corpus-sized training sets without collecting anything.  1M hash
    buckets keeps collision probability per discriminative token
    ~vocab/2^20 while the coefficient vector stays ~8 MB broadcast.

    Deterministic: hashing is seedless murmur3, L-BFGS from a fixed
    zero start.  Score with ``quality_classifier_scores``; the
    standard pipeline keeps documents above a probability threshold
    or importance-samples on the score (the GPT-3 Pareto trick).
    """
    from pyspark.ml.classification import LogisticRegression

    train = _hashed_token_features(
        positive.select(F.col(text_col)).withColumn("label", F.lit(1.0)).unionByName(
            negative.select(F.col(text_col)).withColumn("label", F.lit(0.0))
        ),
        text_col,
        num_features,
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    return lr.fit(train)


def quality_classifier_scores(
    df: DataFrame,
    model,
    text_col: str = "text",
    prob_col: str = "quality_prob",
    pred_col: str = "quality_pred",
) -> DataFrame:
    """Score documents with a trained quality classifier: appends the
    positive-class probability (rounded 6dp for cross-engine
    comparability) and the 0/1 prediction.  Map-only: the coefficient
    vector broadcasts with the plan; nothing shuffles."""
    from pyspark.ml.functions import vector_to_array

    feats = _hashed_token_features(
        df, text_col, model.numFeatures if hasattr(model, "numFeatures") else 1 << 20
    )
    scored = model.transform(
        feats.withColumnRenamed("__features", model.getFeaturesCol())
        if model.getFeaturesCol() != "__features"
        else feats
    )
    return (
        scored.withColumn(
            prob_col,
            F.round(vector_to_array(F.col(model.getProbabilityCol()))[1], 6),
        )
        .withColumn(pred_col, F.col(model.getPredictionCol()))
        .drop(
            model.getFeaturesCol(),
            model.getRawPredictionCol(),
            model.getProbabilityCol(),
            model.getPredictionCol(),
        )
    )


def linear_score(
    df: DataFrame,
    weights: dict[str, float],
    bias: float = 0.0,
    out: str = "score",
    link: str = "logistic",
    decimals: int = 6,
) -> DataFrame:
    """Apply an EXPORTED linear model over existing feature columns:
    ``out = link(bias + Σ w_c · col_c)``.

    The deployment half of a model trained anywhere (sklearn
    ``coef_``, a fasttext projection, `train_quality_classifier`
    coefficients): the weights compile into one codegen'd arithmetic
    expression — map-only, nothing broadcast, no MLlib requirement at
    scoring time, cross-engine reproducible (rounded to ``decimals``).
    ``link``: 'logistic' (sigmoid probability) or 'identity' (raw
    margin)."""
    z: Column = F.lit(float(bias))
    for col_name, w in weights.items():
        z = z + F.col(col_name) * F.lit(float(w))
    if link == "logistic":
        val = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    elif link == "identity":
        val = z
    else:
        raise ValueError(f"unknown link: {link!r}")
    return df.withColumn(out, F.round(val, decimals))


# Unicode script blocks profiled by script_profile.  \x{...} escapes
# parse identically under Java regex and RE2, keeping the op
# oracle-checkable; blocks are the dominant base ranges, not full
# Unicode script properties (a heuristic profile, not ICU)
SCRIPT_BLOCKS: dict[str, str] = {
    "latin": r"A-Za-z",
    "cyrillic": r"\x{0400}-\x{04FF}",
    "greek": r"\x{0370}-\x{03FF}",
    "arabic": r"\x{0600}-\x{06FF}",
    "hebrew": r"\x{0590}-\x{05FF}",
    "devanagari": r"\x{0900}-\x{097F}",
    "cjk": r"\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}",
}


def script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document writing-system profile: for each block in
    ``SCRIPT_BLOCKS`` the fraction of NON-SPACE characters falling in
    that block (``<name>_ratio``, 6dp), plus ``dominant_script`` —
    the first block in declaration order holding a strict-or-equal
    maximum, or 'other' when no block matches anything (pure
    digits/punctuation/empty).

    The multilingual-corpus routing signal that runs BEFORE lang_id:
    script is a single regex count per block (codegen'd, map-only, no
    vocabulary), and most routing decisions (CJK tokenizer vs Latin
    BPE, RTL handling) need only the script.  Counts share one
    materialized ``__nsp`` char-total column — the usual
    CollapseProject guard."""
    text = F.col(text_col)
    staged = df.withColumn(
        "__nsp", F.length(F.regexp_replace(text, r"\s", ""))
    )
    nsp = F.col("__nsp")
    for name, block in SCRIPT_BLOCKS.items():
        cnt = F.length(F.regexp_replace(text, f"[^{block}]", ""))
        staged = staged.withColumn(f"__c_{name}", cnt)
    for name in SCRIPT_BLOCKS:
        ratio = F.when(
            nsp > 0, F.round(F.col(f"__c_{name}") / nsp, 6)
        ).otherwise(F.lit(0.0))
        staged = staged.withColumn(f"{name}_ratio", ratio)
    best = F.greatest(*[F.col(f"__c_{n}") for n in SCRIPT_BLOCKS])
    dom = F.lit("other")
    for name in reversed(list(SCRIPT_BLOCKS)):
        dom = F.when(
            (F.col(f"__c_{name}") == best) & (best > 0), F.lit(name)
        ).otherwise(dom)
    staged = staged.withColumn("dominant_script", dom)
    return staged.drop("__nsp", *[f"__c_{n}" for n in SCRIPT_BLOCKS])


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_ratio: float = 1.0,
    include_postings: bool = True,
) -> DataFrame:
    """Build an inverted index over the corpus: one row per surviving
    term with its document frequency, total term frequency, and
    (optionally) the posting list — the retrieval-side data structure
    behind every keyword search / BM25 serving path, and the exact
    aggregate a contamination or attribution lookup needs.

    ``min_df`` drops hapax noise; ``max_df_ratio`` drops stopword-like
    terms present in more than that fraction of documents (the
    classic df-band).  Postings are emitted as a comma-joined string
    of doc ids in ascending id order — a deterministic, engine-
    portable rendering (array hashing is driver-dependent); set
    ``include_postings=False`` to keep only the statistics when
    posting payloads would dominate the output (the (term, doc, tf)
    intermediate is the scalable index — the string is presentation).

    Exactness: df/tf are exact BIGINTs; the posting string is an
    exact ordered rendering.  Scale: explode → one (term, doc) keyed
    count (map-side partial) → one term-keyed agg; the df-band
    filters apply BEFORE posting-string materialization so stopword
    postings never concatenate.  N (corpus size) rides in as a 1-row
    broadcast, keeping the plan fully lazy."""
    if min_df < 1 or not 0.0 < max_df_ratio <= 1.0:
        raise ValueError(
            "inverted_index: need min_df >= 1 and 0 < max_df_ratio <= 1"
        )
    toks = _tokens(_norm_ws(F.lower(F.col(text_col))))
    td = (
        df.select(F.col(id_col).alias("__doc"), toks.alias("__t"))
        .select("__doc", F.explode("__t").alias("term"))
        .groupBy("term", "__doc")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    n_docs = df.select(
        F.countDistinct(id_col).alias("__n")
    )
    stats = td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_docs"),
        F.sum("__tf").alias("total_tf"),
    )
    banded = (
        stats.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df_docs") >= int(min_df))
            & (
                F.col("df_docs").cast("double")
                <= F.lit(float(max_df_ratio)) * F.col("__n").cast("double")
            )
        )
        .drop("__n")
    )
    if not include_postings:
        return banded
    postings = (
        td.join(banded.select("term"), "term")
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("__doc")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return banded.join(postings, "term")


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Adjacent-bigram collocation mining with pointwise mutual
    information — "which word pairs travel together?" (multi-word
    expressions, tokenizer-merge candidates, prompt-template
    detection in crawl corpora):

        pmi = ln( (c_xy · T) / (c_x · c_y) )

    over bigram count c_xy, unigram counts c_x/c_y, and the corpus
    bigram total T.

    Exactness: all counts are exact BIGINTs and oracle-comparable;
    ``pmi`` crosses ``ln`` (1-ulp libm skew — psi_bin precedent), so
    oracle queries drop it and pytest pins the formula.  The ratio
    argument itself is one division of DECIMAL(19,0)² products —
    exact.

    Scale: bigrams come from ONE codegen'd transform over the token
    array (no posexplode self-join), then two keyed counts; unigram
    counts broadcast back onto the (vocab²-bounded, min_count-
    filtered) bigram table.  Output: w1, w2, pair_count, w1_count,
    w2_count, total_bigrams, pmi."""
    if min_count < 1:
        raise ValueError("collocations: need min_count >= 1")
    from bubbles_spark.ops.core import pushdown_fence

    toks = _tokens(_norm_ws(F.lower(F.col(text_col))))
    # Fence __t: PushDownPredicates otherwise re-inlines the tokenizer
    # into the size() predicate at the scan (runs twice per row).
    base = pushdown_fence(df.select(toks.alias("__t")), "__t").filter(
        F.size("__t") >= 2
    )
    # adjacent pairs via one sequence-transform (codegen'd; arrays
    # are 1-indexed under element_at)
    bigrams = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - 1),
                lambda i: F.struct(
                    F.element_at("__t", i).alias("w1"),
                    F.element_at("__t", i + 1).alias("w2"),
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pair_counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= int(min_count))
    )
    # unigram occurrences (all tokens, not bigram corners — the
    # standard denominator)
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = bigrams.agg(F.count(F.lit(1)).alias("total_bigrams"))
    ratio = (
        F.col("pair_count").cast("decimal(19,0)")
        * F.col("total_bigrams").cast("decimal(19,0)")
    ).cast("double") / (
        F.col("w1_count").cast("decimal(19,0)")
        * F.col("w2_count").cast("decimal(19,0)")
    ).cast("double")
    return (
        pair_counts.join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("w1_count"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("w2_count"))),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2", "pair_count", "w1_count", "w2_count",
            "total_bigrams", F.log(ratio).alias("pmi"),
        )
    )


def reading_level(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease estimate per document — the classic
    text-difficulty screen for training-mix curation (pair with
    ``quality_score``; prose around 60–70, academic text below 30):

        flesch = 206.835 − 1.015·(words/sentences)
                         − 84.6·(syllables/words)

    with the standard cheap proxies: words = whitespace tokens,
    sentences = ``[.!?]+`` runs (min 1 so fragments still score),
    syllables = vowel-group runs ``[aeiouy]+`` (min 1 per word).
    All three are exact integer counts from codegen'd regex scans,
    and the formula is polynomial — unlike the ln-crossing scores,
    the WHOLE report is engine-exact.

    Scale: map-only, no shuffle.  Output: id_col, n_words,
    n_sentences, n_syllables, flesch (NULL for empty docs)."""
    norm = _norm_ws(F.lower(F.col(text_col)))
    n_words = _token_count(F.col(text_col)).cast("bigint")
    n_sent = F.greatest(
        F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")),
        F.lit(1),
    ).cast("bigint")
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        norm.alias("__n"),
    )
    out = out.withColumn(
        "n_syllables",
        F.greatest(
            F.size(F.expr("regexp_extract_all(__n, '[aeiouy]+', 0)")),
            F.col("n_words"),
        ).cast("bigint"),
    )
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    y = F.col("n_syllables").cast("double")
    flesch = F.when(
        F.col("n_words") > 0,
        F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w),
    )
    return out.select(
        id_col, "n_words", "n_sentences", "n_syllables",
        flesch.alias("flesch"),
    )


def vocab_richness(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Chao1 vocabulary-richness estimate — "how many distinct tokens
    does this corpus REALLY have, counting the ones we haven't seen
    yet?" (Chao 1984/1987, public; the species-richness estimator
    ecology uses, applied to token types).  The singleton/doubleton
    ratio carries the unseen mass: the bias-corrected form
    ``chao1 = D + f1·(f1−1) / (2·(f2+1))`` is defined even with no
    doubletons, where D is the observed distinct-token count and
    f1/f2 the tokens seen exactly once/twice.  Drives corpus-growth
    decisions (a chao1 far above D says more crawl still buys new
    vocabulary) and tokenizer-coverage checks.

    Tokens are the shared lowercase whitespace normal form
    (``_tokens``), so the numbers line up with ``term_doc_freq`` /
    ``tf_idf``.

    Exactness: D, total, f1, f2 are exact integer aggregates over the
    per-token counts (map-side combined; Zipf-skew-safe for the same
    reason as ``term_doc_freq``); the correction term is ONE division
    of exact-integer-valued doubles (the f1·(f1−1) product is
    computed in BIGINT first — in raw doubles it would pass 2^53 long
    before a web corpus runs out of singletons), plus one add.

    Scale: one token explode + one keyed count (the term_doc_freq
    shuffle), then a 1-row global aggregate.

    Output (one row): n_tokens, d_observed, f1_singletons,
    f2_doubletons, chao1."""
    toks = df.select(
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("__t")
    )
    counts = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__c"))
    agg = counts.agg(
        F.sum("__c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("d_observed"),
        F.sum((F.col("__c") == 1).cast("int")).cast("bigint")
        .alias("f1_singletons"),
        F.sum((F.col("__c") == 2).cast("int")).cast("bigint")
        .alias("f2_doubletons"),
    )
    num = (
        F.col("f1_singletons") * (F.col("f1_singletons") - 1)
    ).cast("double")
    den = (F.lit(2) * (F.col("f2_doubletons") + 1)).cast("double")
    chao1 = F.when(
        F.col("d_observed") > 0,
        F.col("d_observed").cast("double") + num / den,
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint")
        .alias("n_tokens"),
        "d_observed",
        F.coalesce(F.col("f1_singletons"), F.lit(0)).cast("bigint")
        .alias("f1_singletons"),
        F.coalesce(F.col("f2_doubletons"), F.lit(0)).cast("bigint")
        .alias("f2_doubletons"),
        chao1.alias("chao1"),
    )


def distinctive_terms(
    df: DataFrame,
    label_col: str,
    target,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Corpus-comparison report: which terms are DISTINCTIVE of the
    ``label_col == target`` slice vs the rest of the corpus?  The
    add-one-smoothed odds ratio per term —
    ``OR = ((a+1)·(B−b+1)) / ((b+1)·(A−a+1))`` with a/b the term's
    occurrence counts and A/B the slices' token totals — is the
    monotone core of the log-odds "Fightin' Words" statistic (Monroe
    et al. 2008, public) without the ln, so it stays oracle-exact:
    every cross product is an exact integer (DECIMAL(38,0) — no
    2⁵³ ceiling at corpus scale) and the ratio is ONE IEEE division
    of two correctly-rounded casts.

    Top-k by ratio descending, term ascending — ratio ties (same
    exact rational) break on the unique term, so the cut is a total
    order and deterministic in any engine.

    Scale: explode → term-keyed conditional counts (map-side
    combined — Zipf head terms arrive as one partial per mapper), two
    scalar token totals via a broadcast 1-row fold, then a global
    top-k (TakeOrdered — no full sort).

    Output: term, n_target (bigint), n_rest (bigint), odds_ratio
    (double)."""
    base = df.filter(
        F.col(label_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(
        (F.col(label_col) == F.lit(target)).alias("__t"),
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    per_term = base.groupBy("term").agg(
        F.sum(F.col("__t").cast("bigint")).cast("bigint").alias("n_target"),
        F.sum((~F.col("__t")).cast("bigint")).cast("bigint").alias("n_rest"),
    )
    tot = per_term.groupBy().agg(
        F.sum("n_target").cast("bigint").alias("__A"),
        F.sum("n_rest").cast("bigint").alias("__B"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    j = per_term.crossJoin(F.broadcast(tot))
    num = d(F.col("n_target") + 1) * (F.col("__B") - F.col("n_rest") + 1)
    den = d(F.col("n_rest") + 1) * (F.col("__A") - F.col("n_target") + 1)
    return (
        j.filter(F.col("n_target") + F.col("n_rest") >= int(min_count))
        .select(
            "term",
            "n_target",
            "n_rest",
            (num.cast("double") / den.cast("double")).alias("odds_ratio"),
        )
        .orderBy(F.col("odds_ratio").desc(), "term")
        .limit(int(top_k))
    )


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Compression-ratio quality signal — ``deflate_bytes /
    utf8_bytes`` per document: boilerplate, templated spam, and
    repeated spans compress far below prose (a ratio ≪ 1 flags
    machine-generated filler; ≈ 1 flags high-entropy noise/base64).
    The classic corpus-prep filter alongside ``repetition_ratio``
    (which sees only n-gram repeats) and ``quality_score``.

    Compression is not expressible in Catalyst, so this is an honest
    Arrow-batched ``mapInPandas`` seam (the ``filter_by_predicate``
    escape-hatch posture): zlib at a FIXED level, map-only, no
    shuffle, no state.  Deterministic for a given zlib build; exact
    values are pytest-pinned against the same library, and the
    driver's check is rows-only (no SQL engine has deflate).

    Output: id_col, byte_len, compressed_len (bigint), ratio
    (double; NULL for empty text)."""
    import pandas as pd

    lvl = int(level)
    # id field keeps the caller's type (string/int doc ids are
    # legal), not a hardcoded long
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"`{id_col}` {id_type}, byte_len long, "
        f"compressed_len long, ratio double"
    )

    def run(batches):
        import zlib

        for pdf in batches:
            texts = pdf[text_col].fillna("")
            raw = [t.encode("utf-8") for t in texts]
            blen = [len(b) for b in raw]
            clen = [len(zlib.compress(b, lvl)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": blen,
                    "compressed_len": clen,
                    "ratio": [
                        (c / b) if b > 0 else None
                        for b, c in zip(blen, clen)
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
