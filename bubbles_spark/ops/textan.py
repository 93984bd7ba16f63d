"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.14).

Not in the reference — these are the training-data-pipeline
extensions (language ID, quality scoring, token counting, document
fingerprinting) over the `documents` table shape
(doc_id, text, lang, source, n_chars).

Everything below is built-in Column expressions (JVM, codegen) — no
Python UDFs — so each operator is a map-only stage that scales
linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# tokens
# ---------------------------------------------------------------------


def _tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count."""
    return df.withColumn(out, F.size(_tokens(F.col(text_col))).cast("long"))


def bpe_token_estimate(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """BPE-ish token-count estimate without a tokenizer model: count
    regex word/number/punct pieces, then add a length correction
    (≈1 token per 4 chars within long words — the usual BPE budget
    heuristic).  Deterministic and cheap; swap in a real tokenizer via
    mapInPandas when the model file is available."""
    text = F.col(text_col)
    pieces = F.size(
        F.filter(F.split(text, r"[^\w]+"), lambda t: t != "")
    )
    long_word_extra = F.aggregate(
        F.filter(F.split(text, r"\s+"), lambda t: F.length(t) > 4),
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

    Adds columns: n_chars_q, n_tokens, mean_token_len,
    stopword_ratio, punct_ratio, distinct_token_ratio, quality.
    All ratios rounded to 6dp for cross-engine comparability.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(list(_STOPWORDS))))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    mean_tok = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)) / n_tok,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))

    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), 0.25).otherwise(0.0)
        + F.when((mean_tok >= 2.0) & (mean_tok <= 12.0), 0.25).otherwise(0.0)
        + F.when(stop_ratio >= 0.01, 0.25).otherwise(0.0)
        + F.when(distinct_ratio >= 0.1, 0.25).otherwise(0.0)
    )
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("mean_token_len", F.round(mean_tok, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("distinct_token_ratio", F.round(distinct_ratio, 6))
        .withColumn("quality", F.round(score, 6))
    )


# ---------------------------------------------------------------------
# language ID (n-gram/charset heuristic)
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
    by fixed language order; no hits → 'und')."""
    text = F.col(text_col)
    toks = F.transform(_tokens(text), lambda t: F.lower(t))

    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers)))
        for lang, markers in _LANG_MARKERS.items()
    }
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # fixed iteration order = deterministic tie-break (> not >=)
    for lang in ["en", "es", "de", "fr"]:
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)

    pred = (
        F.when(text.rlike("[一-鿿]"), F.lit("zh"))
        .when(text.rlike("[぀-ヿ]"), F.lit("ja"))
        .when(text.rlike("[Ѐ-ӿ]"), F.lit("ru"))
        .when(text.rlike("[Ͱ-Ͽ]"), F.lit("el"))
        .otherwise(best_lang)
    )
    return df.withColumn(out, pred)


# ---------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------


def fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """Canonical document fingerprint: md5 of the sorted distinct
    token multiset-free form (the "key collision" fingerprint —
    normalization + sort makes word order and repetition irrelevant,
    so it catches shuffled/duplicated-content docs that exact-hash
    misses).  md5 (not xxhash) so external engines can reproduce it.
    """
    toks = F.array_sort(F.array_distinct(_tokens(F.lower(F.col(text_col)))))
    return df.withColumn(out, F.md5(F.array_join(toks, " ").cast("binary")))


def content_hash(df: DataFrame, text_col: str = "text", out: str = "content_hash") -> DataFrame:
    """Exact-content hash (md5 of raw text) — the exact-dedup key."""
    return df.withColumn(out, F.md5(F.col(text_col).cast("binary")))
