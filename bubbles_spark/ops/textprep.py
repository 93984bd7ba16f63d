"""Text cleaning / redaction operators for LLM training-data
pipelines (SURVEY.md §2.14 extensions; not in the reference).

Same codegen discipline as textan.py: regex scans and collection
expressions only — every operator here is a map-only stage except the
corpus-level paragraph dedup, which shuffles (hash, id) pairs only.

Regex portability rule: patterns avoid lookaround and backreferences
so the SAME pattern runs on Java regex (Spark) and RE2 (DuckDB and
most external engines) — that keeps every operator oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed application order: more-specific patterns first so e.g. an
# SSN never half-matches as a phone number
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    "phone": (r"\+?\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
    "ipv4": (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
}

URL_PATTERN = r"https?://[^\s]+"
DOMAIN_PATTERN = r"https?://([^/\s]+)"


def pii_mask(
    df: DataFrame,
    text_col: str = "text",
    out: str | None = None,
    kinds: Sequence[str] = ("email", "ssn", "phone", "ipv4"),
) -> DataFrame:
    """Redact PII-shaped spans with typed placeholder tokens (the
    standard pre-training scrub).  One regexp_replace per kind,
    applied in the declared order — a single codegen'd map stage, no
    shuffle, ~regex-scan cost per kind.

    Heuristic by design (regex PII detection is recall-limited);
    deterministic and cross-engine reproducible.
    """
    col = F.col(text_col)
    for kind in kinds:
        try:
            pattern, token = PII_PATTERNS[kind]
        except KeyError:
            raise ValueError(f"unknown PII kind: {kind!r}")
        col = F.regexp_replace(col, pattern, token)
    return df.withColumn(out or text_col, col)


def extract_urls(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (doc, url) with the registrable host split out:
    (id, url, domain).  regexp_extract_all + explode — map-only, the
    fan-out is bounded by URLs-per-doc."""
    urls = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)).alias(
            "url"
        ),
    )
    return urls.withColumn("domain", F.regexp_extract("url", DOMAIN_PATTERN, 1))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per URL — the min-id winner (deterministic, same
    contract as exact_dedup).  Shuffles (url, id) only; min_by is a
    partial-aggregating min, so the reduce side sees one candidate
    per (url, mapper)."""
    winners = df.groupBy(url_col).agg(F.min(id_col).alias(id_col))
    return winners.join(df, on=[url_col, id_col], how="inner")


def domain_filter(
    df: DataFrame,
    blocklist,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "discard",
) -> DataFrame:
    """Drop (``discard``) or keep-only (``keep``) documents that link
    to a listed registrable domain — the URL-blocklist pass every web
    training corpus runs (spam/adult/SEO domain lists).

    Scale shape: the blocklist is dimension-sized (thousands to a few
    million domains) against a 100 TB corpus — it BROADCASTS; the
    corpus never shuffles.  Domains extract map-side (extract_urls is
    regex codegen), the flagged-doc set is a broadcast semi-join, and
    the final filter is a doc-id anti/semi join that AQE plans against
    the (small, already-aggregated) flagged set.

    ``blocklist``: an iterable of domain strings or a single-column
    DataFrame.
    """
    if mode not in ("discard", "keep"):
        raise ValueError("mode must be 'discard' or 'keep'")
    if isinstance(blocklist, DataFrame):
        bl = blocklist.toDF("domain")
    else:
        from bubbles_spark.ops.core import local_table

        bl = local_table(
            df.sparkSession, [(d,) for d in blocklist], "domain string"
        )
    doms = extract_urls(df, id_col, text_col).select(id_col, "domain")
    flagged = (
        doms.join(F.broadcast(bl), "domain", "left_semi")
        .select(id_col)
        .distinct()
    )
    how = "left_anti" if mode == "discard" else "left_semi"
    return df.join(flagged, id_col, how)


def repetition_ratio(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    out: str = "repetition_ratio",
) -> DataFrame:
    """Fraction of word n-grams that are repeats of an earlier n-gram
    in the same document: 1 - distinct/total (Gopher-style repetition
    quality signal; 0 = no repetition).  Rounded to 6dp for
    cross-engine comparability.

    The n-gram array is materialized ONCE as a column before the
    distinct count (the round-1 MinHash lesson: never inline an
    expression tree inside repeated evaluation).  Map-only stage.
    """
    from bubbles_spark.ops.textan import _tokens

    # Materialize tokens and grams as REAL columns before anything
    # references them repeatedly.  An expression referenced inside a
    # HOF lambda (or twice, as total + distinct below) is re-inlined
    # and re-evaluated per use — per gram slot for the tokenizer —
    # which is the measured 2000× MinHash blowup from round 1.
    # Measured here: 11.9s → 0.4s at sf0.1 from this restructure.
    with_toks = df.withColumn("__toks", _tokens(F.lower(F.col(text_col))))
    toks = F.col("__toks")
    if n == 1:
        grams = toks
    else:
        # slice-join per position over the materialized token column.
        # Guarded: F.sequence(0, -1) would generate a DESCENDING
        # sequence (not an empty one) for docs shorter than n tokens.
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    with_grams = with_toks.withColumn("__g", grams)
    total = F.size(F.col("__g"))
    distinct = F.size(F.array_distinct(F.col("__g")))
    ratio = F.when(total > 0, F.round(1.0 - distinct / total, 6)).otherwise(0.0)
    return with_grams.withColumn(out, ratio).drop("__toks", "__g")


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    flag_col: str = "contaminated",
) -> DataFrame:
    """Train/test decontamination: flag documents sharing any word
    n-gram with a benchmark corpus (the standard 13-gram overlap
    check).  Adds a boolean ``flag_col``.

    Plan: both sides shingle (distinct n-grams via the codegen'd
    regex scan from ops.dedup), explode, and hash — the join carries
    (gram_hash, id) only, never text.  The benchmark side distincts
    to a tiny hash set, so AQE broadcasts it and the document side
    NEVER shuffles; flagged ids (a small set) broadcast back onto the
    input.  Total cost at 100 TB: one map scan of the corpus + two
    broadcast joins.
    """
    from bubbles_spark.ops.dedup import with_shingles

    bench_grams = (
        with_shingles(benchmark.select(bench_text_col), bench_text_col, n, "__sh")
        .select(F.explode("__sh").alias("__g"))
        .select(F.xxhash64("__g").alias("__h"))
        .distinct()
    )
    doc_grams = (
        with_shingles(docs.select(id_col, text_col), text_col, n, "__sh")
        .select(id_col, F.explode("__sh").alias("__g"))
        .select(id_col, F.xxhash64("__g").alias("__h"))
    )
    flagged = doc_grams.join(bench_grams, "__h").select(id_col).distinct()
    return docs.join(
        flagged.withColumn(flag_col, F.lit(True)), id_col, "left"
    ).fillna({flag_col: False})


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 13,
    min_docs: int = 2,
    lowercase: bool = False,
) -> DataFrame:
    """Per-document duplicated-span statistics — the distributed
    approximation of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 §4.1 ExactSubstr — public literature): a doc's
    span is "duplicated" when the same ``span_words``-word window
    occurs verbatim in at least ``min_docs`` distinct documents.

    Returns (id_col, total_spans, dup_spans, dup_fraction) for every
    doc with at least one span (≥ ``span_words`` whitespace tokens);
    counts are over the doc's DISTINCT spans.  Use dup_fraction as a
    removal/trim signal the way ExactSubstr uses repeated 50-token
    substrings — rolling word windows make the check shuffle-friendly
    where a true distributed suffix array is not.

    Scale shape: spans materialize map-side (the same guarded
    slice-join as repetition_ratio — no lambda re-inlining), dedup
    per-doc BEFORE the explode, and leave the executor only as
    (doc_id, xxhash64) pairs — text never shuffles.  Span doc-
    frequency is one partial-aggregated groupBy on the hash; the
    dup-span set joins back as ONE row per hash (no pair explosion,
    boilerplate spans stay safe), then a groupBy on doc_id.  ~3
    shuffles of fixed-width rows total at any corpus size.
    """
    from bubbles_spark.ops.core import pushdown_fence
    from bubbles_spark.ops.textan import _tokens

    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    # Fence __toks: without it PushDownPredicates re-inlines the whole
    # tokenizer into the size() predicate at the scan (regex + split run
    # twice per row per branch — measured 2.44 s vs 1.9x less fenced).
    with_toks = pushdown_fence(
        df.select(F.col(id_col), _tokens(text).alias("__toks")), "__toks"
    ).filter(F.size("__toks") >= span_words)
    spans = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("__toks") - span_words),
            lambda i: F.xxhash64(F.array_join(F.slice(F.col("__toks"), i + 1, span_words), " ")),
        )
    )
    per_doc = with_toks.select(
        id_col, F.explode(spans).alias("__h")
    )  # distinct (doc, hash) rows by construction
    totals = per_doc.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("total_spans")
    )
    dup_hashes = (
        per_doc.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("__h")
    )
    dups = (
        per_doc.join(dup_hashes, "__h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("dup_spans"))
    )
    return (
        totals.join(dups, id_col, "left")
        .fillna({"dup_spans": 0})
        .select(
            id_col,
            "total_spans",
            "dup_spans",
            F.round(F.col("dup_spans") / F.col("total_spans"), 6).alias(
                "dup_fraction"
            ),
        )
    )


def top_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 13,
    k: int = 20,
    lowercase: bool = False,
) -> DataFrame:
    """The k most cross-document-duplicated spans WITH their text —
    the diagnostic twin of ``duplicated_spans`` (what boilerplate is
    poisoning the corpus?).  Returns (span, doc_freq) ordered by
    doc_freq desc, span asc (deterministic ties).

    This one does shuffle span text (needed in the output), but only
    after per-partition partial aggregation of per-doc-distinct
    spans; the result is bounded by TakeOrdered k."""
    from bubbles_spark.ops.core import pushdown_fence
    from bubbles_spark.ops.textan import _tokens

    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    # Same pushdown fence as duplicated_spans: keep the tokenizer out of
    # the size() predicate (it re-inlines at the scan otherwise).
    with_toks = pushdown_fence(
        df.select(F.col(id_col), _tokens(text).alias("__toks")), "__toks"
    ).filter(F.size("__toks") >= span_words)
    spans = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("__toks") - span_words),
            lambda i: F.array_join(F.slice(F.col("__toks"), i + 1, span_words), " "),
        )
    )
    return (
        with_toks.select(F.explode(spans).alias("span"))
        .groupBy("span")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
        .filter(F.col("doc_freq") >= 2)
        .orderBy(F.col("doc_freq").desc(), F.col("span").asc())
        .limit(k)
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 13,
    lowercase: bool = False,
) -> DataFrame:
    """ExactSubstr REMOVAL (Lee et al. 2022, arXiv:2107.06499 §4.1 —
    the step beyond ``duplicated_spans``' statistics): every token
    covered by a ``span_words``-word window that also occurs in
    another document is CUT from all but the lowest-``id_col``
    document containing that span; the winner keeps its text intact.
    Overlapping removals merge naturally (coverage is a position
    set).  Returns the input with ``text_col`` rewritten and an
    appended ``n_removed_tokens``.

    Contract: untouched documents keep their original text verbatim;
    a rewritten document's text is rebuilt from its tokens (i.e.
    whitespace-normalized, and lowercased when ``lowercase``).

    Scale shape: span hashes and positions move as fixed-width rows
    (never text); the winner table is one row per duplicated hash
    (no pair explosion — a boilerplate span in a million docs still
    aggregates to a single row); only documents that actually lose
    tokens pay the explode + ordered-reassembly path (the same
    collect/sort rebuild contract as paragraph_dedup, bounded per
    doc).
    """
    from bubbles_spark.ops.core import pushdown_fence
    from bubbles_spark.ops.textan import _tokens

    text = F.col(text_col)
    if lowercase:
        text = F.lower(text)
    # Fenced for the same reason as duplicated_spans; this operator's
    # plan re-reads toks through several branches, so the re-inlined
    # tokenizer showed up 30x in the unfenced optimized plan.
    toks = pushdown_fence(
        df.select(F.col(id_col).alias("__id"), _tokens(text).alias("__toks")),
        "__toks",
    )
    with_spans = toks.filter(F.size("__toks") >= span_words)
    span_hashes = F.transform(
        F.sequence(F.lit(0), F.size("__toks") - span_words),
        lambda i: F.xxhash64(
            F.array_join(F.slice(F.col("__toks"), i + 1, span_words), " ")
        ),
    )
    spans = with_spans.select(
        "__id", F.posexplode(span_hashes).alias("__pos", "__h")
    )
    # one row per (hash): winner id + distinct-doc count
    per_doc = spans.select("__id", "__h").distinct()
    winners = per_doc.groupBy("__h").agg(
        F.min("__id").alias("__w"), F.count(F.lit(1)).alias("__nd")
    )
    dup_hashes = winners.filter(F.col("__nd") >= 2).select("__h", "__w")
    # covered token positions in losing docs (winner keeps its copy)
    covered = (
        spans.join(dup_hashes, "__h")
        .filter(F.col("__id") != F.col("__w"))
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__pos"), F.col("__pos") + span_words - 1)
            ).alias("__k"),
        )
        .distinct()
    )
    removed_counts = covered.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_removed_tokens")
    )
    # rebuild ONLY the losing docs: explode their tokens, anti-join
    # the covered positions, ordered reassembly.  covered descends
    # from the SAME toks lineage as the exploded side — without the
    # explicit rename the name-based join degenerates into the
    # ambiguous-self-join trap (the id equality resolves both sides
    # to one attribute and every position covered in ANY doc strips
    # every doc — paragraph_dedup hit the same hazard in round 2)
    cov = covered.select(
        F.col("__id").alias("__cov_id"), F.col("__k").alias("__cov_k")
    )
    losing = toks.join(removed_counts.select("__id"), "__id")
    kept = (
        losing.select("__id", F.posexplode("__toks").alias("__k", "__tok"))
        .join(
            cov,
            (F.col("__id") == F.col("__cov_id"))
            & (F.col("__k") == F.col("__cov_k")),
            "left_anti",
        )
        .groupBy("__id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__k", "__tok"))),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias("__newtext")
        )
    )
    rewritten = removed_counts.join(kept, "__id", "left").withColumn(
        "__newtext", F.coalesce("__newtext", F.lit(""))
    )
    out = (
        df.join(
            rewritten.withColumnRenamed("__id", id_col),
            id_col,
            "left",
        )
        .withColumn(text_col, F.coalesce("__newtext", F.col(text_col)))
        .fillna({"n_removed_tokens": 0})
        .drop("__newtext")
    )
    return out


def shuffle_rows(df: DataFrame, seed: int = 0, partitions: int | None = None) -> DataFrame:
    """Deterministic global shuffle (the pre-training randomization
    pass): order rows by a seeded xxhash of the full row.  Same seed ⇒
    same permutation on every run and every retry (unlike
    ``F.rand``-based shuffles, which break task-retry determinism).

    repartitionByRange on the hash + sortWithinPartitions gives a
    total order across output files without a single-task global
    sort — each range partition sorts independently at any scale."""
    key = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
    out = df.withColumn("__shuffle_key", key)
    out = (
        out.repartitionByRange(partitions, "__shuffle_key")
        if partitions
        else out.repartitionByRange("__shuffle_key")
    )
    return out.sortWithinPartitions("__shuffle_key").drop("__shuffle_key")


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    by: str = "source",
    order_by: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    seq_col: str = "seq_id",
) -> DataFrame:
    """Assign documents to fixed-budget training sequences
    (concat-then-chunk packing): within each ``by`` group, documents
    in ``order_by`` order fill sequence ``floor(prefix_tokens /
    max_tokens)`` — a document straddling a boundary belongs to the
    sequence where it starts (standard packing-with-overflow).

    One shuffle on ``by`` + per-group ordered window (the sessionize
    shape); groups pack independently, so 1000 executors pack 1000
    sources at once.  ``token_col`` defaults to a whitespace token
    count computed on the fly."""
    from bubbles_spark.ops.textan import _token_count

    if token_col is None:
        df = df.withColumn("__ntok", _token_count(F.col(text_col)).cast("long"))
        token_col = "__ntok"
    w = (
        Window.partitionBy(by)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix_excl = F.sum(token_col).over(w) - F.col(token_col)
    out = df.withColumn(
        seq_col, F.floor(prefix_excl / F.lit(int(max_tokens))).cast("long")
    )
    return out.drop("__ntok") if "__ntok" in out.columns else out


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out: str | None = None,
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    strip_punct: bool = False,
    ascii_only: bool = False,
) -> DataFrame:
    """Canonical text normalization (the first pass of most training
    pipelines): lowercase, strip control characters, collapse runs of
    whitespace to single spaces, trim; optionally drop punctuation
    and/or non-ASCII bytes.  A single chained-regexp map stage — no
    shuffle, codegen'd end to end, and every pattern is RE2-safe so
    the same normalization is reproducible in any external engine.

    Order matters and is fixed: control-strip → punct-strip →
    ascii-strip → whitespace-collapse → case-fold; whitespace collapse
    runs after the removals so holes they open are closed."""
    col = F.col(text_col)
    if strip_control:
        col = F.regexp_replace(col, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    if strip_punct:
        col = F.regexp_replace(col, r"[!-/:-@\[-`{-~]", " ")
    if ascii_only:
        col = F.regexp_replace(col, r"[^\x00-\x7f]", "")
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, r"\s+", " "))
    if lowercase:
        col = F.lower(col)
    return df.withColumn(out or text_col, col)


def chunk_documents(
    df: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_id_col: str = "chunk_id",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Split each document into fixed-size character chunks with
    ``overlap`` characters of context carried between consecutive
    chunks (the RAG / long-context windowing primitive).  Chunk ``i``
    covers ``[i*step, i*step + chunk_size)`` with ``step = chunk_size
    - overlap``; every document yields at least one chunk (empty text
    ⇒ one empty chunk), and the last chunk is short rather than
    padded.

    Returns (id, chunk_id, chunk).  Map-only: an in-row sequence →
    substr transform → posexplode; no shuffle, fan-out bounded by
    ceil(len/step), and Catalyst keeps the whole stage in codegen.
    At 100 TB this is embarrassingly parallel — output partitioning
    simply inherits the input's."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    step = chunk_size - overlap
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(F.coalesce(F.col(text_col), F.lit(""))) - overlap) / step),
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.coalesce(F.col(text_col), F.lit("")).substr(
            i * step + 1, F.lit(chunk_size)
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias(chunk_id_col, chunk_col),
    ).withColumn(chunk_id_col, F.col(chunk_id_col).cast("long"))


def mixture_plan(
    df: DataFrame,
    weights: dict,
    by: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Plan a training-data mixture BEFORE sampling it: given target
    mixture ``weights`` (group value → share, e.g. {'web': .6,
    'code': .4}), measure each group's available token supply and
    compute the LARGEST total budget T the corpus can serve at those
    shares — T = min over groups of available_g / w_g — plus each
    group's sampling rate w_g·T / available_g.  The binding group
    reports rate 1.0 (it is consumed whole); every other group
    downsamples.  Feed the resulting per-group budgets (w_g·T)
    straight into ``mixture_sample``.

    Groups absent from ``weights`` are ignored; a weighted group with
    ZERO available tokens pins T to 0 (the mixture is unservable —
    surfaced, not silently rescaled).  Exactness: BIGINT token sums,
    then one division per group from identical doubles — bit-exact
    cross-engine.  Scale: one keyed sum, a groups-sized fold —
    map-side partial everywhere.

    Output: group, available_tokens, target_share, token_budget,
    sample_rate."""
    from bubbles_spark.ops.textan import _token_count

    if not weights:
        raise ValueError("weights must be a non-empty dict of group -> share")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights}")
    if token_col is None:
        df = df.withColumn("__ntok", _token_count(F.col(text_col)).cast("long"))
        token_col = "__ntok"
    # weights SPINE, not a filter-side map: a weighted group with no
    # rows at all must still appear (zero supply pins T to 0)
    from bubbles_spark.ops.core import local_table

    spine = local_table(
        df.sparkSession,
        [(k, float(v)) for k, v in weights.items()],
        "group string, target_share double",
    )
    sums = (
        df.groupBy(F.col(by).cast("string").alias("group"))
        .agg(
            F.coalesce(F.sum(F.col(token_col)), F.lit(0))
            .cast("bigint")
            .alias("__avail")
        )
    )
    avail = spine.join(sums, "group", "left").select(
        "group",
        "target_share",
        F.coalesce(F.col("__avail"), F.lit(0)).cast("bigint").alias(
            "available_tokens"
        ),
    )
    tmax = avail.agg(
        F.min(
            F.col("available_tokens").cast("double") / F.col("target_share")
        ).alias("__T")
    )
    return avail.crossJoin(F.broadcast(tmax)).select(
        "group",
        "available_tokens",
        "target_share",
        (F.col("target_share") * F.col("__T")).alias("token_budget"),
        F.when(
            F.col("available_tokens") > 0,
            F.col("target_share")
            * F.col("__T")
            / F.col("available_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("sample_rate"),
    )


def mixture_sample(
    df: DataFrame,
    budgets: dict,
    by: str = "source",
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    seed: str = "",
) -> DataFrame:
    """Token-budget mixture sampling: compose a training mix by
    admitting documents per ``by`` group — in a deterministic
    pseudo-random order — until each group's token budget is spent.
    ``budgets`` maps group value → token budget; groups absent from
    it are DROPPED (same contract as ``stratified_sample``).  A
    document that straddles its budget boundary is admitted if it
    STARTS under the budget (the ``pack_sequences`` overflow rule),
    so every non-empty budget admits at least one document.

    The admission order is ``md5(id || seed)`` — a seeded hash total
    order, not ``F.rand`` (hash order is retry-deterministic AND
    reproducible bit-for-bit in any engine with md5, which keeps this
    operator oracle-checkable).  Plan: one shuffle on ``by`` + a
    per-group ordered running sum — groups fill independently, so
    1000 executors fill 1000 sources at once.  The per-group window
    sort is the scale bound: a single group at 100 TB should be
    pre-bucketed by source (ParquetStore.create_bucketed) so the
    window sorts within buckets instead of one task."""
    from bubbles_spark.ops.textan import _token_count

    if token_col is None:
        df = df.withColumn("__ntok", _token_count(F.col(text_col)).cast("long"))
        token_col = "__ntok"
    budget_map = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    out = (
        df.withColumn("__budget", budget_map[F.col(by)])
        .filter(F.col("__budget").isNotNull())
        .withColumn(
            "__ord", F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))
        )
    )
    w = (
        Window.partitionBy(by)
        .orderBy("__ord", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("__pre", F.sum(token_col).over(w) - F.col(token_col))
    out = out.filter(F.col("__pre") < F.col("__budget"))
    return out.drop("__budget", "__ord", "__pre", "__ntok")


# html_to_text pipeline: (pattern, replacement) pairs applied in
# order.  Patterns are RE2-safe (no lookaround/backreferences) so the
# identical chain runs under Java regex and DuckDB; inline (?is)
# flags work in both engines.
HTML_STRIP_STAGES: list[tuple[str, str]] = [
    # 1. opaque blocks whose CONTENT must go, not just the tags
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # 2. structural breaks -> newline so paragraph shape survives
    (r"(?i)<(?:br|hr)[^>]*>", "\n"),
    (r"(?i)</(?:p|div|li|tr|h[1-6]|ul|ol|table|blockquote|section|article)\s*>", "\n"),
    # 3. every remaining tag -> single space (inline tags must not
    #    glue neighboring words together)
    (r"<[^>]*>", " "),
]

# literal entity decodes, applied AFTER tag stripping; &amp; goes
# last so "&amp;lt;" decodes to "&lt;" (one level), never to "<"
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def html_to_text(
    df: DataFrame,
    text_col: str = "text",
    out: str | None = None,
) -> DataFrame:
    """Extract readable text from raw HTML (the CommonCrawl-style
    WET step of a pre-training pipeline): drop script/style/comment
    blocks wholesale, convert structural tags to newlines, strip all
    remaining markup, decode the common literal entities, and
    normalize whitespace (runs of blanks -> one space, blank-padded
    newlines tightened, 3+ newlines -> paragraph break, ends trimmed).

    Heuristic by design — a regex extractor, not an HTML5 tree parser
    (malformed nesting is handled by the "strip every tag" backstop,
    CDATA and exotic entities are not special-cased).  The entire
    chain is codegen'd ``regexp_replace``/``replace`` Column
    expressions: a single map-only stage, no UDF, no shuffle, and
    cross-engine reproducible (every pattern is RE2-safe, so the
    DuckDB oracle runs the identical chain).
    """
    col = F.col(text_col)
    for pattern, repl in HTML_STRIP_STAGES:
        col = F.regexp_replace(col, pattern, repl)
    for entity, ch in HTML_ENTITIES:
        col = F.replace(col, F.lit(entity), F.lit(ch))
    # whitespace normalization (same chain mirrored in the oracle)
    col = F.regexp_replace(col, r"[ \t\r\f]+", " ")
    col = F.regexp_replace(col, r" ?\n ?", "\n")
    col = F.regexp_replace(col, r"\n{3,}", "\n\n")
    col = F.regexp_replace(col, r"^\s+|\s+$", "")
    return df.withColumn(out or text_col, col)


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    out: str | None = None,
) -> DataFrame:
    """Corpus-level paragraph dedup (the boilerplate-removal pass):
    split each doc on ``sep``, keep only the FIRST occurrence of each
    distinct paragraph across the corpus (ordered by (doc id,
    position)), drop the rest, and reassemble each doc in original
    paragraph order.  Docs whose every paragraph was seen earlier
    come back as the empty string (filter afterwards as needed).

    Plan: posexplode → one shuffle keyed by paragraph hash (xxhash64 —
    ids only, never the text twice) → min-struct winner per hash →
    semi-join back → groupBy(doc) ordered reassembly via sort_array
    over (pos, paragraph) structs.  Two shuffles total, both carrying
    hashes/ids + surviving paragraphs only.
    """
    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias("pos", "para"),
    ).filter(F.col("para") != "")
    keyed = parts.withColumn("__h", F.xxhash64("para"))
    # explicit alias: winners derives from keyed, so an unaliased
    # keyed["__h"] == winners["__h"] is self-join-ambiguous (Spark
    # warns "trivially true predicate") — rename the join key instead
    winners = keyed.groupBy(F.col("__h").alias("__wh")).agg(
        F.min(F.struct(id_col, "pos")).alias("__first")
    )
    kept = keyed.join(
        winners,
        (keyed["__h"] == winners["__wh"])
        & (keyed[id_col] == winners["__first"][id_col])
        & (keyed["pos"] == winners["__first"]["pos"]),
    ).select(keyed[id_col], keyed["pos"], keyed["para"])
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias(out or text_col)
    )
    return df.select(id_col).distinct().join(rebuilt, id_col, "left").fillna(
        {out or text_col: ""}
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 3,
    scope_col: str | None = None,
    out: str | None = None,
) -> DataFrame:
    """C4/CCNet-style boilerplate-line removal: drop every line that
    appears in at least ``min_docs`` DISTINCT documents — navigation
    menus, cookie banners, footers — and keep everything else in
    original order.  Unlike ``paragraph_dedup`` (which keeps the
    FIRST copy of repeated text), boilerplate lines vanish from ALL
    documents: a line shared that widely is template chrome, not
    content anyone authored once.

    ``scope_col`` (e.g. a domain/source column) counts repetition
    within each scope instead of globally — a line legitimately
    common across the whole web may still be boilerplate only within
    one site.  Empty lines never count and never come back (same
    contract as ``paragraph_dedup``).

    Plan: posexplode → ONE shuffle keyed by (scope, line hash) with a
    two-phase count-distinct of doc ids → the boilerplate key set
    (vocabulary-sized, far smaller than the corpus) anti-joins back —
    AQE broadcasts it when it fits — → groupBy(doc) ordered
    reassembly.  The corpus text shuffles once (reassembly); counting
    moves only hashes and ids.
    """
    scope = [scope_col] if scope_col else []
    parts = df.select(
        F.col(id_col),
        *scope,
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias("pos", "line"),
    ).filter(F.col("line") != "")
    keyed = parts.withColumn("__h", F.xxhash64("line"))
    boiler = (
        keyed.groupBy(*scope, "__h")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select(*scope, "__h")
    )
    kept = keyed.join(boiler, [*scope, "__h"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias(out or text_col)
    )
    return df.select(id_col).distinct().join(rebuilt, id_col, "left").fillna(
        {out or text_col: ""}
    )


# tracking query parameters stripped by canonicalize_url — ONLY
# unambiguous analytics/click ids.  Generic names like `ref` carry
# real semantics on many sites (?ref=<branch> on code hosts, referral
# content ids) and stripping them would merge genuinely distinct URLs,
# making url_dedup drop distinct documents — pass
# ``extra_params=("ref", "ref_src")`` to opt in.  Alternation RE2-safe.
TRACKING_PARAMS = r"(?:utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|yclid|mc_eid)"


def canonicalize_url(
    df: DataFrame,
    url_col: str = "url",
    out: str | None = None,
    extra_params: Sequence[str] = (),
) -> DataFrame:
    """Normalize URLs to a canonical form so URL-keyed dedup
    (``url_dedup``) and domain joins don't fracture on cosmetic
    variants: drop the fragment, lowercase scheme and host, strip a
    default port (:80 http / :443 https) and a ``www.`` prefix,
    remove tracking query parameters (``TRACKING_PARAMS``), and trim
    trailing ``?``/``&``/``/``.

    URL-shaped strings without a scheme pass through unchanged (no
    guessing).  Entirely codegen'd regexp/conditional expressions —
    map-only, RE2-safe, cross-engine reproducible.  Heuristic by
    design: percent-encoding normalization and IDN are out of scope
    (they need per-byte tables, not a cleanup pass).

    ``extra_params``: additional query-parameter names to strip
    beyond ``TRACKING_PARAMS`` (literal names, regex-escaped) — e.g.
    ``("ref", "ref_src")`` for corpora where those are known noise.
    """
    params = TRACKING_PARAMS
    if extra_params:
        import re as _re

        params = (
            "(?:" + TRACKING_PARAMS + "|"
            + "|".join(_re.escape(p) for p in extra_params) + ")"
        )
    u = F.regexp_replace(F.col(url_col), r"#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    after = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(after, r"^([^/?]+)", 1))
    pathq = F.regexp_replace(after, r"^[^/?]+", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    rebuilt = F.concat(scheme, F.lit("://"), host, pathq)
    # tracking params: non-first (&k=v) drop; first-with-successor
    # (?k=v&) collapses to "?"; first-and-only (?k=v$) drops
    rebuilt = F.regexp_replace(rebuilt, r"&" + params + r"=[^&]*", "")
    rebuilt = F.regexp_replace(rebuilt, r"\?" + params + r"=[^&]*&", "?")
    rebuilt = F.regexp_replace(rebuilt, r"\?" + params + r"=[^&]*$", "")
    rebuilt = F.regexp_replace(rebuilt, r"[?&]+$", "")
    rebuilt = F.regexp_replace(rebuilt, r"/$", "")
    result = F.when(scheme == "", F.col(url_col)).otherwise(rebuilt)
    return df.withColumn(out or url_col, result)


def remove_stopwords(
    df: DataFrame,
    text_col: str = "text",
    stopwords: Sequence[str] | None = None,
    out: str | None = None,
) -> DataFrame:
    """Rebuild text with stopword tokens removed (case-insensitive
    match, original casing of surviving tokens kept, single-space
    rejoin).  Defaults to the shared ``textan._STOPWORDS`` list so
    the filter agrees with ``quality_score``'s stopword ratio.

    Codegen'd split → filter(token ∉ set) → array_join: the stopword
    set is a literal array in the plan (list-sized, like a broadcast
    but cheaper), map-only, no shuffle."""
    from bubbles_spark.ops.textan import _STOPWORDS

    words = list(stopwords) if stopwords is not None else list(_STOPWORDS)
    stop_arr = F.array(*[F.lit(w.lower()) for w in words])
    toks = F.split(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " "
    )
    kept = F.filter(toks, lambda t: ~F.array_contains(stop_arr, F.lower(t)))
    result = F.when(
        F.trim(F.col(text_col)) == "", F.lit("")
    ).otherwise(F.array_join(kept, " "))
    return df.withColumn(out or text_col, result)


def balance_classes(
    df: DataFrame,
    label_col: str,
    key_cols: Sequence[str],
    target_ratio: float = 1.0,
    salt: int = 0,
    digits: int = 8,
) -> DataFrame:
    """Deterministic majority-class downsampling: cap every class at
    ``target_ratio`` × the SMALLEST class's row count, keeping each
    row iff its md5(key ⊕ salt) hex prefix sorts under the class's
    fraction cutoff — the ``core.hash_sample`` predicate with a
    per-class threshold, so the balanced subset is content-keyed and
    reproduces byte-for-byte in any engine, run, or task retry (the
    property a published training mix needs; seeded Bernoulli can't
    give it).

    Realized class sizes are binomial around the cap (hash
    thresholding is per-row, not exact-N) — the standard trade for a
    one-pass, shuffle-free sampler.  Classes at/below the cap pass
    untouched.  A NULL label is a class like any other: it
    participates in the smallest-class cap and its rows are sampled
    through an explicit ``isNull`` branch (they are never silently
    dropped).  Filter unlabeled rows out beforehand if that is not
    what you want.

    Scale: one vocabulary-sized class-count aggregate to the driver,
    then a map-only predicate (the per-class cutoffs ride as a CASE
    over ≤ |classes| literals).  Output: the balanced rows."""
    if not target_ratio > 0:
        raise ValueError(f"target_ratio must be > 0, got {target_ratio}")
    counts = {
        r["__l"]: r["__c"]
        for r in df.groupBy(F.col(label_col).alias("__l"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    }
    if not counts:
        return df
    cap = target_ratio * min(counts.values())
    space = 16 ** int(digits)
    thresholds = {
        lab: format(
            int(round(min(1.0, cap / c) * space)), "x"
        ).rjust(digits + 1, "0")
        for lab, c in counts.items()
    }
    prefix = F.lpad(
        F.substring(
            F.md5(
                F.concat_ws(
                    "\x1f",
                    *[F.col(c).cast("string") for c in key_cols],
                    F.lit(str(salt)),
                )
            ),
            1,
            int(digits),
        ),
        int(digits) + 1,
        "0",
    )
    cut = F.lit(None).cast("string")
    for lab, thr in thresholds.items():
        cond = (
            F.col(label_col).isNull()
            if lab is None
            else F.col(label_col) == lab
        )
        cut = F.when(cond, F.lit(thr)).otherwise(cut)
    return df.filter(prefix < cut)


def negative_samples(
    pairs: DataFrame,
    candidates: DataFrame,
    query_col: str,
    pos_col: str,
    cand_col: str,
    k: int = 4,
    salt: int = 0,
    oversample: int = 3,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training sets:
    for every query in ``pairs``, draw ``k`` candidates that are NOT
    among that query's positives — reproducibly (content-keyed md5
    draws, so the sampled set is identical across runs, engines, and
    retries — the property a published training set needs; seeded
    RNG sampling is partitioning-dependent).

    Mechanics: candidates get a dense index by the two-phase
    distributed rank; each query makes ``k·oversample`` hash draws
    (``md5(salt|query|j) mod n``), maps them to candidates by index
    equi-join, drops accidental positives (anti-join on the pair
    set) and duplicate draws (keep the earliest j), and keeps the
    first ``k`` under the (j, candidate) order.  A query whose
    positives swallow too many draws emits fewer than ``k`` rows —
    raise ``oversample`` (collision odds shrink geometrically).

    Scale: every step is an equi-join or keyed aggregate; the only
    window partitions by query (draws per query ≤ k·oversample).
    Output: query_col, negative (candidate value), rank (1-based)."""
    if k < 1 or oversample < 1:
        raise ValueError("k and oversample must be >= 1")
    from bubbles_spark.ops.core import _with_global_row_number

    cands = (
        candidates.select(F.col(cand_col).alias("__cand"))
        .filter(F.col("__cand").isNotNull())
        .distinct()
    )
    n = cands.count()
    if n == 0:
        raise ValueError("negative_samples: no candidates")
    ranked = _with_global_row_number(cands, ["__cand"]).select(
        (F.col("__rn") - 1).alias("__idx"), "__cand"
    ).localCheckpoint()
    m = int(k) * int(oversample)
    queries = pairs.select(F.col(query_col).alias("__q")).distinct()
    draws = queries.select(
        "__q", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("__j")
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(salt)),
                    F.col("__q").cast("string"),
                    F.col("__j").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    drawn = draws.withColumn("__idx", h % F.lit(n)).join(ranked, "__idx")
    pos = pairs.select(
        F.col(query_col).alias("__q"), F.col(pos_col).alias("__cand")
    ).distinct()
    negs = drawn.join(pos, ["__q", "__cand"], "left_anti")
    first = negs.groupBy("__q", "__cand").agg(F.min("__j").alias("__j"))
    w = Window.partitionBy("__q").orderBy("__j", "__cand")
    return (
        first.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("__q").alias(query_col),
            F.col("__cand").alias("negative"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
