"""Deduplication operators for LLM data pipelines (SURVEY.md §2.14).

Exact, MinHash-LSH, SimHash, and n-gram-Jaccard dedup, designed
shuffle-light for 100 TB:

- Exact dedup groups on an md5 content key — one hash-partitioned
  aggregate; the winner per group is min(id) (deterministic, no
  ``first()`` nondeterminism).
- MinHash: signatures are computed map-side with built-in array
  functions over xxhash64(shingle, seed_i) — no Python, no explosion;
  only the (band_id, band_hash) pairs shuffle, which is b rows per
  doc regardless of document size.
- Candidate pairs come from an inverted index (self-join on bucket),
  with a frequency cap on pathological buckets (skew guard: a bucket
  holding m docs emits m² pairs — cap + log, never silently).
- Verification joins back the exact token sets only for candidate
  pairs (a tiny fraction of the corpus).

All functions keep document ids, not payloads, moving through the
shuffles — the 100 TB posture: text bytes stay in the scan stage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bubbles_spark.ops.textan import _tokens

# ---------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, content_cols: Sequence[str] = ("text",), id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one row per distinct content: the one with the
    smallest id (deterministic at any parallelism).  Implemented as a
    min-id aggregate on the content hash + self-join back, so the
    shuffle carries (hash, id) pairs, not payloads."""
    key = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
    hashed = df.withColumn("__key", key)
    winners = hashed.groupBy("__key").agg(F.min(id_col).alias(id_col))
    return (
        hashed.join(winners, ["__key", id_col], "left_semi").drop("__key")
    )


def exact_dup_groups(
    df: DataFrame, content_cols: Sequence[str] = ("text",), id_col: str = "doc_id"
) -> DataFrame:
    """Groups of exact duplicates: (content_key, n_docs, min_id) for
    groups with more than one member."""
    key = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]))
    return (
        df.withColumn("__key", key)
        .groupBy(F.col("__key").alias("content_key"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("min_id"))
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _shingles(text_col: str, n: int = 3):
    """Word n-gram shingles as strings (distinct set per doc)."""
    toks = _tokens(F.lower(F.col(text_col)))
    if n <= 1:
        return F.array_distinct(toks)
    # sliding word n-grams via transform over index sequence
    count = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(count - n, F.lit(-1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.array_distinct(F.when(count >= n, grams).otherwise(F.array()))


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out: str = "shingles"
) -> DataFrame:
    return df.withColumn(out, _shingles(text_col, n))


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    out: str = "minhash",
) -> DataFrame:
    """MinHash signature as array<bigint>, computed entirely map-side:
    sig[i] = min over shingles of xxhash64(shingle, seed=i).

    xxhash64 with per-slot seed plays the role of the classic
    (a*x+b) mod p permutation family — i.i.d. enough for Jaccard
    estimation and available as a codegen'd builtin.
    """
    sh = _shingles(text_col, n)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig = F.transform(
        seeds,
        lambda s: F.array_min(F.transform(sh, lambda g: F.xxhash64(g, s))),
    )
    return df.withColumn(out, F.when(F.size(sh) > 0, sig))


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.7,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash-LSH banding +
    signature-estimated Jaccard verification.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b and
    est_jaccard >= threshold.  rows/bucket capped at ``max_bucket``
    (skew guard; LSH theory says a band bucket should be tiny — a huge
    one means degenerate content, which exact-dedup should have
    caught first).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(df, text_col, n, num_hashes).select(
        F.col(id_col).alias("__id"), F.col("minhash")
    ).filter(F.col("minhash").isNotNull())

    # band the signature: bucket key = hash of the band's slice
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        "__id",
        "minhash",
        F.posexplode(
            F.transform(
                band_idx,
                lambda b: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band", "bucket"),
    ).select("__id", "minhash", "band", "bucket")

    # skew guard: drop degenerate buckets (logged via count column)
    bucket_sizes = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    banded = banded.join(
        bucket_sizes.filter(F.col("__bn") <= max_bucket), ["band", "bucket"]
    ).drop("__bn")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.minhash").alias("__ma"),
            F.col("b.minhash").alias("__mb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    est = F.size(
        F.filter(
            F.zip_with(F.col("__ma"), F.col("__mb"), lambda x, y: x == y),
            lambda eq: eq,
        )
    ) / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    **kw,
) -> DataFrame:
    """Drop near-duplicates: every doc that matches a lower-id doc
    (single-link one-step; full transitive closure is an iterative
    connected-components job — out of scope for the batch op)."""
    pairs = minhash_dedup_pairs(df, id_col, text_col, threshold=threshold, **kw)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    out: str = "simhash",
) -> DataFrame:
    """64-bit SimHash per document, without exploding rows: token
    hashes live in an array column; each output bit b is the sign of
    sum over tokens of (bit b of xxhash64(token) ? +1 : -1), folded
    with F.aggregate.  Pure builtins, map-only stage."""
    toks = _tokens(F.lower(F.col(text_col)))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))

    def bit_of(h, b):
        return F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

    # counts[b] = sum of ±1 over tokens for bit b
    counts = F.transform(
        bit_idx,
        lambda b: F.aggregate(
            hashes, F.lit(0), lambda acc, h: acc + bit_of(h, b)
        ),
    )
    # fold bits into one signed 64-bit integer
    sig = F.aggregate(
        F.zip_with(counts, bit_idx, lambda c, b: F.struct(c.alias("c"), b.alias("b"))),
        F.lit(0).cast("long"),
        lambda acc, cb: acc
        + F.when(cb["c"] > 0, F.shiftleft(F.lit(1).cast("long"), cb["b"])).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return df.withColumn(out, F.when(F.size(toks) > 0, sig))


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into
    ``bands`` chunks (pigeonhole: hamming <= bands-1 guarantees an
    exact match in some band; default 4 bands catches hamming <= 3),
    bucket-join, then verify exact hamming distance bit-wise.
    Returns (id_a, id_b, hamming)."""
    width = 64 // bands
    sigs = simhash(df, id_col, text_col).select(
        F.col(id_col).alias("__id"), F.col("simhash")
    ).filter(F.col("simhash").isNotNull())

    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    chunk = lambda b: F.shiftright(F.col("simhash"), b * width).bitwiseAND(
        F.lit((1 << width) - 1)
    )
    banded = sigs.select(
        "__id",
        "simhash",
        F.posexplode(F.transform(band_idx, chunk)).alias("band", "bucket"),
    )
    bucket_sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__bn"))
    banded = banded.join(
        bucket_sizes.filter(F.col("__bn") <= max_bucket), ["band", "bucket"]
    ).drop("__bn")

    a, b = banded.alias("a"), banded.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    hamming = F.bit_count(xor)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index similarity join)
# ---------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 10000,
) -> DataFrame:
    """EXACT Jaccard similarity join on word-n-gram sets via inverted
    index: explode distinct shingles → self-join on shingle →
    co-occurrence counts → |A∩B| / (|A|+|B|-|A∩B|) >= threshold.

    ``max_doc_freq`` drops stop-shingles (doc frequency above the cap)
    before the join — the standard skew guard; a shingle in m docs
    contributes m² join rows.  Returns (id_a, id_b, jaccard)."""
    sh = with_shingles(df, text_col, n).select(
        F.col(id_col).alias("__id"), F.explode("shingles").alias("__g")
    )
    # per-doc set sizes
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__sz"))
    # drop ultra-frequent shingles (skew guard)
    freq = sh.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))
    sh = sh.join(freq.filter(F.col("__df") <= max_doc_freq), "__g").select("__id", "__g")

    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.__g") == F.col("b.__g")) & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    sz_a = sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("__sza"))
    sz_b = sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("__szb"))
    jac = F.col("__common") / (F.col("__sza") + F.col("__szb") - F.col("__common"))
    return (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------
# embedding near-dup (cosine)
# ---------------------------------------------------------------------


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    lsh_bits: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vector pairs by cosine similarity.

    ``lsh_bits=0``: exact all-pairs (self-join on a trivial bucket) —
    only for small/medium corpora.  ``lsh_bits>0``: random-hyperplane
    LSH prefilter — vectors must share the sign-pattern bucket, which
    is where the scale path lives (recall loss bounded by bit count).
    Cosine computed in double precision.  Returns (id_a, id_b, cosine).
    """
    from bubbles_spark.ops.vector import _norm_col, _hyperplane_bucket

    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        _norm_col(F.col(vec_col)).alias("__n"),
    ).filter(F.col("__n") > 0)

    if lsh_bits > 0:
        v = v.withColumn("__bucket", _hyperplane_bucket(F.col("__v"), lsh_bits, seed))
    else:
        v = v.withColumn("__bucket", F.lit(0))

    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col("a.__v"), F.col("b.__v"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.__n") * F.col("b.__n"))
    return (
        a.join(
            b,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            "cosine",
        )
    )
