"""Approximate / sketch aggregations with verifiable error bounds
(engine extensions — SURVEY.md §2.6; the reference has nothing
approximate, but at 100 TB exact count-distinct and exact quantiles
are shuffle-heavy, so the sketch path is a first-class citizen).

Correctness strategy: sketch OUTPUTS are implementation-defined (a
DuckDB oracle cannot reproduce Spark's HLL++ bit-for-bit), so each
operator ships a BOUND-CHECK twin that emits violation rows — rows
where the sketch missed its published error guarantee vs the exact
answer computed in the same job.  The oracle for a bound check is the
empty set; any survivor row is a real defect.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_stats(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.05
) -> DataFrame:
    """Per-column HyperLogLog++ distinct estimate next to the exact
    distinct count: (field, approx_distinct, exact_distinct,
    rel_err).  ONE aggregation pass computes every column's pair —
    at scale the exact side is the expensive one (it shuffles per
    column); drop it and keep only the sketch when the bound has been
    validated at a smaller SF.
    """
    aggs = []
    for c in cols:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"__a_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__e_{c}"))
    row = df.agg(*aggs)
    stacked = None
    for c in cols:
        one = row.select(
            F.lit(c).alias("field"),
            F.col(f"__a_{c}").alias("approx_distinct"),
            F.col(f"__e_{c}").alias("exact_distinct"),
        )
        stacked = one if stacked is None else stacked.unionByName(one)
    return stacked.withColumn(
        "rel_err",
        F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
        / F.col("exact_distinct"),
    )


def approx_distinct_violations(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.05, tolerance_sds: float = 4.0
) -> DataFrame:
    """Bound check: columns whose HLL++ estimate deviates more than
    ``tolerance_sds``·rsd from the exact count.  HLL++'s rsd is the
    standard deviation of the relative error, so 4 sds is a
    ~1-in-16k-per-column false-alarm rate.  Expected output: EMPTY."""
    stats = approx_distinct_stats(df, cols, rsd)
    return stats.filter(F.col("rel_err") > tolerance_sds * rsd)


def approx_quantile_ranks(
    df: DataFrame,
    field: str,
    probabilities: Sequence[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles with their TRUE ranks:
    (prob, approx_value, true_rank, n_rows).  Two jobs: one agg for
    the sketch (returns a k-element array — driver-side scalar,
    metadata-cheap), one agg with k conditional sums for the ranks —
    no per-quantile scan, no sort, no full shuffle at any size.
    """
    probs = list(probabilities)
    qrow = df.agg(
        F.percentile_approx(field, probs, accuracy).alias("q"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    values, n = qrow["q"], qrow["n"]
    rank_aggs = [
        F.sum((F.col(field) <= F.lit(float(v))).cast("long")).alias(f"__r_{i}")
        for i, v in enumerate(values)
    ]
    ranks = df.agg(*rank_aggs).collect()[0]
    spark = df.sparkSession
    rows = [
        (float(p), float(v), int(ranks[f"__r_{i}"]), int(n))
        for i, (p, v) in enumerate(zip(probs, values))
    ]
    from bubbles_spark.ops.core import local_table

    return local_table(
        spark, rows,
        "prob double, approx_value double, true_rank long, n_rows long",
    )


def approx_quantile_violations(
    df: DataFrame,
    field: str,
    probabilities: Sequence[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Bound check: percentile_approx guarantees the returned value's
    rank is within n/accuracy of ceil(p·n).  Violation rows carry the
    measured rank error.  Expected output: EMPTY."""
    ranked = approx_quantile_ranks(df, field, probabilities, accuracy)
    target = F.ceil(F.col("prob") * F.col("n_rows"))
    # +1 slack: rank counts values <= v, and ties at v can push the
    # measured rank one past the guarantee's nominal position
    budget = F.col("n_rows") / accuracy + 1
    return ranked.withColumn(
        "rank_err", F.abs(F.col("true_rank") - target).cast("long")
    ).filter(F.col("rank_err") > budget)


def quantile_bins(
    df: DataFrame,
    field: str,
    k: int,
    accuracy: int = 10000,
    out: str = "qbin",
) -> DataFrame:
    """Equal-frequency binning: assign each row to one of ``k``
    quantile bins of ``field`` (bin i covers (q_i, q_{i+1}]; the
    lowest bin is closed below).

    The SQL-class formulation — ``ntile() OVER (ORDER BY field)`` —
    is a GLOBAL window: every row through one task, a non-starter at
    scale.  Here: one percentile_approx agg for the k-1 cut points
    (driver-side scalar list, metadata-cheap), then a codegen'd
    when-cascade assigns bins map-only.  Ties at a cut land in the
    lower bin deterministically; with heavy ties bins are
    correspondingly uneven (same as any value-based split).
    """
    if k < 2:
        raise ValueError("need k >= 2 bins")
    probs = [i / k for i in range(1, k)]
    cuts = df.agg(F.percentile_approx(field, probs, accuracy).alias("q")).collect()[
        0
    ]["q"]
    col = F.col(field)
    expr = F.lit(0)
    for i, c in enumerate(cuts):
        expr = F.when(col > F.lit(float(c)), F.lit(i + 1)).otherwise(expr)
    return df.withColumn(out, expr.cast("long"))


def quantile_bin_violations(
    df: DataFrame, field: str, k: int, accuracy: int = 10000
) -> DataFrame:
    """Bound check for quantile_bins: every bin's row count must be
    within n/accuracy + ties-at-the-cut slack of n/k.  Emits
    (qbin, record_count, expected, slack) violations; expected EMPTY
    on continuous-ish data."""
    binned = quantile_bins(df, field, k, accuracy)
    n = df.count()
    counts = binned.groupBy("qbin").agg(F.count(F.lit(1)).alias("record_count"))
    expected = n / k
    # 2 sketch errors (each cut off by up to n/accuracy) per bin edge
    slack = 2.0 * n / accuracy + 1
    return (
        counts.withColumn("expected", F.lit(float(expected)))
        .withColumn("slack", F.lit(float(slack)))
        .filter(F.abs(F.col("record_count") - expected) > slack)
    )


def heavy_hitters(
    df: DataFrame, field: str, min_share: float = 0.01
) -> DataFrame:
    """Values holding at least ``min_share`` of all rows: (value,
    record_count, share), share rounded to 6dp.  Exact, but scale-
    safe: count-only groupBy partial-aggregates map-side, so the
    shuffle carries at most |distinct| rows per mapper; the total
    count is a second metadata-cheap columnar job."""
    total = df.count()
    counts = df.groupBy(F.col(field).alias("value")).agg(
        F.count(F.lit(1)).alias("record_count")
    )
    return (
        counts.filter(F.col("record_count") >= float(min_share) * total)
        .withColumn("share", F.round(F.col("record_count") / total, 6))
    )
