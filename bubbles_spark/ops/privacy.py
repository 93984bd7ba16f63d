"""Privacy / release-governance audits for training-data tables.

Before a table (or a training corpus's metadata slice) leaves its
trust boundary, the standard re-identification checks are
k-anonymity — every quasi-identifier combination is shared by ≥ k
rows (Sweeney 2002) — and l-diversity — every such group carries ≥ l
distinct sensitive values (Machanavajjhala et al. 2007), which closes
the homogeneity attack k-anonymity alone leaves open.  These ops
compute the audits and the minimal suppression fix, all as keyed
counts + equi-joins (map-side partial aggregation, no windows, no
collect) so the same plan runs on a 1000-executor table.

Extension family (the reference has no privacy ops); complements
textprep.pii_mask (content-level PII) with table-level governance.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_sizes(df: DataFrame, quasi_cols: Sequence[str]) -> DataFrame:
    """(quasi_cols..., __gn) — one map-side-combined keyed count.
    NULL is a quasi value like any other (groupBy keeps null keys):
    an attacker can match on a missing field too."""
    return df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__gn"))


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """One-row k-anonymity audit over the quasi-identifier columns:
    n_rows, n_groups, min_group_size, violating_groups /
    violating_rows (groups smaller than ``k``), and the
    ``k_anonymous`` verdict.  The table is k-anonymous iff every
    quasi combination occurs at least k times."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sizes = _group_sizes(df, quasi_cols)
    return sizes.agg(
        F.coalesce(F.sum("__gn"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(F.min("__gn"), F.lit(0)).cast("bigint").alias("min_group_size"),
        F.coalesce(
            F.sum((F.col("__gn") < k).cast("bigint")), F.lit(0)
        ).cast("bigint").alias("violating_groups"),
        F.coalesce(
            F.sum(F.when(F.col("__gn") < k, F.col("__gn")).otherwise(F.lit(0))),
            F.lit(0),
        ).cast("bigint").alias("violating_rows"),
        F.coalesce(F.min("__gn") >= k, F.lit(True)).alias("k_anonymous"),
    )


def suppress_small_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """The minimal k-anonymity fix: DROP every row whose
    quasi-identifier group has fewer than ``k`` members (record
    suppression).  The surviving table is k-anonymous by
    construction.  Plan: the group-size table (groups-sized) joins
    back as a semi-filter — one keyed count + one equi-join, rows
    never sort or window."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    big = _group_sizes(df, quasi_cols).filter(F.col("__gn") >= k).drop("__gn")
    return df.join(big, list(quasi_cols), "left_semi")


def l_diversity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,  # noqa: E741 — the literature's name for the parameter
) -> DataFrame:
    """One-row distinct l-diversity audit: every quasi-identifier
    group must carry at least ``l`` DISTINCT values of the sensitive
    column, else a group's homogeneity leaks the sensitive value even
    when the group is k-large.  Reports n_groups, min_diversity,
    violating_groups and the ``l_diverse`` verdict.

    Exact distinct per group via two stacked keyed aggregations
    (group+value, then group) — both partial-aggregate map-side;
    count_distinct would too, but the two-level shape also dedups
    skewed (group, value) pairs before the second shuffle."""
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    per_v = (
        df.filter(F.col(sensitive_col).isNotNull())
        .groupBy(*quasi_cols, sensitive_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    div = per_v.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__ndv")
    )
    return div.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(F.min("__ndv"), F.lit(0)).cast("bigint").alias("min_diversity"),
        F.coalesce(
            F.sum((F.col("__ndv") < l).cast("bigint")), F.lit(0)
        ).cast("bigint").alias("violating_groups"),
        F.coalesce(F.min("__ndv") >= l, F.lit(True)).alias("l_diverse"),
    )


def pseudonymize(
    df: DataFrame,
    cols: Sequence[str],
    salt: str,
    length: int = 16,
) -> DataFrame:
    """Replace identifier columns with deterministic keyed
    pseudonyms: ``sha2(salt ⊕ value, 256)`` truncated to ``length``
    hex chars — the reversible-only-with-the-salt tokenization that
    keeps JOINABILITY (equal values map to equal tokens, so keys
    still link across tables sharing the salt) while removing the
    identifier itself.  NULLs stay NULL (a pseudonym for "missing"
    would fabricate a linkable value).

    This is pseudonymization, not anonymization: whoever holds the
    salt can replay the mapping, and group sizes are preserved — run
    ``k_anonymity_report`` on the result before release.  Rotate the
    salt per release to break cross-release linkage.

    Map-only codegen, no shuffle.  Column types become string."""
    if not cols:
        raise ValueError("pseudonymize: cols must be non-empty")
    if not 1 <= int(length) <= 64:
        raise ValueError("pseudonymize: length must be in [1, 64]")
    out = df
    for c in cols:
        token = F.substring(
            F.sha2(
                F.concat(F.lit(str(salt)), F.lit("\x1f"), F.col(c).cast("string")),
                256,
            ),
            1,
            int(length),
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNotNull(), token)
        )
    return out
