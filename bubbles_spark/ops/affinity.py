"""Market-basket affinity analysis — frequent itemset pairs and
association rules (support / confidence / lift), the co-occurrence
mining behind "customers who bought X also bought Y", co-purchase
recommendation candidates, and feature co-occurrence audits on
training corpora.

Reference scope: Stiivi/bubbles ships no affinity ops (SURVEY.md §2
aggregation rows stop at audits); this is §2.14 extension surface in
the same declarative, oracle-checkable spirit.

Exactness contract: supports are BIGINT basket counts; confidence is
ONE IEEE division of exact integers; lift is one division of two
exact integer products (DECIMAL(19,0)² → (38,0) — products of
100 TB-scale counts overflow int64) cast to double once each.  Every
value is bit-reproducible cross-engine.

Scale shape (the Apriori argument): an item that appears in fewer
than ``min_support`` baskets cannot appear in a frequent pair, so the
basket×basket self-join runs only over the FREQUENT-item projection —
on heavy-tailed real corpora that removes most of the long tail
before the quadratic step.  The self-join shuffles on the basket key
(map-side partial aggregation of pair counts); per-basket fanout is
|frequent items in basket|², bounded by ``max_basket_size``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_pairs", "association_rules"]


def _basket_items(
    df: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Distinct (basket, item) memberships — affinity counts baskets,
    not line repetitions (two rows of the same part in one order are
    one co-occurrence)."""
    # NOT widened (core.widen_scan): measured r13 — the map side here
    # is a light partial distinct, and ``bi`` has three consumers, so
    # the extra round-robin exchange was re-paid per consumer
    # (triangle_count 3.8s → 5.1s).  The heavy stage (the pair join)
    # is post-shuffle and already parallel.
    return df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = None,
    _bi: DataFrame | None = None,
) -> DataFrame:
    """Item pairs co-occurring in ≥ ``min_support`` baskets.

    ``max_basket_size`` drops baskets with more frequent items than
    the cap BEFORE the pair join — the standard skew guard for the
    degenerate "one basket contains everything" corpus, where pair
    generation is quadratic in basket size.  Dropped baskets are
    dropped from pair counts (document the cap when you set it);
    None = no cap.

    Output: item_a, item_b (item_a < item_b), pair_support."""
    # pin the distinct membership table once (eager localCheckpoint):
    # it feeds the frequent-item count AND the pruned pair join (and
    # the rule finisher's counts when called from association_rules) —
    # unpinned, each consumer re-runs the corpus distinct (guide §2.4:
    # remove repeated shuffles outright; widening it instead was the
    # measured-negative A/B above)
    bi = _bi if _bi is not None else _basket_items(
        df, basket_col, item_col
    ).localCheckpoint(eager=False)
    frequent = (
        bi.groupBy("__i")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= int(min_support))
        .select("__i")
    )
    # the frequent-item dictionary is vocabulary-sized (items, not
    # rows) — broadcast it so the Apriori prune is map-only
    pruned = bi.join(F.broadcast(frequent), "__i")
    if max_basket_size is not None:
        sized = pruned.groupBy("__b").agg(
            F.count(F.lit(1)).alias("__n")
        )
        pruned = pruned.join(
            sized.filter(F.col("__n") <= int(max_basket_size)).select("__b"),
            "__b",
        )
    a = pruned.select(
        F.col("__b"), F.col("__i").alias("item_a")
    )
    b = pruned.select(
        F.col("__b"), F.col("__i").alias("item_b")
    )
    return (
        a.join(b, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= int(min_support))
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    min_confidence: float = 0.0,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Directed association rules antecedent → consequent from the
    frequent pairs:

        confidence = pair_support / antecedent_support
        lift       = pair_support · n_baskets
                     / (antecedent_support · consequent_support)

    Both orientations of every frequent pair are emitted, filtered to
    ``confidence ≥ min_confidence``.  n_baskets counts ALL baskets
    (lift's denominator is the independence baseline over the full
    corpus, not the Apriori-pruned projection).

    Exactness: confidence is one IEEE division of exact BIGINTs; lift
    is one division of two DECIMAL(19,0)² products cast to double
    once each (int64 products overflow at ~3e9 × 3e9 basket counts).

    Output: antecedent, consequent, pair_support, antecedent_support,
    consequent_support, n_baskets, confidence, lift."""
    # ONE corpus distinct for the whole rule mine (pinned): baseline,
    # item counts, and the pair join all read the checkpointed table
    bi = _basket_items(df, basket_col, item_col).localCheckpoint(eager=False)
    # one tiny agg for the independence baseline — 1 driver scalar
    n_baskets = bi.select(
        F.countDistinct("__b").alias("n")
    ).first()["n"]
    counts = bi.groupBy("__i").agg(F.count(F.lit(1)).alias("__c"))
    pairs = frequent_pairs(
        df, basket_col, item_col, min_support, max_basket_size, _bi=bi
    )
    both = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_support",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_support",
        )
    )
    # item-count dictionary: vocabulary-sized, broadcast twice
    with_counts = both.join(
        F.broadcast(
            counts.select(
                F.col("__i").alias("antecedent"),
                F.col("__c").alias("antecedent_support"),
            )
        ),
        "antecedent",
    ).join(
        F.broadcast(
            counts.select(
                F.col("__i").alias("consequent"),
                F.col("__c").alias("consequent_support"),
            )
        ),
        "consequent",
    )
    conf = F.col("pair_support").cast("double") / F.col(
        "antecedent_support"
    ).cast("double")
    # (19,0)×(19,0) → (38,0): the widest product BOTH engines accept
    # without precision-loss rules kicking in; int64 products would
    # overflow at ~3e9 × 3e9 basket counts
    lift = (
        (
            F.col("pair_support").cast("decimal(19,0)")
            * F.lit(int(n_baskets)).cast("decimal(19,0)")
        ).cast("double")
        / (
            F.col("antecedent_support").cast("decimal(19,0)")
            * F.col("consequent_support").cast("decimal(19,0)")
        ).cast("double")
    )
    return (
        with_counts.withColumn(
            "n_baskets", F.lit(int(n_baskets)).cast("bigint")
        )
        .withColumn("confidence", conf)
        .withColumn("lift", lift)
        .filter(F.col("confidence") >= float(min_confidence))
        .select(
            "antecedent",
            "consequent",
            "pair_support",
            "antecedent_support",
            "consequent_support",
            "n_baskets",
            "confidence",
            "lift",
        )
    )
