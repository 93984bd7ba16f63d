"""User-activity / engagement analytics: new-vs-returning, churn,
DAU/MAU stickiness, and segment overlap.

The product-analytics staples every events warehouse grows sooner or
later ("how many of today's actives are new?", "who churned last
week?", "how sticky is the product?", "how much do my segments
overlap?") — answered as exact, engine-portable DataFrame ops in the
ops/insights.py discipline: every count is BIGINT, every emitted
double is ONE division (or a fixed sequence of IEEE steps) on exact
integer operands, and no plan carries a data-sized single-task stage.

Reference scope: Stiivi/bubbles ships nothing comparable (SURVEY.md
§2.6 stops at audits); these are §2.14 north-star extension rows.

Timestamps are treated as zone-free wall-clock throughout: buckets
come from ``date_trunc`` on the NTZ input and are emitted as DATEs
(day-space arithmetic — ``date_add``/``add_months`` — never instant
arithmetic), so results are identical in any session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "new_vs_returning",
    "churn_report",
    "growth_accounting",
    "stickiness",
    "segment_overlap",
    "cohort_ltv",
    "rolling_active_users",
]

_BUCKETS = ("day", "week", "month")


def _bucket_date(ts_col: str, bucket: str):
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {_BUCKETS}, got {bucket!r}")
    return F.to_date(F.date_trunc(bucket, F.col(ts_col)))


def _next_bucket(col, bucket: str, periods: int = 1):
    """The bucket start ``periods`` periods after ``col`` — day-space
    arithmetic only (``date_add``/``add_months``), so a DST transition
    inside the period cannot shift the key in any session timezone."""
    if bucket == "day":
        return F.date_add(col, periods)
    if bucket == "week":
        return F.date_add(col, 7 * periods)
    return F.add_months(col, periods)


def new_vs_returning(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Per activity bucket: how many active users were seen for the
    first time EVER in this bucket (``new_users``) vs seen before
    (``returning_users``).  "First ever" is relative to the input
    frame — pass the full history (or a long-enough tail plus a
    seeded first-seen table) for true lifetime semantics.

    Plan: one distinct over (user, bucket) — a single map-side-
    combined shuffle; the per-user first bucket is an unbounded MIN
    window partitioned by user (per-user groups are tiny at any
    corpus size); the final rollup is one keyed count.  Nothing
    data-sized happens in a single task.

    Output: bucket_date DATE, new_users, returning_users,
    active_users (all BIGINT)."""
    uid = F.col(user_col)
    act = (
        df.filter(uid.isNotNull() & F.col(ts_col).isNotNull())
        .select(
            uid.alias("__uid"),
            _bucket_date(ts_col, bucket).alias("bucket_date"),
        )
        .distinct()
    )
    w = Window.partitionBy("__uid")
    flagged = act.withColumn("__first", F.min("bucket_date").over(w))
    new_flag = F.col("bucket_date") == F.col("__first")
    return (
        flagged.groupBy("bucket_date")
        .agg(
            F.count(F.when(new_flag, 1)).cast("bigint").alias("new_users"),
            F.count(F.when(~new_flag, 1))
            .cast("bigint")
            .alias("returning_users"),
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
        )
        .orderBy("bucket_date")
    )


def churn_report(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket: str = "week",
) -> DataFrame:
    """Per activity bucket: of the users active in the bucket, how
    many came back in the NEXT bucket (``retained_next``) and how
    many did not (``churned_next``) — the period-over-period churn
    readout.  The final bucket in the data necessarily reports all
    its actives as churned (there is no next period yet); slice it
    off downstream when reading the report.

    Plan: one distinct over (user, bucket), self-equi-joined against
    its own copy shifted back one period (join keys are (user,
    bucket) on both sides — a plain equi-join, AQE-friendly, no
    theta join), then one keyed count.

    Output: bucket_date DATE, active_users, retained_next,
    churned_next (all BIGINT)."""
    uid = F.col(user_col)
    act = (
        df.filter(uid.isNotNull() & F.col(ts_col).isNotNull())
        .select(
            uid.alias("__uid"),
            _bucket_date(ts_col, bucket).alias("bucket_date"),
        )
        .distinct()
    )
    # activity shifted back one period: a row here means "this user
    # is active in the bucket AFTER bucket_date"
    nxt = act.select(
        "__uid",
        _next_bucket(F.col("bucket_date"), bucket, -1).alias("bucket_date"),
        F.lit(1).alias("__came_back"),
    )
    joined = act.join(nxt, ["__uid", "bucket_date"], "left")
    ret = F.col("__came_back").isNotNull()
    return (
        joined.groupBy("bucket_date")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.count(F.when(ret, 1)).cast("bigint").alias("retained_next"),
            F.count(F.when(~ret, 1)).cast("bigint").alias("churned_next"),
        )
        .orderBy("bucket_date")
    )


def growth_accounting(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket: str = "week",
) -> DataFrame:
    """The MAU-bridge decomposition (the growth-accounting identity
    every subscription/engagement dashboard leads with): per bucket,
    its actives split into **new** (first-ever activity), **retained**
    (also active the previous bucket), and **resurrected** (returning
    after a gap); **churned** counts the PREVIOUS bucket's actives who
    did not return this bucket.  Two identities hold by construction
    and pin the op in tests:
    ``active = new + retained + resurrected`` and
    ``active_t − active_{t−1} = new + resurrected − churned``.

    Plan: one distinct over (user, bucket); first-activity via a keyed
    min; previous-bucket membership via a self-equi-join on the
    day-space-shifted key (``date_add``/``add_months`` — DST-proof,
    never a lag window that would misalign across gaps); churn from
    the same shifted join in the other direction, clamped to buckets
    <= the last OBSERVED bucket (the period after the final bucket
    has no data yet — reporting its churn would mislabel every
    currently-active user).  All BIGINT counts; mid-series buckets
    with zero actives but nonzero churn still appear (the union
    spine includes them).

    Output: bucket_date DATE, active_users, new_users, retained,
    resurrected, churned (all BIGINT)."""
    uid = F.col(user_col)
    act = (
        df.filter(uid.isNotNull() & F.col(ts_col).isNotNull())
        .select(
            uid.alias("__uid"),
            _bucket_date(ts_col, bucket).alias("bucket_date"),
        )
        .distinct()
    )
    first = act.groupBy("__uid").agg(F.min("bucket_date").alias("__first"))
    prev = act.select(
        "__uid",
        _next_bucket(F.col("bucket_date"), bucket).alias("bucket_date"),
        F.lit(1).alias("__was_prev"),
    )
    cur = (
        act.join(first, "__uid")
        .join(prev, ["__uid", "bucket_date"], "left")
        .select(
            "bucket_date",
            (F.col("bucket_date") == F.col("__first")).alias("__new"),
            F.col("__was_prev").isNotNull().alias("__ret"),
        )
    )
    per = cur.groupBy("bucket_date").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_users"),
        F.sum(F.when(F.col("__new"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_users"),
        F.sum(F.when(F.col("__ret"), 1).otherwise(0))
        .cast("bigint")
        .alias("retained"),
        F.sum(
            F.when(~F.col("__new") & ~F.col("__ret"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("resurrected"),
    )
    nxt = act.select(
        "__uid", F.col("bucket_date").alias("__b"),
        _next_bucket(F.col("bucket_date"), bucket).alias("__nb"),
    )
    churn = (
        nxt.join(
            act.select(
                "__uid", F.col("bucket_date").alias("__nb"),
                F.lit(1).alias("__back"),
            ),
            ["__uid", "__nb"],
            "left",
        )
        .filter(F.col("__back").isNull())
        .groupBy(F.col("__nb").alias("bucket_date"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("churned"))
    )
    # clamp churn to OBSERVED buckets: the shifted join would
    # otherwise emit a phantom bucket one period past the last
    # observed one in which every currently-active user counts as
    # churned — churn attributed to a period with no data yet.
    # Mid-gap buckets (zero actives, nonzero churn) stay.  The bound
    # is a 1-row broadcast, never a data-sized shuffle.
    maxb = act.agg(F.max("bucket_date").alias("__maxb"))
    churn = (
        churn.join(F.broadcast(maxb), F.col("bucket_date") <= F.col("__maxb"))
        .drop("__maxb")
    )
    return (
        per.join(churn, "bucket_date", "full")
        .select(
            "bucket_date",
            F.coalesce("active_users", F.lit(0)).cast("bigint").alias("active_users"),
            F.coalesce("new_users", F.lit(0)).cast("bigint").alias("new_users"),
            F.coalesce("retained", F.lit(0)).cast("bigint").alias("retained"),
            F.coalesce("resurrected", F.lit(0)).cast("bigint").alias("resurrected"),
            F.coalesce("churned", F.lit(0)).cast("bigint").alias("churned"),
        )
    )


def stickiness(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket: str = "month",
) -> DataFrame:
    """Engagement stickiness per bucket: average daily active users
    over the bucket's ACTIVE days divided by the bucket's distinct
    actives — the DAU/MAU (or DAU/WAU) ratio.  Days with zero
    activity are not in the denominator; with gap-free data this is
    the classic ratio, with sparse data it measures engagement on
    days the product was used (document-stable across engines either
    way — no calendar-length arithmetic).

    Exactness: ``avg_dau`` and ``stickiness`` are each ONE IEEE
    double division on exact BIGINT operands (``stickiness`` divides
    by the exact integer product ``active_days * bucket_actives``,
    not by the float ``avg_dau`` — one rounding step, not two).

    Plan: one distinct over (user, day); per-day DAU and per-bucket
    distinct actives are two keyed counts off that same frame; the
    join is bucket-count-sized.

    Output: bucket_date DATE, bucket_actives, dau_sum, active_days
    (BIGINT), avg_dau, stickiness (DOUBLE)."""
    uid = F.col(user_col)
    day_act = (
        df.filter(uid.isNotNull() & F.col(ts_col).isNotNull())
        .select(
            uid.alias("__uid"),
            _bucket_date(ts_col, "day").alias("__day"),
        )
        .distinct()
    )
    bcol = F.to_date(F.date_trunc(bucket, F.col("__day")))
    dau = day_act.groupBy("__day").agg(
        F.count(F.lit(1)).cast("bigint").alias("__dau")
    )
    per_bucket_days = dau.groupBy(bcol.alias("bucket_date")).agg(
        F.sum("__dau").cast("bigint").alias("dau_sum"),
        F.count(F.lit(1)).cast("bigint").alias("active_days"),
    )
    actives = (
        day_act.select("__uid", bcol.alias("bucket_date"))
        .distinct()
        .groupBy("bucket_date")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bucket_actives"))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        per_bucket_days.join(actives, "bucket_date")
        .select(
            "bucket_date",
            "bucket_actives",
            "dau_sum",
            "active_days",
            (d("dau_sum") / d("active_days")).alias("avg_dau"),
            (
                d("dau_sum")
                / (F.col("active_days") * F.col("bucket_actives")).cast(
                    "double"
                )
            ).alias("stickiness"),
        )
        .orderBy("bucket_date")
    )


def segment_overlap(
    df: DataFrame,
    id_col: str,
    seg_col: str,
) -> DataFrame:
    """Pairwise membership overlap between segments: for every
    unordered segment pair (seg_a < seg_b), the exact member-set
    sizes, intersection, Jaccard similarity, and containment
    (intersection over the SMALLER set).  Zero-overlap pairs are
    emitted too (a full segment-pair spine), so absence of a row
    never has to be disambiguated from absence of overlap.

    Plan: one distinct over (id, segment), self-equi-joined on id to
    count co-memberships — the expansion per id is (segments the id
    belongs to)², bounded by the segment vocabulary, never by corpus
    size; segment sizes are one keyed count and join back broadcast
    (the spine is vocab²-rows).  An id in very many segments is the
    skew case — pre-filter such ids if the vocabulary is huge.

    Output: seg_a, seg_b, size_a, size_b, intersection (BIGINT),
    jaccard, containment (DOUBLE — single divisions on exact
    counts)."""
    m = (
        df.filter(F.col(id_col).isNotNull() & F.col(seg_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"), F.col(seg_col).alias("__seg")
        )
        .distinct()
    )
    sizes = m.groupBy(F.col("__seg").alias("seg")).agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    inter = (
        m.alias("l")
        .join(m.alias("r"), F.col("l.__id") == F.col("r.__id"))
        .filter(F.col("l.__seg") < F.col("r.__seg"))
        .groupBy(
            F.col("l.__seg").alias("seg_a"), F.col("r.__seg").alias("seg_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("intersection"))
    )
    spine = (
        sizes.select(
            F.col("seg").alias("seg_a"), F.col("size").alias("size_a")
        )
        .join(
            sizes.select(
                F.col("seg").alias("seg_b"), F.col("size").alias("size_b")
            ),
            F.col("seg_a") < F.col("seg_b"),
        )
    )
    j = (
        spine.join(F.broadcast(inter), ["seg_a", "seg_b"], "left")
        .fillna(0, ["intersection"])
    )
    un = (F.col("size_a") + F.col("size_b") - F.col("intersection")).cast(
        "double"
    )
    smaller = F.least(F.col("size_a"), F.col("size_b")).cast("double")
    i = F.col("intersection").cast("double")
    return j.select(
        "seg_a",
        "seg_b",
        "size_a",
        "size_b",
        "intersection",
        F.when(un > 0, i / un).alias("jaccard"),
        F.when(smaller > 0, i / smaller).alias("containment"),
    ).orderBy("seg_a", "seg_b")


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "month",
    decimal: str = "decimal(18,2)",
) -> DataFrame:
    """Cohort lifetime-value curves: users cohort by their FIRST
    active bucket; each (cohort, age) cell reports the cohort's
    size, that period's actives and revenue, and the running
    cumulative revenue per cohort member — the payback/LTV readout
    under every acquisition-spend decision.  Ages with zero activity
    inside the observed span are emitted (zero revenue), so curves
    are gap-free up to each cohort's last active age.

    Exactness: revenue aggregates and cumulates entirely in DECIMAL
    (``decimal`` param, money-shaped default); cohort and age are
    integer month/day/week arithmetic in DATE space (never instant
    math — TZ/DST-proof); ``cum_ltv_per_user`` is ONE IEEE division
    of the exact cumulative by the exact BIGINT cohort size.

    Scale: one (user, bucket) rollup carrying each user's windowed
    first bucket — per-user partitions are tiny; the (cohort, age)
    table is buckets²/2-sized, so its spine fill and cumsum windows
    are metadata-scale.

    Output: cohort_date DATE, age INT, cohort_users, active_users
    (BIGINT), revenue, cum_revenue (DECIMAL), cum_ltv_per_user
    (DOUBLE), ordered by (cohort_date, age)."""
    uid = F.col(user_col)
    per = (
        df.filter(uid.isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            uid.alias("__uid"),
            _bucket_date(ts_col, bucket).alias("bucket_date"),
        )
        .agg(
            F.sum(F.coalesce(F.col(value_col), F.lit(0)).cast(decimal))
            .cast(decimal)
            .alias("__rev")
        )
    )
    w = Window.partitionBy("__uid")
    tagged = per.withColumn("cohort_date", F.min("bucket_date").over(w))
    if bucket == "day":
        age = F.datediff(F.col("bucket_date"), F.col("cohort_date"))
    elif bucket == "week":
        age = (
            F.datediff(F.col("bucket_date"), F.col("cohort_date")) / 7
        ).cast("int")
    else:
        age = (
            (F.year("bucket_date") - F.year("cohort_date")) * 12
            + (F.month("bucket_date") - F.month("cohort_date"))
        )
    cells = tagged.groupBy("cohort_date", age.cast("int").alias("age")).agg(
        F.count(F.lit(1)).cast("bigint").alias("active_users"),
        F.sum("__rev").cast(decimal).alias("revenue"),
    )
    sizes = tagged.filter(F.col("bucket_date") == F.col("cohort_date")).groupBy(
        "cohort_date"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cohort_users"))
    # gap-free age spine per cohort, 0..max observed age
    spans = cells.groupBy("cohort_date").agg(
        F.max("age").alias("__max_age")
    )
    spine = spans.select(
        "cohort_date",
        F.explode(F.sequence(F.lit(0), F.col("__max_age"))).alias("age"),
    )
    filled = (
        spine.join(cells, ["cohort_date", "age"], "left")
        .join(F.broadcast(sizes), "cohort_date")
        .select(
            "cohort_date",
            "age",
            "cohort_users",
            F.coalesce(F.col("active_users"), F.lit(0))
            .cast("bigint")
            .alias("active_users"),
            F.coalesce(F.col("revenue"), F.lit(0).cast(decimal))
            .cast(decimal)
            .alias("revenue"),
        )
    )
    wc = (
        Window.partitionBy("cohort_date")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        filled.withColumn(
            "cum_revenue", F.sum("revenue").over(wc).cast(decimal)
        )
        .withColumn(
            "cum_ltv_per_user",
            F.col("cum_revenue").cast("double")
            / F.col("cohort_users").cast("double"),
        )
        .orderBy("cohort_date", "age")
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Rolling distinct actives (the WAU/MAU curve evaluated at every
    change point): at day t, a user counts if they were active on any
    day d with ``t ∈ [d, d+window_days)``.  Computed WITHOUT a
    per-day × per-user fanout join: each user's active days coalesce
    into covered intervals (gaps-and-islands — a new island starts
    when the previous active day is more than ``window_days`` back),
    and the global curve is the sweep-line concurrency over those
    intervals.  Output rows are the CHANGE POINTS of the step
    function; forward-fill against a day spine downstream if a dense
    series is needed (``resample_time``).

    Exactness: pure day-space integer arithmetic (``datediff`` /
    ``date_add``) and BIGINT sweep sums — no instants, no floats
    except none; identical in any session timezone.

    Scale: one (user, day) distinct shuffle; the island window is
    per-user (active-day lists are user-history-sized); the interval
    table is ≤ one row per user-island, and the sweep inherits
    ``concurrency_report``'s two-phase global cumsum — never a
    day×user blowup join.

    Output: ts DATE, delta, rolling_actives (BIGINT), ordered by
    ts."""
    if window_days < 1:
        raise ValueError("rolling_active_users: window_days must be >= 1")
    from bubbles_spark.ops.events import concurrency_report

    uid = F.col(user_col)
    days = (
        df.filter(uid.isNotNull() & F.col(ts_col).isNotNull())
        .select(
            uid.alias("__uid"),
            _bucket_date(ts_col, "day").alias("__day"),
        )
        .distinct()
    )
    w = Window.partitionBy("__uid").orderBy("__day")
    marked = days.withColumn(
        "__new",
        F.when(
            F.lag("__day").over(w).isNull()
            | (F.datediff(F.col("__day"), F.lag("__day").over(w)) > window_days),
            1,
        ).otherwise(0),
    )
    wisl = (
        Window.partitionBy("__uid")
        .orderBy("__day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = (
        marked.withColumn("__isl", F.sum("__new").over(wisl))
        .groupBy("__uid", "__isl")
        .agg(
            F.min("__day").alias("__s"),
            F.date_add(F.max("__day"), window_days).alias("__e"),
        )
    )
    out = concurrency_report(islands, "__s", "__e")
    return out.withColumnRenamed("concurrent", "rolling_actives")
