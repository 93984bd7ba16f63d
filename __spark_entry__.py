"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` maps one
entry per implemented operator (SURVEY.md §2) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the correctness gate.

Column-name parity rule: every computed column is aliased to the same
name on both sides.  Float parity rule: aggregates/ratios are rounded
identically on both sides (the engines sum in different orders).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bubbles_spark import ops
from bubbles_spark.io import load_table
from bubbles_spark.ops import audit as audit_ops
from bubbles_spark.ops import core, dedup, events, multimodal, text, textan, vector

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation for returned items (SURVEY.md §7.2):
    lineitem ⋈ orders ⋈ customer ⋈ nation, filter returnflag='R',
    group by nation, sum revenue.  Exercises source, broadcast
    master-detail joins, filter, aggregation, sort."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    enriched = core.join_details(
        core.join_details(
            core.join_details(
                core.filter_by_value(lineitem, "l_returnflag", "R"),
                orders,
                "l_orderkey",
                "o_orderkey",
                broadcast_detail=False,  # orders ~ lineitem/4: too big to broadcast at scale
            ),
            customer,
            "o_custkey",
            "c_custkey",
        ),
        nation,
        "c_nationkey",
        "n_nationkey",
    )
    revenue = core.derive(
        enriched, "rev", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    agg = core.aggregate(revenue, "n_name", [("rev", "sum")], include_count=True)
    return core.sort(
        core.derive(agg, "rev_sum", F.round(F.col("rev_sum"), 2)),
        [("rev_sum", "desc"), ("n_name", "asc")],
    )


FLAGSHIP_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev_sum,
       COUNT(*) AS record_count
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY n_name
ORDER BY rev_sum DESC, n_name
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, SF0001)


# ---------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def register(fn):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return register


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- flagship (join_details J1 + F1 + A1 + O1 composition) -----------
_q("flagship_revenue_by_nation", FLAGSHIP_SQL)(flagship)


# --- P1/P2 field_filter ----------------------------------------------
@_q(
    "field_filter_keep_rename",
    "SELECT c_custkey AS custkey, c_name, c_mktsegment FROM customer",
)
def q_field_filter(spark, sf_dir):
    return core.field_filter(
        _t(spark, sf_dir, "customer"),
        keep=["c_custkey", "c_name", "c_mktsegment"],
        rename={"c_custkey": "custkey"},
    )


# --- F1 filter_by_value ----------------------------------------------
@_q("filter_by_value", "SELECT * FROM orders WHERE o_orderstatus = 'F'")
def q_filter_by_value(spark, sf_dir):
    return core.filter_by_value(_t(spark, sf_dir, "orders"), "o_orderstatus", "F")


@_q("filter_by_value_discard", "SELECT * FROM orders WHERE NOT (o_orderstatus = 'F')")
def q_filter_by_value_discard(spark, sf_dir):
    return core.filter_by_value(
        _t(spark, sf_dir, "orders"), "o_orderstatus", "F", discard=True
    )


# --- F2 filter_by_set ------------------------------------------------
@_q(
    "filter_by_set",
    "SELECT * FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')",
)
def q_filter_by_set(spark, sf_dir):
    return core.filter_by_set(
        _t(spark, sf_dir, "customer"), "c_mktsegment", ["BUILDING", "MACHINERY"]
    )


# --- F3 filter_by_range (half-open) ----------------------------------
@_q(
    "filter_by_range",
    "SELECT * FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 20",
)
def q_filter_by_range(spark, sf_dir):
    return core.filter_by_range(_t(spark, sf_dir, "lineitem"), "l_quantity", 10, 20)


# --- F4 filter_not_empty ---------------------------------------------
@_q(
    "filter_not_empty",
    "SELECT * FROM events WHERE props IS NOT NULL AND props <> ''",
)
def q_filter_not_empty(spark, sf_dir):
    return core.filter_not_empty(_t(spark, sf_dir, "events"), "props")


# --- D1 distinct ------------------------------------------------------
@_q("distinct_key", "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer")
def q_distinct(spark, sf_dir):
    return core.distinct(_t(spark, sf_dir, "customer"), ["c_mktsegment", "c_nationkey"])


# --- D2 duplicates ----------------------------------------------------
@_q(
    "duplicates",
    """
    SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS record_count
    FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 2
    """,
)
def q_duplicates(spark, sf_dir):
    return core.duplicates(_t(spark, sf_dir, "lineitem"), "l_orderkey", threshold=2)


# --- D3 duplicate_stats ----------------------------------------------
@_q(
    "duplicate_stats",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS duplicate_key_count,
           CAST(COALESCE(SUM(record_count - 2), 0) AS BIGINT) AS surplus_record_count
    FROM (
      SELECT COUNT(*) AS record_count
      FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 2
    )
    """,
)
def q_duplicate_stats(spark, sf_dir):
    return core.duplicate_stats(_t(spark, sf_dir, "lineitem"), "l_orderkey", threshold=2)


# --- L1 sample (first / nth) -----------------------------------------
@_q("sample_first", "SELECT * FROM customer ORDER BY c_custkey LIMIT 100")
def q_sample_first(spark, sf_dir):
    return core.sample(
        _t(spark, sf_dir, "customer"), 100, mode="first", order_by=["c_custkey"]
    )


@_q(
    "sample_nth",
    """
    SELECT * EXCLUDE (__rn) FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY c_custkey) AS __rn FROM customer
    ) WHERE (__rn - 1) % 10 = 0
    """,
)
def q_sample_nth(spark, sf_dir):
    return core.sample(
        _t(spark, sf_dir, "customer"), 10, mode="nth", order_by=["c_custkey"]
    )


# --- O1/O2 sort + top_k ----------------------------------------------
@_q(
    "top_k",
    """
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 10
    """,
)
def q_top_k(spark, sf_dir):
    sup = core.field_filter(
        _t(spark, sf_dir, "supplier"), keep=["s_suppkey", "s_name", "s_acctbal"]
    )
    return core.top_k(sup, [("s_acctbal", "desc"), ("s_suppkey", "asc")], 10)


# --- A1 aggregate (TPC-H Q1 shape) ------------------------------------
@_q(
    "aggregate_q1",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS l_quantity_sum,
           ROUND(SUM(l_extendedprice), 2) AS l_extendedprice_sum,
           ROUND(AVG(l_discount), 6) AS l_discount_avg,
           MIN(l_shipdate) AS l_shipdate_min,
           MAX(l_shipdate) AS l_shipdate_max,
           CAST(COUNT(*) AS BIGINT) AS record_count
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_aggregate(spark, sf_dir):
    agg = core.aggregate(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum"),
            ("l_extendedprice", "sum"),
            ("l_discount", "avg"),
            ("l_shipdate", "min"),
            ("l_shipdate", "max"),
        ],
    )
    return (
        agg.withColumn("l_quantity_sum", F.round("l_quantity_sum", 2))
        .withColumn("l_extendedprice_sum", F.round("l_extendedprice_sum", 2))
        .withColumn("l_discount_avg", F.round("l_discount_avg", 6))
    )


# --- A2 global aggregate ----------------------------------------------
@_q(
    "aggregate_global",
    """
    SELECT ROUND(SUM(o_totalprice), 2) AS o_totalprice_sum,
           ROUND(AVG(o_totalprice), 4) AS o_totalprice_avg,
           CAST(COUNT(*) AS BIGINT) AS record_count
    FROM orders
    """,
)
def q_aggregate_global(spark, sf_dir):
    agg = core.aggregate(
        _t(spark, sf_dir, "orders"),
        None,
        [("o_totalprice", "sum"), ("o_totalprice", "avg")],
    )
    return agg.withColumn("o_totalprice_sum", F.round("o_totalprice_sum", 2)).withColumn(
        "o_totalprice_avg", F.round("o_totalprice_avg", 4)
    )


# --- J1 join_details ---------------------------------------------------
@_q(
    "join_details",
    """
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           n_name, n_regionkey
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def q_join_details(spark, sf_dir):
    return core.join_details(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        "c_nationkey",
        "n_nationkey",
    )


# --- U1 append ----------------------------------------------------------
@_q(
    "append",
    """
    SELECT * FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT * FROM orders WHERE o_totalprice > 100000
    """,
)
def q_append(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return core.append(
        [
            core.filter_by_value(orders, "o_orderstatus", "F"),
            orders.filter(F.col("o_totalprice") > 100000),
        ]
    )


# --- C1/C2/C3 CDC -------------------------------------------------------
@_q(
    "added_keys",
    """
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey <= 700)
    """,
)
def q_added_keys(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    target = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 700)
    return core.added_keys(orders, target, "o_custkey", "c_custkey")


@_q(
    "added_rows",
    """
    SELECT * FROM customer
    WHERE c_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0)
    """,
)
def q_added_rows(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    # synthetic "previous load" missing every 3rd key
    target = customer.filter(F.col("c_custkey") % 3 != 0)
    return core.added_rows(customer, target, "c_custkey", "c_custkey")


@_q(
    "changed_rows",
    """
    SELECT s.* FROM customer s
    JOIN (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS t_acctbal,
             c_mktsegment AS t_mktsegment
      FROM customer
    ) t ON s.c_custkey = t.c_custkey
    WHERE s.c_acctbal IS DISTINCT FROM t.t_acctbal
       OR s.c_mktsegment IS DISTINCT FROM t.t_mktsegment
    """,
)
def q_changed_rows(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    # synthetic "previous load": every 7th customer's balance shifted
    target = customer.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100).otherwise(
            F.col("c_acctbal")
        ),
    )
    return core.changed_rows(
        customer, target, "c_custkey", ["c_acctbal", "c_mktsegment"]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return dict(_ORACLES)
