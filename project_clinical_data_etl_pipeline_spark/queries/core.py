"""Scan / filter / projection / limit / scalar queries (SURVEY.md §2.1,
§2.3-2.5, §2.7) bound to the driver's testdata tables with DuckDB oracles.

Several operators are merged into multi-column/union "suites" (the
op30_38_scalar_suite pattern) so every SURVEY §2 family fits the
driver's 50-query grading window while each op keeps a named, asserted
output column or row branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import relational as R
from ..tables import load
from .base import QuerySpec, spec

QUERIES: dict[str, QuerySpec] = {}


@spec(
    QUERIES,
    "op09_conjunctive_filter",
    sql="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date
        FROM orders
        WHERE o_orderstatus = 'O'
          AND o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
          AND o_totalprice > 50000.0
          AND o_orderpriority LIKE '%URGENT%'
    """,
    doc="OP-09 conjunctive filter — equality + date-range + numeric range "
    "+ substring in one predicate set, the reference's first demonstrated "
    "query (src/coding_task_1.py:64-83, FHIR params name/gender/"
    "birthdate=gt). All sargable predicates reach PushedFilters. "
    "Flagship smoke query.",
)
def op09_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return R.filtered_search(
        o,
        F.col("o_orderstatus") == "O",
        F.col("o_orderdate") > F.lit("1997-06-01 00:00:00").cast("timestamp"),
        F.col("o_totalprice") > 50000.0,
        F.col("o_orderpriority").contains("URGENT"),
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


@spec(
    QUERIES,
    "op01_02_scan_lookup",
    sql="""
        SELECT 'region' AS src, r_regionkey AS key, r_name AS name,
               CAST(NULL AS DOUBLE) AS acctbal
        FROM region
        UNION ALL
        SELECT 'customer', c_custkey, c_name, c_acctbal
        FROM customer WHERE c_custkey = 42
    """,
    doc="OP-01 full-collection scan (reference src/coding_task_1.py:42-50) "
    "unioned with the OP-02 point lookup (:53-61). The region branch reads "
    "a pruned ReadSchema; the customer branch pushes EqualTo(c_custkey,42) "
    "to the scan → row-group skip.",
)
def op01_02_scan_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").select(
        F.lit("region").alias("src"),
        F.col("r_regionkey").alias("key"),
        F.col("r_name").alias("name"),
        F.lit(None).cast("double").alias("acctbal"),
    )
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select(
            F.lit("customer").alias("src"),
            F.col("c_custkey").alias("key"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )
    return region.unionByName(cust)


@spec(
    QUERIES,
    "op12_22_counts",
    sql="""
        SELECT 'n_orders' AS check, CAST(count(*) AS BIGINT) AS n FROM orders
        UNION ALL
        SELECT 'has_rich_customers',
               CAST(CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS BIGINT)
        FROM customer WHERE c_acctbal > 999999.0
        UNION ALL
        SELECT 'dpp_click_count', CAST(count(*) AS BIGINT)
        FROM events
        WHERE event_type = 'click' AND CAST(ts AS DATE) IN (
            SELECT DISTINCT CAST(ts AS DATE) FROM events
            WHERE event_type = 'error' AND value > 300.0)
    """,
    doc="OP-22 count (reference len(data['entry']), src/coding_task_1.py:75) "
    "unioned with the OP-12 empty-result guard (`if 'entry' in data`, :74) "
    "expressed in-plan — no driver branch, both map-side partial counts — "
    "and the dynamic-partition-pruning leg (SURVEY §4.1): the same count "
    "shape over a date-PARTITIONED events copy joined to a filtered dim, "
    "where Catalyst's dynamicpruning# subquery restricts the fact scan to "
    "the dim's qualifying dates (pruned-partition counts pinned in "
    "tests/test_partition_pruning.py; the oracle expresses the identical "
    "semantics as an IN-subquery over the raw table).",
)
def op12_22_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.pruning import dpp_click_count

    n_orders = R.count_rows(load(spark, sf_dir, "orders"), alias="n").select(
        F.lit("n_orders").alias("check"), "n"
    )
    guard = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 999999.0)
        .agg(
            F.when(F.count(F.lit(1)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("n")
        )
        .select(F.lit("has_rich_customers").alias("check"), "n")
    )
    return n_orders.unionByName(guard).unionByName(dpp_click_count(spark, sf_dir))


@spec(
    QUERIES,
    "op11_13_array_suite",
    sql="""
        SELECT l_orderkey,
               CAST(len(list_filter(list(l_quantity), x -> NOT (x >= 25.0))) AS BIGINT) AS n_kept,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(bool_or(l_returnflag = 'R' AND l_quantity > 45.0) AS INT) AS has_hot_return
        FROM lineitem GROUP BY l_orderkey
    """,
    doc="OP-13 array-element deletion by predicate (reference SSN-identifier "
    "removal, src/coding_task_1.py:199-204; remove-ALL per SURVEY §2.10) "
    "plus OP-11 nested-array exists (code=system|coding search, "
    "src/coding_task_3.py:54-87) over the same per-order collected array — "
    "higher-order filter()/exists(), no explode round-trip.",
)
def op11_13_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_returnflag", "l_quantity")).alias("items"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
    )
    qtys = F.transform(F.col("items"), lambda it: it["l_quantity"])
    kept = R.array_remove_matching(qtys, lambda x: x >= 25.0)
    has_match = F.exists(
        F.col("items"),
        lambda it: (it["l_returnflag"] == "R") & (it["l_quantity"] > 45.0),
    )
    return grouped.select(
        "l_orderkey",
        F.size(kept).cast("bigint").alias("n_kept"),
        "n_total",
        has_match.cast("int").alias("has_hot_return"),
    )


@spec(
    QUERIES,
    "op14_20_projection_suite",
    sql="""
        SELECT c_custkey,
               split_part(c_name, '#', 2) AS cust_num,
               c_name, c_mktsegment,
               coalesce(nullif(trim(CASE WHEN n_nationkey < 10 THEN n_name END), ''),
                        'Not found') AS nation_name,
               trim(printf('%s %s, %s', c_name, n_name, r_name)) AS display,
               printf('<div xmlns="http://www.w3.org/1999/xhtml"><p>%s</p></div>',
                      c_name) AS narrative
        FROM customer
        LEFT JOIN nation ON c_nationkey = n_nationkey
        LEFT JOIN region ON n_regionkey = r_regionkey
    """,
    doc="Projection suite over one customer×nation×region broadcast join: "
    "OP-14 nested-path extraction (coding[0].code, src/coding_task_1.py:99-102), "
    "OP-15 column drop via pruned projection (:193-196), OP-18 null-or-blank "
    "defaulting (district → 'Not found', :210-212), OP-19 derived display "
    "string (:214-220), OP-20 HTML narrative (:246-253), OP-36 "
    "first-element-or-default. One WholeStageCodegen stage over two "
    "broadcast dims — zero fact shuffles at any scale.",
)
def op14_20_projection_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalars import display_string, not_blank_or

    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left").join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey, "left"
    )
    small_nation = F.when(F.col("n_nationkey") < 10, F.col("n_name"))
    return joined.select(
        "c_custkey",
        F.element_at(F.split("c_name", "#"), 2).alias("cust_num"),
        "c_name",
        "c_mktsegment",
        not_blank_or(small_nation, "Not found").alias("nation_name"),
        display_string(
            "%s %s, %s", F.col("c_name"), F.col("n_name"), F.col("r_name")
        ).alias("display"),
        F.format_string(
            '<div xmlns="http://www.w3.org/1999/xhtml"><p>%s</p></div>',
            F.col("c_name"),
        ).alias("narrative"),
    )


@spec(
    QUERIES,
    "op21_first_row_deterministic",
    sql="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
    """,
    doc="OP-21 deterministic pick-one (reference data['entry'][0] trusting "
    "server order, src/coding_task_1.py:123; engine pins a total order, "
    "SURVEY §7.5.1). Physical plan: TakeOrderedAndProject, no full sort.",
)
def op21_first_row_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return R.first_row_deterministic(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
    )


@spec(
    QUERIES,
    "op30_38_scalar_suite",
    sql="""
        SELECT o_orderkey,
               upper(substr(o_orderstatus, 1, 1)) AS status_initial,
               strftime(o_orderdate, '%Y%m%d') AS compact_date,
               concat_ws('^', o_orderstatus, o_orderpriority) AS status_priority,
               CAST(o_orderpriority LIKE '%URGENT%' AS INT) AS is_urgent,
               trim(o_orderpriority) AS priority_trim
        FROM orders
    """,
    doc="OP-30..35 scalar suite in one projection: upper-initial "
    "(src/coding_task_5.py:119), date compaction (:120-122), caret concat "
    "(:117), substring containment (src/coding_task_1.py:201), trim "
    "(src/coding_task_2.py:323). Single WholeStageCodegen stage.",
)
def op30_38_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderstatus", 1, 1)).alias("status_initial"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("compact_date"),
        F.concat_ws("^", "o_orderstatus", "o_orderpriority").alias("status_priority"),
        F.col("o_orderpriority").contains("URGENT").cast("int").alias("is_urgent"),
        F.trim(F.col("o_orderpriority")).alias("priority_trim"),
    )
