"""Scan / filter / projection / limit / scalar queries (SURVEY.md §2.1,
§2.3-2.5, §2.7) bound to the driver's testdata tables with DuckDB oracles.
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
    "op01_full_scan",
    sql="SELECT r_regionkey, r_name FROM region",
    doc="OP-01 full-collection scan (reference src/coding_task_1.py:42-50). "
    "Vectorized parquet read; ReadSchema pruned to the projected columns.",
)
def op01_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "region").select("r_regionkey", "r_name")


@spec(
    QUERIES,
    "op02_point_lookup",
    sql="SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42",
    doc="OP-02 point lookup by key (reference src/coding_task_1.py:53-61). "
    "Key predicate reaches the scan as PushedFilters → row-group skip.",
)
def op02_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_acctbal")
    )


@spec(
    QUERIES,
    "op09_filtered_search",
    sql="""
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        FROM customer
        WHERE c_mktsegment = 'BUILDING'
          AND c_acctbal > 1000.0
          AND c_name LIKE '%1%'
    """,
    doc="OP-09 conjunctive filter — equality + range + substring — the "
    "reference's first demonstrated query (src/coding_task_1.py:64-83, "
    "FHIR params name/gender/birthdate=gt). Flagship smoke query.",
)
def op09_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return R.filtered_search(
        c,
        F.col("c_mktsegment") == "BUILDING",
        F.col("c_acctbal") > 1000.0,
        F.col("c_name").contains("1"),
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@spec(
    QUERIES,
    "op09_date_range",
    sql="""
        SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        FROM orders
        WHERE o_orderstatus = 'O' AND o_orderdate > TIMESTAMP '1998-01-01 00:00:00'
    """,
    doc="OP-09 theta/date-range predicate (reference birthdate=gt{d}, "
    "src/coding_task_1.py:70).",
)
def op09_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return R.filtered_search(
        o,
        F.col("o_orderstatus") == "O",
        F.col("o_orderdate") > F.lit("1998-01-01 00:00:00").cast("timestamp"),
    ).select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


@spec(
    QUERIES,
    "op12_empty_guard",
    sql="""
        SELECT CAST(CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS BIGINT) AS has_rows
        FROM customer WHERE c_acctbal > 999999.0
    """,
    doc="OP-12 empty-result guard (reference `if 'entry' in data`, "
    "src/coding_task_1.py:74) expressed in-plan, no driver branch.",
)
def op12_empty_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 999999.0)
    return c.agg(
        F.when(F.count(F.lit(1)) > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("has_rows")
    )


@spec(
    QUERIES,
    "op13_array_element_removal",
    sql="""
        SELECT l_orderkey,
               CAST(len(list_filter(list(l_quantity), x -> NOT (x >= 25.0))) AS BIGINT) AS n_kept,
               CAST(count(*) AS BIGINT) AS n_total
        FROM lineitem GROUP BY l_orderkey
    """,
    doc="OP-13 array-element deletion by predicate (reference SSN-identifier "
    "removal, src/coding_task_1.py:199-204; remove-ALL per SURVEY §2.10). "
    "Higher-order filter() over a collected array — no explode round-trip.",
)
def op13_array_element_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.collect_list("l_quantity").alias("qtys"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
    )
    kept = R.array_remove_matching(F.col("qtys"), lambda x: x >= 25.0)
    return grouped.select(
        "l_orderkey", F.size(kept).cast("bigint").alias("n_kept"), "n_total"
    )


@spec(
    QUERIES,
    "op14_nested_projection",
    sql="SELECT c_custkey, split_part(c_name, '#', 2) AS cust_num FROM customer",
    doc="OP-14 nested-path / element projection (reference "
    "coding[0].code extraction, src/coding_task_1.py:99-102).",
)
def op14_nested_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", F.element_at(F.split("c_name", "#"), 2).alias("cust_num")
    )


@spec(
    QUERIES,
    "op18_null_default",
    sql="""
        SELECT c_custkey,
               coalesce(nullif(trim(n_name), ''), 'Not found') AS nation_name
        FROM customer
        LEFT JOIN nation ON c_nationkey = n_nationkey AND n_nationkey < 10
    """,
    doc="OP-18 null-or-blank defaulting (reference district → 'Not found', "
    "src/coding_task_1.py:210-212; missing-OR-blank variant per §2.10).",
)
def op18_null_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalars import not_blank_or

    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 10)
    return c.join(
        F.broadcast(n), on=c.c_nationkey == n.n_nationkey, how="left"
    ).select("c_custkey", not_blank_or("n_name", "Not found").alias("nation_name"))


@spec(
    QUERIES,
    "op19_display_string",
    sql="""
        SELECT c_custkey,
               trim(printf('%s %s, %s', c_name, n_name, r_name)) AS display
        FROM customer, nation, region
        WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
    """,
    doc="OP-19 derived display string (reference address.text assembly, "
    "src/coding_task_1.py:214-220).",
)
def op19_display_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalars import display_string

    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            display_string(
                "%s %s, %s", F.col("c_name"), F.col("n_name"), F.col("r_name")
            ).alias("display"),
        )
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
    "op22_count",
    sql="SELECT CAST(count(*) AS BIGINT) AS n_orders FROM orders",
    doc="OP-22 count (reference len(data['entry']), src/coding_task_1.py:75).",
)
def op22_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.count_rows(load(spark, sf_dir, "orders"), alias="n_orders")


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
