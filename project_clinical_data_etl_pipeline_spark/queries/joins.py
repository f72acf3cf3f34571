"""Join / enrichment queries (SURVEY.md §2.6) on the testdata tables.

Join classes exercised, mirroring the reference: broadcast-hash dim
enrichment (OP-24/25/26), left-semi FK filter (OP-10), left-anti
care-gap (OP-29), first-match priority lookup (OP-26). FK split/
construction (OP-27) lives in extended.op16_27_construct_split.
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
    "op10_semi_join",
    sql="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'AUTOMOBILE')
    """,
    doc="OP-10 FK filter as left-semi join (reference Condition?patient={id}, "
    "src/coding_task_1.py:85-109). Key side broadcasts → zero shuffle of "
    "the fact table at any scale.",
)
def op10_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    keys = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return R.semi_join(o, keys, on="o_custkey").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def op24_dim_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-24 terminology-style dim enrichment (reference N+1 Hermes
    lookups src/coding_task_1.py:137-175 → ONE broadcast hash join per
    dim). Physical plan: two BroadcastHashJoins, fact side never shuffles
    before the final partial agg. Graded as the 'enrich' leg of
    op24_25_concept_suite; kept standalone for bench.py's timing
    series and the pinned-plan test."""
    from ..functions.scalars import decimal_sum

    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    enriched = R.dim_enrich(
        R.dim_enrich(c, n, on=c.c_nationkey == n.n_nationkey),
        r,
        on=F.col("n_regionkey") == r.r_regionkey,
    )
    return enriched.groupBy("r_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        decimal_sum("c_acctbal").alias("total_acctbal"),
    )


@spec(
    QUERIES,
    "op24_25_concept_suite",
    sql="""
        SELECT 'enrich' AS part, r_name,
               CAST(NULL AS VARCHAR) AS n_name,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer, nation, region
        WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY r_name
        UNION ALL
        SELECT 'children' AS part, r_name, n_name,
               CAST(NULL AS BIGINT) AS n_customers,
               CAST(NULL AS DOUBLE) AS total_acctbal
        FROM region JOIN nation ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE')
    """,
    doc="OP-24 + OP-25 concept-hierarchy suite: broadcast dim enrichment "
    "UP the hierarchy (parents: reference N+1 Hermes lookups "
    "src/coding_task_1.py:137-175 collapsed to one broadcast hash join "
    "per dim) unioned with 1-hop child expansion DOWN it (reference ECL "
    "<!code, src/coding_task_2.py:115-153). Both legs broadcast the "
    "edge/dim side; the union is a zero-shuffle concat.",
)
def op24_25_concept_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .extended import op25_child_expansion

    enrich = op24_dim_enrichment(spark, sf_dir).select(
        F.lit("enrich").alias("part"),
        "r_name",
        F.lit(None).cast("string").alias("n_name"),
        "n_customers",
        "total_acctbal",
    )
    children = op25_child_expansion(spark, sf_dir).select(
        F.lit("children").alias("part"),
        "r_name",
        "n_name",
        F.lit(None).cast("bigint").alias("n_customers"),
        F.lit(None).cast("double").alias("total_acctbal"),
    )
    return enrich.unionByName(children)


@spec(
    QUERIES,
    "op26_first_match_lookup",
    sql="""
        SELECT o_orderkey, o_totalprice, l_partkey, l_linenumber
        FROM orders
        LEFT JOIN (
            SELECT l_orderkey, l_partkey, l_linenumber
            FROM (
                SELECT l_orderkey, l_partkey, l_linenumber,
                       row_number() OVER (PARTITION BY l_orderkey
                                          ORDER BY l_linenumber, l_partkey) AS rn
                FROM lineitem
            ) WHERE rn = 1
        ) fl ON o_orderkey = fl.l_orderkey
    """,
    doc="OP-26 first-match priority lookup (reference SNOMED→ICD-10 map "
    "row 0 wins, src/coding_task_5.py:71-94; left join preserves the "
    "no-mapping (NULL) path :85-87). Mapping side deduped to 1 row/key "
    "BEFORE the join so fact rows cannot fan out.",
)
def op26_first_match_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    mapping = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_partkey", "l_linenumber"
    )
    return R.lookup_first_match(
        o,
        mapping,
        key="o_orderkey",
        priority=[F.col("l_linenumber").asc(), F.col("l_partkey").asc()],
        broadcast_mapping=False,  # mapping derives from the fact-sized table
    ).select("o_orderkey", "o_totalprice", "l_partkey", "l_linenumber")


@spec(
    QUERIES,
    "op29_care_gap_anti_join",
    sql="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-06-01 00:00:00')
    """,
    doc="OP-29 care-gap anti-join with temporal predicate — the flagship "
    "analytics query (reference insights.md:221-225: condition present, NO "
    "recent observation). Recency filter applied BEFORE the anti-join so "
    "the build side stays small.",
)
def op29_care_gap_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    has_any = R.semi_join(
        c, o.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey"
    )
    recent = (
        o.filter(F.col("o_orderdate") >= F.lit("1998-06-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return R.anti_join(has_any, recent, on="c_custkey").select("c_custkey", "c_name")


@spec(
    QUERIES,
    "asof_click_before_purchase",
    sql="""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT event_id, user_id, epoch_us(ts) AS t
              FROM events WHERE event_type = 'click'),
        m AS (
            SELECT p.event_id, p.user_id, p.t AS purchase_ts_us,
                   c.event_id AS click_event_id, c.t AS click_ts_us,
                   row_number() OVER (PARTITION BY p.event_id
                                      ORDER BY c.t DESC, c.event_id DESC) AS rn
            FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.t <= p.t
        )
        SELECT event_id, user_id, purchase_ts_us, click_event_id, click_ts_us
        FROM m WHERE rn = 1
    """,
    doc="Backward AS-OF join (point-in-time lookup): each purchase event "
    "is paired with the same user's most recent click at or before it — "
    "the attribution / feature-backfill primitive. Implemented as the "
    "union-trick single-shuffle plan (operators.temporal.asof_join), NOT "
    "an inequality join: the oracle's LEFT JOIN + argmax formulation is "
    "O(clicks x purchases) per user and exists only as the small-scale "
    "truth. Comparisons are in epoch MICROSECONDS on both sides so the "
    "oracle's nanosecond parquet values cannot flip a <= at the boundary.",
    tags=("temporal",),
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_join

    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    c = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = asof_join(p, c, on="user_id", left_ts="ts", right_ts="ts",
                    payload_cols=["event_id"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("purchase_ts_us"),
        F.col("right_event_id").alias("click_event_id"),
        F.col("right_ts_us").alias("click_ts_us"),
    )


@spec(
    QUERIES,
    "range_clicks_before_error",
    sql="""
        WITH er AS (SELECT event_id, user_id, epoch_us(ts) AS t
                    FROM events WHERE event_type = 'error'),
        cl AS (SELECT user_id, epoch_us(ts) AS t
               FROM events WHERE event_type = 'click')
        SELECT er.event_id, er.user_id, er.t AS error_ts_us,
               CAST(count(cl.t) AS BIGINT) AS n_clicks
        FROM er LEFT JOIN cl ON cl.user_id = er.user_id
             AND er.t - cl.t >= 0 AND er.t - cl.t < 600000000
        GROUP BY er.event_id, er.user_id, er.t
    """,
    doc="Bounded range join: how many clicks did each user make in the "
    "10 minutes up to each error event (zero-click errors kept). The "
    "scale plan is the BINNED equi-join (operators.temporal."
    "range_join_binned): right side buckets once at the window width, "
    "left side emits exactly two candidate buckets, exact inequality "
    "filters locally — candidate volume 2x|left|, never |left|x|right| "
    "per key like the oracle's BETWEEN theta-join.",
    tags=("temporal",),
)
def range_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import range_join_binned

    e = load(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clk = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    pairs = range_join_binned(
        err, clk, on="user_id", left_ts="ts", right_ts="ts",
        lower_s=-600, upper_s=0,
    )
    counts = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clicks")
    )
    return (
        err.select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("error_ts_us"),
        )
        .join(counts, on="event_id", how="left")
        .select(
            "event_id",
            "user_id",
            "error_ts_us",
            F.coalesce(F.col("n_clicks"), F.lit(0).cast("bigint")).alias("n_clicks"),
        )
    )


@spec(
    QUERIES,
    "interval_overlap_shipments",
    sql="""
        WITH li AS (
            SELECT l_suppkey, l_orderkey, l_linenumber,
                   epoch_us(l_shipdate) AS s,
                   epoch_us(l_shipdate
                            + CAST(l_quantity AS INTEGER) * INTERVAL 1 DAY) AS e
            FROM lineitem
            WHERE l_shipdate IS NOT NULL AND l_suppkey IS NOT NULL
        )
        SELECT a.l_suppkey,
               CAST(count(*) AS BIGINT) AS n_overlapping,
               CAST(max(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
                   AS max_overlap_us
        FROM li a JOIN li b
          ON a.l_suppkey = b.l_suppkey
         AND a.s <= b.e AND b.s <= a.e
         AND (a.l_orderkey, a.l_linenumber) < (b.l_orderkey, b.l_linenumber)
        GROUP BY a.l_suppkey
    """,
    doc="Interval × interval overlap statistics (operators.temporal."
    "interval_overlap_stats) — the clinical concurrency primitive "
    "(overlapping encounters / medication windows, reference care-"
    "quality domain): per supplier, count pairs of shipments whose "
    "handling windows [l_shipdate, l_shipdate + l_quantity days] "
    "overlap, plus the longest overlap. Round 14: computed by the "
    "O(n log n) sweep-line aggregate (one window exchange, groupBy "
    "reuses its partitioning) instead of enumerating candidate pairs "
    "through the bucketed self-join — the join's Σ|bucket|² candidate "
    "volume (~10⁸ rows at sf0.1, 5.2 s measured) is never built. "
    "Pair-set equivalence (each unordered overlapping pair counted "
    "once; max over the same pair set) is derived in the operator "
    "docstring, pinned against the enumeration in tests/"
    "test_temporal.py, and graded against the oracle's theta "
    "self-join. interval_overlap_join remains the pair-ENUMERATION "
    "operator for callers that need the pairs themselves.",
    tags=("temporal",),
)
def interval_overlap_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import interval_overlap_stats

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").alias("w_start"),
        F.timestamp_add(
            "DAY", F.col("l_quantity").cast("int"), F.col("l_shipdate")
        ).alias("w_end"),
    )
    # id_cols: the oracle dedupes mirror pairs by strict tuple order on
    # (orderkey, linenumber) — which also excludes pairs of rows SHARING
    # that tuple (the synthetic data contains ~175 duplicate-id groups);
    # the sweep reproduces exactly that semantics
    return interval_overlap_stats(
        li, on="l_suppkey", start="w_start", end="w_end",
        id_cols=["l_orderkey", "l_linenumber"],
    )
