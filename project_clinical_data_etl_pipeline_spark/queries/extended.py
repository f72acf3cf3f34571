"""Remaining SURVEY.md §2 operators as driver-checkable queries:
construction/split (OP-16/27), nested upsert (OP-17), quality flags
(OP-42), the Arrow-vectorized UDF surface (OP-44), source/sink
round-trips (OP-03/04/07/08/28), JSON extraction (OP-37), the §4.3.1
transitive-closure materialization, the TPC-H-style headline queries
Q4/Q5/Q6, the TPC-H extension suite (Q7/Q10/Q14/Q19 analogs), and the
supplier/part rollup suite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import hierarchy as H
from ..operators import relational as R
from ..tables import load
from .base import QuerySpec, spec
from .tpch_ext import EXTRA_LEGS as TPCH_EXTRA_LEGS

QUERIES: dict[str, QuerySpec] = {}


@spec(
    QUERIES,
    "op16_27_construct_split",
    sql="""
        SELECT o_orderkey,
               to_json(struct_pack(
                   clinicalStatus := struct_pack(coding := [struct_pack(
                       system := 'http://terminology.hl7.org/CodeSystem/condition-clinical',
                       code := o_orderpriority)]),
                   subject := struct_pack(
                       reference := 'Customer/' || CAST(o_custkey AS VARCHAR)),
                   onsetDateTime := strftime(o_orderdate, '%Y-%m-%d')))
                 AS resource_json,
               'Customer/' || CAST(o_custkey AS VARCHAR) AS subject_reference,
               split_part('Customer/' || CAST(o_custkey AS VARCHAR), '/', 1) AS ref_type,
               CAST(split_part('Customer/' || CAST(o_custkey AS VARCHAR), '/', 2) AS BIGINT) AS ref_id
        FROM orders
    """,
    doc="OP-16 literal struct/row construction (reference Condition builder "
    "src/coding_task_1.py:238-319: nested clinicalStatus/category/subject "
    "literals parameterized by joined columns; emitted as canonical JSON "
    "so the oracle compares the full nested value) + OP-27 discriminated-"
    "reference construction and inverse split (subject.reference="
    "'Patient/{id}', :316-318; split for joining, SURVEY §1.3). One "
    "map-only projection over orders.",
)
def op16_27_construct_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    resource = F.struct(
        F.struct(
            F.array(
                F.struct(
                    F.lit(
                        "http://terminology.hl7.org/CodeSystem/condition-clinical"
                    ).alias("system"),
                    F.col("o_orderpriority").alias("code"),
                )
            ).alias("coding")
        ).alias("clinicalStatus"),
        F.struct(
            F.concat(F.lit("Customer/"), F.col("o_custkey").cast("string")).alias(
                "reference"
            )
        ).alias("subject"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("onsetDateTime"),
    )
    ref = F.concat(F.lit("Customer/"), F.col("o_custkey").cast("string"))
    t, i = R.fk_split(ref)
    return o.select(
        "o_orderkey",
        F.to_json(resource).alias("resource_json"),
        ref.alias("subject_reference"),
        t.alias("ref_type"),
        i.cast("bigint").alias("ref_id"),
    )


def op25_child_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-25 child-concept lookup — 1-hop DOWN the hierarchy (reference
    ECL <!code, src/coding_task_2.py:115-153), the reversed-edge variant
    of OP-24. Edge table broadcast; roots filtered first. Graded as the
    'children' leg of op24_25_concept_suite (queries/joins.py)."""
    roots = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .select(F.col("r_regionkey").alias("parent_id"), "r_name")
    )
    edges = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("child_id"),
        F.col("n_regionkey").alias("parent_id"),
        "n_name",
    )
    return H.children_of(edges, roots, code_col="parent_id").select("r_name", "n_name")


@spec(
    QUERIES,
    "op17_nested_field_upsert",
    sql="""
        SELECT c_custkey,
               n_name AS city,
               CASE WHEN c_mktsegment IS NULL OR trim(c_mktsegment) = ''
                    THEN 'Not found' ELSE c_mktsegment END AS district,
               'http://example.org/StructureDefinition/patient' AS profile0
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    doc="OP-17 nested field upsert via withField (reference meta.profile "
    "attach + conditional clinicalStatus ensure + category overwrite, "
    "src/coding_task_1.py:351-354,404-430). Struct is built, mutated with "
    "withField, then flattened for the oracle.",
)
def op17_nested_field_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey",
        F.struct(
            F.col("n_name").alias("city"),
            F.col("c_mktsegment").alias("district"),
        ).alias("address"),
        F.struct(F.array().cast("array<string>").alias("profile")).alias("meta"),
    )
    district = F.col("address.district")
    upserted = base.withColumn(
        "address",
        F.col("address").withField(
            "district",
            F.when(
                district.isNull() | (F.trim(district) == ""), F.lit("Not found")
            ).otherwise(district),
        ),
    ).withColumn(
        "meta",
        F.col("meta").withField(
            "profile",
            F.array(F.lit("http://example.org/StructureDefinition/patient")),
        ),
    )
    return upserted.select(
        "c_custkey",
        F.col("address.city").alias("city"),
        F.col("address.district").alias("district"),
        F.element_at(F.col("meta.profile"), 1).alias("profile0"),
    )


#: OP-42 oracle fragment — reused by the conformance suite's 'flags' leg.
OP42_SQL = """
    SELECT CAST(c_custkey AS VARCHAR) AS entity_id,
           'customer_without_orders' AS flag
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT CAST(o_orderkey AS VARCHAR), 'order_without_lineitems'
    FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
"""


def op42_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-42 data-quality flag table (reference roadmap 'flagging missing
    vitals for patients with certain diagnoses', insights.md:171) — the
    OP-29 anti-join pattern materialized as a findings table across two
    entity types via unionByName. Graded as the 'flags' leg of
    op45_46_conformance_suite."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    no_orders = c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_anti"
    ).select(
        F.col("c_custkey").cast("string").alias("entity_id"),
        F.lit("customer_without_orders").alias("flag"),
    )
    no_items = o.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")), on="o_orderkey", how="left_anti"
    ).select(
        F.col("o_orderkey").cast("string").alias("entity_id"),
        F.lit("order_without_lineitems").alias("flag"),
    )
    return no_orders.unionByName(no_items)


@spec(
    QUERIES,
    "op44_vectorized_udf",
    sql="""
        SELECT c_custkey,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM customer
    """,
    doc="OP-44 UDF surface (reference: arbitrary Python over rows — SURVEY "
    "§2.8). Residual custom logic runs as an Arrow-batched pandas_udf "
    "(vectorized, ~10-100x row-at-a-time Python); semantics chosen "
    "integer-exact so the oracle matches bit-for-bit. The kernel is "
    "self-contained (numpy only) → cloudpickled by value.",
)
def op44_vectorized_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.udfs import to_cents_udf

    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", to_cents_udf()("c_acctbal").alias("acctbal_cents"))


def op03_04_07_08_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink round-trip: OP-07 JSON file write + OP-03 JSON
    document read (reference json.dump exports src/coding_task_1.py:382-386,
    json.load reads :21-23) as a real write→read through a temp dir with
    an explicit schema on re-read (schema-on-read, PERMISSIVE); OP-08
    scalar text write + OP-04 scalar text read + OP-28 cross-task key
    handoff (primary_patient_id.txt, :451-452 → src/coding_task_3.py:42-52)
    as a coalesce(1).write.text checkpoint re-read, trimmed, and
    broadcast-joined onto the JSON rows. Graded as the 'roundtrip' leg
    of op03_37_serde_suite. The scratch dir is removed at process exit
    (the returned frame reads it lazily — see scratch.scratch_dir)."""
    from ..scratch import scratch_dir

    tmp = scratch_dir("etl_serde_")
    json_out = os.path.join(tmp, "customers")
    txt_out = os.path.join(tmp, "handoff")

    subset = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    subset.write.mode("overwrite").json(json_out)
    o = load(spark, sf_dir, "orders")
    o.agg(F.max("o_orderkey").cast("string").alias("value")).coalesce(
        1
    ).write.mode("overwrite").text(txt_out)

    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    reread = spark.read.schema(schema).json(json_out).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    handoff = spark.read.text(txt_out).select(
        F.trim(F.col("value")).alias("handoff")
    )
    return reread.crossJoin(F.broadcast(handoff))


def op37_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-37 JSON deserialize (reference json.load throughout, e.g.
    src/coding_task_1.py:21-23): from_json with an explicit schema over
    the open-content props column, then filter+aggregate on the parsed
    field — schema-on-read for semi-structured payloads. Graded as the
    'json' leg of op03_37_serde_suite."""
    e = load(spark, sf_dir, "events")
    parsed = e.withColumn(
        "__p", F.from_json(F.col("props"), "k bigint")
    ).withColumn("k", F.col("__p.k"))
    return (
        parsed.filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("total_k"),
        )
    )


_SERDE_SUITE_SQL = """
    SELECT 'roundtrip' AS part, c_custkey, c_name, c_acctbal, handoff,
           CAST(NULL AS VARCHAR) AS event_type,
           CAST(NULL AS BIGINT) AS n,
           CAST(NULL AS BIGINT) AS total_k
    FROM (
        SELECT c_custkey, c_name, c_acctbal,
               (SELECT CAST(max(o_orderkey) AS VARCHAR) FROM orders) AS handoff
        FROM customer WHERE c_custkey <= 100
    )
    UNION ALL
    SELECT 'json' AS part, CAST(NULL AS BIGINT) AS c_custkey,
           CAST(NULL AS VARCHAR) AS c_name,
           CAST(NULL AS DOUBLE) AS c_acctbal,
           CAST(NULL AS VARCHAR) AS handoff,
           event_type, n, total_k
    FROM (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS total_k
        FROM events
        WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
        GROUP BY event_type
    )
"""


@spec(
    QUERIES,
    "op03_37_serde_suite",
    sql=_SERDE_SUITE_SQL,
    doc="Serde suite: the OP-03/04/07/08/28 source/sink round-trip leg "
    "(real JSON + text file write→read through a temp dir, schema-on-"
    "read, cross-task key handoff) unioned with the OP-37 JSON "
    "deserialize leg (from_json over the open-content props column, "
    "filter+aggregate on the parsed field). Two independent legs; "
    "zero-shuffle concat.",
)
def op03_37_serde_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    roundtrip = op03_04_07_08_roundtrip(spark, sf_dir).select(
        F.lit("roundtrip").alias("part"),
        "c_custkey",
        "c_name",
        "c_acctbal",
        "handoff",
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("bigint").alias("total_k"),
    )
    json_leg = op37_json_extract(spark, sf_dir).select(
        F.lit("json").alias("part"),
        F.lit(None).cast("bigint").alias("c_custkey"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("handoff"),
        "event_type",
        "n",
        "total_k",
    )
    return roundtrip.unionByName(json_leg)


def hierarchy_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §4.3.1 SNOMED-style transitive closure (generalized ECL <<
    over the one-hop edges of src/coding_task_1.py:158): path-doubling
    iterative self-join to fixpoint (⌈log2 depth⌉ shuffles, not depth),
    checked against DuckDB's recursive CTE on a ~11-level synthetic
    binary-tree hierarchy derived from customer keys. Graded as the
    'closure' leg of hierarchy_graph_suite; standalone for bench.py's
    timing series (same label as rounds 5-8)."""
    c = load(spark, sf_dir, "customer")
    edges = c.filter(F.col("c_custkey") >= 2).select(
        F.col("c_custkey").alias("child_id"),
        (F.col("c_custkey") / 2).cast("bigint").alias("parent_id"),
    )
    closure = H.transitive_closure(edges)
    return closure.select(
        "descendant_id", "ancestor_id", F.col("min_depth").cast("int").alias("min_depth")
    )


_PR_ITERS, _PR_DAMPING_PCT = 5, 85
_PR_ONE = 10 ** 12  # operators.hierarchy.PAGERANK_SCALE_DP


def _pagerank_sql() -> str:
    """DuckDB twin of operators.hierarchy.pagerank on the consecutive-
    lineitem part graph: the same 5 rounds of FIXED-POINT INTEGER
    contribution sums (BIGINT ranks in 1e-12 units, integer DIV
    everywhere — no FP op exists in the iteration, so no rounding-mode
    divergence is possible), generated as a CTE chain (the
    Lloyd-training oracle pattern)."""
    d = _PR_DAMPING_PCT
    base = f"(({100 - d} * {_PR_ONE}) // (100 * (SELECT n FROM nn)))"
    legs = []
    for i in range(1, _PR_ITERS + 1):
        legs.append(f"""
    r{i} AS (
        SELECT n2.node,
               CAST({base} + ({d} * COALESCE(s.acc, 0)) // 100
                    AS BIGINT) AS r_int
        FROM nodes n2 LEFT JOIN (
            SELECT e.dst, SUM(p.r_int // d2.outdeg) AS acc
            FROM edges e
            JOIN r{i - 1} p ON e.src = p.node
            JOIN deg d2 ON e.src = d2.src
            GROUP BY e.dst) s ON n2.node = s.dst
    )""")
    return f"""
    WITH edges AS (
        SELECT DISTINCT l.l_partkey AS src, r.l_partkey AS dst
        FROM lineitem l JOIN lineitem r
          ON l.l_orderkey = r.l_orderkey
         AND r.l_linenumber = l.l_linenumber + 1
    ),
    nodes AS (SELECT src AS node FROM edges
              UNION SELECT dst AS node FROM edges),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, CAST({_PR_ONE} // (SELECT n FROM nn) AS BIGINT)
                            AS r_int
           FROM nodes),
    {",".join(legs)}
    SELECT node, CAST(r_int AS DOUBLE) / {float(_PR_ONE)!r} AS rank
    FROM r{_PR_ITERS}
"""


def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone pagerank leg (bench.py timing series): fixed-point
    integer PageRank over the consecutive-lineitem part graph. Graded
    as the 'pagerank' leg of hierarchy_graph_suite."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    l, r = li.alias("l"), li.alias("r")
    edges = l.join(
        r,
        (F.col("l.l_orderkey") == F.col("r.l_orderkey"))
        & (F.col("r.l_linenumber") == F.col("l.l_linenumber") + 1),
    ).select(
        F.col("l.l_partkey").alias("src"), F.col("r.l_partkey").alias("dst")
    )
    return H.pagerank(edges, iterations=_PR_ITERS, damping_pct=_PR_DAMPING_PCT)


@spec(
    QUERIES,
    "hierarchy_graph_suite",
    sql=f"""
        WITH RECURSIVE e AS (
            SELECT c_custkey AS child_id, c_custkey // 2 AS parent_id
            FROM customer WHERE c_custkey >= 2
        ),
        cl AS (
            SELECT child_id AS descendant_id, parent_id AS ancestor_id, 1 AS min_depth
            FROM e
            UNION ALL
            SELECT cl.descendant_id, e.parent_id, cl.min_depth + 1
            FROM cl JOIN e ON cl.ancestor_id = e.child_id
        )
        SELECT 'closure' AS part, descendant_id AS node_a, ancestor_id AS node_b,
               CAST(min(min_depth) AS INT) AS depth, CAST(NULL AS DOUBLE) AS score
        FROM cl GROUP BY 1, 2, 3
        UNION ALL
        SELECT 'pagerank' AS part, node AS node_a, CAST(NULL AS BIGINT) AS node_b,
               CAST(NULL AS INT) AS depth, rank AS score
        FROM ({_pagerank_sql()})
    """,
    doc="Graph-algorithm suite. 'closure' leg: the §4.3.1 SNOMED-style "
    "transitive closure (path-doubling to fixpoint, ⌈log2 depth⌉ "
    "shuffles) vs DuckDB's recursive CTE. 'pagerank' leg (round 9): "
    "5-iteration damped PageRank (operators.hierarchy.pagerank) over "
    "the consecutive-lineitem part graph — FIXED-POINT INTEGER "
    "arithmetic (BIGINT ranks in 1e-12 units, integer DIV by "
    "out-degree, exact BIGINT sums, integer damping blend): no FP op "
    "exists in the iteration, so the chain is bit-reproducible against "
    "the oracle's generated 5-CTE replay by construction, with no "
    "round-boundary class at all.",
)
def hierarchy_graph_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    closure = hierarchy_transitive_closure(spark, sf_dir).select(
        F.lit("closure").alias("part"),
        F.col("descendant_id").alias("node_a"),
        F.col("ancestor_id").alias("node_b"),
        F.col("min_depth").alias("depth"),
        F.lit(None).cast("double").alias("score"),
    )
    ranks = pagerank_parts(spark, sf_dir)
    pr = ranks.select(
        F.lit("pagerank").alias("part"),
        F.col("node").alias("node_a"),
        F.lit(None).cast("bigint").alias("node_b"),
        F.lit(None).cast("int").alias("depth"),
        F.col("rank").alias("score"),
    )
    return closure.unionByName(pr)


@spec(
    QUERIES,
    "q6_forecast_revenue",
    sql="""
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24.0
    """,
    doc="TPC-H Q6-style forecast revenue: pure scan+filter+agg — the "
    "raw-scan-throughput probe. All three predicates reach PushedFilters; "
    "one map-side partial sum, no join, no wide shuffle.",
    tags=("bench",),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            # round to scale 2 pre-cast: q1's 2^53-unscaled DuckDB cast
            # hazard (SCALE.md) — one global sum, crosses at ~sf700
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(4,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check: EXISTS correlated subquery
    as a left-semi join (orders side filtered first, lineitem side
    pruned to the two join columns), then group-count. Graded as the
    'q4' leg of tpch_extension_suite."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        on=(o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        how="left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count")
    )


@spec(
    QUERIES,
    "dim_rollup_suite",
    sql="""
        SELECT 'nation:' || n_name AS group_key,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS metric
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        UNION ALL
        SELECT group_key, n, metric FROM (
            SELECT 'brand:' || p_brand AS group_key,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*) AS metric
            FROM part GROUP BY p_brand
            ORDER BY n DESC, group_key ASC
            LIMIT 10
        )
        UNION ALL
        SELECT 'roll:' || coalesce(r_name, 'ALL') || '/'
                       || coalesce(n_name, 'ALL') AS group_key,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS metric
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        UNION ALL
        SELECT 'cube:' || coalesce(c_mktsegment, 'ALL') || '/'
                       || coalesce(o_orderpriority, 'ALL') AS group_key,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS metric
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY CUBE(c_mktsegment, o_orderpriority)
    """,
    doc="Dimension-rollup suite (OP-24/39 shapes beyond the graded "
    "op24/op39 queries): supplier-side broadcast-nation enrichment with "
    "decimal-exact balance sums, unioned with the part-catalog brand "
    "rollup (decimal-exact average + deterministic top-10, "
    "TakeOrderedAndProject), plus (round 9) native GROUPING SETS "
    "coverage: GROUP BY ROLLUP(region, nation) over supplier balances "
    "and GROUP BY CUBE(mktsegment, orderpriority) over order totals — "
    "Spark's Expand-based multi-level aggregate (one scan, one shuffle "
    "for every grouping set) graded against DuckDB's ROLLUP/CUBE. "
    "Dimension values never collide with the 'ALL' sentinel.",
)
def dim_rollup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalars import decimal_sum

    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    supplier_side = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            decimal_sum("s_acctbal").alias("metric"),
        )
        .select(
            F.concat(F.lit("nation:"), F.col("n_name")).alias("group_key"),
            "n",
            "metric",
        )
    )
    p = load(spark, sf_dir, "part")
    part_side = (
        p.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("metric"),
        )
        .select(
            F.concat(F.lit("brand:"), F.col("p_brand")).alias("group_key"),
            "n",
            "metric",
        )
        .orderBy(F.col("n").desc(), F.col("group_key").asc())
        .limit(10)
    )
    r = load(spark, sf_dir, "region")
    roll_side = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            decimal_sum("s_acctbal").alias("metric"),
        )
        .select(
            F.concat(
                F.lit("roll:"),
                F.coalesce(F.col("r_name"), F.lit("ALL")),
                F.lit("/"),
                F.coalesce(F.col("n_name"), F.lit("ALL")),
            ).alias("group_key"),
            "n",
            "metric",
        )
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cube_side = (
        o.join(c, o.o_custkey == c.c_custkey)
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            decimal_sum("o_totalprice").alias("metric"),
        )
        .select(
            F.concat(
                F.lit("cube:"),
                F.coalesce(F.col("c_mktsegment"), F.lit("ALL")),
                F.lit("/"),
                F.coalesce(F.col("o_orderpriority"), F.lit("ALL")),
            ).alias("group_key"),
            "n",
            "metric",
        )
    )
    return (
        supplier_side.unionByName(part_side)
        .unionByName(roll_side)
        .unionByName(cube_side)
    )


@spec(
    QUERIES,
    "q5_regional_revenue",
    sql="""
        SELECT n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
                   AS revenue
        FROM lineitem, orders, customer, nation, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
    doc="TPC-H Q5-style regional revenue: selective dim chain "
    "(region→nation broadcast) into the fact join, decimal-exact revenue. "
    "At scale the only fact shuffle is the orderkey join; dims broadcast.",
    tags=("bench",),
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(4,2)")
    return (
        # customer is fact-sized at 100 TB — joined normally (AQE may still
        # broadcast it at small SF); only the true dims are broadcast hints
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            # round to scale 2 pre-cast: q1's 2^53-unscaled DuckDB cast
            # hazard (SCALE.md) — this global-ish sum crosses at ~sf700
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (one - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H extension suite: Q4 + Q7/Q10/Q14/Q19 analogs over the driver's
# TPC-H-ish schema (no partsupp/commitdate/shipmode columns exist, so
# Q2/Q9/Q12 are out of reach; predicates are adapted to the synthetic
# domains). Legs normalize to (part, k, v) so heterogeneous analytics
# share one graded schema. Money sums follow the q1 rule: DECIMAL-exact
# sum, ROUND to scale 2 (money), THEN cast double — dodging DuckDB's
# decimal->double double-rounding past 2^53 unscaled (SCALE.md).
# ---------------------------------------------------------------------------

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)

_Q7_SQL = f"""
    SELECT sn.n_name || '|' || cn.n_name || '|'
               || CAST(year(l_shipdate) AS VARCHAR) AS k,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS v
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
"""

_Q10_SQL = f"""
    SELECT CAST(c_custkey AS VARCHAR) AS k,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS v
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey
    ORDER BY v DESC, c_custkey ASC
    LIMIT 20
"""

_Q14_SQL = f"""
    SELECT CAST(month(l_shipdate) AS VARCHAR) AS k,
           100.0 * COALESCE(CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                                              THEN {_REV_SQL} END), 2)
                                 AS DOUBLE), 0.0)
                 / CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS v
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
"""

_Q19_SQL = f"""
    SELECT 'total' AS k,
           COALESCE(CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE), 0.0) AS v
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""


def _rev_col() -> F.Column:
    one = F.lit(1).cast("decimal(4,2)")
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(4,2)")
    )


def _money(agg):
    return F.round(agg, 2).cast("double")


def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style bilateral shipping volume: the 6-table join
    (lineitem→orders→customer→nation ×2→supplier), nation-pair filter,
    revenue by (supp_nation, cust_nation, year). Nation broadcasts
    explicitly (25 rows); supplier/customer joins are plain equi-joins
    Catalyst/AQE sizes itself (broadcast at bench SF, shuffle at
    warehouse scale)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_money(F.sum(_rev_col())).alias("v"))
        .select(
            F.concat_ws(
                "|", "supp_nation", "cust_nation", F.col("l_year").cast("string")
            ).alias("k"),
            "v",
        )
    )


def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item revenue: top-20 customers by
    returned ('R') revenue over one order-date year. Deterministic
    top-N: ORDER BY rounded revenue DESC, custkey ASC — the 2-dp round
    happens BEFORE ordering so both engines rank identical doubles."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(_money(F.sum(_rev_col())).alias("v"))
        .orderBy(F.col("v").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(F.col("c_custkey").cast("string").alias("k"), "v")
    )


def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share per ship month: conditional
    DECIMAL sum (CASE with no ELSE — NULLs skipped identically in both
    engines) over the part join, 100·promo/total on the rounded
    doubles."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.coalesce(
        _money(F.sum(F.when(F.col("p_type") == "PROMO", _rev_col()))), F.lit(0.0)
    )
    total = _money(F.sum(_rev_col()))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.month("l_shipdate").alias("l_month"))
        .agg(((F.lit(100.0) * promo) / total).alias("v"))
        .select(F.col("l_month").cast("string").alias("k"), "v")
    )


def tpch_q19_branded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style discounted revenue under an OR-of-ANDs
    brand/size/quantity predicate — the classic join-with-disjunctive-
    filter shape (Catalyst pushes the part-only conjuncts of each
    disjunct's brand/size legs into the dim scan)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#21")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.coalesce(_money(F.sum(_rev_col())), F.lit(0.0)).alias("v"))
        .select(F.lit("total").alias("k"), "v")
    )


_EXTRA_LEG_SQL = "\n        UNION ALL\n".join(
    f"        SELECT '{name}' AS part, k, v FROM ({sql})"
    for name, _fn, sql in TPCH_EXTRA_LEGS
)


@spec(
    QUERIES,
    "tpch_extension_suite",
    sql=f"""
        SELECT 'q4' AS part, o_orderpriority AS k,
               CAST(count(*) AS DOUBLE) AS v
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        UNION ALL
        SELECT 'q7' AS part, k, v FROM ({_Q7_SQL})
        UNION ALL
        SELECT 'q10' AS part, k, v FROM ({_Q10_SQL})
        UNION ALL
        SELECT 'q14' AS part, k, v FROM ({_Q14_SQL})
        UNION ALL
        SELECT 'q19' AS part, k, v FROM ({_Q19_SQL})
        UNION ALL
{_EXTRA_LEG_SQL}
    """,
    doc="TPC-H extension suite normalized to (part, k, v): all 17 TPC-H "
    "query shapes beyond the standalone q1/q3/q5/q6 entries, so every "
    "one of the 22 dbgen queries has a graded analog. Q4 priority check "
    "(EXISTS → left-semi), Q7 bilateral volume, Q10 returned-item top-20, "
    "Q14 promo share, Q19 disjunctive brand/size/quantity revenue, plus "
    "the round-9 legs (queries/tpch_ext.py): Q2 min-cost supplier "
    "(derived partsupp + aggregate-then-join-back), Q8 market share, Q9 "
    "profit (10% retail cost model), Q11 stock-value threshold (scalar "
    "subquery), Q12 late-priority counts, Q13 order-count distribution "
    "(left join with ON-clause filter), Q15 scalar-max top supplier, Q16 "
    "distinct-supplier counts (anti-join exclusion), Q17 correlated-avg "
    "small-quantity revenue, Q18 HAVING-semi large orders, Q20 "
    "stock/demand ratio nest, Q21 semi+anti lineitem self-join, Q22 "
    "dormant high-balance customers (scalar threshold + anti-join). "
    "partsupp/commitdate/shipmode/phone don't exist in the driver "
    "schema; the analogs derive partsupp from the fact table and adapt "
    "columns as documented per leg.",
)
def tpch_extension_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    q4 = q4_priority_with_late_items(spark, sf_dir).select(
        F.lit("q4").alias("part"),
        F.col("o_orderpriority").alias("k"),
        F.col("order_count").cast("double").alias("v"),
    )
    legs = [
        (name, fn(spark, sf_dir))
        for name, fn in (
            ("q7", tpch_q7_volume),
            ("q10", tpch_q10_returns),
            ("q14", tpch_q14_promo),
            ("q19", tpch_q19_branded),
        )
    ] + [(name, fn(spark, sf_dir)) for name, fn, _sql in TPCH_EXTRA_LEGS]
    out = q4
    for name, df in legs:
        out = out.unionByName(df.select(F.lit(name).alias("part"), "k", "v"))
    return out
