"""Aggregation / window / set-op queries (SURVEY.md §2.5, §2.8) plus the
TPC-H-style headline bench queries.

All money sums go through DECIMAL casts (exact, order-independent)
then cast to DOUBLE — see functions.scalars.decimal_sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import decimal_sum
from ..operators import relational as R
from ..operators import sketch as SK
from ..tables import load
from .base import QuerySpec, spec

QUERIES: dict[str, QuerySpec] = {}


@spec(
    QUERIES,
    "q1_pricing_summary",
    sql="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
                   AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                        * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)
                   AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary — the headline scan+agg bench query. "
    "Maps OP-39 group-count onto the classic 8-aggregate shape. One scan, "
    "map-side partial agg, shuffle carries |groups|×partitions rows only. "
    "The product sums ROUND to scale 2 (money) BEFORE the double cast: a "
    "scale-6 DECIMAL sum's unscaled int128 crosses 2^53 at sf1, where "
    "DuckDB's decimal->double cast double-rounds ((double)int128 then "
    "/10^scale) while Spark's BigDecimal path rounds once — a measured "
    "1-ulp cross-engine divergence (SCALE.md). Scale-2 keeps the "
    "unscaled value exactly representable until ~sf4000.",
    tags=("bench",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec2 = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    dec_small = lambda c: F.col(c).cast("decimal(4,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(4,2)")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(dec2("l_extendedprice") * (one - dec_small("l_discount"))), 2
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(
                    dec2("l_extendedprice")
                    * (one - dec_small("l_discount"))
                    * (one + dec_small("l_tax"))
                ),
                2,
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(dec2("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(dec2("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(dec_small("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.cast("bigint").alias("count_order"),
        )
    )


@spec(
    QUERIES,
    "q3_top_revenue_orders",
    sql="""
        SELECT o_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                   AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    doc="TPC-H Q3-style shipping-priority: selective dim filter → join → "
    "agg → deterministic top-k. Customer side broadcasts after the segment "
    "filter; lineitem never shuffles pre-join at scale with AQE.",
    tags=("bench",),
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(4,2)")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (one - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_OP39_43_SQL = """
    SELECT 'pivot' AS part, o_orderstatus,
           CAST(NULL AS BIGINT) AS c_custkey,
           n_urgent, n_high, n_total,
           CAST(NULL AS DOUBLE) AS median_price,
           CAST(NULL AS DOUBLE) AS p90_price
    FROM (
        SELECT o_orderstatus,
               CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_urgent,
               CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_high,
               CAST(count(*) AS BIGINT) AS n_total
        FROM orders GROUP BY o_orderstatus
    )
    UNION ALL
    SELECT 'union' AS part, CAST(NULL AS VARCHAR) AS o_orderstatus, c_custkey,
           CAST(NULL AS BIGINT) AS n_urgent,
           CAST(NULL AS BIGINT) AS n_high,
           CAST(NULL AS BIGINT) AS n_total,
           CAST(NULL AS DOUBLE) AS median_price,
           CAST(NULL AS DOUBLE) AS p90_price
    FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
        UNION
        SELECT o_custkey AS c_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
    )
    UNION ALL
    SELECT 'pctl' AS part, o_orderstatus,
           CAST(NULL AS BIGINT) AS c_custkey,
           CAST(NULL AS BIGINT) AS n_urgent,
           CAST(NULL AS BIGINT) AS n_high,
           CAST(NULL AS BIGINT) AS n_total,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'gapfill' AS part,
           day_str AS o_orderstatus,
           CAST(NULL AS BIGINT) AS c_custkey,
           CAST(NULL AS BIGINT) AS n_urgent,
           CAST(NULL AS BIGINT) AS n_high,
           n AS n_total,
           CAST(NULL AS DOUBLE) AS median_price,
           CAST(NULL AS DOUBLE) AS p90_price
    FROM (
        WITH b AS (SELECT date_trunc('day', min(ts)) AS mn,
                          date_trunc('day', max(ts)) AS mx
                   FROM events),
        spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))
                      AS dday FROM b),
        d AS (SELECT date_trunc('day', ts) AS dday,
                     CAST(count(*) AS BIGINT) AS n
              FROM events
              WHERE event_type = 'purchase' AND value > 250.0
              GROUP BY 1)
        SELECT strftime(spine.dday, '%Y-%m-%d') AS day_str,
               CAST(COALESCE(d.n, 0) AS BIGINT) AS n
        FROM spine LEFT JOIN d ON spine.dday = d.dday
    )
    UNION ALL
    SELECT 'unpivot' AS part,
           p_brand || '/' || measure AS o_orderstatus,
           CAST(NULL AS BIGINT) AS c_custkey,
           CAST(NULL AS BIGINT) AS n_urgent,
           CAST(NULL AS BIGINT) AS n_high,
           CAST(NULL AS BIGINT) AS n_total,
           value AS median_price,
           CAST(NULL AS DOUBLE) AS p90_price
    FROM (
        WITH wide AS (
            SELECT p_brand,
                   CAST(SUM(p_size) AS DOUBLE) / count(*) AS avg_size,
                   CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*) AS avg_retail
            FROM part GROUP BY p_brand
        )
        SELECT p_brand, 'avg_size' AS measure, avg_size AS value FROM wide
        UNION ALL
        SELECT p_brand, 'avg_retail' AS measure, avg_retail AS value FROM wide
    )
"""

def _hll_col_sql(tbl: str, col: str) -> str:
    """DuckDB twin of operators.sketch.hll_core over one column: the
    sketch chain comes from the ONE shared generator
    (sketch.hll_oracle_sql — same constants as the Spark side, so the
    twins cannot drift independently); this wrapper adds the column
    label and the exact-distinct truth column."""
    return f"""
        SELECT '{tbl}.{col}' AS col_name, s_int, v_zero, est_raw,
               (SELECT CAST(count(DISTINCT {col}) AS BIGINT) FROM {tbl})
                   AS exact_distinct
        FROM ({SK.hll_oracle_sql(col, tbl)})
    """


_OP39_43_SQL += f"""
    UNION ALL
    SELECT 'hll' AS part, col_name AS o_orderstatus,
           s_int AS c_custkey, v_zero AS n_urgent,
           CAST(NULL AS BIGINT) AS n_high,
           exact_distinct AS n_total,
           est_raw AS median_price,
           CAST(NULL AS DOUBLE) AS p90_price
    FROM ({_hll_col_sql("orders", "o_orderkey")}
          UNION ALL {_hll_col_sql("lineitem", "l_orderkey")})
    UNION ALL
    SELECT 'hllm' AS part, col_name AS o_orderstatus,
           s_int AS c_custkey, v_zero AS n_urgent,
           CAST(NULL AS BIGINT) AS n_high,
           exact_distinct AS n_total,
           est_raw AS median_price,
           CAST(NULL AS DOUBLE) AS p90_price
    FROM ({_hll_col_sql("events", "event_id")})
    UNION ALL
    SELECT 'qsample' AS part, quantile AS o_orderstatus,
           CAST(NULL AS BIGINT) AS c_custkey,
           CAST(NULL AS BIGINT) AS n_urgent,
           CAST(NULL AS BIGINT) AS n_high,
           sample_n AS n_total,
           value AS median_price,
           CAST(NULL AS DOUBLE) AS p90_price
    FROM (
        WITH nn AS (SELECT count(*) AS n FROM lineitem),
        rr AS (SELECT CASE WHEN n <= 0 THEN 1000000
                           ELSE LEAST(1000000,
                                (CAST(1000000 AS BIGINT) * 50000 + n - 1) // n)
                      END AS ppm FROM nn),
        s AS (
            SELECT CAST(l_extendedprice AS DOUBLE) AS v
            FROM lineitem, rr
            WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'
                       || CAST(l_linenumber AS VARCHAR)), 1, 6))::BIGINT
                  % 1000000 < rr.ppm
        ),
        o AS (SELECT v, row_number() OVER (ORDER BY v) AS rk,
                     count(*) OVER () AS sample_n FROM s)
        SELECT 'p' || CAST(pct AS VARCHAR) AS quantile,
               CAST(sample_n AS BIGINT) AS sample_n, v AS value
        FROM o, (SELECT unnest([25, 50, 75, 95, 99]) AS pct) pp
        WHERE rk = ((sample_n - 1) * pct) // 100 + 1
    )
"""

_OP39_43_SQL += f"""
    UNION ALL
    SELECT 'cms' AS part, key AS o_orderstatus,
           est AS c_custkey, exact AS n_urgent,
           CAST(NULL AS BIGINT) AS n_high,
           CAST(NULL AS BIGINT) AS n_total,
           CAST(NULL AS DOUBLE) AS median_price,
           CAST(NULL AS DOUBLE) AS p90_price
    FROM (
        WITH ctrs AS ({SK.cms_counters_sql("l_partkey", "lineitem")}),
        probes AS (
            SELECT CAST(pk AS VARCHAR) AS key, pk
            FROM (SELECT DISTINCT l_partkey AS pk FROM lineitem
                  WHERE l_partkey IS NOT NULL)
            ORDER BY md5(CAST(pk AS VARCHAR) || '|probe'), pk LIMIT 10
        ),
        est AS ({SK.cms_estimates_sql("SELECT * FROM ctrs",
                                      "SELECT key FROM probes")}),
        ex AS (
            SELECT CAST(l.l_partkey AS VARCHAR) AS key,
                   CAST(count(*) AS BIGINT) AS exact
            FROM lineitem l JOIN probes p ON l.l_partkey = p.pk
            GROUP BY 1
        )
        SELECT 'pk:' || e.key AS key, e.est, ex.exact
        FROM est e JOIN ex USING (key)
        UNION ALL
        SELECT 'total',
               (SELECT CAST(SUM(cnt) AS BIGINT) FROM ctrs WHERE r = 0),
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem
                WHERE l_partkey IS NOT NULL)
    )
"""

_OP39_43_SQL += f"""
    UNION ALL
    SELECT 'bloom' AS part, key AS o_orderstatus,
           maybe AS c_custkey, truly AS n_urgent,
           CAST(NULL AS BIGINT) AS n_high,
           CAST(NULL AS BIGINT) AS n_total,
           CAST(NULL AS DOUBLE) AS median_price,
           CAST(NULL AS DOUBLE) AS p90_price
    FROM (
        WITH bits AS ({SK.bloom_bits_sql("o_custkey", "orders")}),
        dom AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS key
                FROM orders WHERE o_custkey IS NOT NULL),
        probes AS (
            (SELECT key FROM dom
             ORDER BY md5(key || '|bprobe'), key LIMIT 5)
            UNION ALL
            (SELECT '-' || CAST(i AS VARCHAR) AS key
             FROM (SELECT unnest([1, 2, 3, 4, 5]) AS i))
        ),
        mb AS ({SK.bloom_contains_sql("SELECT bit FROM bits",
                                      "SELECT key FROM probes")})
        SELECT 'ck:' || mb.key AS key, mb.maybe,
               CAST(CASE WHEN dom.key IS NULL THEN 0 ELSE 1 END AS BIGINT)
                   AS truly
        FROM mb LEFT JOIN dom ON mb.key = dom.key
        UNION ALL
        SELECT 'set_bits', (SELECT CAST(count(*) AS BIGINT) FROM bits),
               CAST(NULL AS BIGINT)
    )
"""


@spec(
    QUERIES,
    "op39_43_agg_set_suite",
    sql=_OP39_43_SQL,
    doc="OP-39 + OP-43 + order-statistics suite: the group-count x pivot "
    "chart (single-pass pivoted hash agg — reference hand-counted "
    "resource-type chart, src/insights.py:12-29) unioned with the "
    "union-distinct key-set op (reference implicit union of per-task "
    "outputs, insights.md:52-59) and a per-group exact-percentile leg "
    "(median/p90 — Spark percentile() interpolates bit-identically to "
    "DuckDB quantile_cont, verified unrounded). The exact percentile "
    "buffers each group's values (ObjectHashAggregate) — correct for "
    "low-cardinality/bounded groups like order status; the unbounded-"
    "group scale path is approx_percentile's mergeable GK sketch, "
    "equivalence-gated in tests/test_properties.py. Plus (round 9) the "
    "'unpivot' leg — Spark's native DataFrame.unpivot melting "
    "per-brand wide aggregates to long form, the Expand-based inverse "
    "of the pivot leg, oracle-matched via the ANSI UNION ALL "
    "formulation — and the 'gapfill' leg: time-series "
    "resample-to-calendar (sequence+explode day spine over the "
    "unfiltered range, left join, zero fill). Round 10 adds the "
    "profiling sketches: the 'hll' leg — deterministic HyperLogLog "
    "distinct-count (md5 register index, INTEGER rho via base-2 "
    "string length, exact BIGINT register sum; the estimate's only FP "
    "steps are one int64->double conversion and one division, both "
    "IEEE-specified, so a sketch grades hash-match instead of "
    "rows-only; operators/sketch.py), the 'qsample' leg: "
    "hash-sampled discrete quantiles under a volume-derived sample "
    "rate (sample size ~50k at ANY corpus size; rank selection "
    "returns actual data values, no interpolation) — and the 'cms' "
    "leg: count-min point-frequency estimation (4x256 BIGINT counter "
    "table, explode(d) + map-side partial agg so the shuffle is "
    "bounded by sketch geometry; MIN-read estimates for 10 "
    "deterministic probe keys graded against their exact counts, "
    "plus a cross-engine counter-sum invariant row; integer-only end "
    "to end, and counters SUM-merge where HLL registers max-merge). "
    "Round 11 adds the 'hllm' leg: the sketch PERSIST-AND-MERGE law — "
    "per-day register tables written as partitioned parquet "
    "(sketch.hll_write_partitioned), merged back ON READ (max per "
    "bucket over sketch rows only, no event rescan) and graded "
    "hash-identical to the oracle's whole-table sketch, because "
    "register max-merge is exact — and the 'bloom' leg: Bloom-filter "
    "set membership (k=4 bit positions sliced from ONE md5 digest mod "
    "m=8192, the filter = the ≤m-row distinct set-bit table, "
    "OR-mergeable), read for 5 deterministic present keys + 5 "
    "guaranteed-absent keys with exact membership as the truth column "
    "plus a set-bit population row; integer-only so it hash-matches — "
    "the no-false-negative guarantee graded cross-engine. Ten "
    "independent bounded-shuffle legs; zero-shuffle concat.",
)
def op39_43_agg_set_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    pctl_nulls = [
        F.lit(None).cast("double").alias("median_price"),
        F.lit(None).cast("double").alias("p90_price"),
    ]
    pivoted = op39_group_pivot_counts(spark, sf_dir).select(
        F.lit("pivot").alias("part"),
        "o_orderstatus",
        F.lit(None).cast("bigint").alias("c_custkey"),
        "n_urgent",
        "n_high",
        "n_total",
        *pctl_nulls,
    )
    unioned = op43_union_distinct(spark, sf_dir).select(
        F.lit("union").alias("part"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        "c_custkey",
        F.lit(None).cast("bigint").alias("n_urgent"),
        F.lit(None).cast("bigint").alias("n_high"),
        F.lit(None).cast("bigint").alias("n_total"),
        *pctl_nulls,
    )
    pctl = order_price_percentiles(spark, sf_dir).select(
        F.lit("pctl").alias("part"),
        "o_orderstatus",
        F.lit(None).cast("bigint").alias("c_custkey"),
        F.lit(None).cast("bigint").alias("n_urgent"),
        F.lit(None).cast("bigint").alias("n_high"),
        F.lit(None).cast("bigint").alias("n_total"),
        "median_price",
        "p90_price",
    )
    gapfill = op39_gapfill_daily(spark, sf_dir).select(
        F.lit("gapfill").alias("part"),
        F.col("day_str").alias("o_orderstatus"),
        F.lit(None).cast("bigint").alias("c_custkey"),
        F.lit(None).cast("bigint").alias("n_urgent"),
        F.lit(None).cast("bigint").alias("n_high"),
        F.col("n").alias("n_total"),
        F.lit(None).cast("double").alias("median_price"),
        F.lit(None).cast("double").alias("p90_price"),
    )
    unpivoted = op39_brand_unpivot(spark, sf_dir).select(
        F.lit("unpivot").alias("part"),
        F.concat_ws("/", "p_brand", "measure").alias("o_orderstatus"),
        F.lit(None).cast("bigint").alias("c_custkey"),
        F.lit(None).cast("bigint").alias("n_urgent"),
        F.lit(None).cast("bigint").alias("n_high"),
        F.lit(None).cast("bigint").alias("n_total"),
        F.col("value").alias("median_price"),
        F.lit(None).cast("double").alias("p90_price"),
    )
    hll = op39_hll_profile(spark, sf_dir).select(
        F.lit("hll").alias("part"),
        F.col("col_name").alias("o_orderstatus"),
        F.col("s_int").alias("c_custkey"),
        F.col("v_zero").alias("n_urgent"),
        F.lit(None).cast("bigint").alias("n_high"),
        F.col("exact_distinct").alias("n_total"),
        F.col("est_raw").alias("median_price"),
        F.lit(None).cast("double").alias("p90_price"),
    )
    qsample = op39_sampled_quantiles(spark, sf_dir).select(
        F.lit("qsample").alias("part"),
        F.col("quantile").alias("o_orderstatus"),
        F.lit(None).cast("bigint").alias("c_custkey"),
        F.lit(None).cast("bigint").alias("n_urgent"),
        F.lit(None).cast("bigint").alias("n_high"),
        F.col("sample_n").alias("n_total"),
        F.col("value").alias("median_price"),
        F.lit(None).cast("double").alias("p90_price"),
    )
    hllm = op39_hll_merged_profile(spark, sf_dir).select(
        F.lit("hllm").alias("part"),
        F.col("col_name").alias("o_orderstatus"),
        F.col("s_int").alias("c_custkey"),
        F.col("v_zero").alias("n_urgent"),
        F.lit(None).cast("bigint").alias("n_high"),
        F.col("exact_distinct").alias("n_total"),
        F.col("est_raw").alias("median_price"),
        F.lit(None).cast("double").alias("p90_price"),
    )
    bloom = op39_bloom_profile(spark, sf_dir).select(
        F.lit("bloom").alias("part"),
        F.col("key").alias("o_orderstatus"),
        F.col("maybe").alias("c_custkey"),
        F.col("truly").alias("n_urgent"),
        F.lit(None).cast("bigint").alias("n_high"),
        F.lit(None).cast("bigint").alias("n_total"),
        F.lit(None).cast("double").alias("median_price"),
        F.lit(None).cast("double").alias("p90_price"),
    )
    cms = op39_cms_profile(spark, sf_dir).select(
        F.lit("cms").alias("part"),
        F.col("key").alias("o_orderstatus"),
        F.col("est").alias("c_custkey"),
        F.col("exact").alias("n_urgent"),
        F.lit(None).cast("bigint").alias("n_high"),
        F.lit(None).cast("bigint").alias("n_total"),
        F.lit(None).cast("double").alias("median_price"),
        F.lit(None).cast("double").alias("p90_price"),
    )
    return (
        pivoted.unionByName(unioned).unionByName(pctl)
        .unionByName(gapfill).unionByName(unpivoted)
        .unionByName(hll).unionByName(hllm)
        .unionByName(qsample).unionByName(cms)
        .unionByName(bloom)
    )


def op39_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (resample-to-calendar): a generated day
    spine over the observed range (sequence + explode — the engine-side
    calendar, no driver loop) left-joined with a sparse filtered daily
    series, absent days zero-filled. The spine bounds come from the
    UNFILTERED stream so the calendar is complete even when the
    filtered series is empty. Graded as the 'gapfill' leg of
    op39_43_agg_set_suite."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 250.0))
        .groupBy(F.date_trunc("day", F.col("ts")).alias("dday"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    bounds = e.agg(
        F.date_trunc("day", F.min("ts")).alias("mn"),
        F.date_trunc("day", F.max("ts")).alias("mx"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("INTERVAL 1 DAY"))
        ).alias("dday")
    )
    return spine.join(daily, on="dday", how="left").select(
        F.date_format("dday", "yyyy-MM-dd").alias("day_str"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
    )


def op39_brand_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse of the pivot leg: per-brand wide aggregates melted
    back to long form with Spark's NATIVE ``DataFrame.unpivot`` (the
    Expand-based melt — one scan, no join; the oracle re-derives it as
    the ANSI UNION ALL formulation). Graded as the 'unpivot' leg of
    op39_43_agg_set_suite."""
    p = load(spark, sf_dir, "part")
    wide = p.groupBy("p_brand").agg(
        (F.sum("p_size").cast("double") / F.count(F.lit(1))).alias("avg_size"),
        (
            F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_retail"),
    )
    return wide.unpivot(
        ids=["p_brand"],
        values=["avg_size", "avg_retail"],
        variableColumnName="measure",
        valueColumnName="value",
    )


def op39_hll_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-HLL distinct-count profile over two key columns
    (orders.o_orderkey — a PK, so exact == row count; lineitem's
    l_orderkey — a real many-to-one dedup). One scan per column, the
    register shuffle carries <= 256 rows per map partition at ANY
    volume; COUNT(DISTINCT) here is the graded truth column, at 100 TB
    it is exactly the pass the sketch replaces. Both profiled columns
    sit in the raw-estimator regime (> 2.5*m distinct) at every graded
    SF — the linear-counting correction is driver-side only
    (operators/sketch.py module docstring). Graded as the 'hll' leg of
    op39_43_agg_set_suite."""
    out = None
    for tbl, colname in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = load(spark, sf_dir, tbl)
        core = SK.hll_core(df, F.col(colname), p=8).select(
            "s_int",
            "v_zero",
            "est_raw",
            F.lit(None).cast("bigint").alias("exact_distinct"),
        )
        exact = df.agg(
            F.lit(None).cast("bigint").alias("s_int"),
            F.lit(None).cast("bigint").alias("v_zero"),
            F.lit(None).cast("double").alias("est_raw"),
            F.countDistinct(colname).cast("bigint").alias("exact_distinct"),
        )
        # join-free 1-row + 1-row attach: union the two single-row
        # aggregates and collapse with max (a constant-tag equi join
        # here constant-folds its condition into a nested loop)
        row = core.unionByName(exact).agg(
            F.max("s_int").alias("s_int"),
            F.max("v_zero").alias("v_zero"),
            F.max("est_raw").alias("est_raw"),
            F.max("exact_distinct").alias("exact_distinct"),
        ).select(
            F.lit(f"{tbl}.{colname}").alias("col_name"),
            "s_int",
            "v_zero",
            "est_raw",
            "exact_distinct",
        )
        out = row if out is None else out.unionByName(row)
    return out


def op39_hll_merged_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch PERSIST-AND-MERGE law, graded cross-engine: per-DAY
    HLL register tables of events.event_id written as partitioned
    parquet (sketch.hll_write_partitioned — the profile-once-per-day
    operational shape), merged back ON READ (max per bucket, a ≤
    days·2^p-row scan — no event rescan), collapsed to the integer
    sketch core. Register max-merge is EXACT, so the merged sketch is
    bit-identical to sketching the whole table in one pass — which is
    what the DuckDB oracle computes; a hash-match grades the merge law
    itself. Output shape matches op39_hll_profile's rows (one labeled
    row: s_int, v_zero, est_raw + exact_distinct truth). Graded as the
    'hllm' leg of op39_43_agg_set_suite."""
    import os

    from ..scratch import scratch_dir

    e = load(spark, sf_dir, "events")
    path = os.path.join(scratch_dir("spark_graft_hllm_"), "sketch")
    SK.hll_write_partitioned(
        e, F.col("event_id"), path, F.date_format("ts", "yyyy-MM-dd"), p=8
    )
    core = SK.hll_core_from_registers(
        SK.hll_read_merged(spark, path), p=8
    ).select(
        "s_int",
        "v_zero",
        "est_raw",
        F.lit(None).cast("bigint").alias("exact_distinct"),
    )
    exact = e.agg(
        F.lit(None).cast("bigint").alias("s_int"),
        F.lit(None).cast("bigint").alias("v_zero"),
        F.lit(None).cast("double").alias("est_raw"),
        F.countDistinct("event_id").cast("bigint").alias("exact_distinct"),
    )
    return core.unionByName(exact).agg(
        F.max("s_int").alias("s_int"),
        F.max("v_zero").alias("v_zero"),
        F.max("est_raw").alias("est_raw"),
        F.max("exact_distinct").alias("exact_distinct"),
    ).select(
        F.lit("events.event_id").alias("col_name"),
        "s_int",
        "v_zero",
        "est_raw",
        "exact_distinct",
    )


def op39_bloom_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership profile of orders.o_custkey — the fourth
    profiling sketch (set membership; the others cover distinct-count,
    point frequency, quantiles). Build: the ≤m-row set-bit table in one
    scan (explode(k) + map-side partial distinct). Read: 5
    deterministically-chosen PRESENT keys (min-md5 over the distinct
    domain — no popularity bias, the cms probe pattern) + 5 keys
    guaranteed ABSENT (negative ids; custkeys are positive), each with
    the exact membership as the graded truth column — no false
    negatives is an invariant the oracle re-derives, false positives
    are legitimate and both engines compute the identical answer
    bit-for-bit. Plus a 'set_bits' row pinning the filter's population
    count cross-engine. At 100 TB this is the did-day-X-contain-key
    check that replaces a partition scan. Graded as the 'bloom' leg of
    op39_43_agg_set_suite."""
    o = load(spark, sf_dir, "orders")
    val = F.col("o_custkey")
    bits = SK.bloom_bits(o, val)
    domain = (
        o.filter(val.isNotNull())
        .select(val.cast("string").alias("key"))
        .distinct()
    )
    present = domain.orderBy(
        F.md5(F.concat(F.col("key"), F.lit("|bprobe"))).asc(),
        F.col("key").asc(),
    ).limit(5)
    absent = spark.createDataFrame(
        [(f"-{i}",) for i in range(1, 6)], "key string"
    )
    probes = present.unionByName(absent)
    maybe = SK.bloom_contains(bits, probes, "key")
    keys_row = maybe.join(
        domain.withColumn("__t", F.lit(1)), on="key", how="left"
    ).select(
        F.concat(F.lit("ck:"), F.col("key")).alias("key"),
        F.col("maybe").cast("bigint").alias("maybe"),
        F.coalesce(F.col("__t"), F.lit(0)).cast("bigint").alias("truly"),
    )
    total = bits.agg(
        F.lit("set_bits").alias("key"),
        F.count(F.lit(1)).cast("bigint").alias("maybe"),
        F.lit(None).cast("bigint").alias("truly"),
    )
    return keys_row.unionByName(total)


def op39_cms_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point-frequency profile of lineitem.l_partkey: a 4×256
    counter table (one scan, explode(4) fan-out, map-side partial agg —
    the shuffle carries ≤ d*w rows per partition at ANY volume), read
    back for 10 deterministically-chosen probe keys (min-md5 over the
    distinct key domain — no frequency information used to pick them)
    with the exact per-key count as the graded truth column, plus a
    'total' row asserting the counter invariant (each hash row's
    counters sum to the exact non-null row count) cross-engine. The
    whole chain is integer-only — counters are exact BIGINT counts and
    the estimate is a MIN — so it grades hash-match like the HLL. At
    100 TB the exact column is the per-key pass the sketch replaces;
    probes here stand in for caller-supplied keys. Graded as the 'cms'
    leg of op39_43_agg_set_suite."""
    li = load(spark, sf_dir, "lineitem")
    val = F.col("l_partkey")
    counters = SK.cms_counters(li, val)
    probes = (
        li.filter(val.isNotNull())
        .select(val.alias("pk"))
        .distinct()
        .orderBy(
            F.md5(F.concat(F.col("pk").cast("string"), F.lit("|probe"))),
            F.col("pk"),
        )
        .limit(10)
        .select("pk", F.col("pk").cast("string").alias("key"))
        # 10 rows, two consumers (estimate read + exact truth join):
        # lazy localCheckpoint so the distinct-key-domain pass and its
        # top-k merge run once, not once per consumer
        .localCheckpoint(eager=False)
    )
    ests = SK.cms_point_estimates(counters, probes.select("key"), "key")
    exact = (
        li.join(F.broadcast(probes), val == F.col("pk"), "inner")
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    )
    per_key = ests.join(F.broadcast(exact), on="key").select(
        F.concat(F.lit("pk:"), F.col("key")).alias("key"), "est", "exact"
    )
    # 'total' invariant row: row-0 counter sum vs the exact non-null
    # count — two independent derivations pinned equal by the grade.
    # union-max attach (the hll-leg trick): no 1-row constant join.
    total = counters.filter(F.col("r") == 0).agg(
        F.sum("cnt").cast("bigint").alias("est"),
        F.lit(None).cast("bigint").alias("exact"),
    )
    n_exact = li.filter(val.isNotNull()).agg(
        F.lit(None).cast("bigint").alias("est"),
        F.count(F.lit(1)).cast("bigint").alias("exact"),
    )
    total_row = (
        total.unionByName(n_exact)
        .agg(F.max("est").alias("est"), F.max("exact").alias("exact"))
        .select(F.lit("total").alias("key"), "est", "exact")
    )
    return per_key.unionByName(total_row)


def op39_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-sampled discrete quantiles of l_extendedprice: the sample
    rate derives from table volume so the sampled set (and the ranking
    window over it) stays ~50k rows at any corpus size — profiling
    cost is O(target_n), not O(data). Values are actual data points
    (rank selection, integer arithmetic, no interpolation). Graded as
    the 'qsample' leg of op39_43_agg_set_suite."""
    li = load(spark, sf_dir, "lineitem")
    return SK.sampled_quantiles(
        li,
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        pcts=(25, 50, 75, 95, 99),
        target_n=50_000,
    )


def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status exact order statistics (median/p90 of o_totalprice).
    Graded as the 'pctl' leg of op39_43_agg_set_suite. Exact
    percentile() is the oracle-able form (linear interpolation matches
    DuckDB quantile_cont bit-for-bit on this data — no rounding shield
    needed); it buffers each group's values, so it is reserved for
    bounded-cardinality groups. For unbounded groups at 100 TB use
    approx_percentile (mergeable fixed-memory GK sketch) — the
    equivalence test in tests/test_properties.py pins the two within
    the sketch's accuracy bound."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("median_price"),
        F.percentile("o_totalprice", 0.9).alias("p90_price"),
    )


def op39_group_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-39 group-count × pivot (reference hand-counted resource-type
    chart, src/insights.py:12-29). Pivot with explicit value list →
    single-pass pivoted hash agg, no second shuffle. Graded as the
    'pivot' leg of op39_43_agg_set_suite."""
    o = load(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH"])
        .agg(F.count(F.lit(1)))
    )
    totals = R.group_counts(o, "o_orderstatus").withColumnRenamed("n", "n_total")
    return (
        pivoted.join(totals, on="o_orderstatus")
        .select(
            "o_orderstatus",
            F.coalesce(F.col("1-URGENT"), F.lit(0)).cast("bigint").alias("n_urgent"),
            F.coalesce(F.col("2-HIGH"), F.lit(0)).cast("bigint").alias("n_high"),
            F.col("n_total"),
        )
    )


def op40_weekly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-40 trend-over-time aggregation (reference roadmap
    insights.md:173: 'observation trends over time'). date_trunc
    bucketing; at scale the events table is date-partitioned so the
    scan prunes to the analysis window. Graded as the 'trend' leg of
    op40_window_suite; kept standalone for bench.py's timing series."""
    e = load(spark, sf_dir, "events")
    return R.time_bucket_trend(
        e,
        ts="ts",
        bucket="week",
        group_cols=["event_type"],
        aggs=[
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            decimal_sum("value").alias("total_value"),
        ],
    ).select(
        F.date_format("week_start", "yyyy-MM-dd").alias("week_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def op40_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-40 ranking pick: latest event per user (reference roadmap
    'latest observation per patient', insights.md:173), via the
    skew-robust windowless argmax (operators.relational.argmax_per_key:
    max_by gets map-side partial combine, so a hot user never serializes
    a full-history sort into one task the way a ranking window does).
    Ties pinned by event_id — the order tuple is unique, so the answer
    equals the row_number() formulation the oracle uses. Graded as the
    'latest' leg of op40_window_suite."""
    e = load(spark, sf_dir, "events")
    picked = R.argmax_per_key(
        e.select("user_id", "event_id", "event_type", "ts"),
        keys="user_id",
        order_cols=["ts", "event_id"],
        desc=True,
    )
    return picked.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


def op40_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily event value per event_type — the
    sliding-frame window shape (ROWS BETWEEN 6 PRECEDING AND CURRENT
    ROW). The frame aggregates a DECIMAL(18,2) daily sum, so the
    sliding reduction is exact in both engines regardless of whether
    the engine recomputes or incrementally slides the frame (FP
    subtract-on-evict drift is the classic cross-engine hazard here);
    the final divide by the frame count is one IEEE op. Graded as the
    'movavg' leg of op40_window_suite."""
    from pyspark.sql import Window

    from ..functions.scalars import decimal_sum  # noqa: F401 (doc pointer)

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("dsum"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day_str"),
        (
            F.sum("dsum").over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("movavg"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("frame_n"),
    )


def op40_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history of each user's event_type over the events
    stream (operators.relational.scd2_history): consecutive same-type
    runs collapse to one versioned (valid_from, valid_to] interval,
    open interval = current version. Graded as the 'scd2' leg of
    op40_window_suite."""
    e = load(spark, sf_dir, "events")
    hist = R.scd2_history(
        e, key="user_id", attr="event_type", ts="ts",
        order_cols=["ts", "event_id"],
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return hist.select(
        "user_id",
        "event_type",
        F.concat_ws(
            "|",
            F.date_format("valid_from", fmt),
            F.coalesce(F.date_format("valid_to", fmt), F.lit("current")),
        ).alias("interval"),
        "version",
        F.col("is_current").cast("bigint").alias("is_current"),
    )


@spec(
    QUERIES,
    "op40_window_suite",
    sql="""
        SELECT 'trend' AS part,
               strftime(date_trunc('week', ts), '%Y-%m-%d') AS bucket,
               event_type,
               CAST(NULL AS BIGINT) AS user_id,
               CAST(NULL AS BIGINT) AS event_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'latest' AS part,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS bucket,
               event_type,
               user_id,
               event_id,
               CAST(NULL AS BIGINT) AS n_events,
               CAST(NULL AS DOUBLE) AS total_value
        FROM (
            SELECT user_id, event_id, event_type, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
        UNION ALL
        SELECT 'movavg' AS part, day_str AS bucket, event_type,
               CAST(NULL AS BIGINT) AS user_id,
               CAST(NULL AS BIGINT) AS event_id,
               frame_n AS n_events,
               movavg AS total_value
        FROM (
            SELECT event_type,
                   strftime(date_trunc('day', day), '%Y-%m-%d') AS day_str,
                   CAST(SUM(dsum) OVER w AS DOUBLE) / COUNT(*) OVER w
                       AS movavg,
                   CAST(COUNT(*) OVER w AS BIGINT) AS frame_n
            FROM (
                SELECT event_type, date_trunc('day', ts) AS day,
                       SUM(CAST(value AS DECIMAL(18,2))) AS dsum
                FROM events GROUP BY 1, 2
            )
            WINDOW w AS (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        )
        UNION ALL
        SELECT 'scd2' AS part,
               strftime(valid_from, '%Y-%m-%d %H:%M:%S') || '|' ||
                 coalesce(strftime(valid_to, '%Y-%m-%d %H:%M:%S'),
                          'current') AS bucket,
               event_type,
               user_id,
               CAST(version AS BIGINT) AS event_id,
               CAST(valid_to IS NULL AS BIGINT) AS n_events,
               CAST(NULL AS DOUBLE) AS total_value
        FROM (
            SELECT user_id, event_type, ts AS valid_from,
                   lead(ts) OVER w2 AS valid_to,
                   row_number() OVER w2 AS version
            FROM (
                SELECT user_id, event_type, ts, event_id,
                       lag(event_type) OVER w1 AS prev,
                       row_number() OVER w1 AS rn
                FROM events
                WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            WHERE rn = 1 OR prev IS DISTINCT FROM event_type
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
    """,
    doc="OP-40 window-function suite: the weekly time-bucket trend "
    "(date_trunc hash-agg) unioned with latest-event-per-user computed "
    "by the WINDOWLESS max_by argmax (operators.relational."
    "argmax_per_key) — the oracle re-derives the latter with a ranking "
    "window, proving argmax ≡ row_number()=1 under a unique order "
    "tuple — and (round 9) the type-2 SCD change history of each "
    "user's event_type (operators.relational.scd2_history: lag change "
    "flag → lead interval close → version number; the warehouse "
    "change-capture shape) plus the sliding-frame 'movavg' leg (7-day "
    "ROWS BETWEEN moving average over DECIMAL daily sums — exact "
    "whether the engine slides or recomputes the frame). Four "
    "independent legs, each one hash-partition of its key; the union "
    "is a zero-shuffle concat.",
    tags=("window",),
)
def op40_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    trend = op40_weekly_trend(spark, sf_dir).select(
        F.lit("trend").alias("part"),
        F.col("week_start").alias("bucket"),
        "event_type",
        F.lit(None).cast("bigint").alias("user_id"),
        F.lit(None).cast("bigint").alias("event_id"),
        "n_events",
        "total_value",
    )
    latest = op40_latest_per_user(spark, sf_dir).select(
        F.lit("latest").alias("part"),
        F.col("ts_str").alias("bucket"),
        "event_type",
        "user_id",
        "event_id",
        F.lit(None).cast("bigint").alias("n_events"),
        F.lit(None).cast("double").alias("total_value"),
    )
    movavg = op40_moving_average(spark, sf_dir).select(
        F.lit("movavg").alias("part"),
        F.col("day_str").alias("bucket"),
        "event_type",
        F.lit(None).cast("bigint").alias("user_id"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("frame_n").alias("n_events"),
        F.col("movavg").alias("total_value"),
    )
    scd2 = op40_scd2_history(spark, sf_dir).select(
        F.lit("scd2").alias("part"),
        F.col("interval").alias("bucket"),
        "event_type",
        "user_id",
        F.col("version").alias("event_id"),
        F.col("is_current").alias("n_events"),
        F.lit(None).cast("double").alias("total_value"),
    )
    return (
        trend.unionByName(latest).unionByName(movavg).unionByName(scd2)
    )


def op43_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-43 set op: union-distinct of two key sets (reference implicit
    union of per-task outputs, insights.md:52-59). Graded as the
    'union' leg of op39_43_agg_set_suite."""
    rich = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select("c_custkey")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-06-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.unionByName(recent).distinct()
