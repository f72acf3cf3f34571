"""Physical-plan shape regression tests (SURVEY.md §4): the plan you'd
WANT at 100 TB, not just the one that passes. Asserts pushdown, dim
broadcasts, top-k physical operators, and — critically — that no query
except the two declared Python-kernel ops ever drops out of the JVM.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.queries import REGISTRY
from project_clinical_data_etl_pipeline_spark.tables import load

#: ops whose WHOLE POINT is a Python kernel (Arrow-batched)
PYTHON_KERNEL_OPS = {"op44_vectorized_udf", "multimodal_decode",
                     # r11: the 'hh' leg's Misra-Gries candidate
                     # summary is a declared Arrow kernel (mapInPandas
                     # — the bounded-state path; see test_plan_audit's
                     # matching exemption)
                     "corpus_top_ngrams"}
#: ops that run a stream or write side effects — explain separately
NON_PLAIN_OPS = {"op41_streaming_hourly_counts", "op03_37_serde_suite"}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_point_lookup_pushes_filter_to_scan(spark, sf_dir):
    plan = _plan(REGISTRY["op01_02_scan_lookup"].run(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "EqualTo(c_custkey,42)" in plan.replace(" ", "").replace("42L", "42") or (
        "c_custkey" in plan and "PushedFilters: []" not in plan
    )


def test_scan_prunes_columns(spark, sf_dir):
    # lineitem-based op11_13 suite must NOT read all 11 lineitem columns
    plan13 = _plan(REGISTRY["op11_13_array_suite"].run(spark, sf_dir))
    assert "l_extendedprice" not in plan13
    assert "l_shipdate" not in plan13


def test_dim_enrichment_broadcasts(spark, sf_dir):
    from project_clinical_data_etl_pipeline_spark.queries.joins import (
        op24_dim_enrichment,
    )

    plan = _plan(op24_dim_enrichment(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    for name in ("op21_first_row_deterministic", "q3_top_revenue_orders"):
        plan = _plan(REGISTRY[name].run(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, name


def test_semi_and_anti_joins_are_joins_not_subquery_loops(spark, sf_dir):
    plan = _plan(REGISTRY["op29_care_gap_anti_join"].run(spark, sf_dir))
    assert "LeftAnti" in plan and "LeftSemi" in plan


def test_no_python_in_jvm_only_queries(spark, sf_dir):
    """Every registered query except the declared Python-kernel ops must
    stay entirely JVM-side: no row-at-a-time or Arrow Python eval nodes."""
    offenders = {}
    for name, spec in REGISTRY.items():
        if name in PYTHON_KERNEL_OPS | NON_PLAIN_OPS:
            continue
        plan = _plan(spec.run(spark, sf_dir))
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                       "FlatMapGroupsInPandas"):
            if marker in plan:
                offenders[name] = marker
    assert not offenders, f"Python eval leaked into JVM-only queries: {offenders}"


def test_exact_dedup_shuffles_hash_not_text(spark, sf_dir):
    """The dedup shuffle must carry (hash, id), never the text column."""
    from project_clinical_data_etl_pipeline_spark.queries.llmdata import dedup_exact

    plan = _plan(dedup_exact(spark, sf_dir))
    ex = plan.split("Exchange")[1] if "Exchange" in plan else ""
    assert "text" not in ex.split("+- ")[0]


def test_q1_whole_stage_codegen(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].run(spark, sf_dir)
    df.collect()  # AQE: codegen markers only appear in the FINAL plan
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # '*(N)' prefixes mark WholeStageCodegen stages in the compact form;
    # both the partial and final aggregate must be inside codegen spans
    assert "*(1) HashAggregate" in plan or "*(2) HashAggregate" in plan


def test_filtered_search_prunes_partitions_after_pushdown(spark, sf_dir):
    plan = _plan(REGISTRY["op09_conjunctive_filter"].run(spark, sf_dir))
    assert "PushedFilters" in plan
    # equality + range + date-range predicates all reach the scan
    assert "o_orderstatus" in plan and "o_totalprice" in plan


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """Eval shingles and the contaminated-id set are broadcast-small by
    definition: both the semi-join (detection) and the anti-join (drop)
    must be broadcast joins — the corpus never shuffles."""
    plan = _plan(REGISTRY["corpus_decontaminate"].run(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_text_suite_is_map_only_and_prunes(spark, sf_dir):
    # per-row metrics: no shuffle anywhere, and the unreferenced
    # documents columns (source, n_chars) never reach the parquet scan
    # (NB "n_chars" alone would false-match the n_chars_calc output alias)
    plan = _plan(REGISTRY["text_metrics_suite"].run(spark, sf_dir))
    assert "Exchange" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string,lang:string>" in plan


def test_curation_cap_is_two_phase_broadcast(spark, sf_dir):
    # the over-cap key list must broadcast into both branch joins, and
    # the quota window must appear exactly once (only over-cap sources
    # pay the sort) — never a corpus-wide SortMergeJoin
    plan = _plan(REGISTRY["corpus_curation_pipeline"].run(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Window") == 1


def test_decontaminate_fuzzy_broadcasts_eval_side(spark, sf_dir):
    """Same contract as the exact guard: eval winnow fingerprints and
    the contaminated-id set broadcast; the corpus never key-shuffles
    (its only Exchange is the map-side fingerprint groupBy)."""
    from project_clinical_data_etl_pipeline_spark.operators import dedup as D
    from project_clinical_data_etl_pipeline_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    plan = _plan(D.decontaminate_fuzzy(docs, ev, "doc_id", "text"))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_asof_join_is_single_shuffle_no_join(spark, sf_dir):
    """The union-trick as-of join must contain NO join operator at all
    (the naive formulation is an O(n*m)-per-key inequality join) and
    exactly ONE exchange on the join key — the same shuffle a plain
    equi-join would pay. The final project joins nothing back."""
    plan = _plan(REGISTRY["asof_click_before_purchase"].run(spark, sf_dir))
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, join_op
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Union" in plan


def test_range_join_is_binned_equi_join_not_nested_loop(spark, sf_dir):
    """The bounded range join must execute as a shuffled EQUI-join on
    (key, bucket) — never a BroadcastNestedLoopJoin/CartesianProduct,
    which is what Spark plans for a raw BETWEEN theta-join and what
    dies at scale."""
    plan = _plan(REGISTRY["range_clicks_before_error"].run(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)
    # candidate fan-out comes from the 2-element bucket array explode
    assert "Generate explode" in plan or "explode" in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """Spark's runtime bloom-filter semi-join reduction (enabled by
    default, size-gated) must inject a might_contain() filter on the
    FACT scan when a selective dim side feeds a shuffle join — the
    engine-level mechanism that prunes fact rows BEFORE the join
    shuffle at 100 TB. The size gates are lowered here to prove the
    machinery fires on this build; at bench scale the fact side is
    below the application threshold, so production plans are unchanged
    (verified by the audit suite, which would flag plan changes).
    Results must be identical with and without the filter."""
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    prior = {k: spark.conf.get(k) for k in confs}

    def run():
        o = load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load(spark, sf_dir, "lineitem")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    baseline = {(r["o_orderstatus"], r["n"]) for r in run().collect()}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = run()
        rows = {(r["o_orderstatus"], r["n"]) for r in df.collect()}
        assert "might_contain" in _plan(df), (
            "no runtime bloom filter on the fact scan despite thresholds met"
        )
        assert rows == baseline
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)
