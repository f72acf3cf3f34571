#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a count() action (materializes the full plan
without driver-side collect). A warmup run of the flagship amortizes
JVM/codegen startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from project_clinical_data_etl_pipeline_spark.queries import REGISTRY  # noqa: E402
from project_clinical_data_etl_pipeline_spark.session import get_spark  # noqa: E402

#: Headline set: scan+agg, join+topk, anti-join, window trend, dedup
#: (exact + minhash), text stats, similarity topk.
#: NB round-3 composition change: `text_metrics_suite` replaced
#: `text_stats` — it absorbed fingerprint+langid+quality (4 former
#: queries in one projection) and later the full Gopher repetition/
#: format rule set plus PII redaction (20 output columns), so its entry
#: does ~4x the map work of the round-2 `text_stats` number it succeeds
#: (~1.0s vs 0.24s at sf0.1 — more METRICS, not slower metrics).
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "op24_dim_enrichment",
    "op29_care_gap_anti_join",
    "op40_weekly_trend",
    "dedup_exact",
    "dedup_minhash_pairs",
    "text_metrics_suite",
    "embed_topk_bruteforce",
    # round-5 additions (families landed in round 4 with no perf
    # telemetry): temporal joins, trained SemDeDup, iterative closure.
    # Methodology (min-of-2, warmup set) is FROZEN from r4 — the r4
    # totals remain comparable on the original 11; later r5 additions
    # keep growing the total line (see entries below), so compare
    # cross-round per-query, never by the total.
    "asof_click_before_purchase",
    "range_clicks_before_error",
    # NB round-6 composition change: embed_neardup_suite now DERIVES
    # its cell count from the corpus (k = max(16, floor(sqrt(n))) → 44
    # cells at sf0.1 vs the constant 16 it succeeds), so its r6+ number
    # does ~2.75x the assignment/training map work of the r5 entry —
    # more CELLS (the scale-true shape), not slower cells. Compare r6+
    # values among themselves.
    "embed_neardup_suite",
    "hierarchy_transitive_closure",
    # round-5 addition: interval x interval overlap join. Round-6
    # composition change: the graded query now exercises the AUTO
    # bucket-width probe (one extra max-span aggregate over both sides
    # per run, ~1.1s at sf0.1) instead of a code-pinned width — the
    # self-tuning shape; its r6+ numbers include the probe.
    "interval_overlap_shipments",
    # round-5 addition: in-engine trained logistic-regression quality
    # filter (8 GD aggregate jobs + map-side scoring; same frozen
    # methodology).
    "quality_classifier_suite",
    # round-5 addition: BM25 lexical top-k (one stats agg + map scoring).
    "bm25_search",
    # round-5 addition: char-bigram LM perplexity filter (CCNet-style).
    "corpus_perplexity",
    # round-6 additions: hybrid retrieval end-to-end (bm25 ∪ dense ∪
    # rrf) and the IVF+PQ SERVING path (persisted bucketed index →
    # probe → reconstruct → top-k; the build is cached per process, so
    # min-of-2 reports the steady-state probe cost — the number behind
    # the 24 B/candidate claim). NB at sf0.1 the probe number is
    # dominated by fixed plan-compile cost (the m·ks·w-literal decode
    # expression) + per-job overhead, not data — it is a regression
    # tracker; the IO-reduction claim is the ReadSchema/bucket-pruning
    # plan shape pinned in tests/test_quantization.py. Same frozen
    # methodology.
    "retrieval_suite",
    "ivfpq_probe",
    # round-6 addition: batched BM25 (8 query sets, ONE corpus text
    # scan) — read against bm25_search: per-query cost should sit well
    # under bm25_search's, since the text tokenization amortizes.
    "bm25_multi_search",
    # round-9 addition: the serving path at faiss-standard ks=256 —
    # 16,384 codebook scalars force the Arrow encode kernel and the
    # broadcast-joined decode (the kernel-switch invariant at
    # production parameters). Pass 1 = ks=256 Lloyd training + index
    # persist ("build"), pass 2 = steady-state probe; split ships as
    # "ivfpq256". Read against "ivfpq": probe cost should be within
    # ~2x of the toy-ks probe (same probed-slice volume, bigger
    # broadcast codebook), while build pays the 16x larger training.
    "ivfpq256_probe",
    # round-9 addition: fixed-point integer PageRank over the
    # consecutive-lineitem part graph (5 iterations × 2 shuffles, all
    # BIGINT arithmetic) — the second iterative-algorithm series next
    # to hierarchy_transitive_closure.
    "pagerank_parts",
    # round-10 addition: count-min point-frequency profile (4x256
    # counter build + 10-probe read + invariant row) — the third
    # profiling-sketch series next to the hll/qsample ladder numbers
    # in SCALE.md; shuffle bounded by sketch geometry, so the series
    # should stay near-flat as sf grows.
    "op39_cms_profile",
]

# (bm25_search is graded as the 'bm25' leg of retrieval_suite; its
# standalone timing series continues via _DIRECT below.)

#: The 10 queries benched every round since round 1 (r1 minus
#: `text_stats`, which round 3 replaced with the wider
#: `text_metrics_suite`). Their subtotal ships as "comparable10" — the
#: one cross-round-comparable aggregate; the headline total keeps
#: absorbing new entries and is not.
COMPARABLE10 = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "op24_dim_enrichment",
    "op29_care_gap_anti_join",
    "op40_weekly_trend",
    "dedup_exact",
    "dedup_minhash_pairs",
    "embed_topk_bruteforce",
]

#: Bench entries that are no longer standalone registry queries (merged
#: into suites to fit the driver's 50-slot grading window) but keep
#: their own timing series here — called directly, same label, so the
#: per-query numbers stay comparable across rounds. Maps name → module.
_DIRECT = {
    "embed_topk_bruteforce": "llmdata",
    "dedup_minhash_pairs": "llmdata",  # r5: graded inside dedup_sketch_pairs_suite
    "op24_dim_enrichment": "joins",  # r5: graded inside op24_25_concept_suite
    "op40_weekly_trend": "aggregates",  # r5: graded inside op40_window_suite
    "dedup_exact": "llmdata",  # r5: graded inside dedup_exact_jaccard_suite
    "bm25_search": "llmdata",  # r5: graded inside retrieval_suite
    "ivfpq_probe": "llmdata",  # bench-only serving path (never graded)
    "bm25_multi_search": "llmdata",  # bench-only batched variant
    "ivfpq256_probe": "llmdata",  # bench-only ks=256 serving twin
    # r9: graded inside hierarchy_graph_suite (closure ∪ pagerank);
    # this timing series stays the closure alone, same label since r5
    "hierarchy_transitive_closure": "extended",
    "pagerank_parts": "extended",  # r9: graded inside hierarchy_graph_suite
    "op39_cms_profile": "aggregates",  # r10: graded inside op39_43_agg_set_suite
}


def _runner(name):
    if name in _DIRECT:
        import importlib

        mod = importlib.import_module(
            f"project_clinical_data_etl_pipeline_spark.queries.{_DIRECT[name]}"
        )
        fn = getattr(mod, name)

        def run(spark, sf_dir):
            from project_clinical_data_etl_pipeline_spark.session import tune

            tune(spark)
            return fn(spark, sf_dir)

        return run
    return REGISTRY[name].run


def _median(xs):
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


_BASELINE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
)


def _load_baseline():
    try:
        with open(_BASELINE_FILE) as fh:
            return json.load(fh).get("queries") or None
    except Exception:
        return None  # no baseline recorded yet — the gate stays silent


def check_regressions(timings, canary_warm, baseline):
    """Per-query canary-normalized regression gate (round 13 — the r12
    verdict's #1): flag every query whose WARM-CANARY-NORMALIZED time
    (t_query / canary_warm) exceeds its recorded baseline by more
    than that query's allowed band. Normalizing by the same-run canary
    divides the box's minute-scale weather out of the comparison —
    the r12 driver bench read c10n 1.2 against a clean-box 1.004
    purely from a single-sample canary, which is exactly the ambiguity
    this check removes. The normalizer is the WARM median
    (median of the trio's post-JIT repeats — measured this round:
    cold 8.39 s vs warm {1.78, 1.37} on the same box minutes apart;
    the cold run is one sample of JVM startup + IO cache state, the
    warm repeats measure the steady-state machine the min-of-2 query
    timings actually run on). The band comes from each query's
    RECORDED run-to-run CV series (BENCH_BASELINE.json documents the
    derivation), so a flag means "moved beyond its own noise", not
    "moved". Telemetry, not a crash: the flagged names ship in the
    payload as `regress` and the run still exits 0 — the driver
    contract is one parseable JSON line, always."""
    if not canary_warm or not baseline:
        return []
    flagged = []
    for name, t in sorted(timings.items()):
        ref = baseline.get(name)
        if not ref or not ref.get("norm"):
            continue
        if t / canary_warm > ref["norm"] * (1.0 + ref.get("band", 0.6)):
            flagged.append(name)
    return flagged


def _canary(spark, sf_dir):
    """FROZEN machine-speed normalizer — round 11, NEVER EDIT.

    This box swings 1.5-2.5x run-to-run and ~30% across days (SCALE.md
    weather sections; the r9 'regression' was re-litigated with a
    manual r8-worktree control). The fix the verdict asked for: a
    frozen-plan trio, run FIRST and COLD each round, whose wall time
    ships in the payload as "canary". Cross-round comparisons read
    comparable10/canary ("c10n") — the machine term divides out.

    Frozen by construction: raw spark.read.parquet (no package helpers
    that later rounds might optimize), three fixed shapes — scan+agg,
    join+agg, sort-topk. Editing this function invalidates every prior
    round's c10n; don't."""
    t0 = time.perf_counter()
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cu = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    from pyspark.sql import functions as F

    li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity"), F.sum("l_extendedprice"),
        F.avg("l_discount"), F.count("*"),
    ).count()
    od.join(cu, od.o_custkey == cu.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(F.sum("o_totalprice"), F.count("*")).count()
    li.orderBy(F.col("l_extendedprice").desc()).limit(100).count()
    return round(time.perf_counter() - t0, 3)


def _ann_maint_split(spark, sf_dir):
    """Index-lifecycle cost telemetry (round 11): build on 90% of the
    bench corpus, append the remaining 10% (frozen parameters — the
    faiss-`add` path), compact the touched cells back to one file, and
    probe the appended index. The build/append ratio is the number the
    incremental-maintenance claim rests on: append must cost a small
    fraction of build at a 10x smaller delta (and stays O(delta) at
    any corpus size, while build grows with the corpus)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from project_clinical_data_etl_pipeline_spark.operators import (
        ann_index as AI,
    )
    from project_clinical_data_etl_pipeline_spark.tables import load

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    split = int(n * 0.9)
    path = tempfile.mkdtemp(prefix="bench_ann_maint_")
    try:
        out = {}
        t0 = time.perf_counter()
        AI.build_ivfpq_index(
            spark, e.filter(F.col("vec_id") < split), path, dim=64
        )
        out["build"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        stats = AI.append_ivfpq_index(
            spark, path, e.filter(F.col("vec_id") >= split)
        )
        out["append"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        AI.compact_index(spark, path, max_files_per_cell=1)
        out["compact"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        AI.probe_index(
            spark, path, e.filter(F.col("vec_id") < 8), k=5
        ).count()
        out["probe"] = round(time.perf_counter() - t0, 2)
        if stats.get("drift_ratio") is not None:
            out["drift"] = round(stats["drift_ratio"], 3)
        # round 12: the middle maintenance rung — split the hottest
        # cell; must cost O(hot cell), a small fraction of build
        t0 = time.perf_counter()
        hot = AI.retrain_criterion(spark, path)["hot_cell"]
        AI.split_cell(spark, path, hot, n_subcells=2)
        out["split"] = round(time.perf_counter() - t0, 2)
        # round 12: two-level (IMI) build + probe at the derived
        # per-level branch — the geometry past the flat 4096-cell cap
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.perf_counter()
        AI.build_imi_index(spark, e.filter(F.col("vec_id") < split), path, dim=64)
        out["imi_build"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        AI.append_ivfpq_index(spark, path, e.filter(F.col("vec_id") >= split))
        out["imi_append"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        AI.probe_index(
            spark, path, e.filter(F.col("vec_id") < 8), k=5, n_probe=3
        ).count()
        out["imi_probe"] = round(time.perf_counter() - t0, 2)
        return out
    finally:
        shutil.rmtree(path, ignore_errors=True)


def build_payload(timings, cv, ivfpq, sf, errors=None, ivfpq256=None,
                  layout=None, canary=None, ann_maint=None,
                  canary_runs=None, regress=None):
    """The ONE place the stdout payload shape is defined — bench.main()
    and tests/test_bench_contract.py both call this, so the size-budget
    tests can never silently validate a drifted shape.

    `comparable10` is the cross-round-comparable subtotal (the queries
    benched since round 1; the full total keeps absorbing new entries
    and is NOT comparable). If any of its ten members errored, the
    subtotal ships as None rather than a silently-smaller sum a reader
    would mistake for a speedup.
    """
    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "comparable10": (
            round(sum(timings[n] for n in COMPARABLE10), 3)
            if all(n in timings for n in COMPARABLE10)
            else None
        ),
        "cv": cv,
        # ivfpq_probe caches the persisted index per process: pass 1
        # pays index build+train, pass 2 is the steady-state probe.
        # Reporting both makes the amortization claim a number.
        "ivfpq": ivfpq,
        "sf": sf,
    }
    if canary is not None:
        # frozen-plan trio (_canary), run 1 + 3 repeats since round 13.
        # `canary` stays the COLD first run — the r11-r12 series
        # continues unbroken, and c10n keeps its historical meaning.
        # `canary_runs` = [cold, warm×3]; the warm repeats measure the
        # steady-state box (post-JIT: measured 8.39 cold vs 1.78/1.37
        # warm minutes apart), so their MEDIAN (`canary_warm`) is the
        # LOW-VARIANCE normalizer the per-query gate and the new c10nw
        # series use. Read c10nw cross-round from r13 on; c10n remains
        # for continuity with the single-sample era.
        payload["canary"] = canary
        if canary_runs is not None:
            payload["canary_runs"] = canary_runs
            if len(canary_runs) > 1:
                payload["canary_warm"] = round(_median(canary_runs[1:]), 3)
        if payload["comparable10"] is not None and canary > 0:
            payload["c10n"] = round(payload["comparable10"] / canary, 3)
        if (
            payload["comparable10"] is not None
            and payload.get("canary_warm")
        ):
            payload["c10nw"] = round(
                payload["comparable10"] / payload["canary_warm"], 3
            )
    if regress:
        # the per-query c10n-normalized gate tripped: these queries
        # moved beyond their recorded noise band vs BENCH_BASELINE.json
        payload["regress"] = regress
    if ann_maint:
        payload["ann_maint"] = ann_maint
    if ivfpq256:
        payload["ivfpq256"] = ivfpq256
    if layout:
        payload["layout"] = layout
    if errors:
        payload["errors"] = errors
    return payload


def render_line(payload, budget=1700):
    # budget: the driver records the LAST ~2000 stdout chars; 1700
    # leaves 300 chars of margin for stray runtime warnings while
    # fitting the round-9 payload additions (ivfpq256, layout) without
    # degrading cv off the recorded line.
    """Serialize within the driver's stdout budget, degrading in
    stages rather than ever printing an oversized line (front-truncated
    lines lost round 6's numbers; a crash lost round 7's). Returns
    ``(line, overflow)`` — `overflow` is a dict the caller should print
    to stderr when degradation had to drop detail, else None."""
    line = json.dumps(payload)
    if len(line) <= budget:
        return line, None
    slim = {k: v for k, v in payload.items() if k != "cv"}
    line = json.dumps(slim)
    if len(line) <= budget:
        return line, {"dropped_cv": payload.get("cv")}
    # Last resort: aggregates only; the per-query map goes to stderr.
    dropped = {"dropped_cv": payload.get("cv"),
               "dropped_queries": slim.get("queries")}
    slim = {k: v for k, v in slim.items() if k != "queries"}
    slim["queries"] = "dropped:size-budget:see-stderr"
    line = json.dumps(slim)
    if len(line) <= budget:
        return line, dropped
    # Final stage: even the error map collapses to a count. The
    # remaining payload is ~6 scalar fields; the assert makes the
    # "never print oversized" contract total rather than probabilistic.
    dropped["dropped_errors"] = slim.get("errors")
    slim["errors"] = f"dropped:{len(payload.get('errors') or {})}:see-stderr"
    line = json.dumps(slim)
    assert len(line) <= budget, (
        f"bench stdout line still {len(line)} chars after final degrade"
    )
    return line, dropped


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="bench")

    # Machine-weather canary: FIRST, before any warmup, so every round
    # pays the identical frozen cost (JVM startup included in run 1 —
    # run 1 IS the r11-r12 cold series, unchanged). Round 13 adds
    # THREE warm repeats of the same frozen trio: the cold run is one
    # sample of JVM startup + cache state (measured 8.39 s cold vs
    # 1.78/1.37 s warm minutes apart), while the warm repeats sample
    # the steady-state box the min-of-2 query timings actually run on
    # — their median is the low-variance normalizer for the per-query
    # regression gate. Telemetry — never fails the run.
    canary_runs = []
    for _ in range(4):
        try:
            # 2dp: canary_runs rides the size-budgeted stdout line
            canary_runs.append(round(_canary(spark, sf_dir), 2))
        except Exception:
            break
    canary = canary_runs[0] if canary_runs else None
    canary_warm = (
        round(_median(canary_runs[1:]), 3) if len(canary_runs) > 1 else None
    )
    canary_runs = canary_runs or None

    # Warmup at the SMALLEST scale factor: JIT-compiles the join/agg/HOF
    # interpreter paths and primes codegen + parquet footer caches so the
    # timed section measures steady-state throughput, not first-call JVM
    # compilation (which at 100 TB amortizes to zero).
    warmup_dir = "/root/testdata/sf0.001"
    for wq in ("op09_conjunctive_filter", "q1_pricing_summary",
               "q3_top_revenue_orders", "dedup_minhash_pairs",
               "embed_topk_bruteforce"):
        try:
            _runner(wq)(spark, warmup_dir).count()
        except Exception:
            try:
                _runner(wq)(spark, sf_dir).count()
            except Exception:
                pass  # a broken warmup query must not kill the run

    # Two timed passes per query, report the MIN: single-pass numbers at
    # this tiny SF are dominated by JVM/GC/AQE-scheduling jitter (observed
    # 1.5-2.5x swings on identical plans), not by data work — min-of-2 is
    # the steady-state throughput the 100 TB question actually asks
    # about. Raw per-pass timings ship in "runs" for transparency.
    # PER-QUERY failure isolation: one raising query records an "errors"
    # entry and the rest keep timing — a single bad query must never
    # again zero a round (BENCH_r07 rc=1 produced nothing).
    runs: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    errors: dict[str, str] = {}
    for _ in range(2):
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            try:
                _runner(name)(spark, sf_dir).count()
                runs[name].append(round(time.perf_counter() - t0, 4))
            except Exception as ex:
                errors[name] = type(ex).__name__
            # Session hygiene OUTSIDE the timed window (r9, measured at
            # sf4 in SCALE.md): without a per-query GC, dead py4j refs
            # pin checkpoint/broadcast blocks across the run and LATE
            # queries inherit the pressure — three sf1 entries ran
            # faster at sf4 purely from adding this. Timing semantics
            # (min-of-2, warmup) are unchanged.
            import gc

            gc.collect()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
    timings = {name: round(min(ts), 3) for name, ts in runs.items() if ts}
    # Per-query coefficient of variation over the raw passes: the
    # noise-vs-regression discriminator. This box swings 1.5-2.5x on
    # identical plans, so a cross-round delta on a query whose cv is
    # high is weather, not signal — read cv BEFORE reading deltas.
    # SPARSE on stdout (size budget, see below): entries under 0.10
    # are omitted — absent means "stable pass-to-pass". (Cutoff raised
    # from 0.05 in round 9: the ivfpq256/layout payload additions left
    # only ~10 chars of budget margin at the old cutoff; the FULL cv
    # map still ships on stderr.)
    cv_full = {
        name: round(
            (max(ts) - min(ts)) / 2 / (sum(ts) / len(ts)), 4
        ) if sum(ts) else 0.0
        for name, ts in runs.items() if ts
    }
    cv = {n: round(v, 2) for n, v in cv_full.items() if v >= 0.10}

    # Guarded build/probe split: short or failed ivfpq runs report what
    # they have instead of raising on an empty tail. The build/probe
    # labels are only meaningful when BOTH passes ran: if pass 1 raised
    # and pass 2 succeeded, runs[0] is a pass-2 time that re-paid the
    # build (the per-process cache was never populated), so report it
    # as "build" and leave "probe" None — honest by construction.
    pq_runs = runs.get("ivfpq_probe", [])
    ivfpq = {
        "build": round(pq_runs[0], 2) if pq_runs else None,
        "probe": round(min(pq_runs[1:]), 2) if len(pq_runs) > 1 else None,
    }
    pq256_runs = runs.get("ivfpq256_probe", [])
    ivfpq256 = {
        "build": round(pq256_runs[0], 2) if pq256_runs else None,
        "probe": round(min(pq256_runs[1:]), 2) if len(pq256_runs) > 1 else None,
    }

    # ANN retrieval quality per round (stderr only — stdout size
    # budget): recall@5 of each approximate method vs the brute-force
    # truth on the bench corpus. The pytest floors gate regressions;
    # this records the actual numbers so the accuracy/cost trade-off is
    # tracked, not just floored.
    recall = {}
    try:
        import importlib

        llm = importlib.import_module(
            "project_clinical_data_etl_pipeline_spark.queries.llmdata"
        )

        def topk_sets(fn_name):
            out = {}
            for r in getattr(llm, fn_name)(spark, sf_dir).collect():
                out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return out

        truth = topk_sets("embed_topk_bruteforce")
        for short, fn in (
            ("lsh", "embed_topk_lsh"),
            ("ivf", "embed_topk_ivf"),
            ("pq", "embed_topk_pq"),
            ("pq_rerank", "embed_topk_pq_rerank"),
        ):
            approx = topk_sets(fn)
            rs = [
                len(approx.get(q, set()) & t) / len(t)
                for q, t in truth.items()
            ]
            recall[short] = round(sum(rs) / len(rs), 3)
    except Exception as ex:  # recall is telemetry — never fail the bench
        recall = {"error": type(ex).__name__}

    # Physical-layout levers (plans.layout_bench): bucketed co-located
    # join vs its shuffle twin, salted vs plain skew join — measured
    # speedups on record each round, not just plan assertions.
    try:
        from project_clinical_data_etl_pipeline_spark.plans.layout_bench import (
            layout_experiments,
        )

        layout = layout_experiments(spark, sf_dir)
    except Exception as ex:  # telemetry — never fail the bench
        layout = {"error": type(ex).__name__}

    # Index-lifecycle split (round 11): build vs append vs compact vs
    # probe on the persisted IVF+PQ index — the incremental-maintenance
    # cost claim, measured each round.
    try:
        ann_maint = _ann_maint_split(spark, sf_dir)
    except Exception as ex:  # telemetry — never fail the bench
        ann_maint = {"error": type(ex).__name__}

    # Per-query regression gate vs the recorded clean-box baseline
    # (round 13): normalized by THIS run's warm canary median, banded
    # by each query's recorded CV — "moved beyond its own noise".
    regress = check_regressions(timings, canary_warm, _load_baseline())

    payload = build_payload(
        timings, cv, ivfpq, sf, errors=errors, ivfpq256=ivfpq256,
        layout=layout, canary=canary, ann_maint=ann_maint,
        canary_runs=canary_runs, regress=regress,
    )
    # The driver captures only the last ~2000 chars of stdout; a line
    # that outgrows that window arrives front-truncated and unparseable
    # (this lost round 6's numbers — BENCH_r06 "parsed": null). Budget
    # enforced here and in tests/test_bench_contract.py; raw per-pass
    # timings go to stderr, outside the stdout window.
    line, overflow = render_line(payload)
    print(json.dumps({"runs": runs, "cv": cv_full, "errors": errors,
                      "recall": recall, "layout": layout,
                      "canary": canary, "canary_runs": canary_runs,
                      "canary_warm": canary_warm,
                      "regress": regress, "ann_maint": ann_maint}),
          file=sys.stderr)
    if overflow:
        print(json.dumps(overflow), file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
