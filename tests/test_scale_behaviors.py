"""Scale-behavior proofs: partition pruning on date-partitioned
layouts, AQE presence on shuffle joins, and MinHash estimation quality
vs exact Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators import dedup as D
from project_clinical_data_etl_pipeline_spark.tables import load


def test_date_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """The 100 TB events layout: partitionBy(event_date) at write time →
    a date predicate becomes a PartitionFilter (directories skipped
    entirely, not just row groups)."""
    e = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    out = str(tmp_path / "events_by_date")
    e.write.mode("overwrite").partitionBy("event_date").parquet(out)

    back = spark.read.parquet(out)
    one_day = back.filter(F.col("event_date") == back.agg(F.max("event_date")).collect()[0][0])
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the partition predicate must be IN PartitionFilters, not DataFilters
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "event_date" in pf
    n_days = back.select("event_date").distinct().count()
    assert one_day.count() < e.count() and n_days > 1


def test_shuffle_join_runs_under_aqe_with_skew_handling_enabled(spark, sf_dir):
    """Large-large joins must execute under AdaptiveSparkPlan with skew
    handling on — the runtime guard for hot keys at scale."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    j = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "o_custkey"
    )
    # collect() executes THIS DataFrame's queryExecution (count() would
    # spawn a separate aggregate execution and leave j's plan unfinalized)
    j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in plan and "isFinalPlan=true" in plan


def _boilerplate_corpus(spark, n_copies: int):
    """n_copies identical boilerplate docs (one mega-bucket / ubiquitous
    shingles) + one near-duplicate pair of distinct docs that must
    survive any skew cap."""
    boiler = "all rights reserved terms of service apply to this page " * 3
    base = [f"tok{i}" for i in range(30)]
    a = " ".join(base)
    b = " ".join(base[:27] + ["x1", "x2", "x3"])
    rows = [(i, boiler) for i in range(n_copies)]
    rows += [(10_000, a), (10_001, b)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_bucket_cap_bounds_boilerplate_blowup(spark):
    """200 identical docs share every band bucket → uncapped LSH
    materializes all C(200,2) boilerplate pairs. max_bucket_size must
    drop the mega-buckets (bounding the O(b²) fan-out) while the
    ordinary near-dup pair, whose buckets are cold, survives."""
    df = _boilerplate_corpus(spark, 200)
    uncapped = D.minhash_lsh_pairs(df, "doc_id", "text").collect()
    assert len(uncapped) == 200 * 199 // 2 + 1  # clique + the near-dup pair

    capped = D.minhash_lsh_pairs(df, "doc_id", "text", max_bucket_size=50)
    rows = capped.collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(10_000, 10_001)]
    # the drop must be a broadcast anti-join — no extra shuffle of the
    # banded rows at scale
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_ngram_df_cap_bounds_posting_list_blowup(spark):
    """Shingles occurring in all 200 boilerplate copies exceed df_max=50
    → dropped from the inverted index, so no boilerplate pair is ever
    enumerated; the near-dup pair's rare shingles keep it alive with its
    exact jaccard (its shingles are under any cap)."""
    df = _boilerplate_corpus(spark, 200)
    uncapped = D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.05)
    assert uncapped.count() == 200 * 199 // 2 + 1

    capped = D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.05, df_max=50)
    rows = capped.collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(10_000, 10_001)]
    exact = uncapped.filter(F.col("id_a") == 10_000).collect()[0]["jaccard"]
    assert rows[0]["jaccard"] == exact  # cold shingles → cap changes nothing


@pytest.mark.parametrize("dup_frac", [1.0, 0.9, 0.0])
def test_minhash_estimate_tracks_true_jaccard(spark, dup_frac):
    """est_jaccard from the 32-hash signature must track exact shingle
    Jaccard: identical docs → 1.0; near-identical docs (90% shared
    tokens, shingle jaccard ≈ 0.8) → a candidate with a high estimate;
    disjoint docs → no candidate pair at all (no shared band).

    (At jaccard ≈ 0.3 an 8-band×4-row scheme catches only ~7% of pairs
    — by design; the S-curve threshold for this config is ≈ 0.6.)"""
    base = [f"w{i}" for i in range(40)]
    n_shared = int(40 * dup_frac)
    a = " ".join(base)
    b = " ".join(base[:n_shared] + [f"x{i}" for i in range(40 - n_shared)])
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    pairs = D.minhash_lsh_pairs(df, "doc_id", "text", num_hashes=32, bands=8).collect()
    if dup_frac == 1.0:
        assert len(pairs) == 1 and pairs[0]["est_jaccard"] == 1.0
    elif dup_frac == 0.9:
        assert len(pairs) == 1
        assert 0.4 <= pairs[0]["est_jaccard"] <= 1.0
    else:
        assert pairs == []


def test_components_converge_logarithmically_on_chains(spark):
    """Pointer jumping must make a 64-node chain (diameter 63 — the
    worst case for plain min-label propagation, which would need ~63
    rounds) converge within 7 rounds (≈ log₂ 63 + slack). A failure
    here means the label-hop step regressed and mega-cluster corpora
    would iterate for the full diameter."""
    from project_clinical_data_etl_pipeline_spark.operators import dedup as D

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    got = {r["id"]: r["comp"] for r in D.dedup_components(pairs, max_iterations=7).collect()}
    assert got == {i: 0 for i in range(64)}


def test_fan_out_size_gate(spark, sf_dir):
    """fan_out(min_bytes=...) must skip the repartition when Catalyst's
    optimized-plan size estimate is below the floor (toy inputs: the
    widened stage costs more than the serial map it saves — measured
    -0.5s on the classifier at sf0.1) and still widen above it. The
    floor only ever SKIPS work, so correctness is unaffected."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    narrow = docs.rdd.getNumPartitions()
    wide = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert narrow < wide, "fixture corpus must scan narrow for this test"

    # A floor far above any test corpus: gate holds, width unchanged.
    gated = D.fan_out(docs, min_bytes=1 << 40)
    assert gated.rdd.getNumPartitions() == narrow

    # A floor below the estimate (plan stats are >= ~file bytes; 1 byte
    # is always below): gate passes, default widening applies.
    widened = D.fan_out(docs, min_bytes=1)
    assert widened.rdd.getNumPartitions() == wide

    # Default (min_bytes=0) is the pre-gate behavior: always widen
    # narrow scans — heavy stages (explode fan-outs) rely on this.
    assert D.fan_out(docs).rdd.getNumPartitions() == wide
