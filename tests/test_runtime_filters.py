"""Runtime Bloom-filter join pruning — the NATIVE Catalyst shuffle
reducer (SPARK-32268): for a join with a selective build side, the
optimizer injects `might_contain(bloom_filter_agg(build keys), probe
key)` into the probe side's scan, pruning rows BEFORE the exchange.

This is the Spark-first form of the bloom-pruned join (the engine's
own `operators.sketch` bloom is the PERSISTED/mergeable profiling
twin; the runtime filter is per-query and Catalyst-managed). The
session keeps the feature at its production defaults — enabled, with
a 10 GiB application-side scan threshold, so it fires exactly where it
pays (a 100 TB probe side) and never at bench scale where the filter
build would cost more than the pruning saves. These tests pin (a) the
feature is ON in the tuned session, (b) it actually FIRES and prunes
when the thresholds are met — the local proof of the 100 TB claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.tables import load


def _restore(spark, key, prev):
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def test_runtime_bloom_filter_enabled_in_tuned_session(spark):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )


def test_runtime_bloom_filter_fires_below_thresholds(spark, sf_dir):
    """With the size thresholds lowered to bench scale, a selective
    dim-side filter must inject `might_contain` into the fact side and
    the executed plan must carry the BloomFilter aggregate — the
    shuffle-reduction shape a 100 TB probe side gets by default."""
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # force the non-broadcast path: broadcast joins don't need (or
        # get) a runtime filter on this tiny dim side
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        li = load(spark, sf_dir, "lineitem")
        od = load(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000.0
        )
        j = li.join(od, li.l_orderkey == od.o_orderkey).select(
            "l_orderkey", "l_extendedprice", "o_totalprice"
        )
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # correctness under pruning: equals the unfiltered-join result
        for k, v in prev.items():
            _restore(spark, k, v)
        li2 = load(spark, sf_dir, "lineitem")
        od2 = load(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000.0
        )
        assert n == li2.join(od2, li2.l_orderkey == od2.o_orderkey).count()
    finally:
        for k, v in prev.items():
            _restore(spark, k, v)
