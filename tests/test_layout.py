"""Physical-layout proofs: bucketed joins run exchange-free, salted
joins return identical results while spreading the shuffle key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.plans import layout as L
from project_clinical_data_etl_pipeline_spark.tables import load


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    spark.sql("CREATE DATABASE IF NOT EXISTS lay")
    L.write_bucketed(
        load(spark, sf_dir, "orders"), "lay.orders_b", ["o_orderkey"], 8
    )
    L.write_bucketed(
        load(spark, sf_dir, "lineitem"), "lay.lineitem_b", ["l_orderkey"], 8
    )
    yield
    spark.sql("DROP TABLE IF EXISTS lay.orders_b")
    spark.sql("DROP TABLE IF EXISTS lay.lineitem_b")


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse):
    li = spark.table("lay.lineitem_b").withColumnRenamed("l_orderkey", "o_orderkey")
    li.createOrReplaceTempView("li_renamed")
    joined = spark.table("lay.orders_b").join(li, on="o_orderkey")
    joined.count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    # and the same join on raw parquet DOES exchange — the contrast
    raw = load(spark, sf_dir, "orders").join(
        load(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        on="o_orderkey",
    )
    raw_plan = raw._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in raw_plan or "BroadcastHashJoin" in raw_plan


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, on="o_custkey").groupBy("o_custkey").count()
    salted = L.salted_join(o, c, "o_custkey").groupBy("o_custkey").count()
    assert {(r[0], r[1]) for r in plain.collect()} == {
        (r[0], r[1]) for r in salted.collect()
    }


def test_salted_join_left_and_anti_match_plain(spark, sf_dir):
    """Left-outer: unmatched left rows keep NULL right columns exactly
    like the unsalted join. Anti: a left row survives iff its key is
    absent from right — replication can't duplicate (no right rows are
    emitted)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # right side missing half the keys → real unmatched-left coverage
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 2 == 0)
        .select(F.col("c_custkey").alias("o_custkey"), "c_name")
    )
    plain_left = {
        tuple(r) for r in o.join(c, on="o_custkey", how="left").collect()
    }
    salted_left = {
        tuple(r) for r in L.salted_join(o, c, "o_custkey", how="left").collect()
    }
    assert plain_left == salted_left

    plain_anti = {
        tuple(r) for r in o.join(c, on="o_custkey", how="left_anti").collect()
    }
    salted_anti = {
        tuple(r)
        for r in L.salted_join(o, c, "o_custkey", how="left_anti").collect()
    }
    assert plain_anti == salted_anti


@pytest.mark.parametrize("how", ["full", "right", "outer"])
def test_salted_join_rejects_right_emitting_joins(spark, sf_dir, how):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    with pytest.raises(ValueError, match="salted_join supports only"):
        L.salted_join(o, c, "o_custkey", how=how)


def test_salted_group_count_matches_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    plain = {
        (r["l_orderkey"], r["n"])
        for r in li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    salted = {
        (r["l_orderkey"], r["n"])
        for r in L.salted_group_count(li, "l_orderkey").collect()
    }
    assert plain == salted


def test_range_partitioned_write_orders_files(spark, sf_dir, tmp_path):
    e = load(spark, sf_dir, "events")
    out = str(tmp_path / "events_ranged")
    L.repartition_by_range_for_write(e, ["ts"], 4).write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == e.count()
    # each file covers a disjoint ts range → min/max skipping works:
    # a tight ts filter must prune row groups (scan reads < all files)
    stats = [
        (r["f"], r["mn"], r["mx"])
        for r in back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
        .collect()
    ]
    stats.sort(key=lambda x: x[1])
    for (_, _, prev_max), (_, nxt_min, _) in zip(stats, stats[1:]):
        assert prev_max <= nxt_min
