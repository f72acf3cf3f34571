"""Dynamic partition pruning (SURVEY §4.1): the date-partitioned events
layout + a filtered broadcast dim must make Catalyst read ONLY the
qualifying partitions — asserted quantitatively from the executed
scan's SQL metrics (numPartitions read vs staticFilesNum on disk), not
just from the plan text.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.plans.audit import plan_string
from project_clinical_data_etl_pipeline_spark.plans.pruning import (
    date_partitioned_events,
    dpp_click_count,
    partitioned_scan_metrics,
)


@pytest.fixture(scope="module")
def ten_day_tables(spark, tmp_path_factory):
    """A synthetic fact partitioned into exactly 10 date partitions
    (10k rows each, one file per partition) plus its UNPARTITIONED twin
    — the dim-side source. DPP's pruningHasBenefit heuristic only
    inserts the runtime filter when the estimated pruned bytes beat the
    dim plan's size, so the dim must derive from a real (filtered)
    source of comparable width, exactly like the graded query's shape —
    a 10-row LocalRelation never qualifies."""
    root = tmp_path_factory.mktemp("dpp")
    rows = spark.range(100_000).select(
        F.col("id"),
        F.date_add(
            F.lit("2024-03-01").cast("date"), (F.col("id") % 10).cast("int")
        ).alias("d"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    rows.coalesce(1).write.mode("overwrite").partitionBy("d").parquet(
        str(root / "fact")
    )
    rows.write.mode("overwrite").parquet(str(root / "flat"))
    return spark.read.parquet(str(root / "fact")), spark.read.parquet(
        str(root / "flat")
    )


def test_dpp_reads_only_dim_partitions(spark, ten_day_tables):
    """Dim (selective filter over the unpartitioned twin) resolves to 2
    of 10 dates with NO static predicate on the fact: the fact scan
    must carry a dynamicpruning# PartitionFilter and its executed
    metrics must show 2 partitions read out of 10 on disk."""
    fact, flat = ten_day_tables
    # ids 3 and 7 land on dates 2024-03-04 / 2024-03-08 — exactly 2 dates
    dim = flat.filter(F.col("id").isin(3, 7)).select("d").distinct()
    joined = fact.join(dim, "d").agg(F.count(F.lit(1)).alias("n"))
    [row] = joined.collect()
    assert row["n"] == 20_000  # 2 partitions x 10k rows

    assert "dynamicpruning" in plan_string(joined)
    [scan] = partitioned_scan_metrics(joined)
    assert scan["staticFilesNum"] == 10
    assert scan["numPartitions"] == 2
    assert scan["numFiles"] == 2


def test_static_partition_filter_prunes_at_plan_time(spark, ten_day_tables):
    """A literal date predicate prunes BEFORE execution: the scan's
    file set is already restricted (PartitionFilters, no dynamicpruning
    subquery needed)."""
    fact, _ = ten_day_tables
    # metrics hang off THIS DataFrame's own query execution, so the
    # action must run on it directly (df.count() would plan separately)
    one_day = fact.filter(F.col("d") == F.lit("2024-03-05").cast("date")).select("id")
    assert len(one_day.collect()) == 10_000
    [scan] = partitioned_scan_metrics(one_day)
    assert scan["numPartitions"] == 1
    # static pruning restricts the file listing itself — the scan never
    # even knows about the other 9 partitions
    assert scan["numFiles"] == 1
    assert "dynamicpruning" not in plan_string(one_day)


def test_graded_dpp_leg_matches_unpartitioned_twin(spark, sf_dir):
    """The graded dpp_click_count leg: same count as the plain
    unpartitioned expression of the query, and the fact scan reads
    fewer partitions than exist whenever the dim is selective (at
    sf0.001 the dim may select 0 dates — both engines then agree on 0,
    and the scan reads 0 partitions)."""
    from project_clinical_data_etl_pipeline_spark.tables import load

    out = dpp_click_count(spark, sf_dir)
    [row] = out.collect()

    e = load(spark, sf_dir, "events")
    dim_dates = (
        e.filter((F.col("event_type") == "error") & (F.col("value") > 300.0))
        .select(F.to_date("ts").alias("event_date"))
        .distinct()
    )
    twin = (
        e.withColumn("event_date", F.to_date("ts"))
        .join(dim_dates, "event_date")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert row["check"] == "dpp_click_count" and row["n"] == twin

    assert "dynamicpruning" in plan_string(out)
    n_dates = dim_dates.count()
    scans = partitioned_scan_metrics(out)
    if n_dates == 0:
        # AQE empty-relation propagation: a 0-date dim broadcast turns
        # the join into an empty relation and the fact scan disappears
        # from the final plan — the ultimate pruning
        assert row["n"] == 0
    else:
        [scan] = scans
        assert scan["numPartitions"] == n_dates
        assert scan["staticFilesNum"] >= scan["numFiles"]


def test_partitioned_copy_is_cached_per_process(spark, sf_dir):
    """Second call must reuse the scratch copy (same underlying path),
    not rewrite it."""
    a = date_partitioned_events(spark, sf_dir)
    b = date_partitioned_events(spark, sf_dir)
    assert a.inputFiles() and set(a.inputFiles()) == set(b.inputFiles())
