"""Warehouse write semantics: dynamic partition overwrite (selective
backfill) and schema-evolution reads (mergeSchema) — engine-level
capabilities a reference user would rely on for replay/backfill and
for widening a table in place."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.sources.writers import (
    overwrite_partitions,
    write_parquet,
)


def _days(spark, rows):
    return spark.createDataFrame(rows, "day string, k long, v double")


def test_dynamic_partition_overwrite_replaces_only_touched_days(spark, tmp_path):
    path = str(tmp_path / "t")
    base = _days(spark, [("d1", 1, 1.0), ("d1", 2, 2.0), ("d2", 3, 3.0),
                         ("d3", 4, 4.0)])
    write_parquet(base, path, partition_by=["day"])

    # backfill d2 with corrected values — d1/d3 must survive untouched
    fix = _days(spark, [("d2", 30, 30.0), ("d2", 31, 31.0)])
    overwrite_partitions(fix, path, ["day"])

    got = sorted(
        (r.day, r.k, r.v) for r in spark.read.parquet(path).collect()
    )
    assert got == [
        ("d1", 1, 1.0), ("d1", 2, 2.0),
        ("d2", 30, 30.0), ("d2", 31, 31.0),
        ("d3", 4, 4.0),
    ]


def test_dynamic_overwrite_restores_session_mode(spark, tmp_path):
    key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(key, "static")
    try:
        path = str(tmp_path / "t2")
        write_parquet(_days(spark, [("d1", 1, 1.0)]), path,
                      partition_by=["day"])
        overwrite_partitions(_days(spark, [("d1", 2, 2.0)]), path, ["day"])
        assert spark.conf.get(key) == "static"  # restored after the write
    finally:
        spark.conf.unset(key)


def test_static_overwrite_would_truncate_other_partitions(spark, tmp_path):
    # the accident overwrite_partitions prevents, pinned so the contrast
    # stays true across Spark upgrades
    path = str(tmp_path / "t3")
    write_parquet(_days(spark, [("d1", 1, 1.0), ("d2", 2, 2.0)]), path,
                  partition_by=["day"])
    _days(spark, [("d2", 9, 9.0)]).write.mode("overwrite").partitionBy(
        "day"
    ).parquet(path)
    days = {r.day for r in spark.read.parquet(path).select("day").collect()}
    assert days == {"d2"}  # d1 is gone — static overwrite truncated it


def test_merge_schema_reads_widened_table(spark, tmp_path):
    path = str(tmp_path / "t4")
    old = spark.createDataFrame([(1, "a")], "id long, name string")
    old.write.mode("overwrite").parquet(path + "/p=1")
    new = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    )
    new.write.mode("overwrite").parquet(path + "/p=2")

    got = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(got.columns) == {"id", "name", "score", "p"}
    rows = {r.id: (r.name, r.score) for r in got.collect()}
    # the pre-widening rows surface the new column as NULL
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
    # and the new column filters/pushes down like any native column
    assert got.filter(F.col("score") > 9.0).count() == 1
