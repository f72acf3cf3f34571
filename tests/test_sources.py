"""Source/sink unit coverage: the OP-05 REST-backed source with an
injected transport, and the batched foreachPartition REST sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.tables import load
from project_clinical_data_etl_pipeline_spark.sources.readers import (
    fetch_rest_table,
    fetch_rest_table_sharded,
)
from project_clinical_data_etl_pipeline_spark.sources.writers import (
    foreach_partition_post,
)


def test_fetch_rest_table_paginates_until_empty(spark):
    pages = {0: [{"id": "1", "g": "male"}, {"id": "2", "g": "female"}],
             1: [{"id": "3", "g": "male"}]}

    calls = []

    def fetch(page):
        calls.append(page)
        return pages.get(page)

    df = fetch_rest_table(spark, fetch, schema="id string, g string")
    assert sorted(r["id"] for r in df.collect()) == ["1", "2", "3"]
    assert calls == [0, 1, 2]  # stopped on the first empty page


def test_fetch_rest_table_sharded_paginates_on_executors(spark):
    """The mapInPandas variant: every page fetched exactly once, rows
    complete, and — the point — NO fetch happens on the driver. The
    injected transport records calls into a driver-local list; closures
    ship to executors as cloudpickled COPIES, so the driver's list stays
    empty iff pagination ran executor-side."""
    pages = {p: [{"id": str(3 * p + j), "g": "x"} for j in range(3)] for p in range(5)}
    driver_calls: list[int] = []

    def fetch(page):
        driver_calls.append(page)
        return pages.get(page)

    df = fetch_rest_table_sharded(
        spark, fetch, schema="id string, g string", num_shards=3
    )
    got = sorted(r["id"] for r in df.collect())
    assert got == sorted(str(i) for i in range(15))  # 5 pages × 3 rows, no dups
    assert driver_calls == []  # all fetches happened in executor tasks
    # the pagination loop runs inside a MapInPandas node (executor-side)
    assert "MapInPandas" in df._jdf.queryExecution().executedPlan().toString()


def test_foreach_partition_post_batches(spark, tmp_path):
    df = spark.range(250).selectExpr("id", "CAST(id AS STRING) AS s").coalesce(1)
    out = tmp_path / "batches.txt"

    # executor-side writes land in a shared file (local mode, 1 partition)
    def post_batch(rows):
        with open(out, "a") as f:
            f.write(f"{len(rows)}\n")

    foreach_partition_post(df, post_batch, batch_size=100)
    sizes = [int(x) for x in out.read_text().split()]
    assert sum(sizes) == 250
    assert all(s <= 100 for s in sizes)


def test_sql_surface_matches_dataframe_api(spark, sf_dir):
    """Operators are equally expressible through spark.sql over the
    registered views (Catalyst produces the same optimized plan)."""
    from project_clinical_data_etl_pipeline_spark.queries import REGISTRY
    from project_clinical_data_etl_pipeline_spark.tables import register_views

    register_views(spark, sf_dir)
    sql_df = spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice,
               date_format(o_orderdate, 'yyyy-MM-dd') AS order_date
        FROM orders
        WHERE o_orderstatus = 'O'
          AND o_orderdate > TIMESTAMP '1997-06-01 00:00:00'
          AND o_totalprice > 50000.0
          AND o_orderpriority LIKE '%URGENT%'
        """
    )
    api_df = REGISTRY["op09_conjunctive_filter"].run(spark, sf_dir)
    assert sorted(map(tuple, sql_df.collect())) == sorted(map(tuple, api_df.collect()))
    # same optimized plan modulo ids: both push all predicates to the scan
    sql_plan = sql_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in sql_plan and "o_totalprice" in sql_plan


def test_write_training_shards_sized_and_ordered(spark, sf_dir, tmp_path):
    """Curated-corpus sink: shards respect the rows_per_shard ceiling,
    all rows land exactly once, and with an order column the shard files
    cover disjoint, ordered doc_id ranges (deterministic loader resume
    points)."""
    from project_clinical_data_etl_pipeline_spark.sources.writers import (
        write_training_shards,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    write_training_shards(d, out, rows_per_shard=120, order_col="doc_id")

    back = spark.read.parquet(out)
    assert back.count() == d.count()
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("mn"),
            F.max("doc_id").alias("mx"),
        )
        .collect()
    )
    assert all(r["n"] <= 120 for r in per_file)
    spans = sorted((r["mn"], r["mx"]) for r in per_file)
    for (_, prev_mx), (nxt_mn, _) in zip(spans, spans[1:]):
        assert prev_mx < nxt_mn  # disjoint ordered ranges
