"""Source operators — SURVEY.md §2.1 (OP-01..05).

The reference reads from a FHIR REST server; the engine's canonical
at-rest format is parquet (columnar, pushdown, pruning). JSON documents
and scalar text handoffs map to spark.read.json / spark.read.text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_table(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """OP-01 full-collection scan (reference src/coding_task_1.py:42-50).
    Explicit schema where known — no inference pass over 100 TB."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_json_docs(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multi_line: bool = True,
) -> DataFrame:
    """OP-03 JSON document read (reference src/coding_task_1.py:11-27).

    PERMISSIVE mode + _corrupt_record reproduces the reference's
    tolerance of malformed/missing fields (SURVEY.md §1.2): bad docs
    become rows with NULLs + the raw record, not job failures.
    """
    reader = spark.read.option("multiLine", multi_line).option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_scalar_text(spark: SparkSession, path: str, alias: str = "value") -> DataFrame:
    """OP-04 scalar text read (reference src/coding_task_3.py:42-52 —
    the single-id handoff files). Returns a 1-column trimmed DataFrame;
    in-DAG lineage should replace these handoffs wherever possible
    (SURVEY.md §3.4)."""
    return spark.read.text(path).select(F.trim(F.col("value")).alias(alias))


def fetch_rest_table(
    spark: SparkSession,
    fetch_page,
    schema: StructType | str,
    max_pages: int = 10_000,
) -> DataFrame:
    """OP-05 authenticated REST-backed source (reference bearer-token FHIR
    search, src/coding_task_1.py:30-39 + OAuth2 refresh
    src/refresh_token.py:22-57).

    ``fetch_page(page_idx) -> list[dict] | None`` owns transport and
    auth (session headers, token refresh, retry); ``None``/empty ends
    pagination. The fetch is driver-side — correct for the reference's
    bundle-sized results; for large collections prefer exporting to
    parquet/bulk-FHIR and scanning, or shard page ranges over executors
    with ``mapInPandas``. Returns a DataFrame with the explicit
    ``schema`` (never inferred — SURVEY.md §1.2)."""
    rows: list[dict] = []
    for page in range(max_pages):
        batch = fetch_page(page)
        if not batch:
            break
        rows.extend(batch)
    return spark.createDataFrame(rows, schema=schema)


def fetch_rest_table_sharded(
    spark: SparkSession,
    fetch_page,
    schema: StructType | str,
    num_shards: int = 8,
    max_pages: int = 10_000,
) -> DataFrame:
    """OP-05 at scale: page ranges sharded over EXECUTORS via
    ``mapInPandas`` — the distributed variant of :func:`fetch_rest_table`
    (whose driver-side loop is correct only for bundle-sized results).

    Shard ``s`` fetches pages ``s, s+num_shards, s+2·num_shards, …``
    and stops at its first empty page — correct whenever pagination is
    monotone (``page ≥ total ⇒ empty``), which standard offset/page
    APIs satisfy. Every page is fetched exactly once, by exactly one
    executor task; no page list ever passes through the driver.

    ``fetch_page(page_idx) -> list[dict] | None`` owns transport and
    auth, exactly like the driver-side variant, and must be
    self-contained (cloudpickle ships it by value to executors —
    session objects/tokens should be built lazily inside it).
    Returns rows under the explicit ``schema`` (never inferred)."""
    schema_struct = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    fields = [f.name for f in schema_struct.fields]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            for shard in pdf["shard"]:
                page = int(shard)
                while page < max_pages:
                    batch = fetch_page(page)
                    if not batch:
                        break
                    yield pd.DataFrame(
                        [[row.get(c) for c in fields] for row in batch],
                        columns=fields,
                    )
                    page += num_shards

    shards = (
        spark.range(num_shards)
        .select(F.col("id").cast("int").alias("shard"))
        .repartition(num_shards)  # one shard per task → full parallelism
    )
    return shards.mapInPandas(run, schema_struct)
