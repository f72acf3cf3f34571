"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``project_clinical_data_etl_pipeline_spark.queries`` — one
QuerySpec per operator from SURVEY.md §2 (plus the LLM-data-pipeline
extension ops), each carrying its own DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from project_clinical_data_etl_pipeline_spark.queries import REGISTRY
from project_clinical_data_etl_pipeline_spark.session import tune


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the OP-09 conjunctive
    filtered search — the reference's own first demonstrated query
    (src/coding_task_1.py:441). Driver checks rows > 0."""
    tune(spark)
    return REGISTRY["op09_conjunctive_filter"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.run for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; ops without a SQL twin
    (xxhash64-based sketches, binary decode) are omitted → driver
    records the weaker rows-only check."""
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
