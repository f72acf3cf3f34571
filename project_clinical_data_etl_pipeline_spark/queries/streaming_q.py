"""OP-41 streaming queries registered for the driver (SURVEY.md §2.8).

The complete-mode stream result equals the batch hourly group-by, so it
IS oracle-checkable in SQL — the stream runs to completion inside the
callable and returns the materialized result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.incremental import run_hourly_counts_stream
from .base import QuerySpec, spec

QUERIES: dict[str, QuerySpec] = {}


@spec(
    QUERIES,
    "op41_streaming_hourly_counts",
    sql="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
    doc="OP-41 incremental sync (reference roadmap insights.md:169): "
    "Structured-Streaming tumbling 1h window over the events file source, "
    "run to completion in complete mode — result provably equals the batch "
    "group-by (the oracle). The watermarked append variant lives in "
    "streaming.incremental and is covered by tests.",
    tags=("streaming",),
)
def op41_streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_hourly_counts_stream(spark, sf_dir)
