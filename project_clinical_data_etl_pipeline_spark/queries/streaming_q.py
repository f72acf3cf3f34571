"""OP-41 streaming queries registered for the driver (SURVEY.md §2.8).

The complete-mode stream result equals the batch hourly group-by, so it
IS oracle-checkable in SQL — the stream runs to completion inside the
callable and returns the materialized result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.incremental import run_hourly_counts_stream
from ..streaming.sessions import sessionize_batch
from ..tables import load
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


@spec(
    QUERIES,
    "sessionize_events",
    sql="""
        WITH g AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sess
            FROM g
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM s GROUP BY user_id, sess
    """,
    doc="Gap-based sessionization (10-min gap) as the batch twin of the "
    "applyInPandasWithState streaming operator: lag-window boundary "
    "detection + running-sum session ids + one group-by — two shuffles "
    "on user_id, all JVM. Microsecond-exact gap math matches the "
    "streaming kernel bit-for-bit.",
    tags=("streaming",),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    s = sessionize_batch(e, gap_s=600)
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.col("total_value"),
    )
