"""Streaming windowed HLL distinct-count — the sketch that makes
per-window COUNT(DISTINCT) feasible in a stream.

Exact streaming distinct needs O(distinct values) of state per open
window (the engine must remember every key it has seen); Structured
Streaming refuses ``approx_count_distinct``-style aggs in update
semantics and an exact distinct would OOM on the first hot window at
warehouse scale. The HLL register table IS a streaming-native
aggregate: ``groupBy(window, bucket).max(rho)`` — a plain windowed
max, so state per window is AT MOST ``2^p`` (bucket, rho) ints
(p=8 → 256) regardless of cardinality, and the result after any
prefix of the stream equals the batch sketch of that prefix
(max is commutative/associative/idempotent — late or replayed rows
can only re-assert or raise a register, never corrupt one).

The estimate math (exact BIGINT register sum + one IEEE division —
operators/sketch.py) runs on the drained snapshot, not in the stream:
registers are the streaming state, the estimate is a projection.

Graded as the 'hll' leg of op41_streaming_hourly_counts: per-hour
distinct users over the events stream, hash-matched against the
DuckDB batch re-derivation (streamed registers ≡ batch registers per
window, the stream_temporal_suite grading pattern).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import hll_bucket_rho, hll_core_from_registers
from .incremental import WINDOW_DURATION, _event_stream, _run_to_completion


def _windowed_registers(
    events: DataFrame, key_col: str, p: int, watermark: str | None
) -> DataFrame:
    e = events.withWatermark("ts", watermark) if watermark else events
    bucket, rho = hll_bucket_rho(F.col(key_col), p)
    return (
        e.filter(F.col(key_col).isNotNull())
        .select(F.window("ts", WINDOW_DURATION).alias("w"), bucket, rho)
        .groupBy(F.col("w"), F.col("bucket"))
        .agg(F.max("rho").alias("rho"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "bucket",
            "rho",
        )
    )


def run_windowed_hll_stream(
    spark: SparkSession,
    sf_dir: str,
    key_col: str = "user_id",
    p: int = 8,
) -> DataFrame:
    """Run the tumbling-window register stream to completion (complete
    mode — deterministic, equals the batch per-window sketch) and
    collapse the drained register snapshot to one row per window:
    ``(window_start, m, v_zero, s_int, est_raw)``. Complete mode
    retains every window's registers for the stream's lifetime — the
    graded-equality shape; long-lived production streams use
    :func:`run_windowed_hll_append`, whose watermark EVICTS finalized
    windows so total state is O(windows inside the horizon) · m."""
    snapshot = _run_to_completion(
        spark,
        _windowed_registers(_event_stream(spark, sf_dir), key_col, p, None)
        .writeStream.outputMode("complete")
        .format("memory"),
        f"hll_windows_{uuid.uuid4().hex[:8]}",
    )
    return hll_core_from_registers(snapshot, p, "window_start")


def run_windowed_hll_append(
    spark: SparkSession,
    sf_dir: str,
    key_col: str = "user_id",
    p: int = 8,
    delay: str = "1 hour",
) -> DataFrame:
    """The PRODUCTION shape: append mode with a late-data watermark —
    a window's registers emit once, when the watermark passes its end,
    and the engine then drops that window's state. Total streaming
    state is (windows inside the horizon) × m register ints,
    independent of both cardinality AND stream age; late rows inside
    the horizon still raise registers before finalization (max is
    idempotent), older ones are dropped by the watermark contract.
    Finalized windows equal the batch sketch of the same windows
    (pinned in tests/test_sketch.py)."""
    snapshot = _run_to_completion(
        spark,
        _windowed_registers(_event_stream(spark, sf_dir), key_col, p, delay)
        .writeStream.outputMode("append")
        .format("memory"),
        f"hll_append_{uuid.uuid4().hex[:8]}",
    )
    return hll_core_from_registers(snapshot, p, "window_start")
