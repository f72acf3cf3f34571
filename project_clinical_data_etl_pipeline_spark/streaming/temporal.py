"""Streaming twin of the bounded range join (operators/temporal.py):
Spark's native stream-stream join with an event-time bound IS the
binned range join in incremental form — the engine maintains keyed
state on both sides and the time bound lets the watermark expire it,
so the join never holds more than the window horizon of either stream.

Batch/stream equivalence is proven in tests/test_streaming.py: the
streamed pair set over the events file source equals
``range_join_binned`` on the same data (same (lower, upper] µs
semantics — both sides compare micros-precision timestamps).

Scale: state per key is bounded by (watermark horizon × arrival rate);
the shuffle partitions both streams on the join key exactly like the
batch equi-join. Swap the file source for Kafka and the plan is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_range_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    watermark_s: int = 3600,
) -> DataFrame:
    """Pairs (l, r) of the same ``on`` key with ``right_ts - left_ts``
    in ``(lower_s, upper_s]`` seconds — identical semantics to
    ``operators.temporal.range_join_binned`` — as a watermarked
    stream-stream inner join.

    ``watermark_s`` bounds how late either side may arrive; it must be
    ≥ the window span or in-window matches could be dropped as late.
    Output columns: left columns unprefixed, right columns prefixed
    ``right_`` (the temporal-operator convention).
    """
    if upper_s <= lower_s:
        raise ValueError(f"upper_s ({upper_s}) must be > lower_s ({lower_s})")
    if watermark_s < (upper_s - lower_s):
        raise ValueError(
            f"watermark_s={watermark_s} < window span {upper_s - lower_s}: "
            "in-window matches would be dropped as late"
        )
    keys = [on] if isinstance(on, str) else list(on)
    l = left_stream.withWatermark(left_ts, f"{watermark_s} seconds")
    r = right_stream.withWatermark(right_ts, f"{watermark_s} seconds")
    r = r.select(
        *[F.col(k).alias(f"__r_{k}") for k in keys],
        F.col(right_ts).alias("__r_ts"),
        *[
            F.col(c).alias(f"right_{c}")
            for c in right_stream.columns
            if c not in (*keys, right_ts)
        ],
    )
    cond = (
        (F.col("__r_ts") > F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (F.col("__r_ts") <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    return (
        l.join(r, cond, "inner")
        .withColumn("right_ts_us", F.unix_micros(F.col("__r_ts").cast("timestamp")))
        .drop(*[f"__r_{k}" for k in keys], "__r_ts")
    )
