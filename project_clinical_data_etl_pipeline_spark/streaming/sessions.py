"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2.8 OP-41 family — the shape the
reference's roadmap items need once sync is incremental).

Semantics: events per user are folded into sessions; a gap of more than
``gap`` seconds between consecutive events closes the session. Closed
sessions are emitted; the open session rides in GroupState and is
flushed by timeout when the watermark passes it.

Scale: state per key is O(1) (five scalars), keys partition across the
cluster by user_id; the watermark bounds total state. Per-group INPUT
is O(events-per-group-per-microbatch): the kernel concat+sorts a
group's Arrow chunks before folding (chunk arrival order is not
guaranteed), so a hot user's microbatch slice materializes in memory
once — bound it by trigger sizing (smaller microbatches), not state.
The identical kernel also runs in batch via ``applyInPandas``
(sessionize_batch) — one code path, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)

_STATE_SCHEMA = "start long, last long, n long, total double"


def _make_stateful_fn(gap_s: int):
    """Build the per-group stateful kernel. Self-contained (pandas only,
    closure-captured gap) → cloudpickled by value."""
    import pandas as pd

    gap_us = gap_s * 1_000_000

    # All time arithmetic in integer MICROSECONDS (Timestamp.value is ns;
    # Spark timestamps are µs) — float seconds would fabricate spurious
    # ns precision that Arrow refuses to cast back to µs.
    def emit(rows):
        return pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "session_start": [pd.Timestamp(r[1], unit="us") for r in rows],
                "session_end": [pd.Timestamp(r[2], unit="us") for r in rows],
                "n_events": [r[3] for r in rows],
                "total_value": [r[4] for r in rows],
            }
        )

    def fn(key, pdf_iter, state):
        user_id = key[0]
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                state.remove()
                yield emit([(user_id, start, last, n, total)])
            return

        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0

        out = []
        # A group spanning multiple Arrow batches arrives as several
        # chunks with no global order guarantee — concat + sort ONCE
        # before folding, or session boundaries split across chunks
        # would be mis-ordered (diverging from the batch oracle).
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t = ts.value // 1000  # ns → µs
                if start is None:
                    start = last = t
                    n, total = 1, float(value)
                elif t - last > gap_us:
                    out.append((user_id, start, last, n, total))
                    start = last = t
                    n, total = 1, float(value)
                else:
                    last = max(last, t)
                    n += 1
                    total += float(value)

        if start is not None:
            state.update((int(start), int(last), int(n), float(total)))
            state.setTimeoutTimestamp(last // 1000 + gap_s * 1000)  # µs → ms

        if out:
            yield emit(out)

    return fn


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Streaming sessionization: watermarked event-time state with
    per-key timeout. ``events`` must be a streaming DataFrame with
    (user_id, ts, value)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", f"{gap_s * 2} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_stateful_fn(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_with_session_window(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Built-in ``F.session_window`` twin of :func:`sessionize_batch` —
    same session membership (both extend on gap ≤ gap_s: an event
    exactly ``gap_s`` after the last continues the session; verified by
    equivalence test), same output schema.

    ONE shuffle (groupBy user_id × session_window, Spark merges windows
    inside the aggregation) versus the lag+cumsum form's two — the
    preferred form when only session AGGREGATES are needed. The
    lag+cumsum twin stays because it labels EVERY EVENT with its
    session id (needed when downstream work is per-event), and because
    it is the bit-exact batch oracle of the streaming kernel."""
    return (
        events.groupBy(
            "user_id", F.session_window("ts", f"{gap_s} seconds").alias("__w")
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .drop("__w")
    )


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch twin of the streaming sessionizer — pure DataFrame ops (no
    Python state): a session boundary is a gap > gap_s from the previous
    event of the same user (lag window), session id = running count of
    boundaries, then one groupBy. Two shuffles on user_id, JVM-only.

    Used as the oracle for the streaming variant in tests."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond-exact gap math — identical to the streaming kernel
    # (second-truncation would flip boundaries the stream keeps open).
    # unix_micros is strict TIMESTAMP-only; the cast makes a
    # TIMESTAMP_NTZ input (Spark 4.1+ reads parquet NANOS as NTZ)
    # analyze instead of erroring, and is a Catalyst no-op on TIMESTAMP.
    # Gap DIFFERENCES are TZ-invariant, so the session-TZ choice the
    # cast bakes in cannot move a session boundary.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    with_gap = events.select(
        "user_id",
        "ts",
        "value",
        (us - F.lag(us, 1).over(w)).alias("__gap"),
    )
    sessioned = with_gap.withColumn(
        "__session",
        F.sum(
            F.when(
                F.col("__gap").isNull() | (F.col("__gap") > gap_s * 1_000_000), 1
            ).otherwise(0)
        ).over(w),
    )
    return (
        sessioned.groupBy("user_id", "__session")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            # decimal accumulation: order-independent, oracle-exact
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .drop("__session")
    )
