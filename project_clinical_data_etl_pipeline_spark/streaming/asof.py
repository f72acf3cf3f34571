"""Streaming as-of join (point-in-time enrichment) via
``applyInPandasWithState`` — the incremental twin of
``operators.temporal.asof_join`` and the feature-store primitive the
batch union-trick can't give you online: every left event is enriched
with the most recent right event of the same key at or before it.

Native stream-stream joins cannot express as-of (the per-left argmax
over the unbounded right history is not a time-bounded equi-join), so
this is a custom stateful kernel, same pattern as the sessionizer.

Correctness contract (matches batch bit-for-bit under it): a left row
is FINALIZED only once the watermark passes its event time — at that
point no right row at-or-before it can still arrive — so every emitted
match equals the batch ``asof_join`` answer. Lefts newer than the
final watermark stay pending (the streaming tail, like open sessions).

State per key is O(watermark horizon), not O(history): rights
strictly below the watermark are pruned to the single latest one (any
older right is dominated by it for every still-pending or future left
— their event times are at or above the watermark), rights at or
above it are kept until the watermark strictly passes them, and
pending lefts drain at finalization. Keys partition across the cluster; a timeout flushes
pending lefts when the watermark advances with no new key traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASOF_SCHEMA = (
    "user_id bigint, left_event_id bigint, left_ts_us bigint, "
    "matched_event_id bigint, matched_ts_us bigint"
)

_STATE_SCHEMA = (
    "l_ids array<long>, l_ts array<long>, r_ids array<long>, r_ts array<long>"
)


def _make_asof_fn():
    """Per-key stateful kernel. Self-contained (pandas only) →
    cloudpickled by value."""
    import pandas as pd

    def emit(user_id, rows):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "left_event_id": [r[0] for r in rows],
                "left_ts_us": [r[1] for r in rows],
                "matched_event_id": [r[2] for r in rows],
                "matched_ts_us": [r[3] for r in rows],
            }
        )

    def fn(key, pdf_iter, state):
        user_id = key[0]
        if state.exists:
            l_ids, l_ts, r_ids, r_ts = (list(x) for x in state.get)
        else:
            l_ids, l_ts, r_ids, r_ts = [], [], [], []

        # absorb this microbatch (chunks arrive unordered — just append;
        # matching below is order-insensitive argmax)
        for pdf in pdf_iter:
            for ts, side, eid in zip(pdf["ts"], pdf["side"], pdf["event_id"]):
                t = ts.value // 1000  # ns → µs
                if side == 1:
                    l_ids.append(int(eid)); l_ts.append(t)
                else:
                    r_ids.append(int(eid)); r_ts.append(t)

        wm_us = state.getCurrentWatermarkMs() * 1000

        # finalize lefts the watermark has STRICTLY passed: Spark's
        # contract only guarantees no more data with event time < the
        # watermark, so a right at exactly the watermark may still
        # arrive — a left at lt == wm must keep pending. Argmax right
        # with ts ≤ left ts, ties by (ts, id) — the batch
        # payload-struct order.
        out = []
        keep_l_ids, keep_l_ts = [], []
        for lid, lt in zip(l_ids, l_ts):
            if lt < wm_us:
                cands = [(rt, rid) for rid, rt in zip(r_ids, r_ts) if rt <= lt]
                if cands:
                    mt, mid = max(cands)
                    out.append((lid, lt, mid, mt))
                else:
                    out.append((lid, lt, None, None))
            else:
                keep_l_ids.append(lid); keep_l_ts.append(lt)

        # prune rights: the latest one strictly below the watermark
        # dominates the rest for every pending/future left (their event
        # times are ≥ the watermark); rights at or above it stay whole
        below = [(rt, rid) for rid, rt in zip(r_ids, r_ts) if rt < wm_us]
        keep = [max(below)] if below else []
        keep += [(rt, rid) for rid, rt in zip(r_ids, r_ts) if rt >= wm_us]
        keep_r_ts = [rt for rt, _ in keep]
        keep_r_ids = [rid for _, rid in keep]

        if keep_l_ids or keep_r_ids:
            state.update((keep_l_ids, keep_l_ts, keep_r_ids, keep_r_ts))
            if keep_l_ids:
                # flush pending lefts when the watermark passes the
                # oldest one, even with no further key traffic
                state.setTimeoutTimestamp(min(keep_l_ts) // 1000 + 1)
        elif state.exists:
            state.remove()

        if out:
            yield emit(user_id, out)

    return fn


def stream_asof_join(
    left: DataFrame,
    right: DataFrame,
    watermark_s: int = 3600,
) -> DataFrame:
    """Backward as-of join over two streaming frames, each with columns
    (user_id, ts, event_id). Returns finalized enriched left rows
    (ASOF_SCHEMA); left rows still inside the watermark horizon are
    withheld until safe. ``watermark_s`` is the late-arrival bound for
    BOTH streams — a right row arriving later than it may be missed
    (the standard event-time contract)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    tagged = (
        left.select("user_id", "ts", F.lit(1).alias("side"), "event_id")
        .unionByName(
            right.select("user_id", "ts", F.lit(0).alias("side"), "event_id")
        )
    )
    return (
        tagged.withWatermark("ts", f"{watermark_s} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_asof_fn(),
            outputStructType=ASOF_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
