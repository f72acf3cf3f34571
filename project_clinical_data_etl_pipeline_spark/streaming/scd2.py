"""Streaming type-2 SCD change capture via ``applyInPandasWithState``
— the incremental twin of ``operators.relational.scd2_history``.

Native streaming aggregation can't express run-length change capture
(each version's close time is the NEXT change's event time — neighbor
context over an unbounded, late-arriving sequence), so this is a
custom stateful kernel, same pattern as the streaming as-of join.

Correctness contract (matches batch bit-for-bit under it): a version
interval ``[valid_from, valid_to)`` is FINALIZED when the change row
that closes it has event time strictly below the watermark — at that
point no row can still arrive inside the interval (all its timestamps
are < the close time < the watermark), and every earlier version of
the key closed even earlier, so the version NUMBER is stable too. The
open (current) version is the streaming tail: it stays pending
forever, exactly like open sessions — batch ``scd2_history`` reports
it as ``is_current``; the stream, by definition of append mode, can
never finalize it.

State per key is O(pending horizon), not O(history): rows at or above
the watermark (sorted and folded on finalization), plus THREE scalars
for the open version (attr, valid_from, version counter). Closed
versions leave state the moment they are emitted. An event-time
timeout re-invokes the key when the watermark passes its oldest
pending row with no new traffic, so pending rows always drain.

Reference parity: the reference's pipeline versions whole resources
via conditional PUT (src/coding_task_2.py:214-260); this kernel is the
streaming analytics twin of that update history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCD2_SCHEMA = (
    "user_id bigint, attr string, valid_from_us bigint, "
    "valid_to_us bigint, version bigint"
)

#: version_no counts versions STARTED (0 = no open version yet);
#: open_isnull distinguishes a NULL-attr open version from none.
_STATE_SCHEMA = (
    "version_no long, open_attr string, open_isnull boolean, "
    "open_from long, p_ts array<long>, p_ids array<long>, "
    "p_attrs array<string>"
)


def _make_scd2_fn():
    """Per-key stateful kernel. Self-contained (pandas only) →
    cloudpickled by value."""
    import pandas as pd

    def emit(user_id, rows):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "attr": [r[0] for r in rows],
                "valid_from_us": [r[1] for r in rows],
                "valid_to_us": [r[2] for r in rows],
                "version": [r[3] for r in rows],
            }
        )

    def fn(key, pdf_iter, state):
        user_id = key[0]
        if state.exists:
            version_no, open_attr, open_isnull, open_from, p_ts, p_ids, p_attrs = (
                state.get
            )
            p_ts, p_ids, p_attrs = list(p_ts), list(p_ids), list(p_attrs)
            if open_isnull:
                open_attr = None
        else:
            version_no, open_attr, open_from = 0, None, None
            p_ts, p_ids, p_attrs = [], [], []

        for pdf in pdf_iter:
            for ts, eid, attr in zip(pdf["ts"], pdf["event_id"], pdf["attr"]):
                p_ts.append(ts.value // 1000)  # ns → µs
                p_ids.append(int(eid))
                # pandas object column: missing is None/NaN
                p_attrs.append(None if attr is None or attr != attr else str(attr))

        wm_us = state.getCurrentWatermarkMs() * 1000

        # fold rows the watermark has STRICTLY passed, in (ts, id)
        # order — the batch operator's total order
        ready = sorted(
            (t, i, a) for t, i, a in zip(p_ts, p_ids, p_attrs) if t < wm_us
        )
        out = []
        for t, _i, a in ready:
            if version_no == 0:
                version_no, open_attr, open_from = 1, a, t
            elif a != open_attr:  # null-safe: None != str and None != None is False
                out.append((open_attr, open_from, t, version_no))
                version_no += 1
                open_attr, open_from = a, t
            # same attr as the open version → absorbed into its run

        keep = [(t, i, a) for t, i, a in zip(p_ts, p_ids, p_attrs) if t >= wm_us]
        if version_no > 0 or keep:
            state.update(
                (
                    version_no,
                    open_attr,
                    open_attr is None,
                    open_from,
                    [t for t, _, _ in keep],
                    [i for _, i, _ in keep],
                    [a for _, _, a in keep],
                )
            )
            if keep:
                # re-invoke once the watermark passes the oldest pending
                # row, even with no further key traffic
                state.setTimeoutTimestamp(min(t for t, _, _ in keep) // 1000 + 1)
        elif state.exists:
            state.remove()

        if out:
            yield emit(user_id, out)

    return fn


def stream_scd2_history(
    events: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    id_col: str = "event_id",
    watermark_s: int = 3600,
) -> DataFrame:
    """Incremental type-2 SCD history over a streaming change log with
    columns ``(key, attr, ts, id_col)``. Emits CLOSED versions only
    (SCD2_SCHEMA — append-mode finalized rows); the open version per
    key is withheld until a change closes it. ``watermark_s`` is the
    late-arrival bound: a row older than it may split history
    incorrectly in any streaming engine — the standard event-time
    contract."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = events.select(
        F.col(key).alias("user_id"),
        F.col(ts).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.col(attr).alias("attr"),
    )
    return (
        src.withWatermark("ts", f"{watermark_s} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_scd2_fn(),
            outputStructType=SCD2_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
