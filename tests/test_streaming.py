"""Structured-Streaming coverage (SURVEY.md §2.8 / M6): complete-mode
equivalence to batch, watermarked append finalization, and the custom
stateful sessionizer vs its batch twin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.streaming import incremental as I
from project_clinical_data_etl_pipeline_spark.streaming import sessions as S
from project_clinical_data_etl_pipeline_spark.tables import load


def _rowset(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


COLS = ["window_start", "event_type", "n_events", "total_value"]


def test_complete_stream_equals_batch(spark, sf_dir):
    stream = I.run_hourly_counts_stream(spark, sf_dir)
    batch = I.hourly_counts_batch_equivalent(spark, sf_dir)
    assert _rowset(stream, COLS) == _rowset(batch, COLS)


def test_watermarked_append_emits_finalized_subset(spark, sf_dir):
    appended = I.run_watermarked_append_stream(spark, sf_dir, delay="1 hour")
    complete = I.hourly_counts_batch_equivalent(spark, sf_dir)
    app_rows = _rowset(appended, COLS)
    all_rows = _rowset(complete, COLS)
    assert app_rows, "append stream emitted nothing"
    assert app_rows <= all_rows
    # the last (unfinalized) window must be withheld by the watermark
    last_window = max(r[0] for r in all_rows)
    assert all(r[0] != last_window for r in app_rows)


@pytest.mark.slow  # round 14: multi-batch stream pin (~38 s); upsert semantics stay fast-tier
def test_foreach_batch_upsert_lands_finalized_windows(spark, sf_dir, tmp_path):
    target = str(tmp_path / "upsert_target")
    result = I.run_upsert_stream(spark, sf_dir, target, delay="1 hour")
    rows = _rowset(result, COLS)
    assert rows
    # upsert target equals the append-mode emission set (single run)
    appended = _rowset(I.run_watermarked_append_stream(spark, sf_dir, "1 hour"), COLS)
    assert rows == appended
    # idempotent: running the stream again over the same data must not
    # duplicate keys in the target
    again = I.run_upsert_stream(spark, sf_dir, target, delay="1 hour")
    keys = [(r["window_start"], r["event_type"]) for r in again.collect()]
    assert len(keys) == len(set(keys))


def test_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """The O(touched partitions) contract, pinned at FILE level: a
    batch containing one window of one day rewrites exactly that day's
    ``p_date=`` directory; every other partition's files stay
    byte-identical (same names, same mtimes). Merge semantics in the
    touched partition: replaced key updated, new key appended,
    untouched key kept."""
    import os

    target = str(tmp_path / "scoped_target")

    def snap(day):
        d = os.path.join(target, f"p_date={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.startswith("part-")
        }

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "window_start string, event_type string, "
            "n_events bigint, total_value double",
        )

    I.upsert_partitioned(
        mk(
            [
                ("2024-05-01 10:00:00", "click", 3, 11.0),
                ("2024-05-01 11:00:00", "view", 1, 3.0),
                ("2024-05-02 09:00:00", "click", 2, 5.0),
            ]
        ),
        target,
    )
    day1_before, day2_before = snap("2024-05-01"), snap("2024-05-02")

    # second batch: ONE window, day 2 only — update one key, add one
    I.upsert_partitioned(
        mk(
            [
                ("2024-05-02 09:00:00", "click", 4, 9.0),
                ("2024-05-02 09:00:00", "purchase", 1, 2.0),
            ]
        ),
        target,
    )
    assert snap("2024-05-01") == day1_before, "untouched partition rewritten"
    assert snap("2024-05-02") != day2_before, "touched partition not rewritten"

    got = {
        (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in I.read_upsert_target(spark, target).collect()
    }
    assert got == {
        ("2024-05-01 10:00:00", "click", 3, 11.0),   # untouched day kept
        ("2024-05-01 11:00:00", "view", 1, 3.0),
        ("2024-05-02 09:00:00", "click", 4, 9.0),    # key replaced
        ("2024-05-02 09:00:00", "purchase", 1, 2.0),  # key appended
    }
    # crash window: a file landed WITHOUT a commit (dead writer) is
    # invisible to the manifest-aware read and vacuumable — the txlog
    # contract extended to the upsert target
    import shutil

    from project_clinical_data_etl_pipeline_spark.plans import txlog

    committed = txlog.committed_files(target)
    orphan = os.path.join(
        os.path.dirname(committed[0]), "part-CRASHED.parquet"
    )
    shutil.copyfile(committed[0], orphan)
    still = {
        (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in I.read_upsert_target(spark, target).collect()
    }
    assert still == got, "uncommitted file leaked into the read"
    assert any("CRASHED" in r for r in txlog.vacuum(target, orphan_grace_s=0))
    assert not os.path.exists(orphan)


def test_batch_sessionize_properties(spark, sf_dir):
    e = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    sessions = S.sessionize_batch(e, gap_s=600)
    agg = sessions.agg(
        F.sum("n_events").alias("n"),
        F.min(F.col("session_end") >= F.col("session_start")).alias("ordered"),
    ).collect()[0]
    assert agg["n"] == e.count()  # every event lands in exactly one session
    assert agg["ordered"] is True
    # session bounds never overlap per user: starts sorted == starts
    per_user = (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.min("session_start").alias("first_start"),
        )
        .collect()
    )
    assert all(r["n_sessions"] >= 1 for r in per_user)


def test_stream_sessionize_matches_batch_for_closed_sessions(spark, sf_dir):
    e_batch = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    batch_sessions = _rowset(
        S.sessionize_batch(e_batch, gap_s=600),
        ["user_id", "session_start", "session_end", "n_events"],
    )

    schema = "user_id bigint, ts timestamp, value double"
    stream_src = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from project_clinical_data_etl_pipeline_spark.tables import convert_event_ts

    stream_events = convert_event_ts(stream_src).select("user_id", "ts", "value")
    import uuid

    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        S.sessionize_stream(stream_events, gap_s=600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_sessions = _rowset(
        spark.table(name),
        ["user_id", "session_start", "session_end", "n_events"],
    )
    # every emitted (closed) streaming session is exactly a batch session;
    # only tail sessions (open at watermark) may be withheld
    assert stream_sessions, "no sessions emitted"
    assert stream_sessions <= batch_sessions
    assert len(stream_sessions) >= len(batch_sessions) // 2


def test_incremental_dedup_drops_resent_and_near_identical_docs(spark, tmp_path):
    """The nightly-sync dedup composition: batch 2 re-sends a batch-1
    doc verbatim AND a normalized near-copy (punctuation/case noise);
    both must anti-join away against the accumulated corpus, while the
    genuinely new doc lands."""
    import json

    from project_clinical_data_etl_pipeline_spark.streaming.incremental import (
        start_incremental_dedup_stream,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    target = str(tmp_path / "corpus")

    def drop(name, rows):
        (src / name).write_text(
            "\n".join(json.dumps(r) for r in rows), encoding="utf-8"
        )

    q = start_incremental_dedup_stream(spark, str(src), target)
    try:
        drop(
            "b1.json",
            [
                {"doc_id": 1, "text": "the quick brown fox"},
                {"doc_id": 2, "text": "lazy dogs sleep all day"},
                {"doc_id": 3, "text": "The quick brown fox!"},  # in-batch dup of 1
            ],
        )
        q.processAllAvailable()
        got1 = {r["doc_id"] for r in spark.read.parquet(target).collect()}
        assert got1 == {1, 2}

        drop(
            "b2.json",
            [
                {"doc_id": 1, "text": "the quick brown fox"},  # re-sent verbatim
                {"doc_id": 4, "text": "a genuinely new document"},
                {"doc_id": 5, "text": "LAZY dogs... sleep, all day"},  # near-copy of 2
            ],
        )
        q.processAllAvailable()
        got2 = {r["doc_id"] for r in spark.read.parquet(target).collect()}
        assert got2 == {1, 2, 4}
    finally:
        q.stop()


@pytest.mark.slow  # round 14: multi-batch stream pin (~21 s)
def test_stream_sessions_correct_with_multichunk_groups(spark, tmp_path):
    """Regression for the multi-chunk ordering fix: with
    arrow.maxRecordsPerBatch=2 a 12-event user arrives at the stateful
    kernel as ≥6 unordered chunks; the kernel must concat+sort before
    folding or session boundaries come out wrong. Rows are written
    ts-scrambled so chunk order genuinely disagrees with event order."""
    import random
    import uuid

    from pyspark.sql import types as T

    base_us = 1_700_000_000 * 1_000_000
    events = []
    # user 1: 12 events in 3 sessions (gaps of 2000 s >> gap_s=600)
    for s in range(3):
        for i in range(4):
            events.append((1, base_us + (s * 2000 + i * 30) * 1_000_000, 1.0))
    # user 2: single long session, also multi-chunk
    for i in range(8):
        events.append((2, base_us + i * 90 * 1_000_000, 2.0))
    rng = random.Random(7)
    rng.shuffle(events)

    src = tmp_path / "events_src"
    src.mkdir()
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    import datetime as dt

    def to_rows(evs):
        return [
            (u, dt.datetime.utcfromtimestamp(t / 1_000_000), v) for u, t, v in evs
        ]

    spark.createDataFrame(to_rows(events), schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "batch1"))

    batch_df = spark.createDataFrame(to_rows(events), schema)
    expected = _rowset(
        S.sessionize_batch(batch_df, gap_s=600),
        ["user_id", "session_start", "session_end", "n_events", "total_value"],
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "batch1"))
        )
        name = f"mc_sessions_{uuid.uuid4().hex[:8]}"
        q = (
            S.sessionize_stream(stream, gap_s=600)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            # flush the open tail sessions: a far-future sentinel event
            # advances the watermark past every timeout (staged as a
            # plain file so the source dir stays unpartitioned)
            import glob
            import shutil

            sentinel = [(99, base_us + 10**12, 0.0)]
            staging = str(tmp_path / "sentinel_stage")
            spark.createDataFrame(to_rows(sentinel), schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(staging)
            part = glob.glob(staging + "/part-*.parquet")[0]
            shutil.copy(part, str(src / "batch1" / "zz-sentinel.parquet"))
            q.processAllAvailable()
        finally:
            q.stop()
        got = _rowset(
            spark.table(name).filter(F.col("user_id") != 99),
            ["user_id", "session_start", "session_end", "n_events", "total_value"],
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == expected


def test_session_window_builtin_equals_lag_cumsum_form(spark, sf_dir):
    """The built-in F.session_window form and the lag+cumsum form must
    produce identical sessions on the real events table — including the
    boundary rule (an event exactly gap seconds after the last EXTENDS
    the session in both: session_window merges at diff == gap, the
    kernel closes only on diff > gap)."""
    e = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    via_window = _rowset(S.sessionize_with_session_window(e, gap_s=600), cols)
    via_cumsum = _rowset(S.sessionize_batch(e, gap_s=600), cols)
    assert via_window == via_cumsum

    # and one shuffle vs two: the built-in form's plan has exactly one
    # user_id exchange
    plan = (
        S.sessionize_with_session_window(e, gap_s=600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_stream_range_join_equals_batch_binned_join(spark, sf_dir):
    """The watermarked stream-stream range join must produce exactly the
    batch binned range join's pair set (same (lower, upper] µs
    semantics) — errors x clicks within the preceding 10 minutes."""
    import uuid

    from pyspark.sql import functions as F

    from project_clinical_data_etl_pipeline_spark.operators.temporal import (
        range_join_binned,
    )
    from project_clinical_data_etl_pipeline_spark.streaming.incremental import (
        _event_stream,
    )
    from project_clinical_data_etl_pipeline_spark.streaming.temporal import (
        stream_range_join,
    )
    from project_clinical_data_etl_pipeline_spark.tables import load

    s = _event_stream(spark, sf_dir)
    err_s = s.filter(F.col("event_type") == "error").select(
        F.col("event_id"), "user_id", "ts"
    )
    clk_s = s.filter(F.col("event_type") == "click").select(
        F.col("event_id"), "user_id", "ts"
    )
    name = f"range_join_{uuid.uuid4().hex[:8]}"
    q = (
        stream_range_join(err_s, clk_s, on="user_id", left_ts="ts",
                          right_ts="ts", lower_s=-600, upper_s=0)
        .select("event_id", "right_event_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r["event_id"], r["right_event_id"])
        for r in spark.table(name).collect()
    }

    e = load(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clk = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    batch = {
        (r["event_id"], r["right_event_id"])
        for r in range_join_binned(
            err, clk, on="user_id", left_ts="ts", right_ts="ts",
            lower_s=-600, upper_s=0,
        ).collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_stream_range_join_rejects_undersized_watermark():
    import pytest as _pytest

    from project_clinical_data_etl_pipeline_spark.streaming.temporal import (
        stream_range_join,
    )

    with _pytest.raises(ValueError, match="watermark"):
        stream_range_join(None, None, on="k", left_ts="ts", right_ts="ts",
                          lower_s=-600, upper_s=0, watermark_s=300)


def test_stream_asof_join_matches_batch_for_finalized_lefts(spark, sf_dir):
    """Every finalized streamed as-of row must equal the batch
    asof_join answer for that left row (purchases enriched with the
    latest preceding click); only lefts inside the final watermark
    horizon may be withheld."""
    import uuid

    from pyspark.sql import functions as F

    from project_clinical_data_etl_pipeline_spark.operators.temporal import asof_join
    from project_clinical_data_etl_pipeline_spark.streaming.asof import (
        stream_asof_join,
    )
    from project_clinical_data_etl_pipeline_spark.streaming.incremental import (
        _event_stream,
    )
    from project_clinical_data_etl_pipeline_spark.tables import load

    s = _event_stream(spark, sf_dir)
    p_s = s.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    c_s = s.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    name = f"asof_{uuid.uuid4().hex[:8]}"
    q = (
        stream_asof_join(p_s, c_s, watermark_s=600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        r["left_event_id"]: (r["matched_event_id"], r["matched_ts_us"])
        for r in spark.table(name).collect()
    }

    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    batch = {
        r["event_id"]: (r["right_event_id"], r["right_ts_us"])
        for r in asof_join(p, c, on="user_id", left_ts="ts", right_ts="ts",
                           payload_cols=["event_id"]).collect()
    }
    assert streamed, "no as-of rows finalized"
    for lid, match in streamed.items():
        assert match == batch[lid], lid
    # the watermark tail may withhold some lefts, but not most of them
    assert len(streamed) >= len(batch) // 2


@pytest.mark.slow  # round 14: multi-batch stream pin (~26 s)
def test_stream_asof_pruned_right_state_serves_later_batches(spark, tmp_path):
    """A right event finalized below the watermark in batch 1 must still
    match a left that only arrives in batch 2 (the latest-right prune
    keeps exactly enough state), including across a long quiet gap."""
    import uuid

    from pyspark.sql import functions as F

    from project_clinical_data_etl_pipeline_spark.streaming.asof import (
        stream_asof_join,
    )

    src = tmp_path / "events_src"
    src.mkdir()
    schema = "user_id bigint, ts timestamp, side bigint, event_id bigint"

    def write_batch(fname, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "stage"))
        import glob
        import shutil

        part = glob.glob(str(tmp_path / "stage" / "*.parquet"))[0]
        shutil.copy(part, str(src / fname))

    from datetime import datetime

    def ts(minute, second=0):
        return datetime(2024, 1, 1, minute // 60, minute % 60, second)

    # batch 1: the right (click 500) plus a slightly-later right for
    # user 2 that moves the watermark just past click 500's event time
    write_batch("b1.parquet", [
        (1, ts(10), 0, 500),
        (2, ts(11), 0, 900),
    ])

    stream = (
        spark.readStream.schema(schema.replace("bigint", "long"))
        .parquet(str(src))
    )
    lefts = stream.filter(F.col("side") == 1).select("user_id", "ts", "event_id")
    rights = stream.filter(F.col("side") == 0).select("user_id", "ts", "event_id")
    name = f"asof2_{uuid.uuid4().hex[:8]}"
    q = (
        stream_asof_join(lefts, rights, watermark_s=60)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a left for user 1 (above the watermark!) after click
        # 500 was pruned to latest-right state, plus a later user-2 row
        # that advances the watermark past the left
        write_batch("b2.parquet", [
            (1, ts(12), 1, 7000),
            (2, ts(14), 0, 901),
        ])
        q.processAllAvailable()
        # batch 3: user 1 gets no traffic — the left must flush via the
        # event-time TIMEOUT as the watermark advances
        write_batch("b3.parquet", [(2, ts(16), 0, 902)])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["left_event_id"]: r["matched_event_id"]
        for r in spark.table(name).collect()
    }
    assert got.get(7000) == 500


def test_op41_suite_empty_events_emits_empty_not_crash(spark, tmp_path):
    """Empty events table: max(ts) is NULL, so no watermark ever
    advances — the suite must return zero rows (matching the oracle's
    NULL-lim comparison), not crash on int(None)."""
    import os

    from project_clinical_data_etl_pipeline_spark.queries.streaming_q import (
        op41_streaming_hourly_counts,
    )

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "empty_events")
    src.limit(0).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    out = op41_streaming_hourly_counts(spark, d)
    assert out.count() == 0
    assert set(out.columns) == {
        "part", "window_start", "event_type", "n_events", "total_value",
    }


def test_watermarked_append_across_multiple_triggers_with_late_data(
    spark, tmp_path
):
    """Real multi-trigger arrival (the graded path drains all-available
    in ONE micro-batch): three file drops, each its own trigger, with
    late data on both sides of the watermark. Asserts the append-mode
    finalized-window set equals the hand-derived batch twin: the
    within-horizon late row UPDATES its window before finalization, the
    beyond-horizon late row is DROPPED (its window's state was already
    evicted), and the still-open tail window is NOT emitted."""
    import json as _json
    import uuid as _uuid

    src = tmp_path / "stream_src"
    src.mkdir()

    def drop_file(name, rows):
        with open(src / name, "w") as f:
            for ts, et, v in rows:
                f.write(_json.dumps(
                    {"ts": f"2024-05-01T{ts}:00.000Z", "event_type": et,
                     "value": v}) + "\n")

    # batch 1 must exist before the stream starts (source needs ≥0 files)
    drop_file("b1.json", [
        ("10:10", "click", 1.0),
        ("10:20", "click", 2.0),
        ("11:05", "view", 3.0),
    ])

    raw = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .json(str(src))
    )
    name = f"wm_multi_{_uuid.uuid4().hex[:8]}"
    q = (
        I._hourly_agg(raw, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()  # trigger 1: watermark -> 10:05

        # trigger 2: advances watermark to 12:10; the 10:40 row is LATE
        # but inside the horizon (10:05 watermark at batch start) — it
        # must still update the [10:00, 11:00) window pre-finalization
        drop_file("b2.json", [
            ("13:10", "purchase", 4.0),
            ("10:40", "click", 8.0),
        ])
        q.processAllAvailable()

        # trigger 3: the 11:30 row is BEYOND the horizon (watermark
        # 12:10 > 11:30, its window already finalized+evicted) — must
        # be dropped; 15:30 advances the final watermark to 14:30 and
        # its own [15:00, 16:00) window stays open (never emitted)
        drop_file("b3.json", [
            ("15:30", "error", 5.0),
            ("11:30", "view", 9.0),
        ])
        q.processAllAvailable()
        got = {
            (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
            for r in spark.table(name).collect()
        }
    finally:
        q.stop()
        spark.catalog.dropTempView(name)

    assert got == {
        ("2024-05-01 10:00:00", "click", 3, 11.0),   # includes late 10:40
        ("2024-05-01 11:00:00", "view", 1, 3.0),     # 11:30 row dropped
        ("2024-05-01 13:00:00", "purchase", 1, 4.0),
    }


def test_dedup_within_watermark_drops_injected_duplicates(spark, sf_dir):
    """The graded 'dedupwm' runner: duplicates ARE injected (non-vacuous)
    and the emitted rowset is exactly the distinct original events —
    full rows, not just ids."""
    e = load(spark, sf_dir, "events")
    u = F.unix_micros(F.col("ts").cast("timestamp"))
    b = e.agg(F.min(u).alias("mn"), F.max(u).alias("mx")).collect()[0]
    mid = (int(b["mn"]) + int(b["mx"])) // 2
    b1max = (
        e.filter(u <= mid).agg(F.max(u).alias("m")).collect()[0]["m"]
    )
    n_resent = e.filter(
        (u <= mid) & (u > b1max - 86_400 * 1_000_000 + 1_000_000)
    ).count()
    assert n_resent > 0, "horizon captured no re-sendable rows — vacuous"

    out = I.run_dedup_within_watermark_stream(spark, sf_dir)
    # ts round-trips through the unix-micros JSON encoding — the one
    # column most at risk of drift, so it IS in the compared tuple
    # (normalized to micros on both sides).
    norm = lambda df: df.select(  # noqa: E731
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    cols = ["event_id", "user_id", "event_type", "value", "ts_us"]
    got = sorted(tuple(r[c] for c in cols) for r in norm(out).collect())
    want = sorted(tuple(r[c] for c in cols) for r in norm(e).collect())
    assert got == want


def test_dedup_within_watermark_synthetic_triggers(spark, tmp_path):
    """Controlled two-trigger stream pinning the operator contract:
    a duplicate re-delivered WITHIN the watermark horizon is dropped
    (the guarantee); a duplicate re-delivered with event time already
    below the watermark does not re-emit either (late-input filter);
    genuinely new keys pass through."""
    import json as _json
    import uuid as _uuid

    src = tmp_path / "dedupwm_src"
    src.mkdir()

    def drop_file(name, rows):
        with open(src / name, "w") as f:
            for eid, ts in rows:
                f.write(_json.dumps(
                    {"event_id": eid, "ts": f"2024-05-01T{ts}:00.000Z"}
                ) + "\n")

    drop_file("b1.json", [(1, "09:00"), (2, "12:00")])
    deduped = (
        spark.readStream.schema("event_id bigint, ts timestamp")
        .json(str(src))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = f"dedupwm_syn_{_uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()  # watermark -> 11:00
        drop_file("b2.json", [
            (2, "12:00"),  # within horizon: state hit -> dup-dropped
            (1, "09:00"),  # event time < watermark: late-filtered
            (3, "12:30"),  # new key -> emitted
        ])
        q.processAllAvailable()
        got = sorted(
            (r["event_id"], str(r["ts"])) for r in spark.table(name).collect()
        )
    finally:
        q.stop()
        spark.catalog.dropTempView(name)
    assert [eid for eid, _ in got] == [1, 2, 3]


def test_upsert_sketch_sidecar_maintained_in_same_commit(spark, tmp_path):
    """Round 12: per-day HLL register sidecar maintained INSIDE the
    upsert's atomic commits. Invariant after every batch: the sidecar's
    register table per day EQUALS a fresh sketch of that day's current
    target rows — including the replace case, where a max-merged
    register could not forget the replaced value (the sidecar is
    recomputed per touched day, not max-merged). Untouched days'
    sketch files stay byte-identical; a commit-point crash changes
    neither data nor profile."""
    import os

    from project_clinical_data_etl_pipeline_spark.operators.sketch import (
        hll_registers,
    )
    from project_clinical_data_etl_pipeline_spark.plans import txlog

    target = str(tmp_path / "sketch_target")

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "window_start string, event_type string, "
            "n_events bigint, total_value double",
        )

    def sidecar_rows(parts=None):
        return sorted(
            (r["part"], r["bucket"], r["rho"])
            for r in I.read_upsert_sketch(spark, target, parts).collect()
        )

    def recompute_rows():
        data = I.read_upsert_target(spark, target, drop_part=False)
        out = []
        for day in [
            r["p_date"] for r in data.select("p_date").distinct().collect()
        ]:
            regs = hll_registers(
                data.filter(F.col("p_date") == day), F.col("event_type")
            )
            out += [
                (str(day), r["bucket"], r["rho"]) for r in regs.collect()
            ]
        return sorted(out)

    I.upsert_partitioned(
        mk(
            [
                ("2024-05-01 10:00:00", "click", 3, 11.0),
                ("2024-05-01 11:00:00", "view", 1, 3.0),
                ("2024-05-02 09:00:00", "click", 2, 5.0),
            ]
        ),
        target,
        sketch_col="event_type",
    )
    assert sidecar_rows() == recompute_rows()

    def sketch_snap(day):
        d = os.path.join(target, "_hll", f"part={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.startswith("part-")
        }

    day1_sketch_before = sketch_snap("2024-05-01")
    # second batch touches ONLY day 2 and REPLACES its sole event_type
    # ('click' rows vanish from that day: a max-merged sidecar would
    # still carry click's register bits — recompute must not)
    I.upsert_partitioned(
        mk([("2024-05-02 09:00:00", "purchase", 1, 2.0)]),
        target,
        keys=["window_start"],
        sketch_col="event_type",
    )
    assert sidecar_rows() == recompute_rows()
    assert sketch_snap("2024-05-01") == day1_sketch_before, (
        "untouched day's sketch partition rewritten"
    )
    # the day-2 sidecar now sketches exactly {'purchase'}
    day2 = I.read_upsert_sketch(spark, target, parts=["2024-05-02"])
    fresh = hll_registers(
        spark.createDataFrame([("purchase",)], "event_type string"),
        F.col("event_type"),
    )
    assert sorted((r["bucket"], r["rho"]) for r in day2.collect()) == sorted(
        (r["bucket"], r["rho"]) for r in fresh.collect()
    )
    # crash at the commit point: neither data nor profile moves
    import pytest as _pytest

    before_data = sorted(
        map(tuple, I.read_upsert_target(spark, target).collect())
    )
    before_sketch = sidecar_rows()
    real_commit = txlog.commit
    txlog.commit = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("injected crash")
    )
    try:
        with _pytest.raises(RuntimeError, match="injected crash"):
            I.upsert_partitioned(
                mk([("2024-05-02 09:00:00", "refund", 1, 1.0)]),
                target,
                sketch_col="event_type",
            )
    finally:
        txlog.commit = real_commit
    assert sorted(
        map(tuple, I.read_upsert_target(spark, target).collect())
    ) == before_data
    assert sidecar_rows() == before_sketch
    txlog.vacuum(target, orphan_grace_s=0)
    assert sidecar_rows() == before_sketch


def test_upsert_sketch_sidecar_all_kinds(spark, tmp_path):
    """The CMS and Bloom sidecars follow the same recompute law in the
    same commit: after a replace batch, each kind equals a fresh
    sketch of the day's current rows (counters must FORGET the
    replaced key's counts; bits must forget its positions)."""
    from project_clinical_data_etl_pipeline_spark.operators.sketch import (
        bloom_bits,
        cms_counters,
    )

    target = str(tmp_path / "sketch_all_target")

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "window_start string, event_type string, "
            "n_events bigint, total_value double",
        )

    kinds = ("hll", "cms", "bloom")
    I.upsert_partitioned(
        mk(
            [
                ("2024-05-01 10:00:00", "click", 3, 11.0),
                ("2024-05-02 09:00:00", "click", 2, 5.0),
                ("2024-05-02 10:00:00", "view", 2, 5.0),
            ]
        ),
        target,
        sketch_col="event_type",
        sketches=kinds,
    )
    # replace day 2 entirely with a single 'purchase' window
    I.upsert_partitioned(
        mk([("2024-05-02 09:00:00", "purchase", 1, 2.0)]),
        target,
        keys=["window_start"],
        sketch_col="event_type",
        sketches=kinds,
    )
    data = I.read_upsert_target(spark, target, drop_part=False)
    day2 = data.filter(F.col("p_date") == "2024-05-02")
    # day 2 now holds: purchase (replaced 09:00) + view (10:00 kept)
    assert {
        r["event_type"] for r in day2.select("event_type").collect()
    } == {"purchase", "view"}
    got_cms = sorted(
        (r["r"], r["bucket"], r["cnt"])
        for r in I.read_upsert_sketch(
            spark, target, parts=["2024-05-02"], kind="cms"
        ).collect()
    )
    want_cms = sorted(
        (r["r"], r["bucket"], r["cnt"])
        for r in cms_counters(day2, F.col("event_type")).collect()
    )
    assert got_cms == want_cms  # 'click' counts forgotten
    got_bloom = sorted(
        r["bit"]
        for r in I.read_upsert_sketch(
            spark, target, parts=["2024-05-02"], kind="bloom"
        ).collect()
    )
    want_bloom = sorted(
        r["bit"] for r in bloom_bits(day2, F.col("event_type")).collect()
    )
    assert got_bloom == want_bloom
    # hll kind still present and day-1 untouched across kinds
    for kind in kinds:
        parts = {
            r["part"]
            for r in I.read_upsert_sketch(spark, target, kind=kind)
            .select("part")
            .distinct()
            .collect()
        }
        assert parts == {"2024-05-01", "2024-05-02"}


def test_upsert_drops_stale_sidecar_kinds_on_touched_days(spark, tmp_path):
    """Round-12 advice (low #4): a later batch maintaining FEWER kinds
    than the target's history must not leave a replaced day's other
    kinds committed with stale pre-merge content. Touched days retire
    their sidecar files for EVERY kind; only the requested kinds are
    recomputed — a missing day is detectable, a stale one silently
    violates the sidecar-≡-fresh-sketch invariant."""
    target = str(tmp_path / "sketch_kinds_target")

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "window_start string, event_type string, "
            "n_events bigint, total_value double",
        )

    I.upsert_partitioned(
        mk(
            [
                ("2024-05-01 10:00:00", "click", 3, 11.0),
                ("2024-05-02 09:00:00", "click", 2, 5.0),
            ]
        ),
        target,
        sketch_col="event_type",
        sketches=("hll", "cms", "bloom"),
    )
    # later batch replaces day 2 but only maintains the default 'hll'
    I.upsert_partitioned(
        mk([("2024-05-02 09:00:00", "purchase", 1, 2.0)]),
        target,
        keys=["window_start"],
        sketch_col="event_type",
    )
    # day 2: hll recomputed (fresh sketch of the current rows)...
    from project_clinical_data_etl_pipeline_spark.operators.sketch import (
        hll_registers,
    )

    day2 = I.read_upsert_target(spark, target, drop_part=False).filter(
        F.col("p_date") == "2024-05-02"
    )
    got = sorted(
        (r["bucket"], r["rho"])
        for r in I.read_upsert_sketch(
            spark, target, parts=["2024-05-02"], kind="hll"
        ).collect()
    )
    want = sorted(
        (r["bucket"], r["rho"])
        for r in hll_registers(day2, F.col("event_type")).collect()
    )
    assert got == want
    # ...while its cms/bloom are GONE (not stale 'click' counters)
    for kind in ("cms", "bloom"):
        parts = {
            r["part"]
            for r in I.read_upsert_sketch(spark, target, kind=kind)
            .select("part")
            .distinct()
            .collect()
        }
        assert parts == {"2024-05-01"}, f"{kind} kept a stale day-2 sidecar"
    # untouched day 1 keeps all three kinds
    for kind in ("hll", "cms", "bloom"):
        day1 = I.read_upsert_sketch(
            spark, target, parts=["2024-05-01"], kind=kind
        )
        assert day1.count() > 0
