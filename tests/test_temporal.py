"""Edge-semantics tests for the temporal join operators: tie-breaking,
tolerance windows, interval boundaries, bucket-boundary crossings, and
TIMESTAMP_NTZ inputs (Spark 4.1+ surfaces parquet NANOS as NTZ)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)


def _ts_df(spark, rows, cols, ntz=False):
    df = spark.createDataFrame(rows, cols)
    cast_to = "timestamp_ntz" if ntz else "timestamp"
    return df.withColumn("ts", F.col("ts").cast(cast_to))


def _asof_pairs(out):
    return {
        r["event_id"]: (r["right_event_id"], r["right_ts_us"])
        for r in out.collect()
    }


def test_asof_matches_latest_at_or_before(spark):
    left = _ts_df(spark, [(1, 10, "2024-01-01 00:10:00"),
                          (2, 10, "2024-01-01 00:00:30")],
                  ["event_id", "user_id", "ts"])
    right = _ts_df(spark, [(100, 10, "2024-01-01 00:01:00"),
                           (101, 10, "2024-01-01 00:05:00"),
                           (102, 10, "2024-01-01 00:20:00"),
                           (103, 99, "2024-01-01 00:09:59")],
                   ["event_id", "user_id", "ts"])
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    payload_cols=["event_id"])
    pairs = _asof_pairs(out)
    assert pairs[1][0] == 101  # latest ≤ 00:10 for user 10 (not user 99's)
    assert pairs[2] == (None, None)  # nothing at or before 00:00:30


def test_asof_simultaneous_right_row_matches_and_ties_pick_max(spark):
    left = _ts_df(spark, [(1, 10, "2024-01-01 00:10:00")],
                  ["event_id", "user_id", "ts"])
    right = _ts_df(spark, [(100, 10, "2024-01-01 00:10:00"),
                           (101, 10, "2024-01-01 00:10:00")],
                   ["event_id", "user_id", "ts"])
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    payload_cols=["event_id"])
    # equal-ts right rows: deterministic winner = max payload tuple
    assert _asof_pairs(out)[1][0] == 101


def test_asof_tolerance_nulls_stale_matches_keeps_left_row(spark):
    left = _ts_df(spark, [(1, 10, "2024-01-01 01:00:00")],
                  ["event_id", "user_id", "ts"])
    right = _ts_df(spark, [(100, 10, "2024-01-01 00:00:00")],
                   ["event_id", "user_id", "ts"])
    loose = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                      payload_cols=["event_id"], tolerance_s=3600)
    tight = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                      payload_cols=["event_id"], tolerance_s=3599)
    assert _asof_pairs(loose)[1][0] == 100  # exactly at tolerance: kept
    assert _asof_pairs(tight)[1] == (None, None)  # one second too old
    assert tight.count() == 1  # left row survives with NULL payload


def test_asof_null_payload_field_does_not_leak_older_row(spark):
    """A right row whose payload FIELD is NULL must still win as-of
    selection whole (struct-atomic) — not be skipped in favor of an
    older row's non-null value."""
    left = _ts_df(spark, [(1, 10, "2024-01-01 00:10:00")],
                  ["event_id", "user_id", "ts"])
    right = _ts_df(spark, [(100, 10, "2024-01-01 00:01:00"),
                           (101, 10, "2024-01-01 00:05:00")],
                   ["event_id", "user_id", "ts"]).withColumn(
        "v", F.when(F.col("event_id") == 100, F.lit(7.0)))
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    payload_cols=["event_id", "v"])
    row = out.collect()[0]
    assert row["right_event_id"] == 101
    assert row["right_v"] is None  # 101's own NULL v, not 100's 7.0


def test_asof_accepts_ntz_timestamps(spark):
    left = _ts_df(spark, [(1, 10, "2024-01-01 00:10:00")],
                  ["event_id", "user_id", "ts"], ntz=True)
    right = _ts_df(spark, [(100, 10, "2024-01-01 00:05:00")],
                   ["event_id", "user_id", "ts"], ntz=True)
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    payload_cols=["event_id"])
    assert _asof_pairs(out)[1][0] == 100


def test_range_join_boundaries_half_open(spark):
    """Interval (lower, upper] in µs on right_ts - left_ts: a right row
    exactly AT the left ts is included (gap 0 = upper), one exactly
    window-width earlier is excluded (gap = lower is open)."""
    left = _ts_df(spark, [(1, 10, "2024-01-01 00:10:00")],
                  ["event_id", "user_id", "ts"])
    right = _ts_df(spark, [(10, "2024-01-01 00:10:00"),   # gap 0 → in
                           (10, "2024-01-01 00:00:00"),   # gap -600s → out
                           (10, "2024-01-01 00:00:00.000001"),  # just in
                           (10, "2024-01-01 00:10:00.000001"),  # future → out
                           (99, "2024-01-01 00:09:00")],  # other key → out
                   ["user_id", "ts"])
    pairs = range_join_binned(left, right, on="user_id", left_ts="ts",
                              right_ts="ts", lower_s=-600, upper_s=0)
    got = sorted(r["right_ts_us"] - r["left_ts_us"] for r in pairs.collect())
    assert got == [-599_999_999, 0]


def test_range_join_crosses_bucket_boundary(spark):
    """A match whose right row falls in the PRECEDING bucket of the
    left row's interval start must still be found (the 2-candidate
    explode covers it)."""
    # width 600s buckets; left at 00:19:59 → interval [00:09:59, 00:19:59]
    # spans buckets floor(599/600)=0 and 1 — right row at 00:10:30 is in
    # bucket 1, right row at 00:09:59.5 in bucket 0.
    left = _ts_df(spark, [(1, 10, "2024-01-01 00:19:59")],
                  ["event_id", "user_id", "ts"])
    right = _ts_df(spark, [(10, "2024-01-01 00:10:30"),
                           (10, "2024-01-01 00:09:59.5")],
                   ["user_id", "ts"])
    pairs = range_join_binned(left, right, on="user_id", left_ts="ts",
                              right_ts="ts", lower_s=-600, upper_s=0)
    assert pairs.count() == 2


def test_range_join_no_duplicate_pairs_from_candidate_buckets(spark):
    """Each true match must appear exactly once even though the left
    side emits two candidate buckets."""
    left = _ts_df(spark, [(1, 10, "2024-01-01 00:10:00")],
                  ["event_id", "user_id", "ts"])
    right = _ts_df(spark, [(10, "2024-01-01 00:05:00")], ["user_id", "ts"])
    pairs = range_join_binned(left, right, on="user_id", left_ts="ts",
                              right_ts="ts", lower_s=-600, upper_s=0)
    assert pairs.count() == 1
