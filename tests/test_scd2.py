"""scd2_history semantics: run collapsing, null attrs, ties, open
intervals. The graded 'scd2' leg of op40_window_suite covers the
cross-engine hash; these pin the operator's edge behavior directly."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators.relational import scd2_history


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k string, a string, ts timestamp, id long")
    out = scd2_history(df, key="k", attr="a", ts="ts", order_cols=["ts", "id"])
    return sorted(
        (
            (r.k, r.a, r.valid_from, r.valid_to, r.version, r.is_current)
            for r in out.collect()
        ),
        key=lambda t: (t[0], t[4]),  # (key, version) — unique, None-safe
    )


def test_consecutive_runs_collapse_and_intervals_chain(spark):
    rows = [
        ("u", "A", _ts("2024-01-01T00:00:00"), 1),
        ("u", "A", _ts("2024-01-02T00:00:00"), 2),  # same run — no version
        ("u", "B", _ts("2024-01-03T00:00:00"), 3),
        ("u", "A", _ts("2024-01-04T00:00:00"), 4),  # A again = NEW version
    ]
    got = _run(spark, rows)
    assert got == [
        ("u", "A", _ts("2024-01-01T00:00:00"), _ts("2024-01-03T00:00:00"), 1, False),
        ("u", "B", _ts("2024-01-03T00:00:00"), _ts("2024-01-04T00:00:00"), 2, False),
        ("u", "A", _ts("2024-01-04T00:00:00"), None, 3, True),
    ]


def test_single_row_key_is_current_version_one(spark):
    got = _run(spark, [("u", "X", _ts("2024-06-01T12:00:00"), 1)])
    assert got == [("u", "X", _ts("2024-06-01T12:00:00"), None, 1, True)]


def test_null_attr_is_a_distinct_version(spark):
    rows = [
        ("u", None, _ts("2024-01-01T00:00:00"), 1),
        ("u", None, _ts("2024-01-02T00:00:00"), 2),  # same null run
        ("u", "A", _ts("2024-01-03T00:00:00"), 3),
        ("u", None, _ts("2024-01-04T00:00:00"), 4),
    ]
    got = _run(spark, rows)
    assert [(g[1], g[4], g[5]) for g in got] == [
        (None, 1, False),
        ("A", 2, False),
        (None, 3, True),
    ]


def test_equal_timestamps_resolved_by_tiebreak_id(spark):
    t = _ts("2024-01-01T00:00:00")
    rows = [("u", "B", t, 2), ("u", "A", t, 1)]  # id orders A before B
    got = _run(spark, rows)
    assert [(g[1], g[4], g[5]) for g in got] == [("A", 1, False), ("B", 2, True)]


def test_keys_are_independent(spark):
    rows = [
        ("u1", "A", _ts("2024-01-01T00:00:00"), 1),
        ("u2", "A", _ts("2024-01-02T00:00:00"), 2),
    ]
    got = _run(spark, rows)
    assert all(g[4] == 1 and g[5] is True for g in got) and len(got) == 2


def test_partitioning_invariance(spark):
    rows = [
        ("u", chr(65 + (i * 7) % 3), _ts("2024-01-01T00:00:00")
         + dt.timedelta(hours=i), i)
        for i in range(50)
    ]
    df1 = spark.createDataFrame(rows, "k string, a string, ts timestamp, id long")
    a = scd2_history(df1, "k", "a", "ts", ["ts", "id"]).collect()
    b = scd2_history(
        df1.repartition(7, F.col("id")), "k", "a", "ts", ["ts", "id"]
    ).collect()
    key = lambda r: (r.k, r.version)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len({key(r) for r in a}) == len(a)
