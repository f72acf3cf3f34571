"""operators.dedup.edit_distance_pairs: brute-force oracle equality,
length-band losslessness, and the no-nested-loop plan guarantee."""

from __future__ import annotations

import pytest

from project_clinical_data_etl_pipeline_spark.operators.dedup import (
    edit_distance_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("max_dist", [1, 3])
def test_matches_bruteforce(spark, max_dist):
    names = [
        "red widget", "blue widget", "red widgets", "red gadget",
        "bolt", "bolts", "volt", "completely different thing", "",
        "a", "ab", "abc",
    ]
    rows = [(i, names[i % len(names)]) for i in range(40)]
    df = spark.createDataFrame(rows, "pid long, name string")
    got = {
        (r.val_a, r.val_b, r.dist)
        for r in edit_distance_pairs(df, "pid", "name", max_dist).collect()
    }
    uniq = sorted(set(names))
    want = {
        (a, b, _lev(a, b))
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if _lev(a, b) <= max_dist
    }
    assert got == want


def test_counts_and_min_ids(spark):
    rows = [(3, "bolt"), (1, "bolt"), (2, "bolts"), (9, "bolts"), (5, "bolts")]
    df = spark.createDataFrame(rows, "pid long, name string")
    out = edit_distance_pairs(df, "pid", "name", 1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.val_a, r.val_b) == ("bolt", "bolts")
    assert (r.n_a, r.n_b) == (2, 3)
    assert (r.min_id_a, r.min_id_b) == (1, 2)
    assert r.dist == 1 and abs(r.sim - (1.0 - 1.0 / 5.0)) < 1e-15


def test_plan_has_no_nested_loop(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "pid long, name string")
    plan = (
        edit_distance_pairs(df, "pid", "name", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
