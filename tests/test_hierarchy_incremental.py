"""Incremental closure maintenance (operators/hierarchy.py
closure_insert_edges) — the nightly-terminology-sync shape: new IS-A
edges arrive, the materialized closure updates in O(affected pairs)
instead of a full path-doubling rebuild. The acceptance bar is
row-set equality INCLUDING min_depth against the full rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators import hierarchy as H
from project_clinical_data_etl_pipeline_spark.tables import load


def _rows(df):
    return sorted(
        (r["descendant_id"], r["ancestor_id"], r["min_depth"])
        for r in df.collect()
    )


def _edges(spark, rows):
    return spark.createDataFrame(rows, "child_id bigint, parent_id bigint")


def test_insert_equals_full_rebuild_on_real_hierarchy(spark, sf_dir):
    """Drop a 10% slice of the graded binary-tree hierarchy's edges,
    build the closure on the rest, insert the slice incrementally —
    must equal the full rebuild exactly (pairs AND min_depth)."""
    c = load(spark, sf_dir, "customer")
    edges = c.filter(F.col("c_custkey") >= 2).select(
        F.col("c_custkey").alias("child_id"),
        (F.col("c_custkey") / 2).cast("bigint").alias("parent_id"),
    )
    new = edges.filter(F.col("child_id") % 10 == 3)
    old = edges.filter(F.col("child_id") % 10 != 3)
    assert new.count() > 0 and old.count() > 0
    inc = H.closure_insert_edges(H.transitive_closure(old), new)
    full = H.transitive_closure(edges)
    assert _rows(inc) == _rows(full)


def test_insert_shortcut_shortens_min_depth(spark):
    """A new edge that SHORTENS an existing pair must update min_depth
    (the min-merge case, not just new-pair discovery)."""
    old = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    base = H.transitive_closure(old)
    assert (1, 4, 3) in _rows(base)
    inc = H.closure_insert_edges(base, _edges(spark, [(1, 4)]))
    rows = _rows(inc)
    assert (1, 4, 1) in rows          # shortened
    assert (1, 3, 2) in rows          # untouched pair keeps its depth
    assert _rows(inc) == _rows(
        H.transitive_closure(_edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)]))
    )


def test_insert_path_through_multiple_new_edges(spark):
    """Paths that traverse SEVERAL new edges require the delta×delta
    composition rounds: three old chain fragments bridged by two new
    edges — the end-to-end pair exists only through both."""
    old = _edges(spark, [(1, 2), (3, 4), (5, 6)])
    new = _edges(spark, [(2, 3), (4, 5)])
    inc = H.closure_insert_edges(H.transitive_closure(old), new)
    rows = _rows(inc)
    assert (1, 6, 5) in rows
    assert _rows(inc) == _rows(
        H.transitive_closure(
            _edges(spark, [(1, 2), (3, 4), (5, 6), (2, 3), (4, 5)])
        )
    )


def test_insert_depth_improves_after_pair_set_stabilizes(spark):
    """Regression (round-12 advice): delta segments are heterogeneous
    in depth, so the composed relation can keep SHORTENING min_depth
    after its pair SET stabilizes — a fixpoint break on pair count
    alone returned (0, 8, 4) here where the rebuild says (0, 8, 3).
    The break must witness depths too (count, Σ min_depth)."""
    old = _edges(spark, [(0, 1), (1, 4), (2, 7), (3, 4), (4, 5), (6, 7), (7, 8)])
    new = _edges(spark, [(0, 4), (0, 5), (4, 6), (6, 8)])
    inc = H.closure_insert_edges(H.transitive_closure(old), new)
    rows = _rows(inc)
    assert (0, 8, 3) in rows
    assert _rows(inc) == _rows(
        H.transitive_closure(
            _edges(
                spark,
                [(0, 1), (1, 4), (2, 7), (3, 4), (4, 5), (6, 7), (7, 8),
                 (0, 4), (0, 5), (4, 6), (6, 8)],
            )
        )
    )


def test_insert_into_empty_delta_regions(spark):
    """New edges disconnected from the old graph: the seed joins find
    no old extensions and the delta is just the new edges' own
    closure."""
    old = _edges(spark, [(1, 2)])
    new = _edges(spark, [(10, 11), (11, 12)])
    inc = H.closure_insert_edges(H.transitive_closure(old), new)
    assert _rows(inc) == _rows(
        H.transitive_closure(_edges(spark, [(1, 2), (10, 11), (11, 12)]))
    )
