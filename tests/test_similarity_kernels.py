"""Kernel-equivalence gates for Voronoi cell assignment
(operators.similarity.cell_assign): the Arrow kernel must be
BIT-IDENTICAL to the literal-expression kernel it bounds the plan cost
of — same cell ids, same tie behavior — and the 'auto' switch must keep
graded-scale centroid sets all-JVM while corpus-scale k (SemDeDup's
k = sqrt(n)) takes the O(1)-plan Arrow path.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators import similarity as S
from project_clinical_data_etl_pipeline_spark.tables import load

DIM = 64


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.col("embedding").alias("__v"),
        S.norm(F.col("embedding"), DIM).alias("__n"),
    )


@pytest.fixture(scope="module")
def centroids(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return S.kmeans_centroids(e, dim=DIM, n_iter=2, round_dp=6)


def _assign(vecs, cents, kernel):
    return {
        r["vec_id"]: r["c"]
        for r in vecs.select(
            "vec_id", S.cell_assign("__v", "__n", cents, DIM, kernel=kernel).alias("c")
        ).collect()
    }


def test_arrow_assignment_matches_expr(vecs, centroids):
    assert _assign(vecs, centroids, "arrow") == _assign(vecs, centroids, "expr")


def test_tie_goes_to_lowest_id_in_both_kernels(vecs, centroids):
    dup = [centroids[0], centroids[0], centroids[1]]
    a = _assign(vecs, dup, "expr")
    b = _assign(vecs, dup, "arrow")
    assert a == b
    assert 1 not in set(a.values())  # duplicate centroid never wins


def test_auto_switch_on_centroid_scalars(vecs, centroids):
    small = vecs.select(S.cell_assign("__v", "__n", centroids, DIM).alias("c"))
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # graded k stays all-JVM

    big_k = S._ASSIGN_EXPR_MAX_SCALARS // DIM + 1
    big_cents = [
        [((i * 31 + j * 7) % 101) / 101.0 + 0.01 for j in range(DIM)]
        for i in range(big_k)
    ]
    big = vecs.select(S.cell_assign("__v", "__n", big_cents, DIM).alias("c"))
    bplan = big._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in bplan
    assert "BatchEvalPython" not in bplan
    with pytest.raises(ValueError):
        S.cell_assign("__v", "__n", centroids, DIM, kernel="simd")


def test_large_k_assignment_bounded_and_correct(vecs):
    """SemDeDup-scale k: assignment over k=256 centroids (16384 scalars
    — past the literal-expression bound) must run through the Arrow
    kernel in bounded wall time AND agree with the expression kernel on
    a sample (the expr side pays its analysis cost once, here)."""
    k = 256
    cents = [
        [((i * 131 + j * 17) % 997) / 997.0 + 0.001 for j in range(DIM)]
        for i in range(k)
    ]
    sample = vecs.filter(F.col("vec_id") < 64)
    t0 = time.time()
    via_auto = _assign(sample, cents, "auto")
    elapsed = time.time() - t0
    assert elapsed < 30, f"k=256 arrow assignment took {elapsed:.1f}s"
    via_expr = _assign(sample, cents, "expr")
    assert via_auto == via_expr
