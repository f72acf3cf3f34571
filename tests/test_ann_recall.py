"""ANN retrieval-quality gate: the approximate indexes must actually
FIND the true neighbors, not merely match an oracle that re-derives the
same buckets/cells (which would pass even at zero recall — exactly how
the original single-table LSH shipped with recall@5 = 0.0).

recall@5 = |approx top-5 ∩ exact top-5| / 5, averaged over the 8 query
vectors, against the brute-force baseline on the same corpus. Floors
are set from measured margins (LSH ≈ 0.62-0.75, IVF ≈ 0.925 across
SFs): a regression in hyperplane/centroid/probe logic trips them while
normal float jitter cannot (both sides are deterministic).
"""

from __future__ import annotations

import pytest

from project_clinical_data_etl_pipeline_spark.queries import REGISTRY

#: (query name, minimum mean recall@5 vs brute force)
_FLOORS = [
    ("embed_topk_lsh", 0.6),
    ("embed_topk_ivf", 0.8),
]


def _topk_sets(spark, sf_dir, name):
    out: dict[int, set[int]] = {}
    for r in REGISTRY[name].run(spark, sf_dir).collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


@pytest.fixture(scope="module")
def exact_topk(spark, sf_dir):
    return _topk_sets(spark, sf_dir, "embed_topk_bruteforce")


@pytest.mark.parametrize("name,floor", _FLOORS)
def test_ann_recall_at_5_meets_floor(spark, sf_dir, exact_topk, name, floor):
    approx = _topk_sets(spark, sf_dir, name)
    recalls = [
        len(approx.get(q, set()) & truth) / len(truth)
        for q, truth in exact_topk.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= floor, (
        f"{name} mean recall@5 {mean_recall:.3f} < floor {floor}; "
        f"per-query: {[round(r, 2) for r in recalls]}"
    )


def test_approx_indexes_return_all_queries(spark, sf_dir, exact_topk):
    """Every query vector must get k results from each index — an index
    that silently drops a query would skew mean recall upward."""
    for name, _ in _FLOORS:
        approx = _topk_sets(spark, sf_dir, name)
        assert set(approx) == set(exact_topk), name
        for q, s in approx.items():
            assert len(s) == 5, f"{name} query {q} returned {len(s)} < 5"
