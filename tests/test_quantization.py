"""PQ (operators.quantization) gates: recall floor vs brute force on
the synthetic embeddings, perfect recall on clusterable data, code
shape/compression contract, determinism, and the map-only plan shapes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators import quantization as Q
from project_clinical_data_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
)
from project_clinical_data_etl_pipeline_spark.tables import load

M, KS, DIM = 32, 16, 64


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def codebooks(corpus):
    return Q.pq_train(corpus, dim=DIM, m=M, ks=KS, n_iter=3)


def test_pq_code_shape_and_compression(corpus, codebooks):
    enc = Q.pq_encode(corpus, codebooks)
    rows = enc.select("vec_id", "pq_code").collect()
    assert len(rows) == corpus.count()
    for r in rows:
        code = r["pq_code"]
        assert len(code) == M  # m codes per vector …
        assert all(0 <= c < KS for c in code)  # … each in [0, ks)
    # the stored index is (id, code): m * ceil(log2 ks) bits = 16 B
    # vs dim * 4 B floats = 256 B — a 16x scan-IO reduction
    assert M * 4 / 8 < DIM * 4 / 4


def test_pq_recall_floor_vs_brute(spark, corpus, codebooks):
    q = corpus.filter(F.col("vec_id") < 8)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, corpus, k=5, dim=DIM).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in Q.pq_topk(q, Q.pq_encode(corpus, codebooks), codebooks,
                           k=5, dim=DIM).collect()
    }
    recall = len(pq & brute) / len(brute)
    # deterministic data + deterministic training → exact value; the
    # floor documents what random-ish synthetic vectors (PQ's worst
    # case — no subspace structure) still achieve
    assert recall >= 0.5, f"PQ recall@5 {recall:.3f}"


def test_pq_cluster_structure_preserved(spark):
    """Vectors drawn from a few distinct prototypes: PQ quantizes away
    the intra-cluster noise BY DESIGN (all members of a cluster
    reconstruct to the same codeword), so the correct guarantees are
    (a) every retrieved neighbor belongs to the query's own cluster and
    (b) reconstruction is near-exact (cosine ≈ 1 with the original)."""
    import random

    rng = random.Random(7)
    protos = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(4)]
    rows = [
        (i, [x + 0.001 * rng.uniform(-1, 1) for x in protos[i % 4]])
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    books = Q.pq_train(df, dim=16, m=4, ks=4, n_iter=4)
    enc = Q.pq_encode(df, books)
    q = df.filter(F.col("vec_id") < 4)
    for r in Q.pq_topk(q, enc, books, k=5, dim=16).collect():
        assert r["neighbor_id"] % 4 == r["query_id"] % 4, r

    from project_clinical_data_etl_pipeline_spark.operators.similarity import (
        cosine,
    )

    decoded = enc.select(
        F.col("embedding"),
        Q.pq_reconstruct_expr(books).alias("__rec"),
    )
    fid = decoded.select(
        F.min(cosine(F.col("embedding"), F.col("__rec"))).alias("worst")
    ).first()["worst"]
    assert fid > 0.999, f"worst reconstruction cosine {fid}"


def test_pq_training_is_deterministic(corpus):
    again = Q.pq_train(corpus, dim=DIM, m=M, ks=KS, n_iter=3)
    base = Q.pq_train(corpus, dim=DIM, m=M, ks=KS, n_iter=3)
    assert base == again


def test_pq_encode_plan_is_map_only(corpus, codebooks):
    enc = Q.pq_encode(corpus, codebooks).select("vec_id", "pq_code")
    plan = enc._jdf.queryExecution().executedPlan().toString()
    for op in ("Exchange", "Join", "BatchEvalPython", "Sort"):
        assert op not in plan, f"PQ encode plan grew a {op}"


def test_pq_scoring_reads_codes_not_vectors(spark, corpus, codebooks, tmp_path):
    """The ADC scan side must read only (id, pq_code) — write the
    encoded index to parquet and assert the scoring scan's ReadSchema
    carries the 16-byte codes, not the 256-byte embeddings."""
    path = str(tmp_path / "pq_index")
    Q.pq_encode(corpus, codebooks).select("vec_id", "pq_code").write.mode(
        "overwrite"
    ).parquet(path)
    index = spark.read.parquet(path)
    q = corpus.filter(F.col("vec_id") < 2)
    out = Q.pq_topk(q, index, codebooks, k=5, dim=DIM)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the index-side scan must read codes only (display paths are
    # truncated, so match on ReadSchema)
    schemas = [
        seg.split("ReadSchema: ")[1].split("\n")[0]
        for seg in plan.split("FileScan")[1:]
        if "ReadSchema: " in seg
    ]
    index_scans = [s for s in schemas if "pq_code" in s]
    assert index_scans, plan
    assert all("embedding" not in s for s in index_scans), index_scans


def test_pq_train_validates_inputs(corpus):
    with pytest.raises(ValueError):
        Q.pq_train(corpus, dim=DIM, m=7, ks=KS)  # 64 % 7 != 0
    with pytest.raises(ValueError):
        Q.pq_train(corpus.limit(3), dim=DIM, m=M, ks=KS)  # < ks seeds


def test_ivfpq_recall_and_candidate_pruning(spark, corpus, codebooks):
    """IVF+PQ: the composed index (coarse cell + fine codes, one map
    pass) must (a) hold a recall floor vs brute force and (b) score
    only the probed cells — candidate volume strictly below the full
    corpus for n_probe < n_centroids."""
    from project_clinical_data_etl_pipeline_spark.operators.similarity import (
        kmeans_centroids,
    )

    cents = kmeans_centroids(corpus, dim=DIM, n_centroids=8, n_iter=2,
                             round_dp=6)
    index = Q.ivfpq_index(corpus, cents, codebooks, dim=DIM)
    q = corpus.filter(F.col("vec_id") < 8)
    out = Q.ivfpq_topk(q, index, cents, codebooks, dim=DIM, k=5, n_probe=4)
    got = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, corpus, k=5, dim=DIM).collect()
    }
    recall = len(got & brute) / len(brute)
    # compounded approximation (cell pruning x quantization): the floor
    # is deterministic on this data, below the PQ-only floor by design
    assert recall >= 0.4, f"IVF+PQ recall@5 {recall:.3f}"

    # pruning: probing 4/8 cells must scan fewer candidates than the
    # corpus (per query) — check via the per-query candidate counts
    probed_cells = 4
    cells = index.groupBy("cell").count().collect()
    total = sum(r["count"] for r in cells)
    max_probe_sum = sum(
        sorted((r["count"] for r in cells), reverse=True)[:probed_cells]
    )
    assert max_probe_sum < total


def test_residual_ivfpq_beats_raw_on_clustered_data(spark):
    """Residual-mode IVF+PQ (codes quantize x − centroid[cell], the
    faiss recipe proper) must clearly beat raw-vector codes at the SAME
    code budget when the corpus is clustered: raw codebooks span the
    whole space while residual codebooks only span the (tighter)
    within-cell spread. Deterministic corpus/training → exact values
    (measured: residual 0.525 vs raw 0.175 recall@5 here)."""
    import random

    from project_clinical_data_etl_pipeline_spark.operators.similarity import (
        kmeans_centroids,
    )

    rng = random.Random(11)
    protos = [[rng.uniform(-1, 1) for _ in range(32)] for _ in range(8)]
    rows = [
        (i, [x + 0.25 * rng.uniform(-1, 1) for x in protos[i % 8]])
        for i in range(256)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = df.filter(F.col("vec_id") < 8)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, df, k=5, dim=32).collect()
    }
    cents = kmeans_centroids(df, dim=32, n_centroids=8, n_iter=3, round_dp=6)

    books_raw = Q.pq_train(df, dim=32, m=8, ks=8, n_iter=3)
    raw = {
        (r["query_id"], r["neighbor_id"])
        for r in Q.ivfpq_topk(
            q, Q.ivfpq_index(df, cents, books_raw, dim=32),
            cents, books_raw, dim=32, k=5, n_probe=3,
        ).collect()
    }
    res_vecs = Q.ivf_residuals(df, cents, dim=32)
    books_res = Q.pq_train(res_vecs, dim=32, vec_col="__res", m=8, ks=8,
                           n_iter=3)
    res = {
        (r["query_id"], r["neighbor_id"])
        for r in Q.ivfpq_topk_residual(
            q, Q.ivfpq_index_residual(df, cents, books_res, dim=32),
            cents, books_res, dim=32, k=5, n_probe=3,
        ).collect()
    }
    raw_recall = len(raw & brute) / len(brute)
    res_recall = len(res & brute) / len(brute)
    assert res_recall >= raw_recall + 0.2, (raw_recall, res_recall)
    assert res_recall >= 0.5, res_recall


def _py_pq_train(vecs_by_id, dim, m, ks, n_iter, round_dp=6):
    """Standalone bit-exact Python mirror of Q.pq_train: same min-id
    seeds, same fold orders (0.0-seeded left-assoc dots, ||c||^2 - 2xc
    distances, (distance, id) argmin), same DECIMAL(28,10)-per-value
    sums (Decimal(repr(v)) — Spark's double->DECIMAL cast rounds the
    shortest-repr decimal), same double division and HALF_UP rounds."""
    from decimal import ROUND_HALF_UP, Decimal

    w = dim // m
    ids = sorted(vecs_by_id)
    seeds = [vecs_by_id[i] for i in ids[:ks]]
    books = [[seeds[c][s * w:(s + 1) * w] for c in range(ks)] for s in range(m)]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def q10(x):
        return Decimal(repr(x)).quantize(Decimal("1e-10"), ROUND_HALF_UP)

    def rdp(x):
        return float(
            Decimal(repr(x)).quantize(Decimal(1).scaleb(-round_dp),
                                      ROUND_HALF_UP)
        )

    for _ in range(n_iter):
        sums: dict[tuple[int, int, int], Decimal] = {}
        counts: dict[tuple[int, int], int] = {}
        for i in ids:
            v = vecs_by_id[i]
            for s in range(m):
                sub = v[s * w:(s + 1) * w]
                best = min(
                    range(ks),
                    key=lambda c: (dot(books[s][c], books[s][c])
                                   - 2.0 * dot(sub, books[s][c]), c),
                )
                counts[(s, best)] = counts.get((s, best), 0) + 1
                for idx, val in enumerate(sub):
                    key = (s, best, idx)
                    sums[key] = sums.get(key, Decimal(0)) + q10(val)
        books = [
            [
                [
                    rdp(float(sums[(s, c, idx)]) / counts[(s, c)])
                    for idx in range(w)
                ]
                if (s, c) in counts
                else books[s][c]
                for c in range(ks)
            ]
            for s in range(m)
        ]
    return books


def test_pq_train_matches_python_oracle_bit_exact(spark, corpus, codebooks):
    """The fused Spark training (posexplode + one aggregate per Lloyd
    iteration) must equal the sequential Python mirror EXACTLY — the
    gold-standard proof that the distributed plan computes the same
    algorithm (argmin fold orders, decimal sums, rounds) with zero
    partitioning sensitivity."""
    rows = corpus.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    expect = _py_pq_train(vecs, DIM, M, KS, n_iter=3)
    assert codebooks == expect


def test_persisted_ivfpq_index_prunes_buckets_and_matches_direct(
    spark, corpus, codebooks, tmp_path
):
    """The persisted bucketed IVF+PQ index must return exactly the
    in-memory composition's results, scan codes-not-vectors, and prune
    to the probed cells' buckets (SelectedBucketsCount < total)."""
    from project_clinical_data_etl_pipeline_spark.operators.similarity import (
        kmeans_centroids,
    )

    cents = kmeans_centroids(corpus, dim=DIM, n_centroids=8, n_iter=2,
                             round_dp=6)
    table = "ivfpq_index_test"
    Q.persist_ivfpq_index(spark, corpus, table, cents, codebooks, dim=DIM)
    try:
        q = corpus.filter(F.col("vec_id") < 8)
        direct = Q.ivfpq_topk(
            q, Q.ivfpq_index(corpus, cents, codebooks, dim=DIM),
            cents, codebooks, dim=DIM, k=5, n_probe=4,
        )
        persisted = Q.ivfpq_topk(
            q, spark.table(table), cents, codebooks, dim=DIM, k=5, n_probe=4
        )
        assert sorted(map(tuple, direct.collect())) == sorted(
            map(tuple, persisted.collect())
        )
        plan = persisted._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in plan, plan
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) < int(m.group(2)), m.group(0)
        # the BUCKETED scan itself reads codes, never raw vectors
        # (scope to the FileScan segment that carries the bucket count)
        seg = next(
            s for s in plan.split("FileScan") if "SelectedBucketsCount" in s
        )
        schema = seg[seg.index("ReadSchema: "):].split("\n")[0]
        assert "pq_code" in schema and "embedding" not in schema, schema
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_pq_rerank_recovers_exact_scores_and_beats_raw_adc(
    spark, corpus, codebooks
):
    """The re-rank stage's contract: every returned cosine must be the
    EXACT cosine (bit-equal to brute force for the same pair), and
    recall@5 must dominate raw ADC's — the whole point of the serving
    mode."""
    q = corpus.filter(F.col("vec_id") < 8)
    enc = Q.pq_encode(corpus, codebooks).select("vec_id", "pq_code")
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(q, corpus, k=5, dim=DIM).collect()
    }
    rer = Q.pq_topk_rerank(
        q, enc, corpus, codebooks, k=5, shortlist=64, dim=DIM
    ).collect()
    raw = {
        (r["query_id"], r["neighbor_id"])
        for r in Q.pq_topk(q, enc, codebooks, k=5, dim=DIM).collect()
    }
    got = {(r["query_id"], r["neighbor_id"]) for r in rer}
    recall_rerank = len(got & set(brute)) / len(brute)
    recall_raw = len(raw & set(brute)) / len(brute)
    assert recall_rerank >= recall_raw
    assert recall_rerank >= 0.8
    # exactness: any re-ranked pair that IS a true top-5 pair carries
    # the bit-identical exact cosine (same unrolled dot, same norms)
    for r in rer:
        key = (r["query_id"], r["neighbor_id"])
        if key in brute:
            assert r["cosine"] == brute[key], key


def test_ivfpq_rerank_tracks_ivf_recall(spark, corpus, codebooks):
    """ivfpq_topk_rerank with a generous shortlist must recover
    (at least) raw IVF+PQ's recall — the ADC quantization loss is
    undone by the exact re-rank, leaving only the cell-probe bound."""
    from project_clinical_data_etl_pipeline_spark.operators.similarity import (
        kmeans_centroids,
    )

    cents = kmeans_centroids(corpus, dim=DIM, n_centroids=8, n_iter=2,
                             round_dp=6)
    index = Q.ivfpq_index(corpus, cents, codebooks, dim=DIM)
    q = corpus.filter(F.col("vec_id") < 8)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, corpus, k=5, dim=DIM).collect()
    }
    raw = {
        (r["query_id"], r["neighbor_id"])
        for r in Q.ivfpq_topk(
            q, index, cents, codebooks, dim=DIM, k=5, n_probe=4
        ).collect()
    }
    rer = {
        (r["query_id"], r["neighbor_id"])
        for r in Q.ivfpq_topk_rerank(
            q, index, corpus, cents, codebooks, dim=DIM, k=5, n_probe=4,
            shortlist=64,
        ).collect()
    }
    recall_rer = len(rer & brute) / len(brute)
    recall_raw = len(raw & brute) / len(brute)
    assert recall_rer >= recall_raw
    assert recall_rer >= 0.4


def test_probe_collect_budget_fallback_matches_fast_path(
    spark, corpus, codebooks, monkeypatch
):
    """Round-14 probe-collect guard: shrinking _PROBE_COLLECT_SCALARS
    below the probe frame's size must flip _collect_probes to the
    lazy-checkpoint fallback (no query vectors on the driver) with
    IDENTICAL top-k results."""
    from project_clinical_data_etl_pipeline_spark.operators.similarity import (
        kmeans_centroids,
    )

    cents = kmeans_centroids(corpus, dim=DIM, n_centroids=8, n_iter=2,
                             round_dp=6)
    index = Q.ivfpq_index(corpus, cents, codebooks, dim=DIM)
    q = corpus.filter(F.col("vec_id") < 8)

    def run():
        return {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in Q.ivfpq_topk(
                q, index, cents, codebooks, dim=DIM, k=5, n_probe=4
            ).collect()
        }

    fast = run()
    # 8 queries x 4 probes x dim floats >> 1 scalar → fallback fires
    monkeypatch.setattr(Q, "_PROBE_COLLECT_SCALARS", 1)
    assert run() == fast and len(fast) > 0
