"""Product quantization (PQ) for embedding compression — the
faiss-style IVF+PQ scale recipe's second half, completing the
similarity stack (``operators.similarity``: brute / LSH / IVF).

PQ splits a ``dim``-dimensional vector into ``m`` contiguous subspaces
and vector-quantizes each against its own ``ks``-entry codebook, so a
vector stores as ``m`` small codes (m bytes for ks ≤ 256) instead of
``dim`` floats — a 32× storage/scan-IO compression at dim=64/m=8.
Retrieval scores queries against the RECONSTRUCTED vectors
(asymmetric distance computation by codebook lookup), trading recall
for a corpus scan that reads codes, not floats.

Scale shapes, all reusing the proven kmeans/classifier patterns:

- **Training** is FUSED across subspaces: each Lloyd iteration is one
  map pass (``m`` inlined-literal L2 argmins) + ONE aggregate over
  (subspace, cell, element) — a single shuffle per iteration no matter
  how many subspaces; ``m·ks·(dim/m) = ks·dim`` scalars reach the
  driver per iteration (the kmeans-centroid-pull pattern).
- **Encoding** is a pure map pass: the codebooks are codegen literals,
  each subspace an argmin expression — no join, no Exchange.
- **Reconstruction/scoring** is map-side codebook lookup
  (``element_at`` on literal arrays) feeding the existing unrolled-dot
  scorer — the plan shape of brute-force top-k, but the scan side
  needs only (id, pq_code).

Determinism mirrors ``similarity.kmeans_centroids``: DECIMAL-exact
means, optional per-iteration rounding, min-id seeds, lowest-id
tiebreaks — so a bit-exact Python oracle (tests) reproduces training,
encoding, and reconstruction end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _col_sql, _dot_lit_sql, _lit_double


def _fold_sq_norm(vec: list[float]) -> float:
    """Driver-side ||v||² with the engines' fold order (0.0 seed,
    index order)."""
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return acc


def _slice_ref(vec_ref: str, start0: int, width: int) -> str:
    """1-based slice of the vector column as a SQL fragment."""
    return f"slice({vec_ref}, {start0 + 1}, {width})"


def l2_argmin_expr(sub_ref: str, centroids: list[list[float]]) -> str:
    """MAP-SIDE L2 argmin against literal centroids (ties → lowest id):
    argmin_c ||x−c||² = argmin_c (c·c − 2·x·c) — the x·x term is
    constant per row and dropped. Same named_struct/array_sort argmin
    as similarity.cell_assign_expr, with the squared-norm trick so each
    centroid costs one literal dot."""
    entries = []
    for i, c in enumerate(centroids):
        d = (
            f"({_lit_double(_fold_sq_norm(c))} - "
            f"(CAST(2 AS DOUBLE) * {_dot_lit_sql(sub_ref, c)}))"
        )
        entries.append(f"named_struct('s', {d}, 'i', {i}L)")
    return f"element_at(array_sort(array({', '.join(entries)})), 1).i"


def pq_train(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
    n_iter: int = 2,
    round_dp: int | None = 6,
) -> list[list[list[float]]]:
    """Train ``m`` subspace codebooks of ``ks`` centroids each (L2
    Lloyd iterations). Returns ``codebooks[s][c] = centroid vector of
    length dim/m``.

    Seeds are the ``ks`` min-id vectors' subvectors (deterministic).
    Each iteration: one map pass assigning all ``m`` subspaces
    (inlined-literal argmins), ONE aggregate over (subspace, cell,
    element) with DECIMAL-exact means — a single shuffle regardless of
    ``m``; empty cells keep their previous centroid.
    """
    if dim % m:
        raise ValueError(f"dim ({dim}) must divide evenly into m ({m}) subspaces")
    w = dim // m
    seed_rows = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(ks)
        .select(F.col(vec_col))
        .collect()
    )
    if len(seed_rows) < ks:
        raise ValueError(f"corpus has fewer than ks={ks} vectors")
    seeds = [[float(x) for x in r[0]] for r in seed_rows]
    codebooks = [
        [seeds[c][s * w : (s + 1) * w] for c in range(ks)] for s in range(m)
    ]

    # each Lloyd iteration re-reads the vector projection: materialize
    # once (at warehouse scale: .persist() before training)
    vecs = corpus.select(F.col(vec_col).alias("__v")).localCheckpoint(
        eager=False
    )
    ref = _col_sql("__v")
    from .similarity import DECIMAL_MEAN_SQL

    mean_sql = DECIMAL_MEAN_SQL
    if round_dp is not None:
        mean_sql = f"round({mean_sql}, {round_dp})"
    for _ in range(n_iter):
        # one row per (subspace, cell, element): posexplode the m
        # subspace structs, then the subvector elements — pure fan-out,
        # then ONE partial-combined aggregate.
        subs = ", ".join(
            f"named_struct('cell', {l2_argmin_expr(_slice_ref(ref, s * w, w), codebooks[s])}, "
            f"'sv', {_slice_ref(ref, s * w, w)})"
            for s in range(m)
        )
        assigned = vecs.select(
            F.posexplode(F.expr(f"array({subs})")).alias("__sub", "__sc")
        )
        means = (
            assigned.select(
                "__sub",
                F.col("__sc.cell").alias("__cell"),
                F.posexplode(F.col("__sc.sv")).alias("__idx", "__val"),
            )
            .groupBy("__sub", "__cell", "__idx")
            .agg(F.expr(mean_sql).alias("__mv"))
        )
        updated: dict[tuple[int, int], list[float]] = {}
        for r in means.collect():
            updated.setdefault((r["__sub"], r["__cell"]), [0.0] * w)[
                r["__idx"]
            ] = r["__mv"]
        codebooks = [
            [updated.get((s, c), codebooks[s][c]) for c in range(ks)]
            for s in range(m)
        ]
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Append ``code_col``: array<bigint> of ``m`` codebook indices —
    pure map pass, codebooks inlined as codegen literals. At scale the
    (id, pq_code) projection IS the stored index: m bytes/vector."""
    m = len(codebooks)
    w = len(codebooks[0][0])
    ref = _col_sql(vec_col)
    codes = ", ".join(
        l2_argmin_expr(_slice_ref(ref, s * w, w), codebooks[s]) for s in range(m)
    )
    return df.withColumn(code_col, F.expr(f"array({codes})"))


def pq_reconstruct_expr(
    codebooks: list[list[list[float]]], code_col: str = "pq_code"
) -> Column:
    """Decoded vector (array<double>) from PQ codes: per subspace an
    ``element_at`` lookup into the literal codebook, flattened —
    map-side, no join."""
    parts = []
    for s, book in enumerate(codebooks):
        arrays = ", ".join(
            f"array({', '.join(_lit_double(x) for x in c)})" for c in book
        )
        parts.append(
            f"element_at(array({arrays}), CAST(element_at({code_col}, {s + 1}) + 1 AS INT))"
        )
    return F.expr(f"flatten(array({', '.join(parts)}))")


def pq_topk(
    queries: DataFrame,
    encoded_corpus: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric top-k: exact query vector vs RECONSTRUCTED corpus
    vectors (cosine). Plan shape = brute_force_topk (broadcast queries,
    unrolled codegen dots, per-query top-k heap) but the corpus side
    scans only (id, pq_code) — the 32× IO saving at 100 TB. Returns
    (query_id, neighbor_id, cosine, rank).
    """
    from .similarity import brute_force_topk

    decoded = encoded_corpus.select(
        F.col(id_col),
        pq_reconstruct_expr(codebooks, code_col).alias(vec_col),
    )
    return brute_force_topk(
        queries, decoded, id_col=id_col, vec_col=vec_col, k=k, dim=dim
    )


def ivfpq_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full faiss-style IVF+PQ index projection in ONE map pass:
    (neighbor_id, cell, pq_code). Coarse cell = cosine argmax vs the
    IVF centroids (similarity.cell_assign_expr); fine codes = per-
    subspace L2 argmins — all inlined literals, no join, no Exchange.
    Persist this (optionally bucketed by cell, plans.layout) and the
    serving scan reads ~24 B/vector instead of dim floats."""
    from .similarity import cell_assign_expr, norm

    coarse = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col),
        norm(F.col(vec_col), dim).alias("__n"),
    ).withColumn(
        "cell", cell_assign_expr(vec_col, "__n", centroids, dim)
    )
    return pq_encode(coarse, codebooks, vec_col=vec_col).select(
        "neighbor_id", "cell", "pq_code"
    )


def ivfpq_topk(
    queries: DataFrame,
    index: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ top-k: queries probe their ``n_probe`` nearest cells and
    score the RECONSTRUCTED vectors of those cells only — candidate
    volume ~ n_probe/n_centroids of the corpus, each candidate read as
    m codes. Same probe plan as similarity.ivf_topk (broadcast query ×
    tiny centroid set → equi-join on cell); reconstruction is map-side
    codebook lookup on the probed slice. Returns (query_id,
    neighbor_id, cosine, rank) — cosine of query vs reconstruction.
    """
    return _probe_and_score(
        queries,
        index,
        lambda df: df.withColumn("__cv", pq_reconstruct_expr(codebooks)),
        centroids,
        dim,
        k,
        n_probe,
        id_col,
        vec_col,
    )


def _probe_and_score(
    queries: DataFrame,
    index: DataFrame,
    decode,
    centroids: list[list[float]],
    dim: int,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared IVF probe/score tail (NB: near-twin of
    similarity.ivf_topk_indexed's — keep tie-breaks/filters in sync):
    queries pick their ``n_probe`` nearest cells (broadcast × tiny
    centroid set); the index — (neighbor_id, cell, pq_code) — is
    FILTERED to the probed cells FIRST (probe-cell ids are collected
    driver-side: bounded by |queries|·n_probe — control flow, the
    ivf_topk_indexed pattern), and only the surviving slice pays the
    ``decode`` reconstruction + norm, so decompression cost is
    ~n_probe/n_centroids of the corpus, not corpus-wide."""
    from pyspark.sql import Window

    from .similarity import _centroid_df, cosine, dot, norm

    cent = _centroid_df(queries.sparkSession, centroids)
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            norm(F.col(vec_col), dim).alias("__qn"),
        )
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "__qv",
            "__qn",
            "centroid_id",
            cosine(F.col("__qv"), F.col("__center"), dim).alias("__sim"),
        )
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "__qn", F.col("centroid_id").alias("cell"))
        # the probe plan is consumed twice (distinct-cell collect below
        # + the broadcast join input): materialize it once so the
        # crossJoin+window — and, on a remote source, the query scan —
        # don't re-execute (the pq_train/kmeans materialization pattern)
        .localCheckpoint(eager=False)
    )
    cells = sorted(
        {r["cell"] for r in probes.select("cell").distinct().collect()}
    )
    decoded = decode(index.filter(F.col("cell").isin(cells))).withColumn(
        "__cn", norm("__cv", dim)
    )
    scored = (
        decoded.join(F.broadcast(probes), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("__qv"), F.col("__cv"), dim)
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _centroid_lookup_expr(
    centroids: list[list[float]], cell_col: str = "cell"
) -> str:
    """Literal centroid table indexed by the cell column — map-side
    ``element_at`` on an inlined array-of-arrays, no join."""
    arrays = ", ".join(
        f"array({', '.join(_lit_double(x) for x in c)})" for c in centroids
    )
    return f"element_at(array({arrays}), CAST({cell_col} + 1 AS INT))"


def ivf_residuals(
    corpus: DataFrame,
    centroids: list[list[float]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, __res): each vector's residual vs its coarse
    centroid — what residual-mode PQ codebooks train on (faiss IVF+PQ
    proper: the residual distribution is tighter than the raw one, so
    the same code budget buys more accuracy). One map pass: cosine
    argmax cell + literal-table lookup + elementwise subtract."""
    from .similarity import cell_assign_expr, norm

    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col), dim).alias("__n"),
    ).withColumn("cell", cell_assign_expr(vec_col, "__n", centroids, dim))
    res = (
        f"zip_with({vec_col}, {_centroid_lookup_expr(centroids)}, "
        f"(a, b) -> CAST(a AS DOUBLE) - b)"
    )
    return assigned.select(
        F.col(id_col), F.col("cell"), F.expr(res).alias("__res")
    )


def ivfpq_index_residual(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Residual-mode IVF+PQ index: (neighbor_id, cell, pq_code) where
    the codes quantize ``x − centroid[cell]`` (train ``codebooks`` on
    :func:`ivf_residuals` output). Same one-map-pass/no-join shape as
    :func:`ivfpq_index`."""
    res = ivf_residuals(corpus, centroids, dim, id_col, vec_col)
    return pq_encode(res, codebooks, vec_col="__res").select(
        F.col(id_col).alias("neighbor_id"), "cell", "pq_code"
    )


def ivfpq_topk_residual(
    queries: DataFrame,
    index: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Residual-mode IVF+PQ top-k: reconstruction =
    ``centroid[cell] + decode(pq_code)`` (map-side literal lookups),
    then the same probe/score plan as :func:`ivfpq_topk`."""
    recon = (
        f"zip_with({_centroid_lookup_expr(centroids)}, __dec, "
        f"(a, b) -> a + b)"
    )

    def decode(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("__dec", pq_reconstruct_expr(codebooks))
            .withColumn("__cv", F.expr(recon))
            .drop("__dec")
        )

    return _probe_and_score(
        queries, index, decode, centroids, dim, k, n_probe, id_col, vec_col
    )


def persist_ivfpq_index(
    spark,
    corpus: DataFrame,
    table: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 16,
    residual: bool = False,
) -> None:
    """Materialize the IVF+PQ index as a table BUCKETED BY cell — the
    serving layout: the build-time map pass (coarse argmax + fine
    argmins) runs ONCE, and every query's probe scans only the matching
    buckets of an m-codes-per-vector table (bucket pruning × PQ
    compression). ``residual=True`` stores residual-mode codes (train
    ``codebooks`` on :func:`ivf_residuals` output and query via
    :func:`ivfpq_topk_residual`)."""
    from ..plans.layout import write_bucketed

    build = ivfpq_index_residual if residual else ivfpq_index
    idx = build(corpus, centroids, codebooks, dim, id_col, vec_col)
    write_bucketed(idx, table, ["cell"], num_buckets=num_buckets)
