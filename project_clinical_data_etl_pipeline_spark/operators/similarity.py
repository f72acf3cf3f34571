"""Similarity search over embedding columns (array<float>).

Two tiers:
- :func:`brute_force_topk` — exact cosine top-k, the correctness
  baseline. Query side must be small (it broadcasts).
- :func:`lsh_bucket_topk` — random-hyperplane LSH bucketing, the scale
  path: corpus is bucketed once (map-only), queries probe only matching
  buckets, so the join is equi-join on bucket keys instead of a cross
  join.

All dot products are built-in higher-order functions
(zip_with + aggregate) — JVM codegen, no Python. Floats are cast to
double element-wise before multiply so accumulation order and precision
are engine-deterministic (matches the DuckDB oracle bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-fold dot product.

    With ``dim`` known the fold is UNROLLED into a flat left-associated
    sum of ``element_at`` products — whole-stage-codegen (no interpreted
    higher-order functions, measured ~40× on pairwise workloads) with
    bit-identical accumulation order to both the HOF fold and DuckDB's
    list_dot_product loop. Without ``dim`` it falls back to the HOF
    fold (any-length arrays)."""
    if dim is not None:
        # seed with 0.0 + x1 so ±0.0 handling matches the fold exactly
        acc = F.lit(0.0) + F.element_at(a, 1).cast("double") * F.element_at(
            b, 1
        ).cast("double")
        for i in range(2, dim + 1):
            acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
                "double"
            )
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        return F.sqrt(dot(a, a, dim))
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    The query side is broadcast (small by construction); the corpus is
    scanned once, partition-parallel, and the per-query top-k is a
    window over (query_id) — a shuffle of only (query_id, neighbor_id,
    score) candidate rows. Self-matches are excluded. Ties broken by
    neighbor id for determinism (SURVEY.md §7.5.1).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv"), dim).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j of plane i is
    a fixed hash-derived value in [-1, 1]. No RNG state — reproducible
    across runs, engines and cluster sizes."""
    out = []
    for j in range(dim):
        # xorshift-style integer mix of (i, j); plain Python, build-time only
        x = (plane_idx * 1_000_003 + j * 7919 + 12345) & 0xFFFFFFFF
        x ^= (x >> 13)
        x = (x * 0x5BD1E995) & 0xFFFFFFFF
        x ^= (x >> 15)
        out.append((x / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def lsh_signature(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """Sign pattern of the vector against ``num_planes`` fixed random
    hyperplanes, packed into an int — the LSH bucket key. Map-only."""
    bucket = F.lit(0)
    for i in range(num_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, i)])
        bucket = bucket + F.when(dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is partitioned into
    ``n_centroids`` Voronoi cells; each query probes only its
    ``n_probe`` nearest cells.

    Centroid seeding is deterministic (the ``n_centroids`` corpus
    vectors with the smallest ids) — at warehouse scale replace with a
    k-means pass and persist the (vector → cell) assignment as a
    bucketed table so queries are pure cell-key equi-joins. Shape at
    100 TB: assignment is one map pass over the corpus vs the broadcast
    centroid set; each query scores ~n_probe/n_centroids of the corpus.

    Determinism: cell assignment and probe order break cosine ties by
    centroid id; final top-k by (cosine desc, neighbor id) — identical
    in the SQL oracle.
    """
    cent = corpus.orderBy(F.col(id_col).asc()).limit(n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__center")
    )
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    assigned = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
        .crossJoin(F.broadcast(cent))
        .select(
            "neighbor_id",
            "__cv",
            "centroid_id",
            cosine(F.col("__cv"), F.col("__center"), dim).alias("__sim"),
        )
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select("neighbor_id", "__cv", F.col("centroid_id").alias("cell"))
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "__qv",
            "centroid_id",
            cosine(F.col("__qv"), F.col("__center"), dim).alias("__sim"),
        )
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", F.col("centroid_id").alias("cell"))
    )
    scored = (
        F.broadcast(probes)
        .join(assigned, on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv"), dim).alias("cosine"),
        )
        # no dedup needed: every neighbor lives in exactly one cell
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank")
        )
    )


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. The cross join becomes an equi-join on the bucket key —
    at 100 TB the corpus bucketing is one map pass, and each query
    touches ~1/2^planes of the corpus. Recall is tunable via
    ``num_planes`` (fewer planes → bigger buckets → higher recall).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lsh_signature(F.col(vec_col), dim, num_planes).alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        lsh_signature(F.col(vec_col), dim, num_planes).alias("__bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, on="__bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qv"), F.col("__cv"), dim).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )
