"""Round-13 ladder point: the flat coarse-quantizer CAP, measured.

The round-12 ladder topped out at 80k vectors (derived flat k=282 —
nowhere near the 4096 cap), so the claim that the two-level (IMI)
quantizer escapes the cap rested on the derivation alone. This script
converts it into data at n = 10^6, where every configuration is still
runnable on this box:

- flat_derived: k = clamp(sqrt(n), 16, 4096) = 1000 — the rule's true
  choice at 1e6 (cap not yet binding); the fair same-n flat baseline.
- flat_cap: k = 4096 FORCED — the configuration flat is STUCK with for
  every n past 1.67e7 (sqrt(n) > cap), paying the full 4096-centroid
  driver budget and training cost. Its candidate fraction is the
  n_probe/4096 floor the cap imposes.
- imi_derived: k1 = k2 = ceil(n^(1/4)) = 32 → 1024 composite cells —
  the derived rule (cells ≈ sqrt(n)) at 64 driver-side centroids.
- imi_fine: k1 = k2 = 128 → 16384 composite cells from only 256
  driver-side centroids — the CAP-ESCAPE configuration: more effective
  cells than flat's cap from 16x fewer driver-side centroids, a
  geometry flat cannot reach without blowing the driver budget the cap
  exists to bound. If its candidate fraction beats flat_cap's at equal
  (re-ranked) recall, the extrapolation is data.

Per config: build wall time, recall@5 (exact-rerank serving path, 8
queries vs brute force), mean per-query candidate fraction, probe wall
time. Corpus: 1e6 synthetic 64-dim unit-norm embeddings, the
gen_scale.py geometry (10 weak clusters, centroid norm ~0.07, within
std 0.125 — weakly clustered, the hard case for coarse quantizers).

Usage: python scripts/imi_cap_point.py [n] [out_json]
Run with the machine ALONE (SCALE.md measurement doctrine).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import SparkSession, functions as F  # noqa: E402


def gen_corpus(path: str, n: int, dim: int = 64, seed: int = 13) -> None:
    if os.path.exists(os.path.join(path, "embeddings.parquet")):
        return
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 0.07 / np.sqrt(dim), (10, dim))
    labels = rng.integers(0, 10, n)
    X = centers[labels] + rng.normal(0, 0.125, (n, dim))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": pa.array(
                    [row for row in X], pa.list_(pa.float32())
                ),
            }
        ),
        os.path.join(path, "embeddings.parquet"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/imi_cap_point.json"
    data_dir = f"/root/repo/scratch/emb{n // 1000}k"
    gen_corpus(data_dir, n)

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from project_clinical_data_etl_pipeline_spark.operators import (
        ann_index as AI,
    )
    from project_clinical_data_etl_pipeline_spark.operators.quantization import (
        imi_probe_cells,
    )
    from project_clinical_data_etl_pipeline_spark.operators.similarity import (
        _centroid_df,
        brute_force_topk,
        cosine,
        norm,
    )
    from project_clinical_data_etl_pipeline_spark.session import tune
    from pyspark.sql import Window

    tune(spark)
    corpus = (
        spark.read.parquet(os.path.join(data_dir, "embeddings.parquet"))
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
                "embedding"
            ),
        )
        .localCheckpoint()
    )
    queries = corpus.filter(F.col("vec_id") < 8).localCheckpoint()
    exact: dict[int, set[int]] = {}
    for r in brute_force_topk(queries, corpus, k=5, dim=64).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(fetch) -> float:
        approx: dict[int, set[int]] = {}
        for r in fetch(queries).collect():
            approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(approx.get(q, set()) & t) / len(t) for q, t in exact.items()
        ) / len(exact)

    def fraction(path, probes) -> float:
        occ = {
            r["cell"]: r["n"]
            for r in AI.read_index(spark, path)
            .groupBy("cell")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        total = sum(occ.values())
        per_q: dict[int, int] = {}
        for r in probes().select("query_id", "cell").collect():
            per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + occ.get(
                r["cell"], 0
            )
        return sum(per_q.values()) / (len(per_q) * total)

    out = {"n": n, "dim": 64}

    def flat_probes_fn(meta, n_probe):
        def probes():
            cent = _centroid_df(spark, meta["centroids"])
            w = Window.partitionBy("query_id").orderBy(
                F.col("__sim").desc(), F.col("centroid_id").asc()
            )
            return (
                queries.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("__qv"),
                    norm(F.col("embedding"), 64).alias("__qn"),
                )
                .crossJoin(F.broadcast(cent))
                .withColumn(
                    "__sim", cosine(F.col("__qv"), F.col("__center"), 64)
                )
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= n_probe)
                .select("query_id", F.col("centroid_id").alias("cell"))
            )

        return probes

    configs = [
        ("flat_derived", {"kind": "flat", "k": None}),
        ("flat_cap", {"kind": "flat", "k": 4096}),
        ("imi_derived", {"kind": "imi", "k1": None, "k2": None}),
        ("imi_fine", {"kind": "imi", "k1": 128, "k2": 128}),
    ]
    for name, cfg in configs:
        path = tempfile.mkdtemp(prefix=f"cap_{name}_")
        t0 = time.perf_counter()
        if cfg["kind"] == "flat":
            meta = AI.build_ivfpq_index(
                spark, corpus, path, dim=64, n_centroids=cfg["k"]
            )
            cells = meta["n_centroids"]
            driver_centroids = cells
            n_probe = 4
            probes = flat_probes_fn(meta, n_probe)
        else:
            meta = AI.build_imi_index(
                spark, corpus, path, dim=64, k1=cfg["k1"], k2=cfg["k2"]
            )
            cells = meta["n_centroids"]
            driver_centroids = meta["imi_k1"] + len(meta["centroids2"])
            n_probe = 3  # 9 joint-ranked composite probes, the r12 budget

            def probes(meta=meta, n_probe=n_probe):
                return imi_probe_cells(
                    queries,
                    meta["centroids"],
                    meta["centroids2"],
                    64,
                    n_probe,
                    n_probe,
                    stride=meta.get("imi_stride"),
                )

        build_s = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        rec = recall(
            lambda q: AI.probe_index_rerank(
                spark, path, q, corpus, k=5, n_probe=n_probe
            )
        )
        probe_s = round(time.perf_counter() - t0, 1)
        out[name] = {
            "cells": cells,
            "driver_centroids": driver_centroids,
            "build_s": build_s,
            "recall5": round(rec, 3),
            "frac": round(fraction(path, probes), 5),
            "probe_s": probe_s,
        }
        print(name, json.dumps(out[name]), flush=True)
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
