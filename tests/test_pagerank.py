"""operators.hierarchy.pagerank vs a standalone Python replay of the
same fixed-point integer iteration. The graded 'pagerank' leg of
hierarchy_graph_suite covers the DuckDB cross-engine hash; this pins
the kernel against an independent implementation and its invariants.
All arithmetic is BIGINT (1e-12 rank units, integer DIV), so equality
is exact by construction — no tolerance anywhere."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators.hierarchy import (
    PAGERANK_SCALE_DP,
    pagerank,
)

_ONE = 10 ** PAGERANK_SCALE_DP


def _py_pagerank(edges, iterations=5, damping_pct=85):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((100 - damping_pct) * _ONE) // (100 * n)
    r = {v: _ONE // n for v in nodes}
    for _ in range(iterations):
        acc = {v: 0 for v in nodes}
        for s, d in edges:
            acc[d] += r[s] // outdeg[s]
        r = {v: base + (damping_pct * acc[v]) // 100 for v in nodes}
    return {v: r[v] / float(_ONE) for v in nodes}


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_matches_python_replay_on_random_graph(spark):
    # deterministic pseudo-random multigraph, self-loops included (the
    # operator treats them as ordinary edges; dedup happens inside)
    edges = [((i * 7919) % 23, (i * 104729) % 23) for i in range(200)]
    got = _spark_ranks(spark, edges)
    want = _py_pagerank(edges)
    assert got == want  # exact: both sides are integer/2^k-free doubles


def test_sink_node_and_source_node_behavior(spark):
    # 1 -> 2 -> 3 (3 is a sink: its mass leaks — simplified variant);
    # 4 -> 2 concentrates mass on 2
    edges = [(1, 2), (2, 3), (4, 2)]
    got = _spark_ranks(spark, edges)
    want = _py_pagerank(edges)
    assert got == want
    base = ((100 - 85) * _ONE) // (100 * 4) / float(_ONE)
    assert got[1] == got[4] == base  # sources keep only the base mass
    assert min(got[2], got[3]) > got[1]  # fed nodes accumulate mass


def test_partitioning_invariance(spark):
    edges = [((i * 31) % 17, (i * 13) % 17) for i in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: r.rank for r in pagerank(df).collect()}
    b = {
        r.node: r.rank
        for r in pagerank(df.repartition(13, F.col("dst"))).collect()
    }
    assert a == b
