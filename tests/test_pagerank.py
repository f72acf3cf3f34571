"""operators.hierarchy.pagerank vs a standalone Python replay of the
same round-shielded iteration. The graded 'pagerank' leg of
hierarchy_graph_suite covers the DuckDB cross-engine hash; this pins
the kernel against an independent implementation and its invariants."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators.hierarchy import pagerank


def _round_half_up(x: float, dp: int) -> float:
    # mirror Spark's round(double, dp): HALF_UP on the shortest-repr
    # decimal of the double (BigDecimal.valueOf semantics)
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-dp), ROUND_HALF_UP))


def _py_pagerank(edges, iterations=5, damping=0.85, dp=10):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {v: _round_half_up(1.0 / n, dp) for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        acc = {v: Decimal(0) for v in nodes}
        for s, d in edges:
            c = _round_half_up(ranks[s] / outdeg[s], dp)
            acc[d] += Decimal(repr(c)).quantize(Decimal(1).scaleb(-dp))
        ranks = {
            v: _round_half_up(base + damping * float(acc[v]), dp) for v in nodes
        }
    return ranks


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_matches_python_replay_on_random_graph(spark):
    # deterministic pseudo-random multigraph, self-loops included (the
    # operator treats them as ordinary edges; dedup happens inside)
    edges = [((i * 7919) % 23, (i * 104729) % 23) for i in range(200)]
    got = _spark_ranks(spark, edges)
    want = _py_pagerank(edges)
    assert got.keys() == want.keys()
    assert all(abs(got[v] - want[v]) == 0.0 for v in want), {
        v: (got[v], want[v]) for v in want if got[v] != want[v]
    }


def test_sink_node_and_source_node_behavior(spark):
    # 1 -> 2 -> 3 (3 is a sink: its mass leaks — simplified variant);
    # 4 -> 2 concentrates mass on 2
    edges = [(1, 2), (2, 3), (4, 2)]
    got = _spark_ranks(spark, edges)
    want = _py_pagerank(edges)
    assert got == want
    base = 0.15 / 4
    assert got[1] == got[4]  # sources keep only the base mass
    assert abs(got[1] - round(base, 10)) < 1e-12
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
