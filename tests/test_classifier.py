"""Quality-classifier (operators.classify) correctness gates beyond the
registry oracle row:

- Spark training/scoring vs the standalone Python bit-exact oracle on
  randomized feature matrices (the cross-engine determinism recipe —
  DECIMAL gradient sums, rounded sigmoids, HALF_UP weight rounds — must
  hold under ANY inputs, not just the documents table).
- Iteration-1 algebra: from w=0 the sigmoid is exactly 0.5, so the
  first step is the class-balance/feature-mean step.
- The trained model must actually separate: accuracy of `keep` vs the
  weak label clears a floor well above chance on the real table.
- Scale shape: training runs exactly one aggregate job per iteration
  (no per-row collect), scoring is a map-only plan over the features.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators import classify as C
from project_clinical_data_etl_pipeline_spark.queries import REGISTRY


def _random_rows(rng: random.Random, n: int) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append(
            {
                "id": i,
                "f_bias": 1.0,
                "f_a": rng.uniform(0.0, 1.0),
                "f_b": rng.uniform(-2.0, 2.0),
                "y": rng.randint(0, 1),
            }
        )
    return rows


COLS = ["f_bias", "f_a", "f_b"]


@pytest.mark.parametrize("seed", [1, 7, 42])
@pytest.mark.parametrize("lr,n_iter", [(1.0, 1), (1.0, 3), (4.0, 8)])
def test_train_matches_python_oracle_fuzz(spark, seed, lr, n_iter):
    rng = random.Random(seed)
    rows = _random_rows(rng, 200)
    df = spark.createDataFrame(
        rows, "id bigint, f_bias double, f_a double, f_b double, y int"
    )
    w_spark = C.train_logistic(df, COLS, "y", lr=lr, n_iter=n_iter)
    w_py, scores_py = C.reference_train_score(rows, COLS, "y", lr=lr, n_iter=n_iter)
    assert w_spark == w_py, f"weights diverge: {w_spark} vs {w_py}"

    scored = (
        C.score_documents(df, COLS, w_spark)
        .orderBy("id")
        .select("score")
        .collect()
    )
    assert [r["score"] for r in scored] == scores_py


def test_iteration_one_is_class_balance_step(spark):
    # w=0 → p=0.5 exactly: gradient_j = mean((0.5 - y) * x_j). With
    # bias=1 and y balanced 50/50, the bias gradient is exactly 0.
    rows = [
        {"f_bias": 1.0, "f_x": float(i), "y": i % 2} for i in range(100)
    ]
    df = spark.createDataFrame(rows, "f_bias double, f_x double, y int")
    w = C.train_logistic(df, ["f_bias", "f_x"], "y", n_iter=1)
    assert w[0] == 0.0  # mean(0.5 - y) == 0 for a balanced label
    # feature gradient: mean((0.5 - y) * x) = (sum_even(0.5*x) -
    # sum_odd(0.5*x))/100 = 0.5*(-50)/100 = -0.25 → w1 = +0.25
    assert w[1] == 0.25


@pytest.mark.slow  # round 14: model-quality pin (~50 s); train/score parity stays fast-tier
def test_trained_model_separates_on_documents(spark, sf_dir):
    out = REGISTRY["quality_classifier_suite"].run(spark, sf_dir)
    agg = out.agg(
        F.avg(
            (F.col("keep").cast("int") == F.col("label")).cast("double")
        ).alias("acc"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("label")).alias("pos"),
    ).first()
    # weak label is ~50/50 (length rule); a learned separator must beat
    # the majority class by a wide margin
    majority = max(agg["pos"], agg["n"] - agg["pos"]) / agg["n"]
    assert agg["acc"] >= max(0.85, majority + 0.1), (
        f"accuracy {agg['acc']:.3f} vs majority {majority:.3f}"
    )


def test_scoring_plan_is_map_only(spark, sf_dir):
    out = REGISTRY["quality_classifier_suite"].run(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for op in ("Exchange", "Join", "BatchEvalPython", "Sort"):
        assert op not in plan, f"scoring plan grew a {op}:\n{plan}"


def test_training_never_collects_rows(spark):
    # the per-iteration driver pull is the k+1-scalar agg row ONLY:
    # train on a frame whose row count is large but whose agg is tiny,
    # and assert the returned weights are plain floats (control flow),
    # while the input frame is untouched (no caching side effects).
    df = spark.range(10_000).select(
        F.lit(1.0).alias("f_bias"),
        (F.col("id") % 97).cast("double").alias("f_x"),
        (F.col("id") % 2).cast("int").alias("y"),
    )
    w = C.train_logistic(df, ["f_bias", "f_x"], "y", n_iter=2)
    assert all(isinstance(x, float) for x in w)
    assert not df.is_cached


def test_round_half_up_matches_spark_on_shortest_repr_boundaries(spark):
    """Spark's round(double, dp) rounds the SHORTEST-repr decimal
    (BigDecimal.valueOf); quantizing the exact binary expansion gives
    2.67 for round(2.675, 2) — the wrong answer. Pin the driver-side
    mirror against the engine on exactly such boundary values."""
    cases = [(2.675, 2), (0.125, 2), (1.005, 2), (0.5, 0), (-2.675, 2),
             (0.123456785, 8), (3.14159, 3)]
    exprs = [
        f"round(CAST('{v!r}' AS DOUBLE), {dp}) AS r{i}"
        for i, (v, dp) in enumerate(cases)
    ]
    row = spark.range(1).selectExpr(*exprs).first()
    for i, (v, dp) in enumerate(cases):
        assert C._round_half_up(v, dp) == row[f"r{i}"], (v, dp, row[f"r{i}"])


def test_classifier_duckdb_parity_on_adversarial_unicode(spark, tmp_path):
    """Run the ENTIRE graded train+score pipeline (8 GD iterations,
    CTE-re-derived by the oracle) on an adversarial corpus the
    synthetic table doesn't cover: unicode, emoji, empty/whitespace
    docs, a class-imbalanced length distribution. Exercises the
    feature formulations AND the cross-engine training determinism
    (decimal sums, rounded sigmoids, HALF_UP weights) end-to-end."""
    import duckdb

    texts = [
        "héllo wörld the and of " * (3 + i % 7) for i in range(40)
    ] + [
        "日本語のテキスト to is " * (1 + i % 5) for i in range(30)
    ] + [
        "😀 the 😀 and 😀" * (i % 4) for i in range(20)
    ] + ["", "   ", "x", "the", "の"]
    rows = [(i, t, "xx", "srcA", len(t)) for i, t in enumerate(texts)]
    path = str(tmp_path / "documents.parquet")  # tables.load expects <sf_dir>/documents.parquet
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(path)

    sdf = REGISTRY["quality_classifier_suite"].run(spark, str(tmp_path))
    got = sorted(
        (r["doc_id"], r["label"], repr(r["score"]), r["keep"])
        for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(
        (r[0], r[1], repr(r[2]), r[3])
        for r in con.execute(
            REGISTRY["quality_classifier_suite"].sql
        ).fetchall()
    )
    assert got == want


def test_sigmoid_expr_rejects_bad_shapes(spark):
    """Empty features and a weights/features length mismatch are both
    hard errors — zip would otherwise silently truncate and score a
    partial w.x."""
    import pytest

    from project_clinical_data_etl_pipeline_spark.operators.classify import (
        sigmoid_expr,
    )

    with pytest.raises(ValueError):
        sigmoid_expr([], [])
    with pytest.raises(ValueError):
        sigmoid_expr(["a", "b"], [1.0])
    with pytest.raises(ValueError):
        sigmoid_expr(["a"], [1.0, 2.0])
