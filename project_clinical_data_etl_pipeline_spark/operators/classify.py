"""Model-based quality filtering: distributed logistic-regression
training + map-side scoring over document feature projections.

The classifier stage every production training-data pipeline runs
between the rule-based filters and dedup (CCNet/Gopher/LLaMA-style
"quality classifier": train a cheap linear model on weak labels, score
every document, keep by threshold). The reference's quality domain is
rule-tables only (src/insights.py quality flags); this is the learned
upgrade, built scale-first:

- **Features** are one map-side projection (integer-exact ratios, the
  same formulations as ``operators.text``) — a free rider on any scan.
- **Training** is batch gradient descent where each iteration is ONE
  partial-combine aggregate job; only k+1 scalar gradients ever reach
  the driver per iteration (k-means-centroid-pull pattern,
  ``operators.similarity.kmeans_centroids``). The corpus is read once
  per iteration; nothing is ever collected.
- **Scoring** inlines the trained weights as codegen literals — no
  join, no broadcast, pure map work, embarrassingly parallel at 100 TB.

Cross-engine determinism (so a SQL oracle can re-derive the SAME model
from the same parquet):

- gradient means are DECIMAL(28,10)-exact sums (order-independent →
  identical under any partitioning) cast to DOUBLE before the count
  division — the proven kmeans_centroids recipe;
- per-row sigmoids round to ``prob_dp`` decimals before entering any
  sum, absorbing last-ulp ``exp`` divergence between JVM and C libm;
- weights round to ``weight_dp`` decimals per iteration, so both
  engines iterate from bit-identical coefficients;
- the learning rate is restricted to powers of two (``lr * g`` is an
  exact IEEE scaling — no rounding step the engines could disagree on).

Known residual risk (documented, not fixable on our side): the round
shields themselves have a measure-zero boundary class. Spark rounds
the SHORTEST-repr decimal of a double (BigDecimal.valueOf → HALF_UP),
DuckDB rounds via float scaling — they disagree on doubles whose
shortest repr terminates with '5' exactly at position dp+1 (e.g.
round(1.005, 2): Spark 1.01, DuckDB 1.00). Generic doubles (17-digit
reprs) never hit this; values that do must arise by arithmetic
coincidence. Empirically green at sf0.001/0.01/0.1 plus adversarial
unicode corpora; ``_round_half_up`` mirrors SPARK (the engine the
driver executes), pinned by test.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _lit_double

#: DECIMAL type for order-independent gradient sums. 28,10 holds
#: |resid| <= 1 times features in [0, ~100] across 1e15 rows headroom.
_SUM_DEC = "decimal(28,10)"

#: Gradient sums round to this many decimals (exact decimal->decimal,
#: HALF_UP in both engines) BEFORE the DOUBLE cast — the q1 shield
#: against DuckDB's double-rounding decimal->double cast past 2^53
#: unscaled (SCALE.md hazard inventory, closed round 10).
_GRAD_DP = 6


def _logit_expr(feature_cols: list[str], weights: list[float]) -> Column:
    """w·x as a left-associated literal-weight chain — the exact
    addition order the SQL twin spells out, so the double is
    bit-identical in both engines."""
    if not feature_cols:
        # a real error, not assert (python -O would strip it and fall
        # through to a confusing downstream NoneType failure)
        raise ValueError("at least one feature required")
    if len(weights) != len(feature_cols):
        # zip would silently truncate to the shorter list and score a
        # partial w·x with no error
        raise ValueError(
            f"{len(weights)} weights for {len(feature_cols)} features"
        )
    z: Column | None = None
    for c, w in zip(feature_cols, weights):
        term = F.col(c) * F.expr(_lit_double(w))
        z = term if z is None else z + term
    return z


def sigmoid_expr(
    feature_cols: list[str], weights: list[float], prob_dp: int | None = 8
) -> Column:
    """round(1 / (1 + exp(-w·x)), prob_dp) — the scoring expression.
    Pure codegen scalar math (weights inlined as literals): no join, no
    shuffle, no Python. ``prob_dp`` is the cross-engine determinism
    shield for libm ``exp`` last-ulp differences."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit_expr(feature_cols, weights)))
    return F.round(p, prob_dp) if prob_dp is not None else p


def train_logistic(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    n_iter: int = 2,
    weight_dp: int = 10,
    prob_dp: int = 8,
) -> list[float]:
    """Batch-GD logistic regression; returns the trained weight vector
    (index-aligned with ``feature_cols`` — include an explicit constant
    1.0 column for the bias term).

    Each iteration runs ONE aggregate job over the feature projection:
    ``g_j = CAST(sum(CAST((p - y) * x_j AS DECIMAL(28,10))) AS DOUBLE)
    / count(*)`` with ``p = round(sigmoid(w·x), prob_dp)``, then
    ``w_j ← round(w_j - lr·g_j, weight_dp)`` on the driver (k scalars —
    control flow, not a data collect). From ``w = 0`` the first
    iteration's ``p`` is exactly 0.5, so iteration 1 is a pure
    class-balance/feature-mean step — the property the unit tests pin.

    At 100 TB: persist/cache ``features`` before calling (each
    iteration re-reads it); the aggregate is map-side partial-combined,
    so the exchange carries k partial sums per partition, nothing else.

    ``lr`` must be a power of two: scaling a double by a power of two
    is exact in IEEE arithmetic, so the update matches the SQL twin
    without an extra rounding step.
    """
    if not (lr > 0 and math.frexp(lr)[0] == 0.5):
        # a real error, not assert: python -O would strip an assert and
        # silently break the bit-reproducibility contract (the exact
        # hazard retrieval._check_terms documents)
        raise ValueError(
            f"lr must be a power of two for exact cross-engine scaling, got {lr}"
        )
    k = len(feature_cols)
    weights = [0.0] * k
    for _ in range(n_iter):
        p = sigmoid_expr(feature_cols, weights, prob_dp)
        resid = p - F.col(label_col).cast("double")
        # ROUND the decimal sum to _GRAD_DP BEFORE the double cast (the
        # q1 money-sum shield, SCALE.md): at scale 10 the corpus-global
        # gradient sum's unscaled int128 crosses 2^53 at ~sf18, where
        # DuckDB's decimal->double cast double-rounds while Spark's
        # BigDecimal path rounds once. Scale 6 pushes that boundary out
        # by 10^4x (~sf180k) — decimal->decimal rounding is exact and
        # identical in both engines, so the cast sees a value both
        # round identically.
        aggs = [
            F.round(F.sum((resid * F.col(c)).cast(_SUM_DEC)), _GRAD_DP)
            .cast("double")
            .alias(f"g{j}")
            for j, c in enumerate(feature_cols)
        ] + [F.count(F.lit(1)).alias("n")]
        row = features.agg(*aggs).first()
        n = row["n"]
        if n == 0:
            raise ValueError("cannot train on an empty feature frame")
        grads = [row[f"g{j}"] / n for j in range(k)]
        weights = [
            _round_half_up(w - lr * g, weight_dp)
            for w, g in zip(weights, grads)
        ]
    return weights


def _round_half_up(x: float, dp: int) -> float:
    """Driver-side HALF_UP decimal rounding matching Spark's
    ``round(double, dp)``. Spark's Round goes through
    ``BigDecimal.valueOf(d)`` = ``Double.toString(d)`` — the SHORTEST
    round-trip decimal — so the Python mirror must quantize
    ``Decimal(repr(x))`` (same shortest form), NOT ``Decimal(x)``
    (the exact binary expansion): they disagree on boundary values
    like round(2.675, 2) → 2.68 (shortest "2.675", HALF_UP) vs 2.67
    (exact 2.67499…). Not Python's banker's rounding either."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-dp), ROUND_HALF_UP)
    )


def score_documents(
    features: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    score_dp: int = 6,
    threshold: float = 0.5,
) -> DataFrame:
    """Append ``score`` (rounded sigmoid) and ``keep`` (score >=
    threshold) — one map-side projection with the model inlined."""
    score = sigmoid_expr(feature_cols, weights, prob_dp=score_dp)
    return features.withColumn("score", score).withColumn(
        "keep", F.col("score") >= F.lit(threshold)
    )


def train_sql_cte(
    feats_cte: str,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    n_iter: int = 2,
    weight_dp: int = 10,
    prob_dp: int = 8,
) -> str:
    """Generate the DuckDB CTE chain that re-derives the SAME training
    run from a feature CTE named ``feats_cte`` (columns =
    ``feature_cols`` + ``label_col``): per iteration one aggregate CTE
    (w{i}) whose weight columns repeat the exact Spark arithmetic —
    DECIMAL(28,10) sums, double division, HALF_UP-equivalent round.
    Returns the ``wN AS (...), ...`` fragment; the caller's final
    SELECT cross-joins the last CTE (``w{n_iter}``).

    ``lr`` must be a power of two (1.0, 2.0, 4.0 …): scaling a double
    by a power of two is EXACT in IEEE arithmetic, so ``lr * g``
    introduces no rounding step the two engines could disagree on."""
    if not (lr > 0 and math.frexp(lr)[0] == 0.5):
        raise ValueError(
            f"lr must be a power of two for exact cross-engine scaling, got {lr}"
        )
    k = len(feature_cols)
    ctes = []
    prev = None  # weight refs of the previous iteration
    for it in range(1, n_iter + 1):
        if prev is None:
            # w = 0 → sigmoid is exactly 0.5: spell it literally so the
            # oracle does not depend on exp(0) round-tripping.
            p = "0.5"
        else:
            z = " + ".join(
                f"{c} * {prev}.w{j}" for j, c in enumerate(feature_cols)
            )
            p = f"round(1.0 / (1.0 + exp(-({z}))), {prob_dp})"
        resid = f"({p} - CAST({label_col} AS DOUBLE))"
        lr_lit = f"{float(lr)!r} * " if lr != 1.0 else ""
        # round-before-cast mirrors train_logistic's _GRAD_DP shield
        cols = ", ".join(
            f"round(" + (f"{prev}.w{j}" if prev else "0.0") + " - "
            f"{lr_lit}(CAST(round(sum(CAST({resid} * {c} AS DECIMAL(28,10))),"
            f" {_GRAD_DP}) AS DOUBLE)"
            f" / count(*)), {weight_dp}) AS w{j}"
            for j, c in enumerate(feature_cols)
        )
        src = feats_cte if prev is None else f"{feats_cte} CROSS JOIN {prev}"
        group = "" if prev is None else f" GROUP BY {', '.join(f'{prev}.w{j}' for j in range(k))}"
        ctes.append(f"w{it} AS (SELECT {cols} FROM {src}{group})")
        prev = f"w{it}"
    return ",\n".join(ctes)


def score_sql(
    feature_cols: list[str], weights_cte: str, score_dp: int = 6
) -> str:
    """DuckDB scoring expression against the trained-weight CTE —
    the same left-associated w·x chain as :func:`sigmoid_expr`."""
    z = " + ".join(
        f"{c} * {weights_cte}.w{j}" for j, c in enumerate(feature_cols)
    )
    return f"round(1.0 / (1.0 + exp(-({z}))), {score_dp})"


def reference_train_score(
    rows: list[dict],
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    n_iter: int = 2,
    weight_dp: int = 10,
    prob_dp: int = 8,
    score_dp: int = 6,
) -> tuple[list[float], list[float]]:
    """Bit-exact Python oracle (pure floats + Decimal sums) for fuzz
    tests: returns (weights, per-row scores in input order)."""
    from decimal import Decimal

    def q(x: float, dp: int) -> Decimal:
        # repr, not the exact binary expansion: Spark's round() AND its
        # double→DECIMAL cast both go through BigDecimal.valueOf =
        # Double.toString = the shortest round-trip decimal
        from decimal import ROUND_HALF_UP

        return Decimal(repr(x)).quantize(Decimal(1).scaleb(-dp), ROUND_HALF_UP)

    k = len(feature_cols)
    weights = [0.0] * k
    n = len(rows)
    for _ in range(n_iter):
        sums = [Decimal(0)] * k
        for r in rows:
            z = 0.0
            for j, c in enumerate(feature_cols):
                z += float(r[c]) * weights[j]
            p = float(q(1.0 / (1.0 + math.exp(-z)), prob_dp))
            resid = p - float(r[label_col])
            for j, c in enumerate(feature_cols):
                sums[j] += q(resid * float(r[c]), 10)
        # quantize the exact Decimal sum to _GRAD_DP (HALF_UP) before
        # the float division — the engines' round-before-cast shield
        from decimal import ROUND_HALF_UP

        grads = [
            float(
                s.quantize(Decimal(1).scaleb(-_GRAD_DP), ROUND_HALF_UP)
            ) / n
            for s in sums
        ]
        weights = [
            _round_half_up(w - lr * g, weight_dp)
            for w, g in zip(weights, grads)
        ]
    scores = []
    for r in rows:
        z = 0.0
        for j, c in enumerate(feature_cols):
            z += float(r[c]) * weights[j]
        scores.append(float(q(1.0 / (1.0 + math.exp(-z)), score_dp)))
    return weights, scores
