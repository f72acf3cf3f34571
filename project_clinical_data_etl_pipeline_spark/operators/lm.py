"""Character n-gram language model + perplexity filtering — the
CCNet-style quality signal (Wenzek et al. 2020): train a cheap LM on a
trusted reference slice, score every document by perplexity, filter or
bucket by the score. Complements the rule table (``operators.text``)
and the learned classifier (``operators.classify``).

Built relationally end-to-end so a SQL oracle re-derives the SAME
model and scores:

- **Training** is one shuffle: explode the normalized reference text
  into character bigrams (map-side fan-out, linear in chars), then one
  partial-combined ``groupBy(bigram).count()``. Unigram (prefix)
  totals derive from the bigram table by grouping on the first char —
  no second pass over the text.
- **The model is a tiny table** (≤ |alphabet|² rows — the normalized
  alphabet is a-z, 0-9, space → ≤ 1369 bigrams): it BROADCASTS into
  scoring, never shuffles the corpus.
- **Scoring**: explode each document into bigrams, broadcast-join the
  LM, add-one-smoothed log-probabilities, per-doc mean via the
  DECIMAL-exact sum recipe, perplexity = exp(−mean).

Cross-engine determinism: every ``ln`` result rounds to 8 dp (libm
shield) BEFORE entering the per-doc sum; each per-bigram logprob is
DECIMAL(28,10)-cast so the mean is order-independent; the final
perplexity rounds to 4 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text

#: Smoothing vocabulary size: the normalized alphabet (a-z, 0-9, space)
#: — a FIXED constant, not derived from data, so the model is defined
#: even for unseen prefixes (logprob = ln(1/V)).
ALPHABET_V = 37


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __bg): all character bigrams of the normalized text —
    map-side ``explode(sequence)`` + substring fan-out, linear in
    chars. Docs with < 2 normalized chars emit nothing.

    fan_out first: the explode multiplies each row into ~|text| rows,
    so a narrow scan (single-file corpus = 1-2 partitions) runs the
    whole fan-out near-serial — measured 20.3s -> 4.5s at sf1 on
    local[32] (SCALE.md). A no-op when the scan is already wide."""
    from .dedup import fan_out

    nt = normalize_text(F.col(text_col))
    return (
        # project to (id, text) BEFORE the repartition so the shuffle
        # moves only the two columns the fan-out needs
        fan_out(
            df.filter(F.col(text_col).isNotNull()).select(
                F.col(id_col), F.col(text_col)
            )
        )
        .select(F.col(id_col), nt.alias("__nt"))
        .filter(F.length("__nt") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr("transform(sequence(1, length(__nt) - 1), "
                       "i -> substring(__nt, i, 2))")
            ).alias("__bg"),
        )
    )


def char_bigram_lm(
    reference: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Train the bigram table from a reference corpus: (bg, c) counts
    over normalized text. ONE groupBy shuffle; the result is the
    broadcastable model."""
    return (
        _bigrams(reference, id_col, text_col)
        .groupBy(F.col("__bg").alias("bg"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def with_perplexity(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lp_dp: int = 8,
    ppl_dp: int = 4,
) -> DataFrame:
    """Score every document against the bigram LM: returns
    (id_col, n_bigrams, avg_lp, ppl).

    Add-one smoothing: ``lp(bg) = ln((c_bg + 1) / (c_prefix + V))``
    with ``c_prefix`` = Σ counts of bigrams sharing the first char
    (derived FROM the bigram table — exactly the number of reference
    positions where that char has a successor) and ``V`` =
    :data:`ALPHABET_V`; unseen bigram → ``c_bg = 0``; unseen prefix →
    ``ln(1/V)``. Both LM joins broadcast (≤ |alphabet|² rows). Docs
    with no bigrams are excluded (no defined perplexity).
    """
    prefixes = lm.groupBy(
        F.substring(F.col("bg"), 1, 1).alias("pfx")
    ).agg(F.sum("c").cast("bigint").alias("cp"))
    scored = (
        _bigrams(docs, id_col, text_col)
        .join(F.broadcast(lm), on=F.col("__bg") == F.col("bg"), how="left")
        .join(
            F.broadcast(prefixes),
            on=F.substring(F.col("__bg"), 1, 1) == F.col("pfx"),
            how="left",
        )
        .select(
            F.col(id_col),
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                    / (
                        F.coalesce(F.col("cp"), F.lit(0)) + F.lit(ALPHABET_V)
                    ).cast("double")
                ),
                lp_dp,
            ).alias("__lp"),
        )
    )
    # the mean needs NO rounding shield: the DECIMAL sum is exact and
    # order-independent, its double cast and the /count division are
    # correctly-rounded in both engines — rounding it would only ADD a
    # cross-engine boundary (observed: a mean landing on an 8-dp round
    # boundary split Spark/DuckDB by 1 ulp of the rounded value)
    avg = "CAST(sum(CAST(__lp AS DECIMAL(28,10))) AS DOUBLE) / count(1)"
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.expr(avg).alias("avg_lp"),
        )
        .withColumn("ppl", F.round(F.exp(-F.col("avg_lp")), ppl_dp))
    )


def perplexity_sql(
    ref_where: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    norm_sql: str | None = None,
    lp_dp: int = 8,
    ppl_dp: int = 4,
) -> str:
    """DuckDB twin: re-derives the LM from ``WHERE {ref_where}`` rows
    and scores all docs with the identical smoothing/rounding
    arithmetic. ``norm_sql`` is the normalization expression over
    ``text`` (defaults to the repo's canonical _NORM form)."""
    norm = norm_sql or (
        f"trim(regexp_replace(regexp_replace(lower({text_col}), "
        "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
    )
    bigrams = f"""
        SELECT {id_col}, substring(nt, i, 2) AS bg
        FROM (SELECT {id_col}, {norm} AS nt FROM {table}
              WHERE {text_col} IS NOT NULL),
             unnest(generate_series(1, length(nt) - 1)) AS t(i)
        WHERE length(nt) >= 2
    """
    return f"""
        WITH all_bg AS ({bigrams}),
        lm AS (
            SELECT bg, CAST(count(*) AS BIGINT) AS c
            FROM all_bg WHERE {ref_where} GROUP BY bg
        ),
        pfx AS (
            SELECT substring(bg, 1, 1) AS pfx, CAST(sum(c) AS BIGINT) AS cp
            FROM lm GROUP BY 1
        ),
        lp AS (
            SELECT a.{id_col},
                   round(ln(CAST(coalesce(lm.c, 0) + 1 AS DOUBLE)
                            / CAST(coalesce(pfx.cp, 0) + {ALPHABET_V}
                                   AS DOUBLE)), {lp_dp}) AS lp
            FROM all_bg a
            LEFT JOIN lm ON a.bg = lm.bg
            LEFT JOIN pfx ON substring(a.bg, 1, 1) = pfx.pfx
        )
        SELECT {id_col},
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(CAST(lp AS DECIMAL(28,10))) AS DOUBLE)
                   / count(*) AS avg_lp,
               round(exp(-(CAST(sum(CAST(lp AS DECIMAL(28,10)))
                                AS DOUBLE) / count(*))),
                     {ppl_dp}) AS ppl
        FROM lp GROUP BY {id_col}
    """
