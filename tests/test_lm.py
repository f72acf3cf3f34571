"""Char-bigram LM / perplexity (operators.lm) gates: hand-computed
smoothing on a tiny corpus (seen/unseen bigram, unseen prefix),
reference-slice discipline, and the broadcast-LM plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators import lm as L


@pytest.fixture(scope="module")
def tiny(spark):
    # normalized reference text: "ababc" → bigrams ab, ba, ab, bc
    return spark.createDataFrame(
        [(0, "ababc"), (1, "abq"), (2, "zz"), (3, "x")],
        "doc_id bigint, text string",
    )


def test_perplexity_hand_computed(spark, tiny):
    lm = L.char_bigram_lm(tiny.filter(F.col("doc_id") == 0))
    got = {
        r["doc_id"]: r
        for r in L.with_perplexity(tiny, lm).collect()
    }
    V = L.ALPHABET_V
    # LM: ab:2, ba:1, bc:1; prefixes: a:2, b:2
    lp = {
        "ab": round(math.log(3 / (2 + V)), 8),
        "ba": round(math.log(2 / (2 + V)), 8),
        "bc": round(math.log(2 / (2 + V)), 8),
        "bq": round(math.log(1 / (2 + V)), 8),  # unseen bigram, seen pfx
        "zz": round(math.log(1 / V), 8),  # unseen prefix
    }

    def expect(bigrams):
        avg = sum(lp[b] for b in bigrams) / len(bigrams)
        return len(bigrams), round(math.exp(-avg), 4)

    n, ppl = expect(["ab", "ba", "ab", "bc"])
    assert (got[0]["n_bigrams"], got[0]["ppl"]) == (n, ppl)
    n, ppl = expect(["ab", "bq"])
    assert (got[1]["n_bigrams"], got[1]["ppl"]) == (n, ppl)
    n, ppl = expect(["zz"])
    assert (got[2]["n_bigrams"], got[2]["ppl"]) == (n, ppl)
    assert 3 not in got  # single char → no bigrams → no defined ppl
    # reference text itself scores lowest perplexity (it IS the model)
    assert got[0]["ppl"] < got[1]["ppl"] < got[2]["ppl"]


def test_lm_broadcasts_and_corpus_never_shuffles_text(spark, sf_dir):
    from project_clinical_data_etl_pipeline_spark.queries import REGISTRY

    df = REGISTRY["corpus_perplexity"].run(spark, sf_dir)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # both LM joins broadcast
    assert "SortMergeJoin" not in plan
    # the only exchanges: LM-count groupBys + the per-doc aggregate —
    # none may carry the raw text column
    for seg in plan.split("Exchange")[1:]:
        first = seg.split("+-")[0]
        assert "text#" not in first, first


def test_bigram_fanout_widens_narrow_scan(spark):
    """The bigram explode multiplies each row ~|text|-fold, so a
    narrow (single-partition) input must be fanned out before the
    fan-out stage — measured 4.5x at sf1 (SCALE.md). Pinned here: a
    1-partition frame's bigram plan runs at session shuffle
    parallelism."""
    from project_clinical_data_etl_pipeline_spark.operators.lm import _bigrams

    one = spark.createDataFrame(
        [(i, "abcdef" * 10) for i in range(100)], "doc_id long, text string"
    ).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    bg = _bigrams(one, "doc_id", "text")
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert bg.rdd.getNumPartitions() >= n
    # and the values are unaffected: 60 chars -> 59 bigrams per doc
    assert bg.count() == 100 * 59
