"""WordPiece subword tokenizer gates (operators.text.wordpiece_count):
the expression kernel, the Arrow kernel, and the DuckDB twin must agree
bit-for-bit; an independent pure-Python greedy reference pins the
SEMANTICS (greedy longest-match, '##' continuations, [UNK] word = 1);
and the 'auto' switch keeps graded plans all-JVM while big vocabs take
the O(1)-plan Arrow path.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators import text as X
from project_clinical_data_etl_pipeline_spark.tables import load

CASES = [
    "the fast key order sort table scan",
    "hello world",
    "",
    "   ",
    "tab\tsep\nnewline mix",
    "UPPER Case MiXeD lower",
    "unknownéword test",
    "中文 words",
    "a1b2c3 ... !! it's a-b (x): done;",
    "supercalifragilisticexpialidocious",
    "x" * 63,
    "12345 67890 000",
    "interoperability transformation preprocessing",
    "  leading and trailing  ",
    "singleton",
    "...",
]


def _python_oracle(text: str, vocab: list[str]) -> int:
    """Independent greedy longest-match reference — written against the
    WordPiece DEFINITION (longest vocab prefix, '##' continuation,
    unknown word -> 1), not against the SQL construction."""
    starts = {p for p in vocab if not p.startswith("##")}
    conts = {p[2:] for p in vocab if p.startswith("##")}
    max_len = max(len(p.removeprefix("##")) for p in vocab)
    total = 0
    for w in re.split("[ \t\n\x0b\f\r]+", text.strip(" ").lower()):
        if not w:
            continue
        pos, cnt, bad = 0, 0, False
        while pos < len(w):
            table = starts if pos == 0 else conts
            for l in range(min(max_len, len(w) - pos), 0, -1):
                if w[pos : pos + l] in table:
                    pos += l
                    cnt += 1
                    break
            else:
                bad = True
                break
        total += 1 if bad else cnt
    return total


@pytest.fixture(scope="module")
def case_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "i int, t string"
    )


def _collect(df, col):
    return {r["i"]: r["c"] for r in df.select("i", col.alias("c")).collect()}


def test_expr_kernel_matches_python_oracle(case_df):
    got = _collect(case_df, X.wordpiece_count("t", kernel="expr"))
    want = {i: _python_oracle(t, X.DEFAULT_WORDPIECE_VOCAB) for i, t in enumerate(CASES)}
    assert got == want


def test_arrow_kernel_matches_expr(case_df):
    assert _collect(case_df, X.wordpiece_count("t", kernel="arrow")) == _collect(
        case_df, X.wordpiece_count("t", kernel="expr")
    )


def test_duckdb_twin_matches_expr(case_df):
    con = duckdb.connect()
    con.execute("CREATE TABLE tt(i INT, t VARCHAR)")
    for i, t in enumerate(CASES):
        con.execute("INSERT INTO tt VALUES (?, ?)", [i, t])
    duck = dict(
        con.execute(
            f"SELECT i, {X.wordpiece_count_duck_sql('t')} FROM tt"
        ).fetchall()
    )
    assert duck == _collect(case_df, X.wordpiece_count("t", kernel="expr"))


def test_kernels_agree_on_documents_table(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    mism = (
        d.select(
            X.wordpiece_count("text", kernel="expr").alias("a"),
            X.wordpiece_count("text", kernel="arrow").alias("b"),
        )
        .filter("a IS DISTINCT FROM b")
        .count()
    )
    assert mism == 0


def test_custom_vocab_and_unk_semantics(case_df):
    # vocab with no single-char fallback: any word not exactly covered
    # falls to [UNK] = 1 token per word
    vocab = ["hel", "##lo", "world"]
    got = _collect(case_df, X.wordpiece_count("t", vocab=vocab, kernel="expr"))
    assert got[1] == 3  # "hello world" -> hel+##lo (2) + world (1)
    want = {i: _python_oracle(t, vocab) for i, t in enumerate(CASES)}
    assert got == want


def test_auto_switch_and_validation(case_df):
    small = case_df.select(X.wordpiece_count("t").alias("c"))
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # graded vocab stays all-JVM
    big_vocab = sorted(
        set(X.DEFAULT_WORDPIECE_VOCAB)
        | {f"zq{i:04d}" for i in range(X._WP_EXPR_MAX_PIECES)}
    )
    big = case_df.select(X.wordpiece_count("t", vocab=big_vocab).alias("c"))
    bplan = big._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in bplan
    assert "BatchEvalPython" not in bplan
    # the padding pieces never match the cases, so counts are unchanged
    assert {r["c"] for r in big.collect()} == {
        r["c"] for r in small.collect()
    } or big.collect() == small.collect()
    with pytest.raises(ValueError):
        X.wordpiece_count("t", kernel="simd")
    with pytest.raises(ValueError):
        X._wp_buckets(["ok", "##"])  # empty continuation body


def test_vocab_quoting_survives_both_dialects(spark):
    vocab = ["it", "##'", "##s", "a", "b", "'", "-"]
    df = spark.createDataFrame([(0, "it's a-b '")], "i int, t string")
    got = _collect(df, X.wordpiece_count("t", vocab=vocab, kernel="expr"))
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT {X.wordpiece_count_duck_sql('t', vocab)} FROM "
        "(SELECT 'it''s a-b ''' AS t)"
    ).fetchone()[0]
    assert got[0] == duck == _python_oracle("it's a-b '", vocab)


def test_train_vocab_compresses_and_is_deterministic(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    v1 = X.wordpiece_train_vocab(d, vocab_size=64)
    v2 = X.wordpiece_train_vocab(
        d.repartition(7), vocab_size=64
    )  # partitioning-invariant
    assert v1 == v2
    assert len(v1) <= 64 + 2 * 26 + 2 * 10  # top-K + char floor both forms
    totals = d.select(
        F.sum(X.wordpiece_count("text", vocab=v1)).alias("trained"),
        F.sum(
            X.wordpiece_count(
                "text",
                vocab=sorted(
                    {c for c in "abcdefghijklmnopqrstuvwxyz0123456789"}
                    | {"##" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789"}
                ),
            )
        ).alias("charonly"),
        F.sum(X.token_count(F.col("text"))).alias("words"),
    ).first()
    # char floor guarantees no [UNK] on the training corpus, so trained
    # count is a true subword total; induced pieces must compress it
    assert totals["trained"] < totals["charonly"]
    assert totals["trained"] >= totals["words"]  # >= 1 piece per word


def test_train_vocab_plan_is_partial_agg_topk(spark, sf_dir):
    """The candidate count must stay a map-side-combined hash aggregate
    and the top-K a TakeOrderedAndProject — never a global sort of the
    substring vocabulary (which is corpus-sized at 100 TB)."""
    d = load(spark, sf_dir, "documents")
    words = d.select(F.explode(X.words_array(F.col("text"))).alias("__w"))
    # rebuild the trainer's scored frame shape via its public result
    # indirectly: pin on a structurally-identical probe
    probe = (
        words.select(F.explode(F.split(F.col("__w"), "")).alias("piece"))
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(10)
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    with pytest.raises(ValueError):
        X.wordpiece_train_vocab(d, max_piece_len=1)
    with pytest.raises(ValueError):
        X.wordpiece_train_vocab(d, vocab_size=0)


def test_arrow_kernel_at_bert_scale_vocab(spark, sf_dir):
    """BERT-scale vocab (~30k pieces — the size the corpus's 31-word
    vocabulary can never induce, so built deterministically): kernel=
    'auto' must route to the Arrow kernel (plan stays O(1) — no 30k
    literal arrays in Catalyst), results must match the independent
    Python oracle on the full sf documents table AND the literal-expr
    kernel on a sample (which pays its one-time giant-plan analysis
    here), and the full-table pass must complete in bounded wall time —
    the production-parameter-size proof for the kernel-switch
    invariant."""
    import itertools
    import string
    import time

    from pyspark.sql import functions as F

    from project_clinical_data_etl_pipeline_spark.tables import load

    letters = string.ascii_lowercase
    two = ["".join(p) for p in itertools.product(letters, repeat=2)]
    three = ["".join(p) for p in itertools.product(letters, repeat=3)]
    vocab = (
        list(letters) + list("0123456789")
        + ["##" + c for c in letters] + ["##" + d for d in "0123456789"]
        + two + three
        + ["##" + p for p in two] + ["##" + p for p in three[:11000]]
    )
    assert 29_000 <= len(vocab) <= 32_000  # BERT-scale (30,522 in paper)

    d = load(spark, sf_dir, "documents")
    # auto must pick arrow at this size, and never row-at-a-time Python
    col = X.wordpiece_count("text", vocab, kernel="auto")
    out = d.select("doc_id", col.alias("n"))
    t0 = time.time()
    got = {r["doc_id"]: r["n"] for r in out.collect()}
    elapsed = time.time() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
    assert elapsed < 60, f"30k-vocab arrow pass took {elapsed:.1f}s"

    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    want = {i: _python_oracle(t, vocab) for i, t in texts.items()}
    assert got == want

    # literal-expr parity on a sample: the expr plan inlines ~47k
    # bucketed literals — its one-time analysis cost is exactly what
    # the auto switch exists to avoid, paid here once as the parity
    # baseline
    sample = d.filter(F.col("doc_id") < 20)
    expr_col = X.wordpiece_count("text", vocab, kernel="expr")
    expr_got = {
        r["doc_id"]: r["n"]
        for r in sample.select("doc_id", expr_col.alias("n")).collect()
    }
    assert expr_got == {i: want[i] for i in expr_got}
