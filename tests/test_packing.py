"""Mixture-sampling + sequence-packing operator tests, each checked
against a standalone pure-Python oracle (md5 via hashlib; greedy
next-fit as the textbook loop) — same gate style as
test_python_oracles.py."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators import packing as P
from project_clinical_data_etl_pipeline_spark.tables import load


def _py_sample_hash(doc_id: int, salt: str = "") -> int:
    return int(hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:4], 16) % 100


def test_deterministic_sample_matches_python_oracle(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id")
    got = {r["doc_id"] for r in P.deterministic_sample(d, "doc_id", 25).collect()}
    all_ids = {r["doc_id"] for r in d.collect()}
    expected = {i for i in all_ids if _py_sample_hash(i) < 25}
    assert got == expected
    # ~25% ± sampling noise, and a different salt draws a different set
    assert 0.1 < len(got) / len(all_ids) < 0.4
    other = {
        r["doc_id"]
        for r in P.deterministic_sample(d, "doc_id", 25, salt="v2").collect()
    }
    assert other == {i for i in all_ids if _py_sample_hash(i, "v2") < 25}
    assert other != got


def test_stratified_mixture_rates(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    rates = {"web": 10, "books": 100}
    got = P.sample_by_rates(d, "doc_id", "source", rates).collect()
    rows = d.collect()
    expected = {
        r["doc_id"]
        for r in rows
        if _py_sample_hash(r["doc_id"]) < rates.get(r["source"], 0)
    }
    assert {r["doc_id"] for r in got} == expected
    # every 'books' row kept; sources outside the rate map fully dropped
    by_source = {r["source"] for r in rows}
    kept_books = sum(1 for r in got if r["source"] == "books")
    total_books = sum(1 for r in rows if r["source"] == "books")
    assert kept_books == total_books
    for s in by_source - set(rates):
        assert all(r["source"] != s for r in got)


def _py_pack_greedy(items: list[tuple[int, int]], budget: int) -> dict[int, int]:
    """items = [(id, tokens)] sorted by id → {id: bin_id} (next-fit)."""
    out, cur_bin, cur_tok = {}, 0, 0
    for doc_id, t in sorted(items):
        if cur_tok > 0 and cur_tok + t > budget:
            cur_bin += 1
            cur_tok = 0
        out[doc_id] = cur_bin
        cur_tok += t
    return out


def test_pack_greedy_matches_python_oracle_and_respects_budget(spark, sf_dir):
    budget = 400
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", F.col("n_chars").alias("n_tokens"))
    )
    got = P.pack_greedy(d, "doc_id", "n_tokens", budget, part_col="source").collect()
    rows = d.collect()
    by_part: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_part.setdefault(r["source"], []).append((r["doc_id"], r["n_tokens"]))
    for part, items in by_part.items():
        expected = _py_pack_greedy(items, budget)
        got_part = {r["id"]: r["bin_id"] for r in got if r["part"] == part}
        assert got_part == expected, part
    # strict capacity: every multi-doc bin total ≤ budget
    totals: dict[tuple[str, int], list[int]] = {}
    for r in got:
        totals.setdefault((r["part"], r["bin_id"]), []).append(r["n_tokens"])
    for (part, b), toks in totals.items():
        if len(toks) > 1:
            assert sum(toks) <= budget, (part, b, sum(toks))


def test_window_pack_bins_bounded_overflow(spark, sf_dir):
    """The scalable window form: bin totals ≤ budget + max doc (the
    straddling doc stays in its starting bin); bins start at 0 per
    partition (ids may legitimately skip after an over-budget doc —
    floor(start/budget) jumps with the offset)."""
    budget = 400
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("n_tokens")
    )
    binned = P.with_pack_bins(d, "doc_id", "n_tokens", budget).collect()
    max_doc = max(r["n_tokens"] for r in binned)
    totals: dict[tuple[str, int], int] = {}
    bins_per_part: dict[str, set[int]] = {}
    for r in binned:
        totals[(r["source"], r["bin_id"])] = (
            totals.get((r["source"], r["bin_id"]), 0) + r["n_tokens"]
        )
        bins_per_part.setdefault(r["source"], set()).add(r["bin_id"])
    for total in totals.values():
        assert total <= budget + max_doc
    for part, bins in bins_per_part.items():
        assert min(bins) == 0, part

def _py_split(doc_id: int, salt: str, bounds: list[tuple[str, str]], last: str) -> str:
    h = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:4]
    for name, bound in bounds:
        if h < bound:
            return name
    return last


def test_with_split_matches_python_oracle_and_is_deterministic(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id")
    splits = (("train", 90), ("val", 5), ("test", 5))
    bounds = P.split_bounds_hex(splits)
    assert bounds == [("train", "e666"), ("val", "f333")]
    got = {r["doc_id"]: r["split"] for r in P.with_split(d, "doc_id").collect()}
    for doc_id, split in got.items():
        assert split == _py_split(doc_id, "", bounds, "test"), doc_id
    # all three buckets populated, train dominant
    from collections import Counter

    c = Counter(got.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] + c["test"]
    # a different salt reassigns some rows; the same salt never does
    salted = {
        r["doc_id"]: r["split"]
        for r in P.with_split(d, "doc_id", salt="v2").collect()
    }
    assert salted != got
    again = {r["doc_id"]: r["split"] for r in P.with_split(d, "doc_id").collect()}
    assert again == got


def test_with_split_rejects_bad_weights(spark):
    import pytest

    d = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 100"):
        P.with_split(d, "doc_id", splits=(("train", 90), ("val", 5)))


def test_cap_per_key_matches_single_phase_window(spark):
    """Two-phase cap (broadcast bypass for under-cap keys + window only
    over over-cap keys) must equal the plain corpus-wide row_number
    formulation — on a skewed corpus that exercises BOTH branches."""
    from pyspark.sql import Window

    rows = [("hot", i, float(i % 7)) for i in range(40)]  # over cap
    rows += [("cold%d" % k, 1000 + 10 * k + i, 1.0) for k in range(5) for i in range(3)]
    df = spark.createDataFrame(rows, "source string, doc_id long, quality double")

    order = [F.col("quality").desc(), F.col("doc_id").asc()]
    got = {
        (r["source"], r["doc_id"]): r["in_cap"]
        for r in P.cap_per_key(df, "source", 10, order).collect()
    }
    w = Window.partitionBy("source").orderBy(*order)
    expected = {
        (r["source"], r["doc_id"]): r["flag"]
        for r in df.withColumn(
            "flag", (F.row_number().over(w) <= 10).cast("int")
        ).collect()
    }
    assert got == expected
    # both branches actually ran: every cold row kept, exactly 10 hot kept
    assert all(v == 1 for (s, _), v in got.items() if s.startswith("cold"))
    assert sum(v for (s, _), v in got.items() if s == "hot") == 10
    assert len(got) == len(rows)


def test_chunk_documents_semantics(spark):
    """Python-oracle chunking: coverage (concatenated strides rebuild
    the document), overlap between neighbors, short/empty-doc floor."""
    from project_clinical_data_etl_pipeline_spark.operators.packing import (
        chunk_documents,
    )

    C, V = 10, 4  # stride 6
    texts = {
        0: "abcdefghijklmnopqrstuvwxyz",  # 26 chars → ceil(22/6)=4 chunks
        1: "short",  # < chunk → 1 full-text chunk
        2: "",  # empty → 1 empty chunk
        3: "x" * 10,  # exactly one window
        4: "x" * 11,  # one char past → 2 chunks
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    out = chunk_documents(df, chunk_chars=C, overlap=V)
    got: dict[int, list] = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r)
    for rows in got.values():
        rows.sort(key=lambda r: r["chunk_id"])

    stride = C - V
    for doc_id, text in texts.items():
        rows = got[doc_id]
        n_expect = max(1, -(-(max(len(text) - V, 0)) // stride)) if len(
            text
        ) > V else 1
        assert len(rows) == n_expect, (doc_id, len(rows), n_expect)
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        for i, r in enumerate(rows):
            assert r["chunk_text"] == text[i * stride : i * stride + C]
            assert r["chunk_len"] == len(r["chunk_text"])
        # coverage: strided prefixes + final chunk rebuild the text
        rebuilt = "".join(r["chunk_text"][:stride] for r in rows[:-1]) + rows[-1][
            "chunk_text"
        ]
        assert rebuilt == text
        # overlap: neighbor chunks share V chars (when the next is full)
        for a, b in zip(rows, rows[1:]):
            assert a["chunk_text"][stride:] == b["chunk_text"][: len(
                a["chunk_text"]
            ) - stride]


def test_chunk_documents_rejects_bad_overlap(spark):
    from project_clinical_data_etl_pipeline_spark.operators.packing import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=5, overlap=5)


def test_chunk_documents_duckdb_parity_on_adversarial_unicode(spark, tmp_path):
    """The graded corpus_chunks oracle runs on ASCII-ish synthetic
    text; pin the Spark-vs-DuckDB twin on what it does NOT cover —
    multi-byte code points, surrogate-pair emoji, combining marks,
    newlines — where substring/length semantics could diverge
    (both engines count code points; this proves it)."""
    import duckdb

    from project_clinical_data_etl_pipeline_spark.operators.packing import (
        chunk_documents,
        chunk_documents_sql,
    )

    texts = [
        "héllo wörld ünïcode " * 9,
        "日本語のテキストです。" * 20,
        "emoji 😀😁😂🤣😃 pairs " * 12,
        "á" * 150,  # combining acute: 300 code points
        "line\nbreaks\n" * 25,
        "mixed ascii 日本 😀 é tail " * 8,
        "x",
        "",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)

    sdf = chunk_documents(
        spark.read.parquet(path), chunk_chars=40, overlap=10
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["chunk_len"])
        for r in sdf.collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            chunk_documents_sql(chunk_chars=40, overlap=10)
        ).fetchall()
    )
    assert got == want
