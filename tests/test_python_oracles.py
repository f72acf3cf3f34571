"""Standalone Python bit-exact oracles for the kernels that have no
DuckDB SQL twin (the xxhash64-based production sketches) —
the driver records only rows-only checks for their suite, so THIS module is
their correctness gate.

Every reference implementation here is independent of the package under
test: its own XXH64 (verified against Spark's xxhash64 below), its own
splitmix64 constant derivation, ASCII ``\\s`` regex classes (Java regex
semantics — Python's default ``\\s`` is Unicode), and Java-compatible
split/trim behavior (trim strips spaces only; split keeps trailing
empty strings).
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.queries import REGISTRY, llmdata
from project_clinical_data_etl_pipeline_spark.tables import load

# ---------------------------------------------------------------------------
# Pure-Python XXH64, bit-compatible with Spark's xxhash64 expression
# (seed 42; multi-column calls chain the running hash as the next seed).

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over ``data`` (unsigned result)."""
    n, i = len(data), 0
    if n >= 32:
        v = [
            (seed + _P1 + _P2) & _M64,
            (seed + _P2) & _M64,
            seed & _M64,
            (seed - _P1) & _M64,
        ]
        while i + 32 <= n:
            for j in range(4):
                k = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v[j] = (_rotl((v[j] + k * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & _M64
        for vj in v:
            h ^= (_rotl((vj * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def _hash_int(x: int, seed: int) -> int:
    """Spark XXH64.hashInt — how an IntegerType argument chains."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((x & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(s: str, seed: int = 42) -> int:
    """= F.xxhash64(lit(s)) — signed 64-bit like Spark."""
    return _signed(xxh64_bytes(s.encode("utf-8"), seed))


def spark_xxhash64_str_int(s: str, extra: int, seed: int = 42) -> int:
    """= F.xxhash64(lit(s), lit(extra)) — the running hash seeds the
    IntegerType argument's hash."""
    return _signed(_hash_int(extra, xxh64_bytes(s.encode("utf-8"), seed)))


def test_xxh64_reference_matches_spark(spark):
    """Anchor: the Python XXH64 must equal Spark's expression on strings
    covering every tail-length branch and the chained-int form."""
    samples = [
        "", "a", "abc", "1234", "1234567", "12345678", "hello world",
        "x" * 31, "y" * 32, "z" * 33, "é unicode ü", "w " * 40,
    ]
    rows = (
        spark.createDataFrame([(s,) for s in samples], "s string")
        .select("s", F.xxhash64("s").alias("h1"), F.xxhash64("s", F.lit(7)).alias("h2"))
        .collect()
    )
    for r in rows:
        assert spark_xxhash64(r["s"]) == r["h1"], repr(r["s"])
        assert spark_xxhash64_str_int(r["s"], 7) == r["h2"], repr(r["s"])


# ---------------------------------------------------------------------------
# Java-compatible text primitives (ASCII \s; trim = spaces only; split
# keeps trailing empties like Spark's split with limit -1).

_WS = re.compile(r"\s+", re.ASCII)
_NON_ALNUM = re.compile(r"[^a-z0-9\s]", re.ASCII)


def java_words(text: str) -> list[str]:
    """Mirror F.split(F.lower(F.trim(col)), r'\\s+')."""
    t = text.lower().strip(" ")
    return _WS.split(t)


def normalize_text(text: str) -> str:
    """Mirror dedup.normalize_text: lower → strip non-alnum → collapse
    ws → trim."""
    t = text.lower()
    t = _NON_ALNUM.sub("", t)
    t = _WS.sub(" ", t)
    return t.strip(" ")


def shingles(text: str, k: int) -> list[str]:
    """Mirror dedup.with_shingles (zip-with-shifted-slices): complete
    k-word shingles over the NORMALIZED text, or one whole-text shingle
    for docs shorter than k words."""
    words = normalize_text(text).split(" ")
    if len(words) >= k:
        return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return [" ".join(words)]


def _splitmix(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


# ---------------------------------------------------------------------------
# MinHash + LSH oracle (dedup_minhash_pairs: num_hashes=32, bands=8, k=3)


def minhash_signature(text: str, num_hashes: int = 32, k: int = 3) -> list[int]:
    a = [(_splitmix(2 * i + 1) % ((1 << 30) - 1)) | 1 for i in range(num_hashes)]
    c = [_splitmix(3 * i + 7) % (1 << 32) for i in range(num_hashes)]
    sig = [(1 << 63) - 1] * num_hashes
    for sh in shingles(text, k):
        h32 = xxh64_bytes(sh.encode("utf-8"), 42) & 0xFFFFFFFF
        for i in range(num_hashes):
            hi = ((h32 ^ c[i]) * a[i]) >> 13
            if hi < sig[i]:
                sig[i] = hi
    return sig


def minhash_pairs_oracle(docs: list[tuple[int, str]]) -> dict[tuple[int, int], float]:
    num_hashes, bands = 32, 8
    rows_per_band = num_hashes // bands
    sigs = {doc_id: minhash_signature(text) for doc_id, text in docs}
    buckets: dict[tuple[int, tuple[int, ...]], list[int]] = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            key = (b, tuple(sig[b * rows_per_band : (b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(doc_id)
    pairs: dict[tuple[int, int], float] = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i, id_a in enumerate(ids):
            for id_b in ids[i + 1 :]:
                if (id_a, id_b) not in pairs:
                    match = sum(
                        1 for x, y in zip(sigs[id_a], sigs[id_b]) if x == y
                    )
                    pairs[(id_a, id_b)] = match / float(num_hashes)
    return pairs


def test_minhash_pairs_match_python_oracle(spark, sf_dir):
    docs = [
        (r["doc_id"], r["text"])
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ]
    expected = minhash_pairs_oracle(docs)
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in llmdata.dedup_minhash_pairs(spark, sf_dir).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# md5-salted MinHash oracle (dedup_minhash_md5: num_hashes=8, bands=4,
# k=3 — the DuckDB-twinnable kernel; same banding tail as above)


def minhash_md5_pairs_oracle(
    docs: list[tuple[int, str]], num_hashes: int = 8, bands: int = 4
) -> dict[tuple[int, int], float]:
    import hashlib

    rows_per_band = num_hashes // bands
    sigs = {
        doc_id: [
            min(
                hashlib.md5(f"{j}|{sh}".encode("utf-8")).hexdigest()
                for sh in shingles(text, 3)
            )
            for j in range(num_hashes)
        ]
        for doc_id, text in docs
    }
    buckets: dict[tuple[int, tuple[str, ...]], list[int]] = {}
    for doc_id, sig in sigs.items():
        for b in range(bands):
            key = (b, tuple(sig[b * rows_per_band : (b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(doc_id)
    pairs: dict[tuple[int, int], float] = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i, id_a in enumerate(ids):
            for id_b in ids[i + 1 :]:
                if (id_a, id_b) not in pairs:
                    match = sum(
                        1 for x, y in zip(sigs[id_a], sigs[id_b]) if x == y
                    )
                    pairs[(id_a, id_b)] = match / float(num_hashes)
    return pairs


def test_minhash_md5_pairs_match_python_oracle(spark, sf_dir):
    docs = [
        (r["doc_id"], r["text"])
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ]
    expected = minhash_md5_pairs_oracle(docs)
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in llmdata.dedup_minhash_md5(spark, sf_dir).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# SimHash oracle (dedup_simhash_pairs: k=2 shingles over RAW words,
# xxhash64(shingle, 7), vote per occurrence, max_hamming=3)


def simhash64(text: str) -> int:
    votes = [0] * 64
    for sh in shingles(text, 2):
        h = spark_xxhash64_str_int(sh, 7) & _M64  # unsigned view of the hash
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    u = 0
    for b in range(64):
        if votes[b] > 0:
            u |= 1 << b
    return _signed(u)


def simhash_pairs_oracle(docs: list[tuple[int, str]]) -> dict[tuple[int, int], int]:
    """All pairs at Hamming ≤ 3. The 4×16-bit block LSH is provably
    complete at this radius (pigeonhole: 3 flipped bits cannot touch all
    4 blocks), so candidate generation loses nothing vs all-pairs."""
    hs = {doc_id: simhash64(text) & _M64 for doc_id, text in docs}
    ids = sorted(hs)
    out: dict[tuple[int, int], int] = {}
    for i, id_a in enumerate(ids):
        for id_b in ids[i + 1 :]:
            d = bin(hs[id_a] ^ hs[id_b]).count("1")
            if d <= 3:
                out[(id_a, id_b)] = d
    return out


def test_simhash_pairs_match_python_oracle(spark, sf_dir):
    docs = [
        (r["doc_id"], r["text"])
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ]
    expected = simhash_pairs_oracle(docs)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in llmdata.dedup_simhash_pairs(spark, sf_dir).collect()
    }
    assert got == expected


def test_simhash_value_matches_python_oracle(spark, sf_dir):
    """Signature-level check (stronger than pair-level: a constant-zero
    simhash would still produce matching pairs)."""
    from project_clinical_data_etl_pipeline_spark.operators.dedup import (
        simhash64_by_key,
    )

    d = load(spark, sf_dir, "documents").limit(50)
    got = {
        r["doc_id"]: r["sh"]
        for r in simhash64_by_key(d, "doc_id", "text", "sh").select(
            "doc_id", "sh"
        ).collect()
    }
    docs = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    for doc_id, text in docs.items():
        assert got[doc_id] == simhash64(text), f"doc {doc_id}"


# ---------------------------------------------------------------------------
# Rolling-fingerprint oracle (text_rolling_fingerprint: window=8 over
# raw lower/trim/split words, xxhash64 seed 42, min over spans)


def rolling_fingerprint(text: str, window: int = 8) -> int:
    words = java_words(text)
    n = len(words)
    top = max(n - (window - 1), 1)
    best = None
    for i in range(top):
        span = " ".join(words[i : i + window])  # slice saturates like F.slice
        h = spark_xxhash64(span)
        if best is None or h < best:
            best = h
    return best


def rolling_fingerprint_md5(text: str, window: int = 8) -> str:
    """md5-kernel twin of :func:`rolling_fingerprint`: lexicographic min
    of the span hex digests (the graded kernel)."""
    import hashlib

    words = java_words(text)
    top = max(len(words) - (window - 1), 1)
    return min(
        hashlib.md5(" ".join(words[i : i + window]).encode()).hexdigest()
        for i in range(top)
    )


def test_rolling_fingerprint_matches_python_oracle(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    got = {
        r["doc_id"]: r["rolling_fp_md5"]
        for r in REGISTRY["text_rolling_fingerprint"].run(spark, sf_dir).collect()
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        assert got[doc_id] == rolling_fingerprint_md5(text), f"doc {doc_id}"


# ---------------------------------------------------------------------------
# Multimodal fake-decode oracle (multimodal_decode: sha256-derived dims)


def fake_decode_dims(payload: bytes) -> tuple[int, int, int]:
    h = hashlib.sha256(payload).digest()
    return 64 + h[0], 64 + h[1], 3


def test_multimodal_decode_matches_python_oracle(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    got = {
        r["media_id"]: (r["width"], r["height"], r["n_channels"])
        for r in REGISTRY["multimodal_decode"].run(spark, sf_dir).collect()
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        assert got[doc_id] == fake_decode_dims(text.encode("utf-8")), f"doc {doc_id}"


# ---------------------------------------------------------------------------
# Fuzz: the oracles must track Spark on adversarial strings, not just
# the synthetic corpus — unicode, ASCII-vs-unicode whitespace (\xa0 is
# NOT Java \s), empty/whitespace-only docs, and >32-byte tails.


def _fuzz_strings() -> list[str]:
    import random

    rng = random.Random(20260813)
    words = ["the", "fox", "Wörld", "café", "123", "a", "ZZZ", "d'une", "naïve"]
    punct = [".", ",", "!", "--", "~", "|"]
    out = [
        "",
        " ",
        "\t\n\x0b\f\r",
        "a",
        "one two",
        "\xa0nbsp\xa0joined",  # U+00A0: Python/Java ASCII \s both exclude it
        "word " * 40,  # multi-chunk xxh64 input
        "Tab\tseparated\nlines\rcarriage",
    ]
    for _ in range(60):
        n = rng.randint(1, 25)
        toks = []
        for _ in range(n):
            toks.append(rng.choice(words) + (rng.choice(punct) if rng.random() < 0.4 else ""))
        sep = rng.choice([" ", "  ", " \t"])
        out.append(sep.join(toks))
    return out


def test_sketch_oracles_track_spark_on_fuzz_strings(spark):
    from pyspark.sql import functions as SF

    from project_clinical_data_etl_pipeline_spark.operators import text as X
    from project_clinical_data_etl_pipeline_spark.operators.dedup import (
        minhash_signature_from_shingles,
        simhash64_by_key,
        with_shingles,
    )

    rows = [(i, s) for i, s in enumerate(_fuzz_strings())]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in with_shingles(df, "text", k=3)
        .select(
            "doc_id",
            minhash_signature_from_shingles(SF.col("__shingles"), 32).alias("sig"),
        )
        .collect()
    }
    rolling = {
        r["doc_id"]: r["rfp"]
        for r in X.with_rolling_fingerprint(df, "text", "rfp").select(
            "doc_id", "rfp"
        ).collect()
    }
    simhashes = {
        r["doc_id"]: r["sh"]
        for r in simhash64_by_key(df, "doc_id", "text", "sh")
        .select("doc_id", "sh")
        .collect()
    }
    for doc_id, text in rows:
        assert sigs[doc_id] == minhash_signature(text), (doc_id, repr(text))
        assert rolling[doc_id] == rolling_fingerprint(text), (doc_id, repr(text))
        assert simhashes[doc_id] == simhash64(text), (doc_id, repr(text))

def _repetition_pii_fuzz_strings() -> list[str]:
    """Adversarial docs for the repetition/PII metrics: newline-heavy,
    duplicated lines, boilerplate word repetition, embedded emails /
    SSNs / phone numbers, unicode, and degenerate empties."""
    import random

    rng = random.Random(20260814)
    out = [
        "",
        " ",
        "\n",
        "a\n",
        "one line",
        "dup\ndup\ndup\nuniq",
        "spam spam spam spam ham",
        "the the the the the the",
        "mail me at alice@example.com or bob.smith+tag@sub.domain.co",
        "ssn 123-45-6789 phone 555-123-4567 alt 555.123.4567",
        "edge 123-45-6789-1234 not-a-phone 12-345-6789",
        "mixed\ncafé naïve Wörld\ncafé naïve Wörld\n123-45-6789",
        "a@b.co\na@b.co\na@b.co",
        "\r\nwindows\r\nwindows\r\n",
        "tab\tsep no newline " * 10,
        "- bullet one\n* bullet two\n• bullet three\nplain line",
        "  - indented bullet\nnot-a-bullet -dash inside",
        "truncated line...\nfull line\nunicode trunc…\ndots... mid",
        "para one\n\npara two\n\npara one\n\npara two",
        "#hash #tags... everywhere… #more\n\n#hash",
        "a\n\n\nb",  # odd blank-line run: \n\n split leaves '\nb'
    ]
    words = ["the", "fox", "café", "123", "a", "spam", "x@y.io", "555-123-4567"]
    for _ in range(40):
        n_lines = rng.randint(1, 6)
        lines = []
        for _ in range(n_lines):
            toks = [rng.choice(words) for _ in range(rng.randint(0, 8))]
            lines.append(" ".join(toks))
        if rng.random() < 0.5:
            lines.append(rng.choice(lines))  # force duplicate lines
        out.append("\n".join(lines))
    return out


def test_text_suite_tracks_duckdb_on_repetition_pii_fuzz(spark, monkeypatch):
    """The full text_metrics_suite projection (incl. the Gopher-style
    repetition metrics and PII redaction) must hash-match its DuckDB
    oracle on adversarial strings, not just the tame synthetic corpus.
    Runs the PRODUCTION query code path via a monkeypatched loader."""
    import duckdb
    import pandas as pd

    from project_clinical_data_etl_pipeline_spark.queries import REGISTRY, llmdata
    from tests.oracle_harness import compare

    rows = [(i, s, "en") for i, s in enumerate(_repetition_pii_fuzz_strings())]
    fuzz = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    monkeypatch.setattr(llmdata, "load", lambda _spark, _sf, _name: fuzz)

    spec = REGISTRY["text_metrics_suite"]
    sdf = spec.run(spark, "ignored")

    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    con.register("documents", pdf)
    odf = con.execute(spec.sql).fetchdf()
    problems = compare(sdf, odf)
    con.close()
    assert not problems, "\n".join(problems)


# ---------------------------------------------------------------------------
# Winnowing fingerprints + fuzzy containment (Schleimer et al. / MOSS)


def winnow_oracle(text: str, k: int = 3, window: int = 4) -> list[int]:
    """Mirror dedup.with_winnow_fingerprints: xxhash64 per shingle, min
    of each sliding hash window (slice saturates at the tail like
    F.slice), distinct keeping first occurrence."""
    hs = [spark_xxhash64(sh) for sh in shingles(text, k)]
    upper = max(len(hs) - window + 1, 1)
    mins = [min(hs[i : i + window]) for i in range(upper)]
    out: list[int] = []
    for m in mins:
        if m not in out:
            out.append(m)
    return out


def test_winnow_fingerprints_match_python_oracle(spark):
    from project_clinical_data_etl_pipeline_spark.operators import dedup as D

    rows = [(i, s) for i, s in enumerate(_fuzz_strings())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["w"])
        for r in D.with_winnow_fingerprints(df, "text", out="w")
        .select("doc_id", "w")
        .collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == winnow_oracle(text), (doc_id, repr(text))


def test_containment_pairs_match_python_oracle(spark):
    """Directed containment: an eval paragraph pasted inside a larger
    doc scores near 1.0 in the paragraph→doc direction, much lower the
    other way; unrelated docs never pair. Values must equal the
    set-arithmetic oracle exactly (int/int → IEEE double)."""
    from project_clinical_data_etl_pipeline_spark.operators import dedup as D

    para = " ".join(f"signal{i} token{i * 7 % 13}" for i in range(20))
    host = "intro filler words here. " + para + " trailing commentary text."
    other = " ".join(f"noise{i} blob{i * 5 % 11}" for i in range(25))
    rows = [(0, para), (1, host), (2, other)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in D.containment_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    fps = {i: set(winnow_oracle(t)) for i, t in rows}
    expected = {}
    for s, sf in fps.items():
        for d, df_ in fps.items():
            if s != d and sf & df_:
                expected[(s, d)] = len(sf & df_) / len(sf)
    assert got == expected
    assert got[(0, 1)] >= 0.8  # paragraph ⊂ host
    assert got[(1, 0)] < got[(0, 1)]  # host ⊄ paragraph
    assert (0, 2) not in got and (2, 0) not in got


def test_decontaminate_fuzzy_drops_embedders_keeps_idiom_sharers(spark):
    """Containment decontamination must drop the doc that embeds the
    eval paragraph, keep unrelated docs, and — unlike the exact
    shingle-overlap guard, which fires on ANY shared shingle — keep a
    doc that merely reuses one idiom from the eval text."""
    from project_clinical_data_etl_pipeline_spark.operators import dedup as D

    eval_para = " ".join(f"bench{i} answer{i * 3 % 7}" for i in range(15))
    idiom = " ".join(eval_para.split()[:3])  # one shared 3-gram only
    docs = [
        (0, "clean document " + " ".join(f"w{i}" for i in range(20))),
        (1, "preamble text. " + eval_para + " epilogue text."),
        (2, f"unrelated doc that quotes {idiom} once amid " + " ".join(f"v{i}" for i in range(20))),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    edf = spark.createDataFrame([(100, eval_para)], "doc_id long, text string")

    fuzzy_kept = {
        r["doc_id"]
        for r in D.decontaminate_fuzzy(ddf, edf, "doc_id", "text").collect()
    }
    assert fuzzy_kept == {0, 2}
    exact_kept = {
        r["doc_id"] for r in D.decontaminate(ddf, edf, "doc_id", "text").collect()
    }
    assert exact_kept == {0}  # the blunt guard also drops the idiom-sharer


def test_winnow_guarantee_shared_run_yields_shared_fingerprint():
    """The winnowing theorem (k=3, window=4): ANY two docs sharing a
    verbatim run of ≥ k+window-1 = 6 words share at least one
    fingerprint. Pure-Python over the oracle (proven Spark-identical by
    the fuzz parity test above), so hundreds of cases are cheap."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
    words = st.lists(word, min_size=0, max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(run=st.lists(word, min_size=6, max_size=12),
           pa=words, sa=words, pb=words, sb=words)
    def check(run, pa, sa, pb, sb):
        a = " ".join(pa + run + sa)
        b = " ".join(pb + run + sb)
        assert set(winnow_oracle(a)) & set(winnow_oracle(b)), (a, b)

    check()


# ---------------------------------------------------------------------------
# md5-family SimHash hex oracle (dedup_exact_jaccard_suite 'simhash' leg:
# bits = md5 first 16 hex chars as two unsigned 32-bit halves, k=3
# shingles, duplicates vote each, nibble n = bits 4n..4n+3 weight 2^j)


def simhash_md5_hex(text: str, k: int = 3) -> str:
    import hashlib

    votes = [0] * 64
    for sh in shingles(text, k):
        d = hashlib.md5(sh.encode()).hexdigest()
        hi, lo = int(d[0:8], 16), int(d[8:16], 16)
        for b in range(64):
            half = lo if b < 32 else hi
            votes[b] += 1 if (half >> (b % 32)) & 1 else -1
    return "".join(
        "0123456789abcdef"[
            sum((1 << j) if votes[4 * n + j] > 0 else 0 for j in range(4))
        ]
        for n in range(16)
    )


def test_simhash_md5_hex_matches_python_oracle(spark, sf_dir):
    from project_clinical_data_etl_pipeline_spark.operators.dedup import (
        with_simhash_md5_hex,
    )

    d = load(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: r["simhash_hex"]
        for r in with_simhash_md5_hex(d, "text")
        .select("doc_id", "simhash_hex")
        .collect()
    }
    docs = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        assert got[doc_id] == simhash_md5_hex(text), f"doc {doc_id}"


def test_simhash_md5_hex_fuzz(spark):
    from project_clinical_data_etl_pipeline_spark.operators.dedup import (
        with_simhash_md5_hex,
    )

    rows = [(i, s) for i, s in enumerate(_fuzz_strings())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["simhash_hex"]
        for r in with_simhash_md5_hex(df, "text")
        .select("doc_id", "simhash_hex")
        .collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == simhash_md5_hex(text), (doc_id, repr(text))
