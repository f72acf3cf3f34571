"""Training-data-pipeline queries over ``documents`` and ``embeddings``:
dedup (exact / minhash-LSH / simhash / n-gram Jaccard), similarity
search (brute-force + LSH), text analysis, fingerprinting, multimodal
plumbing.

Oracle-checkable ops use md5 (identical hex in Spark & DuckDB) and
integer-exact ratios; xxhash64-based ops (minhash/simhash) have no
DuckDB twin → registered without SQL (driver records rows-only).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import packing as P
from ..operators import similarity as S
from ..operators import text as X
from ..tables import load
from .base import QuerySpec, spec

QUERIES: dict[str, QuerySpec] = {}

# Canonicalization in DuckDB — mirrors dedup.normalize_text / text.fingerprint.
# DuckDB regexp_replace needs the 'g' flag (Spark replaces all by default).
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)


_DEDUP_EXACT_SQL = f"""
    SELECT md5({_NORM}) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_dups
    FROM documents GROUP BY 1
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized-content hash-groupBy. Only
    (hash, id) shuffles — never the text. keep = min id. Graded as the
    'exact' leg of dedup_exact_jaccard_suite; standalone for bench.py's
    timing series."""
    return D.exact_dedup_groups(load(spark, sf_dir, "documents"), "doc_id", "text")


def _langid_sql() -> str:
    """Generate the oracle CASE for the stopword-vote language heuristic,
    mirroring text.lang_guess (same marker sets, same tie priority)."""
    counts = {
        lang: (
            "len(list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'), "
            f"w -> w IN ({', '.join(repr(m) for m in markers)})))"
        )
        for lang, markers in X._LANG_MARKERS.items()
    }
    best = f"greatest({counts['en']}, {counts['fr']}, {counts['de']}, {counts['es']})"
    # priority en > fr > de > es on ties (documented policy in lang_guess)
    whens = "\n".join(
        f"WHEN {best} > 0 AND {counts[lang]} = {best} THEN '{lang}'"
        for lang in ["en", "fr", "de", "es"]
    )
    return f"CASE {whens} ELSE 'und' END"


_PII_ALTERNATION = (
    "([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,})"
    "|(\\b\\d{3}-\\d{2}-\\d{4}\\b)"
    "|(\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b)"
)

_PII_REDACT = (
    "regexp_replace(regexp_replace(regexp_replace(text,"
    " '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),"
    " '\\b\\d{3}-\\d{2}-\\d{4}\\b', '[SSN]', 'g'),"
    " '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '[PHONE]', 'g')"
)

_TEXT_SUITE_SQL = f"""
    WITH t AS (
        SELECT doc_id, text, lang,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_calc,
               CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) AS punct_ratio,
               len(list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
                   w -> w IN ('the', 'and', 'of', 'to', 'is'))) AS n_stops,
               string_split(text, chr(10)) AS ls,
               string_split(text, chr(10) || chr(10)) AS ps,
               string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+') AS ws
        FROM documents
    ),
    t2 AS (
        SELECT *,
               list_transform(generate_series(1, greatest(len(ws) - 1, 1)),
                              i -> array_to_string(ws[i:i+1], ' ')) AS g2
        FROM t
    ),
    t3 AS (
        SELECT *,
               list_max(list_transform(list_distinct(g2),
                        d -> len(list_filter(g2, x -> x = d)))) AS g2top
        FROM t2
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           n_chars_calc,
           punct_ratio,
           CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
               / greatest(n_tokens, 1) AS mean_word_len,
           md5({_NORM}) AS fp,
           lang AS lang_declared,
           {_langid_sql()} AS lang_pred,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS n_bpeish_tokens,
           {X.wordpiece_count_duck_sql("text")} AS n_wp_tokens,
           CAST(n_stops AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio,
           least(CAST(n_chars_calc AS DOUBLE) / 500.0, 1.0) * 0.4
             + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3
             + least((CAST(n_stops AS DOUBLE) / greatest(n_tokens, 1)) * 5.0, 1.0) * 0.3
               AS quality_score,
           1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / CAST(len(ls) AS DOUBLE)
               AS dup_line_frac,
           1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE)
               AS dup_word_frac,
           CAST(list_max(list_transform(list_distinct(ws),
                    w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE)
               / CAST(len(ws) AS DOUBLE) AS top_word_frac,
           CAST(len(regexp_extract_all(text, '{_PII_ALTERNATION}')) AS BIGINT)
               AS pii_hits,
           md5({_PII_REDACT}) AS redacted_fp,
           1.0 - CAST(len(list_distinct(ps)) AS DOUBLE) / CAST(len(ps) AS DOUBLE)
               AS dup_para_frac,
           CAST(length(array_to_string(ls, '')) -
                    length(array_to_string(list_distinct(ls), '')) AS DOUBLE)
               / CAST(greatest(length(array_to_string(ls, '')), 1) AS DOUBLE)
               AS dup_line_char_frac,
           CAST(length(array_to_string(ps, '')) -
                    length(array_to_string(list_distinct(ps), '')) AS DOUBLE)
               / CAST(greatest(length(array_to_string(ps, '')), 1) AS DOUBLE)
               AS dup_para_char_frac,
           CAST(len(list_filter(ls, l -> regexp_matches(l, '^\\s*[-*•]')))
                    AS DOUBLE) / CAST(len(ls) AS DOUBLE) AS bullet_line_frac,
           CAST(len(list_filter(ls, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
                    AS DOUBLE) / CAST(len(ls) AS DOUBLE) AS ellipsis_line_frac,
           CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS DOUBLE)
               / greatest(n_tokens, 1) AS symbol_word_ratio,
           CAST(g2top * length(replace(
                    list_max(list_filter(list_distinct(g2),
                        d -> len(list_filter(g2, x -> x = d)) = g2top)),
                    ' ', '')) AS DOUBLE)
               / greatest(length(array_to_string(ws, '')), 1)
               AS top_2gram_char_frac
    FROM t3
"""


@spec(
    QUERIES,
    "text_metrics_suite",
    sql=_TEXT_SUITE_SQL,
    doc="Text-analysis suite in one map-only projection over documents: "
    "token count, char count, punctuation ratio, mean word length, md5 "
    "content fingerprint (the incremental-dedup primitive), stopword-vote "
    "language-ID with fixed tie priority, BPE-ish subword token estimate, "
    "a REAL greedy longest-match WordPiece subword count over a length-"
    "bucketed literal vocab (operators.text.wordpiece_count; the SQL "
    "twin is generated from the same buckets), "
    "stopword ratio, the weighted [0,1] quality heuristic used to "
    "filter training corpora, the Gopher repetition/format rules "
    "(duplicate-line/paragraph/word fractions, top-word fraction, "
    "bullet- and ellipsis-line fractions, symbol-to-word ratio), and "
    "PII redaction (email/SSN/phone → typed tokens; hit count + "
    "redacted-content md5). All ratios are exact-integer numerators/"
    "denominators "
    "combined in a fixed operation order → engine-deterministic doubles. "
    "At scale this is a free rider on any scan.",
    tags=("llm", "bench"),
)
def text_metrics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    # words materialized once: the repetition metrics reference the array
    # from interpreted HOF lambdas, which would otherwise re-tokenize per
    # element (no CSE). Multi-use + non-cheap keeps CollapseProject away.
    d = d.withColumn("__ws", X.words_array(t))
    d = d.withColumn("__ls", F.split(t, r"\n"))
    d = d.withColumn("__ps", F.split(t, r"\n\n"))
    d = X.with_top_ngram(d, "__ws", "__t2", n=2)
    # n=1 gives the word mode: same sorted-run machinery, O(L log L) —
    # value-identical to the naive count-per-distinct form the SQL
    # oracle uses (only the count feeds the fraction, ties irrelevant)
    d = X.with_top_ngram(d, "__ws", "__t1", n=1)
    return d.select(
        "doc_id",
        X.token_count(t).alias("n_tokens"),
        X.char_count(t).alias("n_chars_calc"),
        X.punct_ratio(t).alias("punct_ratio"),
        X.mean_word_length(t).alias("mean_word_len"),
        X.fingerprint(t).alias("fp"),
        F.col("lang").alias("lang_declared"),
        X.lang_guess(t).alias("lang_pred"),
        X.bpe_ish_token_count(t).alias("n_bpeish_tokens"),
        # real greedy longest-match WordPiece (operators.text) — the
        # regex proxy above stays for continuity; this is the graded
        # subword count, all-JVM at the built-in vocab size
        X.wordpiece_count("text").alias("n_wp_tokens"),
        X.stopword_ratio(t).alias("stopword_ratio"),
        X.quality_score(t).alias("quality_score"),
        X.dup_fraction(F.col("__ls")).alias("dup_line_frac"),
        X.dup_word_fraction(F.col("__ws")).alias("dup_word_frac"),
        (
            F.col("__t1")["cnt"].cast("double")
            / F.size(F.col("__ws")).cast("double")
        ).alias("top_word_frac"),
        X.pii_hit_count(t).alias("pii_hits"),
        F.md5(X.redact_pii(t)).alias("redacted_fp"),
        X.dup_fraction(F.col("__ps")).alias("dup_para_frac"),
        X.dup_char_fraction(F.col("__ls")).alias("dup_line_char_frac"),
        X.dup_char_fraction(F.col("__ps")).alias("dup_para_char_frac"),
        X.bullet_line_fraction(F.col("__ls")).alias("bullet_line_frac"),
        X.ellipsis_line_fraction(F.col("__ls")).alias("ellipsis_line_frac"),
        X.symbol_word_ratio(t).alias("symbol_word_ratio"),
        X.top_ngram_char_fraction(
            F.col("__t2"), F.length(F.array_join(F.col("__ws"), ""))
        ).alias("top_2gram_char_frac"),
    )


_TOP_NGRAMS_INNER_SQL = """
    WITH w AS (
        SELECT string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+') AS ws FROM documents
    ),
    g AS (
        SELECT unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 1)),
                      i -> array_to_string(ws[i:i+1], ' '))) AS ngram
        FROM w
    )
    SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
    FROM g GROUP BY ngram
    ORDER BY cnt DESC, ngram ASC
    LIMIT 20
"""

# The 'hh' leg's oracle is deliberately the SAME exact top-20: the
# bounded-state composition's CONTRACT is that it returns the true
# top-k whenever every top key clears the Misra-Gries capture bound
# N/(c+1) — grading it against the exact answer grades that capture
# claim cross-engine (true at sf0.001/0.01/0.1/1/4, measured round 11;
# both paths break count ties by ngram asc, so the boundary is
# deterministic in both engines).
_TOP_NGRAMS_SQL = f"""
    SELECT 'exact' AS part, ngram, cnt FROM ({_TOP_NGRAMS_INNER_SQL})
    UNION ALL
    SELECT 'hh' AS part, ngram, cnt FROM ({_TOP_NGRAMS_INNER_SQL})
"""


@spec(
    QUERIES,
    "corpus_top_ngrams",
    sql=_TOP_NGRAMS_SQL,
    doc="Corpus-wide top-20 word 2-grams by term frequency — the "
    "vocabulary/boilerplate/contamination probe (which templates "
    "dominate a crawl). 'exact' leg: explode → hash-agg with map-side "
    "partial combine (each partition collapses its grams before the "
    "exchange) → TakeOrderedAndProject top-k; no global sort of the "
    "vocabulary ever materializes — but the exchange still carries the "
    "distinct n-gram DOMAIN, the term that stops fitting at 100 TB. "
    "'hh' leg (round 11): the bounded-state replacement — per-partition "
    "Misra-Gries candidates (≤ c counters resident, ≤ partitions·(c+1) "
    "rows shuffled) + CMS upper bound + broadcast-pruned exact recount "
    "of every candidate within the MG slack band N//(c+1) of the k-th "
    "(sketch.cms_top_k via "
    "text.corpus_top_ngrams_approx) — graded against the SAME exact "
    "top-20, i.e. the oracle grades the Misra-Gries capture guarantee "
    "itself. Deterministic total order (cnt desc, ngram asc) pins the "
    "k-boundary ties identically in both engines and both legs.",
    tags=("llm",),
)
def corpus_top_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    exact = X.corpus_top_ngrams(d, "text", n=2, k=20).select(
        F.lit("exact").alias("part"), "ngram", "cnt"
    )
    hh = X.corpus_top_ngrams_approx(d, "text", n=2, k=20).select(
        F.lit("hh").alias("part"), "ngram", "cnt"
    )
    return exact.unionByName(hh)


_JACCARD_SQL = f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(ws) - 2, 1)),
                   i -> array_to_string(ws[i:i+2], ' '))) AS shs
        FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents)
    ),
    e AS (SELECT doc_id, len(shs) AS n, unnest(shs) AS s FROM sh),
    pairs AS (
        SELECT l.doc_id AS id_a, r.doc_id AS id_b,
               count(*) AS inter, min(l.n) AS na, min(r.n) AS nb
        FROM e l JOIN e r ON l.s = r.s AND l.doc_id < r.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
    FROM pairs
    WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.7
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard near-dup pairs at t=0.7 (the
    realistic near-duplicate threshold — C4/RefinedWeb-class pipelines
    dedup at 0.7–0.8) via the PREFIX-FILTERED candidate path
    (operators.dedup.jaccard_pairs_prefix: AllPairs/PPJoin prefix +
    length + positional bounds, then exact array_intersect verify),
    output-identical to the naive inverted-index self-join at every
    threshold (test-pinned, tests/test_linedup_prefixjoin.py).

    Round-10 re-grading rationale (SCALE.md): the leg previously ran
    the NAIVE index at t=0.05 — the one measured ~quadratic graded
    plan. The measured crossover on this dense corpus: prefix LOSES
    below t≈0.5 (at t=0.05 the prefix is ~0.95·n tokens, so it pays
    the df-sort overhead on top of near-naive candidates: 328 s vs
    54 s at sf1) and WINS at t=0.7 (41 s vs 127 s same-day; 13.6 s vs
    138 s on the faster r9 box). Grading the t=0.7 prefix
    configuration makes the graded plan the scale-safe one AND the
    semantically-realistic one; exact LOW-threshold jaccard remains
    available as ngram_jaccard_pairs (df_max-capped for scale), and
    dense-corpus low-threshold dedup at 100 TB is the minhash-LSH
    leg's job (exponent 0.48) — exact candidates at t→0 are inherently
    quadratic, no candidate filter can exist (every shared-shingle
    pair is a true candidate). Graded as the 'jaccard' leg of
    dedup_exact_jaccard_suite."""
    return D.jaccard_pairs_prefix(
        load(spark, sf_dir, "documents"), "doc_id", "text", k=3,
        threshold=0.7,
    )


# MinHash(8, 4 bands)+LSH on the md5-salted kernel — the full
# sketch→band→bucket-join→estimate pipeline re-derived in SQL:
# sig[j] = min over 3-shingles of md5(j‖'|'‖shingle) (lexicographic min
# over lowercase hex — engine-independent), pairs share ≥1 of 4 2-row
# band buckets, est = matching-position fraction. Grading this leg
# hash-match proves the LSH pipeline's SEMANTICS; the xxhash64
# production kernel (dedup_sketch_pairs_suite, rows-only) shares the
# banding/dedupe/estimate tail via dedup._lsh_banded_pairs, so the
# proof transfers to everything but the hash family itself.
_MINHASH_MD5_SQL = f"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(ws) - 2, 1)),
                   i -> array_to_string(ws[i:i+2], ' '))) AS shs
        FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents)
    ),
    e AS (SELECT doc_id, unnest(shs) AS s FROM sh),
    salts AS (SELECT unnest(generate_series(0, 7)) AS j),
    sig AS (
        SELECT doc_id, j, min(md5(CAST(j AS VARCHAR) || '|' || s)) AS mh
        FROM e, salts GROUP BY doc_id, j
    ),
    sigv AS (SELECT doc_id, list(mh ORDER BY j) AS sig FROM sig GROUP BY doc_id),
    bs AS (SELECT unnest(generate_series(0, 3)) AS b),
    banded AS (
        SELECT doc_id, b, sig[2*b+1] || '_' || sig[2*b+2] AS bucket
        FROM sigv, bs
    ),
    cand AS (
        SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM banded l JOIN banded r
          ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ),
    pos AS (SELECT unnest(generate_series(0, 7)) AS p)
    SELECT CAST(c.id_a AS BIGINT) AS id_a, CAST(c.id_b AS BIGINT) AS id_b,
           CAST(sum(CASE WHEN sa.sig[p+1] = sb.sig[p+1] THEN 1 ELSE 0 END)
                AS DOUBLE) / 8.0 AS est_jaccard
    FROM cand c
    JOIN sigv sa ON sa.doc_id = c.id_a
    JOIN sigv sb ON sb.doc_id = c.id_b, pos
    GROUP BY c.id_a, c.id_b
"""


# SimHash on the md5 hash family — the second sketch family under a
# hash-match oracle. Bits = the first 16 hex chars of md5(shingle) as
# two unsigned 32-bit halves ('0x…'::BIGINT / Spark conv()); vote rule
# and the duplicate-shingles-vote-each semantics are the production
# kernel's (operators.dedup.simhash_votes); the signature ships as a
# 16-hex-char string (nibble n = bits 4n..4n+3, weight 2^j) so no
# signed-64 packing is needed in any engine.
_SIMHASH_MD5_SQL = f"""
    WITH sh AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, greatest(len(ws) - 2, 1)),
                   i -> array_to_string(ws[i:i+2], ' ')) AS shs
        FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents)
    ),
    hh AS (
        SELECT doc_id,
               ('0x' || substr(md5(s), 1, 8))::BIGINT AS hi,
               ('0x' || substr(md5(s), 9, 8))::BIGINT AS lo
        FROM (SELECT doc_id, unnest(shs) AS s FROM sh)
    ),
    votes AS (
        SELECT doc_id, b,
               sum(CASE WHEN ((CASE WHEN b < 32 THEN lo ELSE hi END)
                        // CAST(pow(2, b % 32) AS BIGINT)) % 2 = 1
                        THEN 1 ELSE -1 END) AS v
        FROM hh, (SELECT unnest(generate_series(0, 63)) AS b) bb
        GROUP BY doc_id, b
    ),
    nib AS (
        SELECT doc_id, b // 4 AS n,
               CAST(sum(CASE WHEN v > 0
                        THEN CAST(pow(2, b % 4) AS INT) ELSE 0 END) AS INT) AS nv
        FROM votes GROUP BY doc_id, b // 4
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           string_agg(substr('0123456789abcdef', nv + 1, 1), '' ORDER BY n)
               AS simhash_hex
    FROM nib GROUP BY doc_id
"""


# C4-style cross-document line dedup (keep-one-occurrence): winner per
# distinct line = first (doc_id, position); blank lines always kept.
# The twin re-derives it with a row_number window — equivalent to the
# Spark side's min(struct(doc_id, pos)) winner because (doc_id, p) is
# unique per occurrence.
_LINEDUP_SQL = """
    WITH dl AS (
        SELECT doc_id, string_split(text, chr(10)) AS l FROM documents
    ),
    lx AS (
        SELECT doc_id, l, unnest(generate_series(1, len(l))) AS p FROM dl
    ),
    lines AS (SELECT doc_id, p, l[p] AS line FROM lx),
    ranked AS (
        SELECT doc_id, p, line,
               CASE WHEN length(line) >= 1
                    THEN row_number() OVER (PARTITION BY line
                                            ORDER BY doc_id, p)
                    ELSE 1 END AS rn
        FROM lines
    ),
    rebuilt AS (
        SELECT doc_id,
               string_agg(line, chr(10) ORDER BY p) AS text_clean,
               count(*) AS n_kept
        FROM ranked WHERE rn = 1 GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, count(*) AS total FROM lines GROUP BY doc_id)
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           md5(coalesce(r.text_clean, '')) AS clean_hash,
           CAST(t.total - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
           CAST(coalesce(r.n_kept, 0) AS DOUBLE) / CAST(t.total AS DOUBLE)
               AS kept_frac
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


def corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global line dedup (operators.dedup.line_dedup_corpus):
    each distinct non-blank line keeps exactly its first (doc_id, pos)
    occurrence corpus-wide; docs reassemble from surviving lines. The
    winner aggregate partial-combines map-side (the hot-boilerplate skew
    answer — no row_number window sort over a hot line's copies).
    Graded as the 'linedup' leg of dedup_exact_jaccard_suite."""
    out = D.line_dedup_corpus(
        load(spark, sf_dir, "documents"), "doc_id", "text", min_chars=1
    )
    return out.select(
        "doc_id",
        F.md5("text_clean").alias("clean_hash"),
        F.col("n_lines_dropped").alias("n_dropped"),
        "kept_frac",
    )


_EDITDIST_SQL = """
    WITH vals AS (
        SELECT p_name AS val, count(*) AS n, min(p_partkey) AS min_id,
               length(p_name) AS len
        FROM part GROUP BY p_name
    )
    SELECT a.val || '|' || b.val AS pair_key,
           a.min_id AS min_id_a, b.min_id AS min_id_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           1.0 - CAST(levenshtein(a.val, b.val) AS DOUBLE)
               / CAST(greatest(a.len, b.len) AS DOUBLE) AS sim
    FROM vals a JOIN vals b
      ON a.val < b.val AND abs(a.len - b.len) <= 3
    WHERE levenshtein(a.val, b.val) <= 3
"""


def dedup_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-dup pairs over the part-name entity domain
    (operators.dedup.edit_distance_pairs, max_dist=3) — the
    entity-resolution member of the dedup family. Distinct-value
    aggregate → length-banded EQUI-join (no theta/BNLJ) → JVM-side
    levenshtein prune. Graded as the 'editdist' leg of
    dedup_exact_jaccard_suite."""
    out = D.edit_distance_pairs(
        load(spark, sf_dir, "part"), "p_partkey", "p_name", max_dist=3
    )
    return out.select(
        F.concat_ws("|", "val_a", "val_b").alias("pair_key"),
        "min_id_a",
        "min_id_b",
        "n_a",
        "n_b",
        "sim",
    )


_CC_SQL = f"""
    WITH RECURSIVE p2 AS (
        SELECT min_id_a AS ida, min_id_b AS idb FROM ({_EDITDIST_SQL})
    ),
    ue AS (SELECT ida AS a, idb AS b FROM p2
           UNION SELECT idb AS a, ida AS b FROM p2),
    reach AS (
        SELECT a AS id, b AS r FROM ue
        UNION
        SELECT reach.id, ue.b AS r FROM reach JOIN ue ON reach.r = ue.a
    )
    SELECT id, LEAST(id, MIN(r)) AS comp FROM reach GROUP BY id
"""


def dedup_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact connected-components cluster resolution
    (operators.dedup.dedup_components — min-label propagation with
    pointer jumping, O(log diameter) rounds) over the Levenshtein
    entity-resolution pair graph: fuzzy pairs are NOT cliques, so
    canonical-keep needs true components, and this leg grades that
    resolution end-to-end against DuckDB's recursive-CTE reachability
    (cheap in the oracle because entity clusters are small — the same
    operator's 100 TB story is the log-diameter round count, pinned in
    tests/test_scale_behaviors). Graded as the 'cc' leg of
    dedup_exact_jaccard_suite."""
    pairs = D.edit_distance_pairs(
        load(spark, sf_dir, "part"), "p_partkey", "p_name", max_dist=3
    ).select(F.col("min_id_a").alias("id_a"), F.col("min_id_b").alias("id_b"))
    return D.dedup_components(pairs)


def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc md5-family SimHash signature (operators.dedup.
    with_simhash_md5_hex) — graded as the 'simhash' leg of
    dedup_exact_jaccard_suite; with the minhash leg this puts BOTH
    sketch families under hash-match oracles, leaving only the xxhash64
    production hash itself rows-only."""
    return D.with_simhash_md5_hex(
        load(spark, sf_dir, "documents"), "text"
    ).select("doc_id", "simhash_hex")


def dedup_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8)+LSH(4 bands) pairs on the md5-salted signature kernel
    (operators.dedup.minhash_md5_lsh_pairs) — the cross-engine-graded
    twin of the xxhash64 scale kernel: identical banding, pair-dedupe,
    and matching-fraction estimate (shared _lsh_banded_pairs tail), only
    the per-shingle hash differs. Graded as the 'minhash' leg of
    dedup_exact_jaccard_suite."""
    return D.minhash_md5_lsh_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=8, bands=4
    )


@spec(
    QUERIES,
    "dedup_exact_jaccard_suite",
    sql=f"""
        SELECT 'exact' AS part, content_hash, keep_id, n_dups,
               CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
               CAST(NULL AS DOUBLE) AS jaccard
        FROM ({_DEDUP_EXACT_SQL})
        UNION ALL
        SELECT 'jaccard' AS part, CAST(NULL AS VARCHAR) AS content_hash,
               CAST(NULL AS BIGINT) AS keep_id, CAST(NULL AS BIGINT) AS n_dups,
               id_a, id_b, jaccard
        FROM ({_JACCARD_SQL})
        UNION ALL
        SELECT 'minhash' AS part, CAST(NULL AS VARCHAR) AS content_hash,
               CAST(NULL AS BIGINT) AS keep_id, CAST(NULL AS BIGINT) AS n_dups,
               id_a, id_b, est_jaccard AS jaccard
        FROM ({_MINHASH_MD5_SQL})
        UNION ALL
        SELECT 'simhash' AS part, simhash_hex AS content_hash,
               CAST(NULL AS BIGINT) AS keep_id, CAST(NULL AS BIGINT) AS n_dups,
               doc_id AS id_a, CAST(NULL AS BIGINT) AS id_b,
               CAST(NULL AS DOUBLE) AS jaccard
        FROM ({_SIMHASH_MD5_SQL})
        UNION ALL
        SELECT 'linedup' AS part, clean_hash AS content_hash,
               doc_id AS keep_id, n_dropped AS n_dups,
               CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
               kept_frac AS jaccard
        FROM ({_LINEDUP_SQL})
        UNION ALL
        SELECT 'editdist' AS part, pair_key AS content_hash,
               min_id_a AS keep_id, min_id_b AS n_dups,
               n_a AS id_a, n_b AS id_b,
               sim AS jaccard
        FROM ({_EDITDIST_SQL})
        UNION ALL
        SELECT 'cc' AS part, CAST(NULL AS VARCHAR) AS content_hash,
               comp AS keep_id, CAST(NULL AS BIGINT) AS n_dups,
               id AS id_a, CAST(NULL AS BIGINT) AS id_b,
               CAST(NULL AS DOUBLE) AS jaccard
        FROM ({_CC_SQL})
    """,
    doc="Dedup suite: the exact normalized-hash leg (only (hash, id) "
    "shuffles — never text; keep = min id), the exact 3-shingle "
    "Jaccard pair leg (inverted-index self-join, integer-exact ratios; "
    "df_max is the 100 TB ubiquitous-shingle cap), and the md5-salted "
    "MinHash(8)+LSH(4 bands) leg — the full sketch→band→bucket-join→"
    "estimate pipeline under a hash-match oracle (the xxhash64 "
    "production kernel shares its banding tail, so only the hash "
    "family itself stays rows-only), plus the md5-family SimHash "
    "signature leg (hex-string bit votes, duplicate shingles vote "
    "each — both sketch FAMILIES are now oracle-graded), plus the "
    "C4-style cross-document line-dedup leg (keep-one-occurrence per "
    "distinct line; partial-agg winner rule, no hot-line window sort), "
    "plus (round 9) the Levenshtein entity-resolution leg: distinct "
    "values → length-banded equi-join (|Δlen| ≤ d is a lossless bound) "
    "→ JVM-side edit-distance prune, over the part-name domain — and "
    "the 'cc' leg resolving those fuzzy pairs into exact connected "
    "components (min-label propagation + pointer jumping vs DuckDB's "
    "recursive-CTE reachability: fuzzy pair graphs are not cliques, so "
    "canonical-keep needs true components). "
    "Independent legs; zero-shuffle concat.",
    tags=("llm",),
)
def dedup_exact_jaccard_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = dedup_exact(spark, sf_dir).select(
        F.lit("exact").alias("part"),
        "content_hash",
        "keep_id",
        "n_dups",
        F.lit(None).cast("bigint").alias("id_a"),
        F.lit(None).cast("bigint").alias("id_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    jac = dedup_ngram_jaccard(spark, sf_dir).select(
        F.lit("jaccard").alias("part"),
        F.lit(None).cast("string").alias("content_hash"),
        F.lit(None).cast("bigint").alias("keep_id"),
        F.lit(None).cast("bigint").alias("n_dups"),
        "id_a",
        "id_b",
        "jaccard",
    )
    mh = dedup_minhash_md5(spark, sf_dir).select(
        F.lit("minhash").alias("part"),
        F.lit(None).cast("string").alias("content_hash"),
        F.lit(None).cast("bigint").alias("keep_id"),
        F.lit(None).cast("bigint").alias("n_dups"),
        "id_a",
        "id_b",
        F.col("est_jaccard").alias("jaccard"),
    )
    sh = dedup_simhash_md5(spark, sf_dir).select(
        F.lit("simhash").alias("part"),
        F.col("simhash_hex").alias("content_hash"),
        F.lit(None).cast("bigint").alias("keep_id"),
        F.lit(None).cast("bigint").alias("n_dups"),
        F.col("doc_id").alias("id_a"),
        F.lit(None).cast("bigint").alias("id_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    ld = corpus_line_dedup(spark, sf_dir).select(
        F.lit("linedup").alias("part"),
        F.col("clean_hash").alias("content_hash"),
        F.col("doc_id").alias("keep_id"),
        F.col("n_dropped").alias("n_dups"),
        F.lit(None).cast("bigint").alias("id_a"),
        F.lit(None).cast("bigint").alias("id_b"),
        F.col("kept_frac").alias("jaccard"),
    )
    ed = dedup_editdist_pairs(spark, sf_dir).select(
        F.lit("editdist").alias("part"),
        F.col("pair_key").alias("content_hash"),
        F.col("min_id_a").alias("keep_id"),
        F.col("min_id_b").alias("n_dups"),
        F.col("n_a").alias("id_a"),
        F.col("n_b").alias("id_b"),
        F.col("sim").alias("jaccard"),
    )
    cc = dedup_cc_clusters(spark, sf_dir).select(
        F.lit("cc").alias("part"),
        F.lit(None).cast("string").alias("content_hash"),
        F.col("comp").alias("keep_id"),
        F.lit(None).cast("bigint").alias("n_dups"),
        F.col("id").alias("id_a"),
        F.lit(None).cast("bigint").alias("id_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    return (
        exact.unionByName(jac).unionByName(mh).unionByName(sh)
        .unionByName(ld).unionByName(ed).unionByName(cc)
    )


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32)+LSH(8 bands) candidate pairs with signature-estimated
    Jaccard. Map-side signatures (fixed 256 B/doc), band-bucket
    equi-join — text never shuffles. The scale path for fuzzy dedup;
    boilerplate mega-buckets are boundable via max_bucket_size
    (operators.dedup.minhash_lsh_pairs, tested in test_scale_behaviors).
    Graded as the 'minhash' leg of dedup_sketch_pairs_suite; standalone
    for bench.py's timing series and the bit-exact Python oracle."""
    return D.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=32, bands=8
    )


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash64 near-dup pairs via 4×16-bit block LSH (Hamming ≤ 3 ⇒
    pigeonhole guarantees a shared block). Candidate generation is an
    equi-join on block keys. Graded as the 'simhash' leg of
    dedup_sketch_pairs_suite; Python-oracle-tested bit-exactly."""
    return D.simhash_near_dups(
        load(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


@spec(
    QUERIES,
    "dedup_sketch_pairs_suite",
    sql=None,  # xxhash64-based sketches have no DuckDB twin → rows-only
    # check; BOTH legs carry bit-exact Python oracles + adversarial fuzz
    # in tests/test_python_oracles.py
    doc="xxhash64 sketch dedup suite: MinHash(32)+LSH(8 bands) "
    "estimated-Jaccard pairs ('minhash' leg, score=est_jaccard) unioned "
    "with SimHash64 4×16-bit-block pairs ('simhash' leg, "
    "score=hamming). Both legs are banded/blocked equi-joins shuffling "
    "fixed-width (key, id, sketch) tuples only — never text, never "
    "all-pairs.",
    tags=("llm", "bench"),
)
def dedup_sketch_pairs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    mh = dedup_minhash_pairs(spark, sf_dir).select(
        F.lit("minhash").alias("part"),
        "id_a",
        "id_b",
        F.col("est_jaccard").alias("score"),
    )
    sh = dedup_simhash_pairs(spark, sf_dir).select(
        F.lit("simhash").alias("part"),
        "id_a",
        "id_b",
        F.col("hamming").cast("double").alias("score"),
    )
    return mh.unionByName(sh)


_TOPK_SQL = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                 AS cosine
        FROM q CROSS JOIN c
        WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
"""


def embed_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for query vectors vec_id<8 — the ANN
    correctness baseline. Query side broadcasts; corpus scanned once;
    dot products via zip_with+aggregate (JVM, element-order identical
    to the oracle → bit-exact doubles). Registered through
    embed_topk_suite (method='brute')."""
    e = load(spark, sf_dir, "embeddings")
    return S.brute_force_topk(e.filter(F.col("vec_id") < 8), e, k=5, dim=64)


def _lsh_topk_sql(
    dim: int = 64, num_planes: int = 4, num_tables: int = 8, k: int = 5
) -> str:
    """Oracle for the multi-table LSH ANN: hyperplanes are deterministic
    constants (similarity._hyperplane), so per-table bucket keys embed
    as SQL expressions; candidates = UNION of per-table equi-joins,
    deduped before scoring — mirroring the Spark plan."""
    def plane_lit(i: int) -> str:
        vals = ", ".join(f"{v!r}" for v in S._hyperplane(dim, i))
        return f"[{vals}]::DOUBLE[]"

    def bucket(t: int) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, {plane_lit(t * num_planes + i)}) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i in range(num_planes)
        )

    bucket_cols = ", ".join(f"{bucket(t)} AS b{t}" for t in range(num_tables))
    b_list = ", ".join(f"b{t}" for t in range(num_tables))
    per_table = "\n            UNION ALL\n            ".join(
        f"SELECT query_id, neighbor_id FROM q JOIN c ON q.b{t} = c.b{t}"
        for t in range(num_tables)
    )
    return f"""
        WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sig AS (SELECT vec_id, v, {bucket_cols} FROM b),
        q AS (SELECT vec_id AS query_id, v AS qv, {b_list} FROM sig WHERE vec_id < 8),
        c AS (SELECT vec_id AS neighbor_id, v AS cv, {b_list} FROM sig),
        cand AS (
            SELECT DISTINCT query_id, neighbor_id FROM (
            {per_table}
            ) WHERE query_id <> neighbor_id
        ),
        scored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                     AS cosine
            FROM cand
            JOIN q ON cand.query_id = q.query_id
            JOIN c ON cand.neighbor_id = c.neighbor_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, neighbor_id) AS rn
              FROM scored)
        WHERE rn <= {k}
    """


def embed_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via MULTI-TABLE random-hyperplane LSH (4
    planes × 8 independent tables) — the 100 TB path: corpus bucketed
    in one map pass, candidates from per-table bucket equi-joins
    deduped before exact scoring. Single-table 8-plane LSH measured
    recall@5 = 0.0 on this corpus (weakly clustered vectors almost
    never agree on 8 signs); the multi-table OR restores recall ≥ 0.6
    while scoring ~40% of the corpus per query — gated by
    tests/test_ann_recall.py against the brute-force baseline.
    Hyperplanes are hash-derived constants → same buckets in the
    oracle. Registered through embed_topk_suite (method='lsh')."""
    e = load(spark, sf_dir, "embeddings")
    return S.lsh_bucket_topk(e.filter(F.col("vec_id") < 8), e, dim=64, k=5)


_DECON_SQL = f"""
    WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(
            generate_series(1, greatest(len(ws) - 2, 1)),
            i -> array_to_string(ws[i:i+2], ' '))) AS shs
        FROM (SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents)
    ),
    ev AS (SELECT DISTINCT unnest(shs) AS s FROM sh WHERE doc_id < 5),
    corpus_sh AS (SELECT doc_id, unnest(shs) AS s FROM sh WHERE doc_id >= 5),
    bad AS (SELECT DISTINCT corpus_sh.doc_id FROM corpus_sh JOIN ev USING (s))
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id >= 5 AND doc_id NOT IN (SELECT doc_id FROM bad)
"""


@spec(
    QUERIES,
    "corpus_decontaminate",
    sql=_DECON_SQL,
    doc="Benchmark decontamination (test-set-leakage guard): training "
    "docs sharing any 3-word shingle with the eval set (docs 0-4 stand "
    "in for the benchmark) are dropped. Eval shingles broadcast "
    "(benchmarks are small by definition); detection is a broadcast "
    "semi-join on exploded corpus shingles — text never shuffles "
    "(operators.dedup.decontaminate).",
    tags=("llm",),
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") >= 5)
    eval_set = d.filter(F.col("doc_id") < 5)
    return D.decontaminate(corpus, eval_set, "doc_id", "text", k=3).select(
        "doc_id", "lang", "source"
    )


_NDCOS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b})))"
)

# One Lloyd round in SQL: assign every vector to its max-cosine
# centroid (ties → lowest id), then the elementwise cell mean as a
# DECIMAL-exact sum cast to double before the count division, rounded
# to 6 dp — token-for-token the arithmetic of
# operators.similarity.kmeans_centroids(round_dp=6), so Spark and the
# oracle iterate from bit-identical centroids. Empty cells keep the
# previous centroid (the LEFT JOIN coalesce).
def _lloyd_round_sql(prev: str, out: str, src: str = "v") -> str:
    return f"""
    a_{out} AS (
        SELECT vec_id, e, cid FROM (
            SELECT {src}.vec_id, {src}.e, {prev}.cid,
                   row_number() OVER (
                       PARTITION BY {src}.vec_id
                       ORDER BY {_NDCOS.format(a=f'{src}.e', b=f'{prev}.c')} DESC,
                                {prev}.cid ASC) AS rn
            FROM {src} CROSS JOIN {prev}
        ) WHERE rn = 1
    ),
    m_{out} AS (
        SELECT cid,
               list(mv ORDER BY idx) AS c
        FROM (
            SELECT cid, idx,
                   round(CAST(sum(CAST(val AS DECIMAL(28,10))) AS DOUBLE)
                         / count(*), 6) AS mv
            FROM (SELECT cid, unnest(e) AS val,
                         generate_subscripts(e, 1) AS idx
                  FROM a_{out})
            GROUP BY cid, idx
        )
        GROUP BY cid
    ),
    {out} AS (
        SELECT {prev}.cid, coalesce(m_{out}.c, {prev}.c) AS c
        FROM {prev} LEFT JOIN m_{out} USING (cid)
    )"""


# k is DERIVED from the corpus size in both engines (max(16, ⌊√n⌋) —
# dedup.semdedup_n_centroids): at 100 TB the cell count must grow with
# n to keep within-cell pair work ~n^1.5; a constant would quietly
# degenerate back toward n². sqrt of an exact integer is correctly
# rounded IEEE in both engines, so the derived k always agrees.
#
# Training runs on a DETERMINISTIC md5-threshold HALF-SAMPLE (vs — the
# faiss/SemDeDup recipe: centroid/codebook TRAINING is sample-based at
# any corpus scale; only the one-pass ASSIGNMENT touches every row).
# md5 hex is identical across engines, so the oracle re-derives the
# exact training set; seeds are the sample's min-id vectors.
# identical semantics in both engines; only the string-type keyword
# differs (Spark: STRING, DuckDB: VARCHAR)
_NEARDUP_TRAIN_SAMPLE = "substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '8'"
_NEARDUP_TRAIN_SAMPLE_SPARK = "substring(md5(CAST(vec_id AS STRING)), 1, 1) < '8'"

_NEARDUP_SUITE_SQL = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    vs AS (SELECT * FROM v WHERE {_NEARDUP_TRAIN_SAMPLE}),
    kk AS (SELECT greatest(16, CAST(floor(sqrt(count(*))) AS BIGINT)) AS k
           FROM v),
    seed AS (SELECT rn - 1 AS cid, e AS c
             FROM (SELECT row_number() OVER (ORDER BY vec_id) AS rn, e
                   FROM vs) s, kk
             WHERE s.rn <= kk.k),
    {_lloyd_round_sql('seed', 'c1', src='vs')},
    {_lloyd_round_sql('c1', 'c2', src='vs')},
    assigned AS (
        SELECT vec_id, e, cid FROM (
            SELECT v.vec_id, v.e, c2.cid,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_NDCOS.format(a='v.e', b='c2.c')} DESC,
                                c2.cid ASC) AS rn
            FROM v CROSS JOIN c2
        ) WHERE rn = 1
    ),
    kept AS (
        SELECT assigned.* FROM assigned
        JOIN (SELECT cid, count(*) AS n FROM assigned GROUP BY cid) sz
          USING (cid)
        WHERE sz.n <= 400
    )
    SELECT a.cid AS cell, a.vec_id AS id_a, b.vec_id AS id_b,
           {_NDCOS.format(a='a.e', b='b.e')} AS cosine
    FROM kept a JOIN kept b ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE {_NDCOS.format(a='a.e', b='b.e')} >= 0.45
"""


@spec(
    QUERIES,
    "embed_neardup_suite",
    sql=_NEARDUP_SUITE_SQL,
    doc="SemDeDup embedding near-duplicate pairs in the PRODUCTION "
    "configuration: k-means cells with k DERIVED from the corpus size "
    "(max(16, floor(sqrt(n))) — dedup.semdedup_n_centroids; the oracle "
    "re-derives the same k from count(*), so the query is self-tuning "
    "at any SF), 2 deterministic Lloyd rounds (6-dp-rounded means — "
    "the oracle SQL re-derives the exact iterations), within-cell "
    "cosine pairs via the equi-join on cell, and the max_cell_size "
    "hot-cell cap engaged WITH dropped-cell logging (no silent caps). "
    "The plan contains NO cartesian/BNLJ: cell assignment is a "
    "map-side codegen argmax against inlined centroid literals, so "
    "the graded query is the shape that survives 100 TB (pair work "
    "~n^1.5 with k≈sqrt(n), capped per cell). The exact brute-force "
    "baseline is a pytest parity check on a hash-sampled subset "
    "(tests/test_ann_recall.py) — not graded, by design: its O(n²) "
    "crossJoin is verification-only. Threshold 0.45 sits under this "
    "corpus's max pairwise cosine (~0.49) so the check exercises "
    "non-empty results.",
    tags=("llm",),
)
def embed_neardup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kmeans_centroids

    e = load(spark, sf_dir, "embeddings")
    # one cheap count (parquet-metadata-backed) derives the cell count —
    # driver-scalar control flow, deterministic, re-derived by the oracle
    k = D.semdedup_n_centroids(e.count())
    # centroid TRAINING on a deterministic md5 half-sample (the faiss/
    # SemDeDup recipe — training never needs the full corpus; the
    # sample is ~n/2 ≫ k at every SF); ASSIGNMENT below is full-corpus.
    # md5 hex matches DuckDB's, so the oracle re-derives the sample.
    sample = e.filter(F.expr(_NEARDUP_TRAIN_SAMPLE_SPARK))
    trained = kmeans_centroids(
        sample, dim=64, n_iter=2, round_dp=6, n_centroids=k
    )
    return D.semantic_near_dup_pairs(
        e, "vec_id", "embedding", dim=64, threshold=0.45,
        centroids=trained, max_cell_size=400, log_dropped=True,
    ).select("cell", "id_a", "id_b", "cosine")


@spec(
    QUERIES,
    "text_rolling_fingerprint",
    sql="""
        SELECT doc_id,
               list_min(list_transform(
                   generate_series(1, greatest(len(ws) - 7, 1)),
                   i -> md5(array_to_string(ws[i:i+7], ' ')))) AS rolling_fp_md5
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+') AS ws
              FROM documents)
    """,
    doc="Winnowing-style rolling-hash fingerprint (min hash over 8-word "
    "spans) for fuzzy containment — robust to local edits where md5 "
    "content-addressing of the whole text is not. Map-only; words "
    "materialized once per row. GRADED via the md5 kernel (hex digests "
    "order identically in every engine — the minhash-leg pattern); "
    "xxhash64 stays the production kernel (operators.text."
    "with_rolling_fingerprint kernel='xxhash64', an order of magnitude "
    "cheaper per span, bit-exact-Python-oracle-tested).",
    tags=("llm",),
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return X.with_rolling_fingerprint(
        d, "text", "rolling_fp_md5", kernel="md5"
    ).select("doc_id", "rolling_fp_md5")


@spec(
    QUERIES,
    "multimodal_frame_sample",
    sql="""
        SELECT doc_id AS media_id,
               CAST(unnest(generate_series(0,
                   greatest(CAST(n_chars // 100 AS INT), 1) - 1)) AS DOUBLE)
                 AS frame_ts
        FROM documents
    """,
    doc="Multimodal frame-sampling plan at 1 fps: each video row (duration "
    "synthesized from n_chars) expands to (media_id, frame_ts) rows via "
    "sequence+explode — pure JVM, no codec; each sampled frame then flows "
    "through the mapInPandas decode kernel (multimodal_decode).",
    tags=("llm",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import frame_sample_plan

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") / 100).cast("int").cast("double").alias("duration_s"),
    )
    return frame_sample_plan(d, fps=1.0)


_CURATION_SQL = f"""
    WITH canon AS (
        SELECT doc_id, text, lang, source FROM documents
        WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5({_NORM}))
    ),
    scored AS (
        SELECT doc_id, lang, source,
               least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
                 + (1.0 - least(CAST(length(regexp_replace(text,
                        '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                        / greatest(length(text), 1) * 5.0, 1.0)) * 0.3
                 + least(CAST(len(list_filter(
                        string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
                        w -> w IN ('the', 'and', 'of', 'to', 'is'))) AS DOUBLE)
                        / greatest(CASE WHEN trim(text) = '' THEN 0
                                   ELSE len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+'))
                                   END, 1) * 5.0, 1.0) * 0.3
                   AS quality
        FROM canon
    )
    SELECT doc_id, lang, source, quality,
           CAST(quality >= 0.5 AS INT) AS kept,
           {{split_case}} AS split,
           CAST(row_number() OVER (
                    PARTITION BY source ORDER BY quality DESC, doc_id
                ) <= {{source_cap}} AS INT) AS in_cap
    FROM scored
"""

#: per-source quota in the curation query. Every synthetic source holds
#: 25 canonical docs, so all sources take the over-cap window branch
#: here; the under-cap bypass branch is pinned by the skewed-corpus
#: unit test in tests/test_packing.py.
_SOURCE_CAP = 15

_SPLIT_CASE = (
    "CASE "
    + " ".join(
        "WHEN substring(md5(CAST(doc_id AS VARCHAR) || 'curation'), 1, 4)"
        f" < '{bound}' THEN '{name}'"
        for name, bound in P.split_bounds_hex()
    )
    + " ELSE 'test' END"
)

_CURATION_SQL = _CURATION_SQL.format(split_case=_SPLIT_CASE, source_cap=_SOURCE_CAP)


@spec(
    QUERIES,
    "corpus_curation_pipeline",
    sql=_CURATION_SQL,
    doc="End-to-end training-corpus curation in ONE lazy plan: exact "
    "dedup resolved to the kept min-id canonical rows (the full "
    "dedup→filter loop — anti-join of losers; text never shuffles, only "
    "(hash, id)) → composite quality scoring → keep flag at the 0.5 "
    "threshold → deterministic train/val/test split assignment (md5 "
    "hex-threshold buckets) → per-source quota flag (two-phase "
    "cap_per_key: only over-cap sources pay the row_number window, the "
    "rest bypass via broadcast anti-join). Emitting ALL canonical rows "
    "with the flags (instead of pre-filtering) makes the oracle check "
    "the canonical row set, the threshold decision, the split buckets, "
    "and the quota ranking. Catalyst optimizes across the stage "
    "boundaries — column pruning reaches the scan.",
    tags=("llm",),
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    keep = D.exact_dedup_groups(d, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    canon = d.join(keep, on="doc_id", how="left_semi")
    scored = canon.select(
        "doc_id",
        "lang",
        "source",
        X.quality_score(F.col("text")).alias("quality"),
    )
    flagged = scored.withColumn("kept", (F.col("quality") >= 0.5).cast("int"))
    flagged = P.with_split(flagged, "doc_id", salt="curation")
    return P.cap_per_key(
        flagged,
        "source",
        _SOURCE_CAP,
        [F.col("quality").desc(), F.col("doc_id").asc()],
    )


_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b})))"
)

_IVF_SQL = f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, e AS c FROM v
             ORDER BY vec_id LIMIT 16),
    assigned AS (
        SELECT neighbor_id, cv, centroid_id AS cell FROM (
            SELECT v.vec_id AS neighbor_id, v.e AS cv, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_COS.format(a='v.e', b='cent.c')} DESC,
                                cent.centroid_id ASC) AS rn
            FROM v CROSS JOIN cent
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, qv, centroid_id AS cell FROM (
            SELECT v.vec_id AS query_id, v.e AS qv, cent.centroid_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_COS.format(a='v.e', b='cent.c')} DESC,
                                cent.centroid_id ASC) AS rn
            FROM v CROSS JOIN cent WHERE v.vec_id < 8
        ) WHERE rn <= 4
    ),
    scored AS (
        SELECT query_id, neighbor_id, {_COS.format(a='qv', b='cv')} AS cosine
        FROM probes JOIN assigned USING (cell)
        WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 5
"""


def embed_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-5: corpus partitioned into 16 Voronoi
    cells (deterministic min-id centroid seed — k-means at warehouse
    scale), queries probe their 4 nearest cells. Assignment is one map
    pass vs broadcast centroids; each query scores ~n_probe/n_centroids
    of the corpus. Complements the hyperplane-LSH variant. Registered
    through embed_topk_suite (method='ivf')."""
    e = load(spark, sf_dir, "embeddings")
    return S.ivf_topk(e.filter(F.col("vec_id") < 8), e, k=5, dim=64)


# ---------------------------------------------------------------------------
# Product-quantization leg: the oracle re-derives pq_train's fused
# subspace Lloyd training end-to-end in SQL (the classifier
# train_sql_cte / SemDeDup _lloyd_round_sql pattern, extended to m
# subspaces), then encodes, reconstructs, and scores — so the graded
# check covers training, encoding, and asymmetric-distance retrieval.
# ---------------------------------------------------------------------------

#: PQ configuration for the graded leg — must match embed_topk_pq.
_PQ_DIM, _PQ_M, _PQ_KS, _PQ_ITER = 64, 8, 16, 2
_PQ_W = _PQ_DIM // _PQ_M

#: Spark's l2_argmin_expr drops the per-row ||x||² term: score =
#: c·c − 2·x·c. Same textual arithmetic here; list_dot_product is the
#: same 0-seeded index-order fold as the Spark HOF/unrolled dots.
_PQ_L2 = (
    "(list_dot_product({cb}.c, {cb}.c)"
    " - (CAST(2 AS DOUBLE) * list_dot_product({x}, {cb}.c)))"
)


def _pq_lloyd_round_sql(prev: str, out: str) -> str:
    """One fused subspace Lloyd round in SQL: every (vector, subspace)
    slice L2-argmins against codebook ``prev`` (ties → lowest cid),
    then the DECIMAL-exact 6-dp elementwise mean per (subspace, cell,
    element) — token-for-token the arithmetic of
    operators.quantization.pq_train(round_dp=6), so both engines
    iterate from bit-identical codebooks (proven at sf0.001/0.01/0.1).
    Empty cells keep the previous centroid (LEFT JOIN coalesce)."""
    l2 = _PQ_L2.format(cb=prev, x="subs.sv")
    return f"""
    a_{out} AS (
        SELECT vec_id, sub, sv, cid FROM (
            SELECT subs.vec_id, subs.sub, subs.sv, {prev}.cid,
                   row_number() OVER (
                       PARTITION BY subs.vec_id, subs.sub
                       ORDER BY {l2} ASC, {prev}.cid ASC) AS rn
            FROM subs JOIN {prev} USING (sub)
        ) WHERE rn = 1
    ),
    m_{out} AS (
        SELECT sub, cid, list(mv ORDER BY idx) AS c
        FROM (
            SELECT sub, cid, idx,
                   round(CAST(sum(CAST(val AS DECIMAL(28,10))) AS DOUBLE)
                         / count(*), 6) AS mv
            FROM (SELECT sub, cid, unnest(sv) AS val,
                         generate_subscripts(sv, 1) AS idx
                  FROM a_{out})
            GROUP BY sub, cid, idx
        )
        GROUP BY sub, cid
    ),
    {out} AS (
        SELECT {prev}.sub, {prev}.cid, coalesce(m_{out}.c, {prev}.c) AS c
        FROM {prev} LEFT JOIN m_{out} USING (sub, cid)
    )"""


def _pq_recon_ctes() -> str:
    """The shared PQ-oracle CTE block (expects a prior ``v`` CTE):
    subspace slices → {_PQ_ITER} fused Lloyd rounds → final-codebook
    encode → per-vector reconstruction ``recon(vec_id, rv)``. Used by
    both the 'pq' and 'imi' legs of embed_topk_suite — one definition,
    no twin drift."""
    final_cb = f"cb{_PQ_ITER}"
    rounds = ",\n".join(
        _pq_lloyd_round_sql(f"cb{i}", f"cb{i + 1}") for i in range(_PQ_ITER)
    )
    enc_l2 = _PQ_L2.format(cb=final_cb, x="subs.sv")
    return f"""
    subs AS (
        SELECT vec_id, ss.sub,
               list_slice(e, ss.sub * {_PQ_W} + 1, (ss.sub + 1) * {_PQ_W}) AS sv
        FROM v, (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS sub) ss
    ),
    seedids AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, vec_id
                FROM v ORDER BY vec_id LIMIT {_PQ_KS}),
    cb0 AS (SELECT subs.sub, seedids.cid, subs.sv AS c
            FROM seedids JOIN subs USING (vec_id)),
    {rounds},
    enc AS (
        SELECT vec_id, sub, cid FROM (
            SELECT subs.vec_id, subs.sub, {final_cb}.cid,
                   row_number() OVER (
                       PARTITION BY subs.vec_id, subs.sub
                       ORDER BY {enc_l2} ASC, {final_cb}.cid ASC) AS rn
            FROM subs JOIN {final_cb} USING (sub)
        ) WHERE rn = 1
    ),
    recon AS (
        SELECT enc.vec_id, flatten(list({final_cb}.c ORDER BY enc.sub)) AS rv
        FROM enc JOIN {final_cb}
          ON enc.sub = {final_cb}.sub AND enc.cid = {final_cb}.cid
        GROUP BY enc.vec_id
    )"""


def _pq_topk_sql(k: int = 5) -> str:
    """DuckDB twin of :func:`embed_topk_pq`: re-derive the trained
    codebooks ({_PQ_ITER} fused Lloyd rounds over m subspace slices),
    re-encode every vector against the FINAL codebooks, reconstruct by
    codebook lookup, and score exact queries vs reconstructions."""
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    {_pq_recon_ctes()},
    q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 8),
    scored AS (
        SELECT query_id, recon.vec_id AS neighbor_id,
               list_dot_product(qv, rv)
                 / (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(rv, rv))) AS cosine
        FROM q CROSS JOIN recon
        WHERE query_id <> recon.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {k}
    """


# ---------------------------------------------------------------------------
# Two-level (IMI) leg: the coarse quantizer tier past the flat
# 4096-centroid cap (operators.quantization.imi_train/imi_index/
# imi_topk — k1·k2 effective cells from k1+k2 centroids). The oracle
# re-derives BOTH training levels (level-1 cosine Lloyd, level-2 L2
# Lloyd over residuals x − c1), the composite assignment, the
# JOINT-ranked probe (top-p1 level-1 branches, then best p1·p2
# composite centroids by actual distance), and the PQ-reconstruction
# scoring — so the graded check covers the full two-level pipeline
# cross-engine, not just its row count.
# ---------------------------------------------------------------------------

#: IMI configuration for the graded leg — must match embed_topk_imi.
_IMI_K1, _IMI_K2, _IMI_P1, _IMI_P2 = 8, 8, 3, 3


def _imi_l2_round_sql(prev: str, out: str, src: str = "resid") -> str:
    """One L2 Lloyd round over the residual vectors — the DuckDB twin
    of quantization.pq_train(m=1) on the residual frame (the level-2
    training quantization.imi_train delegates to): L2 argmin
    c·c − 2·r·c (ties → lowest cid), DECIMAL-exact 6-dp elementwise
    means, empty cells keep the previous centroid."""
    l2 = (
        f"(list_dot_product({prev}.c, {prev}.c) - "
        f"(CAST(2 AS DOUBLE) * list_dot_product({src}.r, {prev}.c)))"
    )
    return f"""
    a_{out} AS (
        SELECT vec_id, r, cid FROM (
            SELECT {src}.vec_id, {src}.r, {prev}.cid,
                   row_number() OVER (
                       PARTITION BY {src}.vec_id
                       ORDER BY {l2} ASC, {prev}.cid ASC) AS rn
            FROM {src} CROSS JOIN {prev}
        ) WHERE rn = 1
    ),
    m_{out} AS (
        SELECT cid, list(mv ORDER BY idx) AS c
        FROM (
            SELECT cid, idx,
                   round(CAST(sum(CAST(val AS DECIMAL(28,10))) AS DOUBLE)
                         / count(*), 6) AS mv
            FROM (SELECT cid, unnest(r) AS val,
                         generate_subscripts(r, 1) AS idx
                  FROM a_{out})
            GROUP BY cid, idx
        )
        GROUP BY cid
    ),
    {out} AS (
        SELECT {prev}.cid, coalesce(m_{out}.c, {prev}.c) AS c
        FROM {prev} LEFT JOIN m_{out} USING (cid)
    )"""


def _imi_topk_sql(k: int = 5) -> str:
    """DuckDB twin of :func:`embed_topk_imi` — the full two-level
    pipeline: level-1 cosine k-means (2 Lloyd rounds, min-id seeds,
    6-dp means), corpus assignment + residuals, level-2 L2 k-means on
    residuals (min-id seeds), composite cell = c1·k2 + c2, PQ
    reconstruction (the shared _pq_recon_ctes block), joint-ranked
    probes, and cosine scoring of queries vs reconstructions in the
    probed cells only."""
    dd = (
        "(list_dot_product(comp, comp) - "
        "(CAST(2 AS DOUBLE) * list_dot_product(qv, comp)))"
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    seed1 AS (SELECT rn - 1 AS cid, e AS c
              FROM (SELECT row_number() OVER (ORDER BY vec_id) AS rn, e
                    FROM v) s
              WHERE s.rn <= {_IMI_K1}),
    {_lloyd_round_sql('seed1', 'imc1', src='v')},
    {_lloyd_round_sql('imc1', 'imc2', src='v')},
    assigned1 AS (
        SELECT vec_id, e, cid FROM (
            SELECT v.vec_id, v.e, imc2.cid,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_NDCOS.format(a='v.e', b='imc2.c')} DESC,
                                imc2.cid ASC) AS rn
            FROM v CROSS JOIN imc2
        ) WHERE rn = 1
    ),
    resid AS (
        SELECT a.vec_id,
               list_transform(generate_series(1, {_PQ_DIM}),
                              i -> a.e[i] - cb.c[i]) AS r
        FROM assigned1 a JOIN imc2 cb USING (cid)
    ),
    seed2 AS (SELECT rn - 1 AS cid, r AS c
              FROM (SELECT row_number() OVER (ORDER BY vec_id) AS rn, r
                    FROM resid) s
              WHERE s.rn <= {_IMI_K2}),
    {_imi_l2_round_sql('seed2', 'imr1')},
    {_imi_l2_round_sql('imr1', 'imr2')},
    enc2 AS (
        SELECT vec_id, cid2 FROM (
            SELECT resid.vec_id, imr2.cid AS cid2,
                   row_number() OVER (
                       PARTITION BY resid.vec_id
                       ORDER BY (list_dot_product(imr2.c, imr2.c)
                                 - (CAST(2 AS DOUBLE)
                                    * list_dot_product(resid.r, imr2.c))) ASC,
                                imr2.cid ASC) AS rn
            FROM resid CROSS JOIN imr2
        ) WHERE rn = 1
    ),
    cellmap AS (
        SELECT a.vec_id, a.cid * {_IMI_K2} + e2.cid2 AS cell
        FROM assigned1 a JOIN enc2 e2 USING (vec_id)
    ),
    {_pq_recon_ctes()},
    q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 8),
    p1 AS (
        SELECT query_id, qv, cid AS c1, c AS c1vec FROM (
            SELECT q.query_id, q.qv, cb.cid, cb.c,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_NDCOS.format(a='q.qv', b='cb.c')} DESC,
                                cb.cid ASC) AS rn
            FROM q CROSS JOIN imc2 cb
        ) WHERE rn <= {_IMI_P1}
    ),
    pj AS (
        SELECT query_id, qv, cell FROM (
            SELECT query_id, qv, cell,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY {dd} ASC, cell ASC) AS rn
            FROM (
                SELECT p1.query_id, p1.qv,
                       p1.c1 * {_IMI_K2} + cb2.cid AS cell,
                       list_transform(generate_series(1, {_PQ_DIM}),
                                      i -> p1.c1vec[i] + cb2.c[i]) AS comp
                FROM p1 CROSS JOIN imr2 cb2
            )
        ) WHERE rn <= {_IMI_P1 * _IMI_P2}
    ),
    scored AS (
        SELECT pj.query_id, cm.vec_id AS neighbor_id,
               list_dot_product(qv, rv)
                 / (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(rv, rv))) AS cosine
        FROM pj JOIN cellmap cm USING (cell)
        JOIN recon ON recon.vec_id = cm.vec_id
        WHERE pj.query_id <> cm.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {k}
    """


def embed_topk_imi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (IMI) approximate top-5: level-1 spherical k-means +
    shared L2 residual codebook (quantization.imi_train) compose
    k1·k2 = {_IMI_K1}·{_IMI_K2} effective cells from k1+k2 centroids;
    queries JOINT-rank the composite centroids and probe the best
    p1·p2 = {_IMI_P1}·{_IMI_P2} cells (~14% candidate fraction at this
    geometry); scoring is ADC over PQ reconstructions of the probed
    slice. This is the quantizer tier past the flat 4096-centroid cap
    — at 10^10 vectors the flat √n rule needs 10^5 driver-side
    centroids, the two-level one needs 2·10^2.5. Registered through
    embed_topk_suite (method='imi')."""
    from ..operators.quantization import (
        imi_index,
        imi_topk,
        imi_train,
        pq_train,
    )

    e = load(spark, sf_dir, "embeddings")
    cents1, cents2 = imi_train(
        e, dim=_PQ_DIM, k1=_IMI_K1, k2=_IMI_K2, n_iter=2, round_dp=6
    )
    books = pq_train(
        e, dim=_PQ_DIM, m=_PQ_M, ks=_PQ_KS, n_iter=_PQ_ITER, round_dp=6
    )
    idx = imi_index(e, cents1, cents2, books, _PQ_DIM)
    return imi_topk(
        e.filter(F.col("vec_id") < 8),
        idx,
        cents1,
        cents2,
        books,
        _PQ_DIM,
        k=5,
        n_probe1=_IMI_P1,
        n_probe2=_IMI_P2,
    )


#: Per-process cache for the bench serving path: (centroids, codebooks,
#: table) per sf_dir. First ivfpq_probe call per process trains + builds
#: the persisted bucketed index; subsequent calls only probe — so
#: bench.py's min-of-2 reports the steady-state SERVING cost (the
#: number the 24 B/candidate claim is about), with the build amortized
#: exactly as it is in production.
_IVFPQ_BENCH_CACHE: dict[str, tuple] = {}


def _ivfpq_probe_at(
    spark: SparkSession,
    sf_dir: str,
    ks: int,
    cache: dict[str, tuple],
    prefix: str,
) -> DataFrame:
    """Shared bench serving path: build (once per process) the trained
    coarse centroids + PQ(ks) codebooks and the persisted bucketed
    (neighbor_id, cell, pq_code) index, then probe top-5."""
    import re

    from ..operators.quantization import (
        ivfpq_topk,
        persist_ivfpq_index,
        pq_train,
    )
    from ..operators.similarity import kmeans_centroids

    e = load(spark, sf_dir, "embeddings")
    key = sf_dir.rstrip("/")
    if key not in cache:
        # table name must be INJECTIVE in the cache key — two corpora
        # whose keys sanitize alike would overwrite each other's index
        # while both cache entries kept pointing at it (wrong-corpus
        # results, no error). A readable sanitized tail + a key hash.
        # The PID suffix makes the name unique PER PROCESS: concurrent
        # bench/serving processes sharing spark-warehouse/ never write
        # the same location (write_bucketed is additionally idempotent
        # against orphans — the r7 bench crash), and the atexit rmtree
        # below keeps the warehouse from accumulating dead indexes.
        import atexit
        import hashlib
        import shutil

        from ..plans.layout import table_location

        table = "{}_bench_idx_{}_{}_p{}".format(
            prefix,
            re.sub(r"[^0-9a-zA-Z]+", "_", key.rsplit("/", 1)[-1]).strip("_"),
            hashlib.md5(key.encode()).hexdigest()[:8],
            os.getpid(),
        )
        loc = table_location(spark, table)
        if loc is not None:
            atexit.register(shutil.rmtree, loc, ignore_errors=True)
        cents = kmeans_centroids(e, dim=_PQ_DIM, n_iter=2, round_dp=6)
        books = pq_train(
            e, dim=_PQ_DIM, m=_PQ_M, ks=ks, n_iter=_PQ_ITER, round_dp=6
        )
        persist_ivfpq_index(spark, e, table, cents, books, dim=_PQ_DIM)
        cache[key] = (cents, books, table)
    cents, books, table = cache[key]
    return ivfpq_topk(
        e.filter(F.col("vec_id") < 8),
        spark.table(table),
        cents,
        books,
        dim=_PQ_DIM,
        k=5,
    )


def ivfpq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only (not registered): top-5 via the PERSISTED bucketed
    IVF+PQ index — the 100 TB serving path. Build (once per process):
    trained coarse centroids + PQ codebooks, corpus materialized as a
    (neighbor_id, cell, pq_code) table bucketed by cell. Probe: queries
    pick n_probe cells, the scan bucket-prunes to those cells, decode +
    score touch only the probed slice (~24 B/candidate read)."""
    return _ivfpq_probe_at(spark, sf_dir, _PQ_KS, _IVFPQ_BENCH_CACHE, "ivfpq")


#: Per-process cache for the faiss-standard ks=256 serving twin.
_IVFPQ256_BENCH_CACHE: dict[str, tuple] = {}


def ivfpq256_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the IDENTICAL serving path at faiss-standard ks=256
    — 8 subspaces x 256 centroids x 8 dims = 16,384 codebook scalars,
    4x past _EXPR_KERNEL_MAX_SCALARS, so train/encode run the Arrow
    kernels and decode runs the broadcast-joined codebook lookup (plan
    size O(m) — the kernel-switch invariant at production parameters,
    bit-parity pinned in tests/test_quantization_kernels.py). Build
    (pass 1) carries ks=256 Lloyd training + index persist; pass 2 is
    the steady-state probe — bench reports the split as 'ivfpq256'."""
    return _ivfpq_probe_at(
        spark, sf_dir, 256, _IVFPQ256_BENCH_CACHE, "ivfpq256"
    )


def embed_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric PQ top-5: codebooks trained IN the engine
    (quantization.pq_train — fused subspace Lloyd, one shuffle per
    iteration regardless of m, DECIMAL-exact 6-dp means), corpus
    encoded to m codes in a pure map pass, queries scored against the
    RECONSTRUCTED vectors (codebook-lookup ADC). The scoring scan here
    reuses brute-force's declared-tiny broadcast shape for the graded
    parity check; the 100 TB serving path is ivfpq_topk over a
    persisted bucketed (neighbor_id, cell, pq_code) index — probed
    cells only, ~24 B/candidate (benched as bench.py's ivfpq_probe).
    Registered through embed_topk_suite (method='pq')."""
    from ..operators.quantization import pq_encode, pq_topk, pq_train

    e = load(spark, sf_dir, "embeddings")
    codebooks = pq_train(
        e, dim=_PQ_DIM, m=_PQ_M, ks=_PQ_KS, n_iter=_PQ_ITER, round_dp=6
    )
    enc = pq_encode(e, codebooks).select("vec_id", "pq_code")
    return pq_topk(
        e.filter(F.col("vec_id") < 8), enc, codebooks, k=5, dim=_PQ_DIM
    )


def embed_topk_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ SERVING mode: ADC shortlist (top-200 per query over the
    compressed codes — the embed_topk_pq scan) → exact cosine re-rank
    of only those candidates against the raw vector table
    (quantization.pq_topk_rerank). Raw-ADC recall@5 at ks=16 is ~0.22
    (a correct oracle leg but unusable served answers); the shortlist
    re-rank recovers near-exact recall while the corpus-wide scan still
    reads m codes/vector — the 100 TB serving recipe. Shortlist depth
    is VOLUME-DERIVED (quantization.derived_shortlist, ~n/40): a fixed
    200 measured 0.875 at sf0.1 but decayed to 0.75 at sf1 as
    distractors accumulated; n/40 holds 0.875 (sf0.1) / 0.95 (sf1).
    NOT registered: the graded PQ leg stays raw-ADC (embed_topk_suite
    method='pq'); this is bench recall telemetry ('pq_rerank') + a
    pytest floor (tests/test_ann_recall.py)."""
    from ..operators.quantization import pq_encode, pq_topk_rerank, pq_train

    e = load(spark, sf_dir, "embeddings")
    codebooks = pq_train(
        e, dim=_PQ_DIM, m=_PQ_M, ks=_PQ_KS, n_iter=_PQ_ITER, round_dp=6
    )
    enc = pq_encode(e, codebooks).select("vec_id", "pq_code")
    return pq_topk_rerank(
        e.filter(F.col("vec_id") < 8),
        enc,
        e,
        codebooks,
        k=5,
        shortlist=None,  # volume-derived (n/40, floor 200, cap 5000)
        dim=_PQ_DIM,
    )


@spec(
    QUERIES,
    "embed_topk_suite",
    sql=f"""
        SELECT 'brute' AS method, * FROM ({_TOPK_SQL})
        UNION ALL
        SELECT 'lsh' AS method, * FROM ({_lsh_topk_sql()})
        UNION ALL
        SELECT 'ivf' AS method, * FROM ({_IVF_SQL})
        UNION ALL
        SELECT 'pq' AS method, * FROM ({_pq_topk_sql()})
        UNION ALL
        SELECT 'imi' AS method, * FROM ({_imi_topk_sql()})
    """,
    doc="All five ANN retrieval strategies over one oracle: exact "
    "brute-force cosine top-5 (the correctness baseline), multi-table "
    "random-hyperplane LSH, IVF cell-probing, product-quantization "
    "ADC (in-engine-trained codebooks — the oracle re-derives the full "
    "fused subspace Lloyd training, the encoding, and the "
    "reconstruction), and the two-level IMI quantizer (NEW round 12 — "
    "the oracle re-derives BOTH training levels, the composite "
    "assignment, the joint-ranked probe, and the scoring: the "
    "past-the-4096-cap cell geometry is graded end to end, not just "
    "row-counted) — discriminated by a `method` column. One registry "
    "slot covers the whole family; the recall@5 gate "
    "(tests/test_ann_recall.py) separately asserts the approximate "
    "methods actually retrieve the true neighbors. Each branch scans "
    "the corpus independently (methods share no state), so suite cost "
    "= sum of parts — at 100 TB you run ONE method, chosen by the "
    "recall/probe-cost tradeoff (PQ's serving path is the persisted "
    "bucketed IVF+PQ index, benched separately).",
    tags=("llm", "bench"),
)
def embed_topk_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        embed_topk_bruteforce(spark, sf_dir).withColumn("method", F.lit("brute"))
        .unionByName(
            embed_topk_lsh(spark, sf_dir).withColumn("method", F.lit("lsh"))
        )
        .unionByName(
            embed_topk_ivf(spark, sf_dir).withColumn("method", F.lit("ivf"))
        )
        .unionByName(
            embed_topk_pq(spark, sf_dir).withColumn("method", F.lit("pq"))
        )
        .unionByName(
            embed_topk_imi(spark, sf_dir).withColumn("method", F.lit("imi"))
        )
    )


@spec(
    QUERIES,
    "multimodal_decode",
    sql="""
        SELECT doc_id AS media_id,
               CAST(64 + ('0x' || substr(sha256(text), 1, 2))::INT AS INT)
                   AS width,
               CAST(64 + ('0x' || substr(sha256(text), 3, 2))::INT AS INT)
                   AS height,
               CAST(3 AS INT) AS n_channels
        FROM documents
    """,
    doc="Multimodal plumbing: treat document text bytes as an opaque "
    "binary payload, run the Arrow-batched mapInPandas decode kernel "
    "(deterministic sha256-derived stub — compressed codecs absent in "
    "this container; PPM/WAV decode for real via "
    "operators.multimodal) and return typed metadata. HASH-MATCH "
    "graded: the oracle re-derives the stub's dimensions from sha256 "
    "hex independently, so the Arrow batch plumbing (schema, "
    "iteration, partitioning) is proven byte-deterministic end to "
    "end, not just row-counted.",
    tags=("llm",),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_image_features

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return decode_image_features(d, fake=True).select(
        "media_id", "width", "height", "n_channels"
    )


# ---------------------------------------------------------------------------
# Model-based quality filtering (operators.classify): the CCNet/Gopher-
# style learned quality classifier — trained IN the engine, scored
# map-side, and re-derived end-to-end by the DuckDB oracle.
# ---------------------------------------------------------------------------

#: Feature columns for the quality classifier (bias first). All are
#: integer-exact-ratio doubles — the proven text_metrics formulations.
_CLF_COLS = ["f_bias", "f_len", "f_stop", "f_wlen"]

#: n_tokens with the empty-doc guard — shared by two feature ratios.
_CLF_NTOK = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END"
)

_CLF_FEATS_SQL = f"""
    feats AS (
        SELECT doc_id,
               1.0 AS f_bias,
               least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS f_len,
               CAST(len(list_filter(string_split_regex(lower(trim(text)), '[ \\t\\n\\x0b\\f\\r]+'),
                    w -> w IN ('the', 'and', 'of', 'to', 'is'))) AS DOUBLE)
                   / greatest({_CLF_NTOK}, 1) AS f_stop,
               (CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                   / greatest({_CLF_NTOK}, 1)) / 10.0 AS f_wlen,
               CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END AS label
        FROM documents
    )
"""


def _clf_suite_sql() -> str:
    from ..operators.classify import score_sql, train_sql_cte

    train = train_sql_cte("feats", _CLF_COLS, "label", lr=4.0, n_iter=8)
    score = score_sql(_CLF_COLS, "w8", score_dp=6)
    return f"""
        WITH {_CLF_FEATS_SQL},
        {train}
        SELECT f.doc_id,
               CAST(f.label AS INT) AS label,
               {score} AS score,
               {score} >= 0.5 AS keep
        FROM feats f CROSS JOIN w8
    """


@spec(
    QUERIES,
    "quality_classifier_suite",
    sql=_clf_suite_sql(),
    doc="Learned quality filter (operators.classify) — the classifier "
    "stage between rule filters and dedup in CCNet/Gopher-style "
    "pipelines: weak label = length rule, features = the map-side "
    "integer-exact text ratios, model = logistic regression trained by "
    "EIGHT batch-GD iterations (lr=4 — powers of two scale exactly in "
    "IEEE) where each iteration is ONE partial-"
    "combine aggregate job (only k+1 scalars reach the driver — the "
    "kmeans-centroid-pull pattern), scoring = trained weights inlined "
    "as codegen literals (no join, no shuffle, pure map work at "
    "100 TB). DECIMAL-exact gradient sums + per-row sigmoid rounding "
    "make the training run bit-reproducible, so the oracle SQL "
    "re-derives the SAME model via CTEs and the scores hash-match.",
    tags=("llm", "bench"),
)
def quality_classifier_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import classify as C
    from ..operators.dedup import fan_out

    # fan_out the (id, text) projection before feature extraction: the
    # regex-heavy features (stopword ratio, mean word length) otherwise
    # run near-serial off a narrow single-file scan — measured 4.3s ->
    # 2.5s at sf1 (SCALE.md); no-op when the scan is already wide.
    # min_bytes gates the toy end: below ~1 MB the widened checkpoint
    # makes all 8 GD jobs pay 32-task scheduling for sub-second maps
    # (measured -0.5s at sf0.1, whose pruned-scan estimate is 0.25 MB;
    # sf1's is 2.6 MB — the floor sits geometrically between them).
    d = fan_out(
        load(spark, sf_dir, "documents").select("doc_id", "text"),
        min_bytes=1 << 20,
    )
    t = F.col("text")
    feats = d.select(
        "doc_id",
        F.lit(1.0).alias("f_bias"),
        F.least(F.length(t).cast("double") / F.lit(500.0), F.lit(1.0)).alias(
            "f_len"
        ),
        X.stopword_ratio(t).alias("f_stop"),
        (X.mean_word_length(t) / F.lit(10.0)).alias("f_wlen"),
        F.when(F.length(t) >= 300, F.lit(1)).otherwise(F.lit(0)).alias("label"),
    )
    # Train over a materialized feature projection: the two GD jobs and
    # the final scoring pass re-read 5 doubles/row, never the text
    # (at scale: .persist() the projection; localCheckpoint here also
    # severs lineage so the scoring plan inlines only literals).
    feats = feats.localCheckpoint(eager=False)
    weights = C.train_logistic(feats, _CLF_COLS, "label", lr=4.0, n_iter=8)
    return C.score_documents(feats, _CLF_COLS, weights, score_dp=6).select(
        "doc_id",
        F.col("label").cast("int").alias("label"),
        "score",
        "keep",
    )


# ---------------------------------------------------------------------------
# Lexical retrieval (operators.retrieval): BM25 — the keyword-search
# complement to the embedding ANN suites.
# ---------------------------------------------------------------------------

#: Fixed probe query for the graded BM25 row (terms present in the
#: synthetic vocabulary; lowercase by contract).
_BM25_TERMS = ["spark", "table", "agg"]


def _bm25_suite_sql() -> str:
    from ..operators.retrieval import bm25_sql

    return bm25_sql(_BM25_TERMS, k=20)


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical top-20 (operators.retrieval.bm25_topk) for a fixed
    query-term set — the keyword-retrieval complement to
    embed_topk_suite. One partial-combine stats aggregate (N, Σdl,
    per-term document frequency — |terms|+2 scalars to the driver),
    then a pure map scoring pass with idf/avgdl inlined as codegen
    literals and TakeOrderedAndProject for the top-k: no explode, no
    (doc, term) shuffle, no inverted index for ad-hoc queries. Graded
    as the 'bm25' leg of retrieval_suite; standalone for bench.py's
    timing series."""
    from ..operators.retrieval import bm25_topk

    return bm25_topk(load(spark, sf_dir, "documents"), _BM25_TERMS, k=20)


#: Eight query-term sets for the batched-BM25 bench entry — the
#: contamination-benchmark shape (many probes, one corpus).
_BM25_MULTI_QUERIES = {
    f"q{i}": terms
    for i, terms in enumerate(
        [
            _BM25_TERMS,
            ["data", "pipeline"],
            ["model", "training"],
            ["patient", "record"],
            ["quality", "filter"],
            ["spark", "query"],
            ["the", "and"],
            ["document", "text"],
        ]
    )
}


def bm25_multi_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only (not registered): batched BM25 over 8 query-term sets
    in ONE corpus text scan (operators.retrieval.bm25_topk_multi) —
    the contamination-benchmark serving shape. Compare its timing
    against 8× bm25_search to read the batching win."""
    from ..operators.retrieval import bm25_topk_multi

    return bm25_topk_multi(
        load(spark, sf_dir, "documents"), _BM25_MULTI_QUERIES, k=20
    )


_RRF_K = 60

_RETRIEVAL_SUITE_SQL = f"""
    WITH bm AS (
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                    AS BIGINT) AS rank
        FROM ({{bm25}})
    ),
    dense AS (
        SELECT neighbor_id AS doc_id, cosine AS score,
               CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT c.vec_id AS neighbor_id,
                   {_COS.format(a='q.qv', b='c.cv')} AS cosine,
                   row_number() OVER (
                       ORDER BY {_COS.format(a='q.qv', b='c.cv')} DESC,
                                c.vec_id ASC) AS rn
            FROM (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = 0) q
            CROSS JOIN (SELECT vec_id, embedding::DOUBLE[] AS cv
                        FROM embeddings WHERE vec_id <> 0) c
        ) WHERE rn <= 20
    ),
    fused AS (
        SELECT doc_id,
               round(CAST(sum(CAST(CAST(1 AS DOUBLE) / ({_RRF_K} + rank)
                                   AS DECIMAL(28,10))) AS DOUBLE), 8)
                   AS score
        FROM (SELECT doc_id, rank FROM bm
              UNION ALL SELECT doc_id, rank FROM dense)
        GROUP BY doc_id
    ),
    rrf AS (
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
                    AS BIGINT) AS rank
        FROM fused
    )
    SELECT 'bm25' AS part, doc_id, score, rank FROM bm
    UNION ALL
    SELECT 'dense' AS part, doc_id, score, rank FROM dense
    UNION ALL
    SELECT 'rrf' AS part, doc_id, score, rank FROM rrf WHERE rank <= 20
"""


@spec(
    QUERIES,
    "retrieval_suite",
    sql=_RETRIEVAL_SUITE_SQL.format(bm25=_bm25_suite_sql()),
    doc="Hybrid retrieval suite: the BM25 lexical top-20 leg (one "
    "stats aggregate + map-side scoring with inlined idf/avgdl + "
    "TakeOrderedAndProject — no explode, no (doc, term) shuffle), the "
    "dense cosine top-20 leg (query vec 0 vs the embeddings corpus, "
    "the exact baseline), and their reciprocal-rank fusion "
    "(operators.retrieval.rrf_fuse — Cormack et al. 2009: "
    "score = sum over systems of 1/(60 + rank), rank-based so the two "
    "lists combine without score calibration). Fusion terms go "
    "through DECIMAL casts so the per-id sum is order-independent; "
    "rounded scores + id tiebreaks pin every k-boundary in both "
    "engines. The fused inputs are top-k lists — driver-scale work at "
    "any corpus size. At 100 TB you run THIS bm25 leg (its one-pass "
    "stats + map scoring scale as-is; thousands of queries batch via "
    "bm25_topk_multi's single text scan) but NOT this dense leg: its "
    "linear corpus scan is the declared-tiny correctness baseline — "
    "production dense retrieval is the persisted bucketed IVF(+PQ) "
    "index (similarity/quantization), recall-gated in tests and "
    "benched as ivfpq_probe.",
    tags=("llm", "bench"),
)
def retrieval_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.retrieval import rrf_fuse
    from ..operators.similarity import brute_force_topk

    bm = bm25_search(spark, sf_dir).withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        .cast("bigint"),
    )
    e = load(spark, sf_dir, "embeddings")
    dense = (
        brute_force_topk(e.filter(F.col("vec_id") == 0), e, k=20, dim=64)
        .select(
            F.col("neighbor_id").alias("doc_id"),
            F.col("cosine").alias("score"),
            "rank",
        )
    )
    rrf = rrf_fuse([bm, dense], id_col="doc_id", k_const=_RRF_K, topk=20)

    def leg(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("part"), "doc_id", "score", "rank"
        )

    return leg(bm, "bm25").unionByName(leg(dense, "dense")).unionByName(
        leg(rrf, "rrf")
    )


@spec(
    QUERIES,
    "corpus_chunks",
    sql=P.chunk_documents_sql(chunk_chars=200, overlap=50),
    doc="Sliding-window document chunking (operators.packing."
    "chunk_documents) — the docs→training-sequences stage between "
    "curation and sequence packing: 200-char chunks with 50-char "
    "overlap, at least one chunk per document. Pure map-side "
    "posexplode(sequence) + substring fan-out: no shuffle, no Python, "
    "output linear in corpus chars. Chunk counts use INTEGER "
    "arithmetic only, so the DuckDB twin reproduces the exact chunk "
    "set and the text hashes match.",
    tags=("llm",),
)
def corpus_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.chunk_documents(
        load(spark, sf_dir, "documents"), chunk_chars=200, overlap=50
    )


def _ppl_sql() -> str:
    from ..operators.lm import perplexity_sql

    return perplexity_sql(ref_where="doc_id % 10 = 0", norm_sql=_NORM)


@spec(
    QUERIES,
    "corpus_perplexity",
    sql=_ppl_sql(),
    doc="CCNet-style perplexity filtering (operators.lm, Wenzek et al. "
    "2020): a char-bigram LM trained on the trusted reference slice "
    "(doc_id % 10 == 0) scores EVERY document — per-doc mean add-one-"
    "smoothed log-probability and perplexity. Training is one "
    "partial-combined groupBy over the bigram fan-out (linear in "
    "reference chars); the model is a <=|alphabet|^2-row table that "
    "BROADCASTS into scoring — the corpus never shuffles. ln results "
    "round to 8 dp (libm shield) before the DECIMAL-exact per-doc "
    "mean, so the oracle SQL re-derives the same model and the "
    "scores hash-match.",
    tags=("llm", "bench"),
)
def corpus_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import char_bigram_lm, with_perplexity

    d = load(spark, sf_dir, "documents")
    lm = char_bigram_lm(d.filter(F.col("doc_id") % 10 == 0))
    return with_perplexity(d, lm)
