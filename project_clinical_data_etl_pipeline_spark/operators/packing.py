"""Corpus mixture + sequence-packing operators for training-data
pipelines: deterministic content-hash sampling (reproducible mixture
weights per source) and token-budget sequence packing (grouping
documents into fixed-size training examples).

Sampling is md5-based (no RNG state): the same row is kept or dropped
identically across runs, engines, partitionings, and cluster sizes —
the property `df.sample()` cannot give and mixture reproducibility
requires. Packing comes in two tiers: a pure-window approximate form
(one shuffle, any scale) and an exact greedy kernel via
``applyInPandas`` (per-group sequential fold, the textbook algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: bin assignment output of the exact packer
_PACK_SCHEMA = "part string, id bigint, n_tokens bigint, bin_id bigint"


def sample_hash(id_col, salt: str = ""):
    """Deterministic per-row sample hash in [0, 100): the first 4 md5
    hex digits of ``id || salt`` mod 100. Change ``salt`` to draw an
    independent sample; md5 gives identical values in any engine."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 4
        ),
        16,
        10,
    ).cast("bigint")
    return h % 100


def deterministic_sample(
    df: DataFrame, id_col: str, rate_pct: int, salt: str = ""
) -> DataFrame:
    """Keep ~rate_pct% of rows, chosen by content hash of the id —
    reproducible Bernoulli sampling (map-only, scan-free-rider)."""
    return df.filter(sample_hash(id_col, salt) < rate_pct)


def sample_by_rates(
    df: DataFrame, id_col: str, strata_col: str, rates_pct: dict[str, int],
    default_pct: int = 0, salt: str = "",
) -> DataFrame:
    """Stratified mixture sampling: per-stratum keep rates (percent),
    e.g. ``{"web": 10, "books": 100}`` — the mixture-weights primitive
    of corpus construction. One map-only pass; strata absent from
    ``rates_pct`` default to ``default_pct``."""
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.filter(sample_hash(id_col, salt) < rate)


def with_split(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5)),
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the first 4 md5 hex
    digits of ``id || salt`` land in consecutive hex-threshold buckets
    sized by the percentage weights (must sum to 100). Pure string
    comparison on fixed-width lowercase hex — identical lexicographic =
    numeric order in any engine, so the assignment is oracle-checkable
    without hex→int conversion. Map-only; the same row lands in the
    same split across runs, partitionings, and cluster sizes."""
    weights = [pct for _, pct in splits]
    if sum(weights) != 100:
        raise ValueError(f"split weights must sum to 100, got {sum(weights)}")
    h = F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 4)
    acc = 0
    expr = None
    for name, pct in splits[:-1]:
        acc += pct
        bound = format((65536 * acc) // 100, "04x")
        expr = (
            F.when(h < bound, F.lit(name))
            if expr is None
            else expr.when(h < bound, F.lit(name))
        )
    last = F.lit(splits[-1][0])
    return df.withColumn(out, last if expr is None else expr.otherwise(last))


def split_bounds_hex(
    splits: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5)),
) -> list[tuple[str, str]]:
    """(name, upper-bound hex) pairs for all but the last split — the
    SQL-oracle twin of :func:`with_split` builds the same CASE from
    these, guaranteeing both engines share one threshold table."""
    acc = 0
    out = []
    for name, pct in splits[:-1]:
        acc += pct
        out.append((name, format((65536 * acc) // 100, "04x")))
    return out


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    order_cols,
    out: str = "in_cap",
) -> DataFrame:
    """Per-key quota flag: ``out`` = 1 for the first ``cap`` rows of each
    key under the deterministic ``order_cols`` total order, else 0 —
    the per-source/domain cap of corpus curation.

    Two-phase for scale: keys are counted first (map-side partial agg),
    and ONLY rows of over-cap keys go through the row_number window; the
    (usually vast) under-cap remainder is flagged 1 via a broadcast
    anti-join against the over-cap key list and never shuffles on the
    key. A single boilerplate mega-source therefore costs one window
    over its own rows, not a corpus-wide sort. Equivalent single-phase
    semantics: row_number() OVER (PARTITION BY key ORDER BY ...) <= cap.

    Cost note: ``df``'s lineage is traversed three times (count + the
    two branch joins). When the upstream is an expensive computed plan
    rather than a scan, persist/localCheckpoint it first — the trade is
    3× map work for avoiding a corpus-wide key shuffle, which wins
    whenever upstream is scan-dominated.
    """
    over = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > cap)
        .select(key_col)
    )
    under_rows = df.join(F.broadcast(over), on=key_col, how="left_anti").withColumn(
        out, F.lit(1)
    )
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    over_rows = (
        df.join(F.broadcast(over), on=key_col, how="left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(out, (F.col("__rn") <= cap).cast("int"))
        .drop("__rn")
    )
    return under_rows.unionByName(over_rows)


def with_pack_bins(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    part_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Approximate sequence packing as a pure window op: documents are
    laid out in deterministic ``order_col`` order within each partition
    and assigned ``bin_id = floor(start_offset / budget)`` from the
    running token cumsum. One shuffle on ``part_cols``; scales to any
    corpus. Bins hold ≤ budget + max-doc tokens (a document whose span
    straddles a boundary stays in its starting bin) — acceptable when
    docs ≪ budget; use :func:`pack_greedy` for the strict-capacity
    form."""
    w = Window.partitionBy(*part_cols).orderBy(F.col(order_col).asc())
    start = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn("bin_id", F.floor(start / budget).cast("bigint"))


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    part_col: str = "source",
) -> DataFrame:
    """Exact greedy next-fit packing via ``applyInPandas``: within each
    partition group (ordered by id) a running bin fills until adding the
    next document would exceed ``budget``, then a new bin opens;
    over-budget documents get a bin of their own. Returns (part, id,
    n_tokens, bin_id) with every bin total ≤ budget (singleton
    oversized bins excepted).

    The fold is inherently sequential per group — exactly what
    ``applyInPandas`` is for: groups pack in parallel across the
    cluster, each group packs exactly. Kernel is self-contained
    (pandas only) → cloudpickled by value."""
    budget_ = int(budget)

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values("id", kind="mergesort")
        bins, cur_bin, cur_tok = [], 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if cur_tok > 0 and cur_tok + t > budget_:
                cur_bin += 1
                cur_tok = 0
            bins.append(cur_bin)
            cur_tok += t
        return pd.DataFrame(
            {
                "part": pdf["part"],
                "id": pdf["id"],
                "n_tokens": pdf["n_tokens"],
                "bin_id": bins,
            }
        )

    normalized = df.select(
        F.col(part_col).cast("string").alias("part"),
        F.col(id_col).cast("bigint").alias("id"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
    )
    return normalized.groupBy("part").applyInPandas(kernel, _PACK_SCHEMA)


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Sliding-window document chunking — the docs→training-sequences
    stage between curation and packing: each document becomes
    ``ceil((len - overlap) / stride)`` chunks of ``chunk_chars``
    characters with ``overlap`` characters shared between neighbors
    (``stride = chunk_chars - overlap``); every document emits at least
    one chunk (short/empty docs yield their full text).

    Pure map-side fan-out: ``posexplode(sequence(...))`` + 1-based
    ``substring`` — no shuffle, no Python; output volume is
    ``total_chars / stride`` rows, linear in corpus size. The chunk
    count uses INTEGER arithmetic only (``(len - overlap + stride - 1)
    div stride``), so a SQL twin reproduces it exactly; NULL-text rows
    are dropped (no well-defined chunking).

    Output: (id_col, chunk_id, chunk_text, chunk_len), chunk_id
    0-based in document order.
    """
    if overlap >= chunk_chars:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_chars ({chunk_chars})"
        )
    stride = chunk_chars - overlap
    # integer division: Spark's `div` on bigints (floor for positives)
    n = F.expr(
        f"greatest(1L, (length({text_col}) - {overlap} + {stride - 1}) div {stride})"
    )
    exploded = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(text_col),
            F.explode(F.sequence(F.lit(0).cast("bigint"), n - 1)).alias(
                "chunk_id"
            ),
        )
    )
    chunk = F.substring(
        F.col(text_col), (F.col("chunk_id") * stride + 1).cast("int"), chunk_chars
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
    )


def chunk_documents_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 200,
    overlap: int = 50,
) -> str:
    """DuckDB twin of :func:`chunk_documents` — same integer chunk
    count, same 1-based length-clamped substring."""
    stride = chunk_chars - overlap
    return f"""
        WITH n AS (
            SELECT {id_col}, {text_col},
                   greatest(1, (length({text_col}) - {overlap} + {stride - 1})
                               // {stride}) AS n_chunks
            FROM {table} WHERE {text_col} IS NOT NULL
        )
        SELECT {id_col},
               CAST(i AS BIGINT) AS chunk_id,
               substring({text_col}, CAST(i * {stride} + 1 AS INT),
                         {chunk_chars}) AS chunk_text,
               CAST(length(substring({text_col}, CAST(i * {stride} + 1 AS INT),
                         {chunk_chars})) AS BIGINT) AS chunk_len
        FROM n, unnest(generate_series(0, n_chunks - 1)) AS t(i)
    """
