"""OP-41 streaming queries registered for the driver (SURVEY.md §2.8).

The complete-mode stream result equals the batch hourly group-by, so it
IS oracle-checkable in SQL — the stream runs to completion inside the
callable and returns the materialized result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import (
    _BLOOM_K,
    _BLOOM_M,
    _CMS_DEPTH,
    cms_counters_sql,
    cms_probe_cells_sql,
    hll_oracle_sql,
)
from ..streaming.incremental import WINDOW_S, run_hourly_counts_stream
from ..streaming.sessions import sessionize_batch
from ..tables import load
from .base import QuerySpec, spec

QUERIES: dict[str, QuerySpec] = {}


#: Watermark delay for the graded append leg (must match the SQL lim).
#: The WINDOW width is a different knob — streaming.incremental.WINDOW_S
#: — and the cutoff math below uses each where it belongs (window end =
#: start + width; finalization horizon = max ts − delay).
_APPEND_DELAY_S = 3600

_HOURLY_SUITE_SQL = f"""
    WITH base AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    ),
    lim AS (
        SELECT (epoch_us(max(ts)) // 1000 - {_APPEND_DELAY_S * 1000}) * 1000
                   - 1000000 AS lim_us
        FROM events
    )
    SELECT 'complete' AS part,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n_events, total_value
    FROM base
    UNION ALL
    SELECT 'append' AS part,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n_events, total_value
    FROM base, lim
    WHERE epoch_us(h + INTERVAL {WINDOW_S} SECOND) < lim_us
    UNION ALL
    SELECT 'hll' AS part, window_start,
           CAST(NULL AS VARCHAR) AS event_type,
           s_int AS n_events, est_raw AS total_value
    FROM ({hll_oracle_sql(
        "user_id",
        "events",
        (("window_start", "strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')"),),
    )})
    UNION ALL
    SELECT 'dedupwm' AS part,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n_events, total_value
    FROM base
    UNION ALL
    SELECT 'cmsw' AS part, window_start, key AS event_type,
           est AS n_events, CAST(COALESCE(exact, 0) AS DOUBLE) AS total_value
    FROM (
        WITH wctrs AS ({cms_counters_sql(
            "user_id",
            "events",
            group_keys=(
                ("window_start",
                 "strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')"),
            ),
        )}),
        probes AS (
            SELECT CAST(pk AS VARCHAR) AS key, pk
            FROM (SELECT DISTINCT user_id AS pk FROM events
                  WHERE user_id IS NOT NULL)
            ORDER BY md5(CAST(pk AS VARCHAR) || '|probe'), pk LIMIT 3
        ),
        cells AS ({cms_probe_cells_sql("SELECT key FROM probes")}),
        est AS (
            SELECT c.window_start, p.key,
                   CASE WHEN count(*) < {_CMS_DEPTH} THEN CAST(0 AS BIGINT)
                        ELSE MIN(c.cnt) END AS est
            FROM wctrs c JOIN cells p ON c.r = p.r AND c.bucket = p.bucket
            GROUP BY 1, 2
        ),
        ex AS (
            SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S')
                       AS window_start,
                   CAST(e.user_id AS VARCHAR) AS key,
                   CAST(count(*) AS BIGINT) AS exact
            FROM events e JOIN probes p ON e.user_id = p.pk GROUP BY 1, 2
        )
        SELECT est.window_start, est.key, est.est, ex.exact
        FROM est LEFT JOIN ex
            ON est.window_start = ex.window_start AND est.key = ex.key
    )
"""

# Per-window Bloom set-bit twin, generated from the same geometry
# constants as streaming/bloom.py (one definition, no drift): each of
# the k hash windows of md5(user_id), tagged with the event's hour.
_BLOOMW_BITS_SQL = "\nUNION ALL\n".join(
    f"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), {1 + 4 * i}, 4))::BIGINT
                % {_BLOOM_M} AS INT) AS bit
        FROM events WHERE user_id IS NOT NULL"""
    for i in range(_BLOOM_K)
)
# probe-key bit cells (duplicates preserved — the all-k sum stays
# exact when two hash windows collide for one key)
_BLOOMW_CELLS_SQL = "\nUNION ALL\n".join(
    f"""SELECT key,
           CAST(('0x' || substr(md5(key), {1 + 4 * i}, 4))::BIGINT
                % {_BLOOM_M} AS INT) AS bit
        FROM probes"""
    for i in range(_BLOOM_K)
)

# Sidecar-read twin (round 13): the per-day HLL profile the upsert
# maintains over the target's event_type column. Registers depend only
# on the SET of values per day, and the leg's two-batch upsert drives
# the target to exactly the batch hourly aggregate — so the oracle
# re-derives the same registers straight from events (every (day,
# event_type) pair in the final target appears in events and vice
# versa), p=8 = upsert_partitioned's sketch_p.
_HLLUP_ORACLE = hll_oracle_sql(
    "event_type",
    "(SELECT * FROM events WHERE ts IS NOT NULL) tn",
    (("window_start", "strftime(date_trunc('day', ts), '%Y-%m-%d')"),),
)

_HOURLY_SUITE_SQL += f"""
    UNION ALL
    SELECT 'hllup' AS part, window_start,
           CAST(NULL AS VARCHAR) AS event_type,
           s_int AS n_events, est_raw AS total_value
    FROM ({_HLLUP_ORACLE})
"""

_HOURLY_SUITE_SQL += f"""
    UNION ALL
    SELECT 'bloomw' AS part, window_start, key AS event_type,
           maybe AS n_events, CAST(truly AS DOUBLE) AS total_value
    FROM (
        WITH wbits AS (
            SELECT DISTINCT window_start, bit FROM ({_BLOOMW_BITS_SQL})
        ),
        probes AS (
            (SELECT CAST(user_id AS VARCHAR) AS key
             FROM (SELECT DISTINCT user_id FROM events
                   WHERE user_id IS NOT NULL)
             ORDER BY md5(CAST(user_id AS VARCHAR) || '|probe'),
                      CAST(user_id AS VARCHAR) LIMIT 3)
            UNION ALL
            (SELECT unnest(['-1', '-2']) AS key)
        ),
        cells AS ({_BLOOMW_CELLS_SQL}),
        wins AS (SELECT DISTINCT window_start FROM wbits),
        grid AS (SELECT w.window_start, c.key, c.bit
                 FROM wins w CROSS JOIN cells c),
        mb AS (
            SELECT g.window_start, g.key,
                   CAST(CASE WHEN SUM(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END)
                             = {_BLOOM_K} THEN 1 ELSE 0 END AS BIGINT)
                       AS maybe
            FROM grid g LEFT JOIN wbits b
                ON g.window_start = b.window_start AND g.bit = b.bit
            GROUP BY 1, 2
        ),
        tr AS (
            SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S')
                       AS window_start,
                   CAST(e.user_id AS VARCHAR) AS key,
                   CAST(1 AS BIGINT) AS truly
            FROM events e JOIN probes p ON CAST(e.user_id AS VARCHAR) = p.key
            GROUP BY 1, 2
        )
        SELECT mb.window_start, mb.key, mb.maybe,
               COALESCE(tr.truly, 0) AS truly
        FROM mb LEFT JOIN tr
            ON mb.window_start = tr.window_start AND mb.key = tr.key
    )
"""


@spec(
    QUERIES,
    "op41_streaming_hourly_counts",
    sql=_HOURLY_SUITE_SQL,
    doc="OP-41 incremental sync (reference roadmap insights.md:169), BOTH "
    "output modes graded. 'complete' leg: Structured-Streaming tumbling "
    "1h window over the events file source run to completion in complete "
    "mode — provably equals the batch group-by. 'append' leg: the "
    "PRODUCTION shape — the same aggregation with a 1h watermark in "
    "append mode, so only watermark-finalized windows emit; the "
    "deterministic cutoff (1 s below the engine's final watermark = max "
    "event time − 1h, re-derived by the oracle — the stream_temporal_"
    "suite trick) restricts both engines to windows the watermark "
    "contract guarantees emitted, independent of ms truncation. State "
    "on the append leg is O(windows inside the horizon × group "
    "cardinality), never history-sized. 'hll' leg (round 10): per-hour "
    "distinct-user HLL sketch computed IN the stream — the register "
    "table is a plain windowed max (streaming/hll.py), so state per "
    "window is ≤256 ints at ANY user cardinality where exact windowed "
    "distinct would hold O(distinct) state; the oracle re-derives the "
    "identical registers batch-side (integer sketch core, hash-match). "
    "'dedupwm' leg (round 10): NATIVE streaming dedup — "
    "dropDuplicatesWithinWatermark under injected at-least-once "
    "re-deliveries (two real micro-batches; every batch-1 event inside "
    "the watermark horizon re-sent in batch 2) must emit exactly the "
    "distinct original events, so the hourly rollup equals the batch "
    "group-by; dedup state is bounded by the watermark horizon where "
    "plain dropDuplicates state grows with stream history. 'cmsw' leg "
    "(round 10): per-hour count-min estimates for 3 watched user keys "
    "computed IN the stream (streaming/cms.py — windowed counter "
    "table, state ≤ d·w ints per window at any cardinality; unlike the "
    "idempotent-max HLL registers, counters SUM, so at-least-once "
    "sources inflate them — the contract is stated at the operator). "
    "'bloomw' leg (round 11): per-hour Bloom MEMBERSHIP for 3 watched "
    "keys + 2 guaranteed-absent keys, the filter computed IN the "
    "stream (streaming/bloom.py — windowed groupBy(window, bit).max(1), "
    "state ≤ m bit rows per window at any cardinality, and IDEMPOTENT "
    "like the HLL registers so at-least-once replays are harmless); "
    "the per-window no-false-negative guarantee grades cross-engine "
    "(streamed bits ≡ batch bits per window, hash-match). 'hllup' leg "
    "(round 13): the upsert target's PER-DAY PROFILE SIDECAR read "
    "path — two deterministic upsert batches (first-half aggregates, "
    "then full-day replacements for every day the second half "
    "touches) drive the day-partitioned target to exactly the batch "
    "hourly aggregate while the per-day HLL sidecar over event_type "
    "rides each commit (streaming/incremental.py upsert_partitioned); "
    "the leg then answers distinct-event_type-per-day FROM THE "
    "SIDECAR ALONE (read_upsert_sketch — profile-without-rescan) and "
    "the oracle re-derives the identical registers from the raw "
    "events. Grades the round-12 write-side invariant (sidecar ≡ "
    "fresh sketch of each day's current rows, through replacements) "
    "end-to-end cross-engine.",
    tags=("streaming",),
)
def op41_streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.incremental import run_watermarked_append_stream

    complete = run_hourly_counts_stream(spark, sf_dir).select(
        F.lit("complete").alias("part"),
        "window_start",
        "event_type",
        "n_events",
        "total_value",
    )

    # deterministic finalization cutoff, strictly below the engine's
    # final watermark whatever its ms truncation (1 s slack); one 1-row
    # scalar pull — control flow, not data movement
    e = load(spark, sf_dir, "events")
    ux = F.unix_micros(F.col("ts").cast("timestamp"))
    lim_raw = e.agg(
        (
            (F.floor(F.max(ux) / 1000).cast("bigint") - _APPEND_DELAY_S * 1000)
            * 1000
            - 1_000_000
        ).alias("__lim_us")
    ).collect()[0][0]
    if lim_raw is None:
        # empty table / all-NULL ts: no watermark ever advances, so the
        # append leg is empty BY DEFINITION — the oracle's NULL lim
        # comparison yields the same zero rows. Both legs share a
        # schema, so the complete leg alone is the full suite result.
        return complete
    lim_us = int(lim_raw)
    appended = run_watermarked_append_stream(
        spark, sf_dir, delay=f"{_APPEND_DELAY_S} seconds"
    )
    # window END (start + WIDTH) vs the delay-derived horizon — the
    # width and the delay are equal here by coincidence, not contract
    append_leg = appended.filter(
        F.unix_micros(F.to_timestamp("window_start")) + WINDOW_S * 1_000_000
        < F.lit(lim_us)
    ).select(
        F.lit("append").alias("part"),
        "window_start",
        "event_type",
        "n_events",
        "total_value",
    )
    return (
        complete.unionByName(append_leg)
        .unionByName(_hll_leg(spark, sf_dir))
        .unionByName(_dedupwm_leg(spark, sf_dir))
        .unionByName(_cmsw_leg(spark, sf_dir))
        .unionByName(_bloomw_leg(spark, sf_dir))
        .unionByName(_hllup_leg(spark, sf_dir))
    )


def _hllup_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sidecar-READ leg (round 13): exercise the upsert's maintained
    per-day HLL profile END TO END — write side (two batches, the
    second REPLACING every key of the days it touches, so the
    recompute-per-touched-day law does real work) and read side
    (read_upsert_sketch → estimate per day, no rescan of the data).

    Determinism: batch 1 is the hourly aggregate of the first half of
    the event-time range (its rows for days that also have second-half
    events are PARTIAL); batch 2 is the hourly aggregate of ALL events
    on every day the second half touches — a superset of batch 1's
    keys for those days, so the replace-merge drives the final target
    to exactly the full batch hourly aggregate, whatever the halves
    were. The sidecar then equals a fresh per-day sketch of the final
    rows (the round-12 pinned invariant), which the oracle re-derives
    from raw events (registers see sets, not multiplicities)."""
    import os

    from ..operators.sketch import hll_core_from_registers
    from ..scratch import scratch_dir
    from ..streaming.incremental import (
        read_upsert_sketch,
        upsert_partitioned,
    )

    empty = spark.createDataFrame(
        [],
        "part string, window_start string, event_type string, "
        "n_events bigint, total_value double",
    )
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ux = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = e.agg(
        F.min(ux).alias("mn"), F.max(ux).alias("mx")
    ).collect()[0]
    if bounds["mn"] is None:
        return empty  # the oracle's empty-events register set is empty too

    def hourly(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_value"),
            )
            .select(
                F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n_events",
                "total_value",
            )
        )

    mid = (int(bounds["mn"]) + int(bounds["mx"])) // 2
    batch1 = hourly(e.filter(ux <= mid))
    touched_days = (
        e.filter(ux > mid)
        .select(F.to_date(F.date_trunc("day", "ts")).alias("__d"))
        .distinct()
    )
    batch2 = hourly(
        e.withColumn("__d", F.to_date(F.date_trunc("day", "ts"))).join(
            F.broadcast(touched_days), on="__d"
        )
    )
    target = os.path.join(scratch_dir("spark_graft_hllup_"), "target")
    upsert_partitioned(batch1, target, sketch_col="event_type")
    upsert_partitioned(batch2, target, sketch_col="event_type")
    regs = read_upsert_sketch(spark, target, kind="hll").withColumnRenamed(
        "part", "day"
    )
    return hll_core_from_registers(regs, 8, "day").select(
        F.lit("hllup").alias("part"),
        F.col("day").alias("window_start"),
        F.lit(None).cast("string").alias("event_type"),
        F.col("s_int").alias("n_events"),
        F.col("est_raw").alias("total_value"),
    )


def _bloomw_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour Bloom membership for 3 watched user keys + 2
    guaranteed-absent keys, the filter computed IN the stream
    (streaming/bloom.py: windowed groupBy(window, bit).max(1) — state
    per window ≤ m bit rows at ANY key cardinality, and IDEMPOTENT
    like the HLL registers, so at-least-once replays are harmless
    where CMS counters would inflate). The membership read and the
    exact per-window truth column run batch-side on the drained
    snapshot. Graded as the 'bloomw' leg of
    op41_streaming_hourly_counts (streamed bits ≡ batch bits per
    window — the no-false-negative guarantee per window,
    hash-match)."""
    from ..streaming.bloom import run_windowed_bloom_stream, windowed_membership

    e = load(spark, sf_dir, "events")
    present = (
        e.filter(F.col("user_id").isNotNull())
        .select(F.col("user_id").cast("string").alias("key"))
        .distinct()
        .orderBy(F.md5(F.concat(F.col("key"), F.lit("|probe"))), F.col("key"))
        .limit(3)
    )
    absent = spark.createDataFrame([("-1",), ("-2",)], "key string")
    probes = present.unionByName(absent).localCheckpoint(eager=False)
    bits = run_windowed_bloom_stream(spark, sf_dir)
    maybe = windowed_membership(bits, probes)
    truly = (
        e.join(
            F.broadcast(probes),
            F.col("user_id").cast("string") == F.col("key"),
        )
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "key",
        )
        .agg(F.lit(1).cast("bigint").alias("truly"))
    )
    return maybe.join(
        F.broadcast(truly), on=["window_start", "key"], how="left"
    ).select(
        F.lit("bloomw").alias("part"),
        "window_start",
        F.col("key").alias("event_type"),
        F.col("maybe").alias("n_events"),
        F.coalesce(F.col("truly"), F.lit(0)).cast("double").alias("total_value"),
    )


def _cmsw_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour CMS point-frequency estimates for 3 deterministically
    chosen watched user keys, computed IN the stream (streaming/cms.py:
    windowed groupBy(window, r, bucket).count() — state per window is
    ≤ d·w counter ints at ANY key cardinality; exact per-window per-key
    counting holds O(distinct) state). The estimate read and the exact
    truth column run batch-side on the drained horizon-bounded counter
    snapshot. Graded as the 'cmsw' leg of op41_streaming_hourly_counts
    (streamed counters ≡ batch counters per window, hash-match)."""
    from ..streaming.cms import run_windowed_cms_stream, windowed_point_estimates

    e = load(spark, sf_dir, "events")
    probes = (
        e.filter(F.col("user_id").isNotNull())
        .select(F.col("user_id").alias("pk"))
        .distinct()
        .orderBy(
            F.md5(F.concat(F.col("pk").cast("string"), F.lit("|probe"))),
            F.col("pk"),
        )
        .limit(3)
        .select("pk", F.col("pk").cast("string").alias("key"))
        # two consumers (probe cells + exact truth join): materialize
        # the 3-row probe set once (the op39_cms_profile pattern)
        .localCheckpoint(eager=False)
    )
    counters = run_windowed_cms_stream(spark, sf_dir)
    est = windowed_point_estimates(counters, probes.select("key"))
    exact = (
        e.join(F.broadcast(probes), F.col("user_id") == F.col("pk"))
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "key",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    )
    return est.join(
        F.broadcast(exact), on=["window_start", "key"], how="left"
    ).select(
        F.lit("cmsw").alias("part"),
        "window_start",
        F.col("key").alias("event_type"),
        F.col("est").alias("n_events"),
        F.coalesce(F.col("exact"), F.lit(0)).cast("double").alias("total_value"),
    )


def _dedupwm_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming dedup (``dropDuplicatesWithinWatermark``) under
    injected at-least-once re-deliveries, aggregated per hour — the
    emitted set must be EXACTLY the distinct original events, so the
    hourly rollup equals the batch group-by even though the stream saw
    duplicates (streaming/incremental.run_dedup_within_watermark_stream:
    two real micro-batches, every batch-1 event inside the watermark
    horizon re-sent in batch 2; state bounded by the horizon, not the
    stream history). Graded as the 'dedupwm' leg of
    op41_streaming_hourly_counts."""
    from ..streaming.incremental import run_dedup_within_watermark_stream

    out = run_dedup_within_watermark_stream(spark, sf_dir)
    return (
        out.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.lit("dedupwm").alias("part"),
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def _hll_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour distinct-user HLL sketch computed IN the stream
    (streaming/hll.py: windowed groupBy(bucket).max(rho) — state per
    window is ≤256 ints at ANY cardinality, the reason sketches exist
    in streams; exact windowed distinct would hold O(distinct) state).
    The oracle re-derives the identical registers from the batch table,
    so the leg grades streamed-registers ≡ batch-registers per window."""
    from ..streaming.hll import run_windowed_hll_stream

    return run_windowed_hll_stream(spark, sf_dir).select(
        F.lit("hll").alias("part"),
        "window_start",
        F.lit(None).cast("string").alias("event_type"),
        F.col("s_int").alias("n_events"),
        F.col("est_raw").alias("total_value"),
    )


@spec(
    QUERIES,
    "sessionize_events",
    sql="""
        WITH g AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sess
            FROM g
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM s GROUP BY user_id, sess
    """,
    doc="Gap-based sessionization (10-min gap) as the batch twin of the "
    "applyInPandasWithState streaming operator: lag-window boundary "
    "detection + running-sum session ids + one group-by — two shuffles "
    "on user_id, all JVM. Microsecond-exact gap math matches the "
    "streaming kernel bit-for-bit.",
    tags=("streaming",),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    s = sessionize_batch(e, gap_s=600)
    return s.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.col("total_value"),
    )


#: Watermark/late-arrival horizon for the streamed temporal joins (s).
_HORIZON_S = 600

_STREAM_TEMPORAL_SQL = f"""
    WITH lim AS (
        SELECT (epoch_us(max(ts)) // 1000 - {_HORIZON_S * 1000}) * 1000
                   - 1000000 AS lim_us
        FROM events WHERE event_type IN ('click', 'purchase')
    ),
    lim_all AS (
        SELECT (epoch_us(max(ts)) // 1000 - {_HORIZON_S * 1000}) * 1000
                   - 1000000 AS lim_us
        FROM events
    ),
    p AS (SELECT event_id, user_id, epoch_us(ts) AS t
          FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, epoch_us(ts) AS t
          FROM events WHERE event_type = 'click'),
    m AS (
        SELECT p.event_id, p.user_id, p.t,
               c.event_id AS match_event_id, c.t AS match_ts_us,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.t DESC, c.event_id DESC) AS rn
        FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.t <= p.t
    )
    SELECT 'asof' AS part, event_id, user_id, t AS ts_us,
           match_event_id, match_ts_us,
           CAST(NULL AS BIGINT) AS n_right,
           CAST(NULL AS VARCHAR) AS attr
    FROM m, lim WHERE rn = 1 AND t < lim_us
    UNION ALL
    SELECT 'range' AS part, er.event_id, er.user_id, er.t AS ts_us,
           CAST(NULL AS BIGINT) AS match_event_id,
           CAST(NULL AS BIGINT) AS match_ts_us,
           CAST(count(*) AS BIGINT) AS n_right,
           CAST(NULL AS VARCHAR) AS attr
    FROM (SELECT event_id, user_id, epoch_us(ts) AS t
          FROM events WHERE event_type = 'error') er
    JOIN (SELECT user_id, epoch_us(ts) AS t
          FROM events WHERE event_type = 'click') cl
      ON cl.user_id = er.user_id
         AND er.t - cl.t >= 0 AND er.t - cl.t < {_HORIZON_S * 1000000}
    GROUP BY er.event_id, er.user_id, er.t
    UNION ALL
    SELECT 'scd2' AS part, CAST(version AS BIGINT) AS event_id, user_id,
           valid_from_us AS ts_us,
           CAST(NULL AS BIGINT) AS match_event_id,
           valid_to_us AS match_ts_us,
           CAST(NULL AS BIGINT) AS n_right,
           attr
    FROM (
        SELECT user_id, attr, valid_from_us,
               lead(valid_from_us) OVER w2 AS valid_to_us,
               row_number() OVER w2 AS version
        FROM (
            SELECT user_id, event_type AS attr, epoch_us(ts) AS valid_from_us,
                   event_id,
                   lag(event_type) OVER w1 AS prev,
                   row_number() OVER w1 AS rn
            FROM events
            WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        WHERE rn = 1 OR prev IS DISTINCT FROM attr
        WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from_us, event_id)
    ), lim_all
    WHERE valid_to_us IS NOT NULL AND valid_to_us < lim_us
"""


@spec(
    QUERIES,
    "stream_temporal_suite",
    sql=_STREAM_TEMPORAL_SQL,
    doc="The streamed temporal-join kernels graded against the SAME "
    "truth as their batch twins. 'asof' leg: the custom "
    "applyInPandasWithState as-of kernel (streaming/asof.py) run to "
    "completion over the events file source — every finalized purchase "
    "carries the latest preceding click; the deterministic cutoff "
    "(1 s below the engine's final watermark = max event time − "
    f"{_HORIZON_S} s, re-derived by the oracle) restricts both sides to "
    "rows the watermark contract guarantees emitted, independent of "
    "the engine's ms truncation. 'range' leg: Spark's native "
    "watermarked stream-stream inner join (streaming/temporal.py) — "
    "clicks within the 10 minutes before each error, grouped to "
    "per-error counts; a single micro-batch emits the complete pair "
    "set, equal to the batch binned range join. 'scd2' leg (round 9): "
    "the streaming type-2 SCD change-capture kernel "
    "(streaming/scd2.py) — closed versions finalized once the closing "
    "change row clears the watermark, proven equal to the batch "
    "scd2_history under the same cutoff (derived over ALL events for "
    "this unfiltered stream). State on every leg is O(watermark "
    "horizon × key arrival rate), never history-sized.",
    tags=("streaming", "temporal"),
)
def stream_temporal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.asof import stream_asof_join
    from ..streaming.incremental import _event_stream, run_to_parquet
    from ..streaming.temporal import stream_range_join

    # --- asof leg: custom stateful kernel ---
    # all three legs emit O(data) rows (per-purchase enrichments,
    # per-PAIR matches, per-change versions), so each lands in scratch
    # parquet executor-side — a memory sink would hold the whole
    # emitted stream in driver heap (run_to_parquet docstring)
    s = _event_stream(spark, sf_dir)
    p_s = s.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    c_s = s.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    asof_rows = run_to_parquet(
        spark,
        stream_asof_join(p_s, c_s, watermark_s=_HORIZON_S),
        "stsuite_asof",
    )

    # Deterministic finalization cutoff, strictly below the engine's
    # final watermark whatever its ms truncation: 1 s of slack. One
    # 1-row scalar pull — control flow, not data movement (the same
    # class as the IVF probe-cell enumeration).
    e = load(spark, sf_dir, "events")
    ux = F.unix_micros(F.col("ts").cast("timestamp"))
    lim_us = int(
        e.filter(F.col("event_type").isin("click", "purchase"))
        .agg(
            (
                (F.floor(F.max(ux) / 1000).cast("bigint") - _HORIZON_S * 1000)
                * 1000
                - 1_000_000
            ).alias("__lim_us")
        )
        .collect()[0][0]
    )
    asof_leg = (
        asof_rows
        .filter(F.col("left_ts_us") < F.lit(lim_us))
        .select(
            F.lit("asof").alias("part"),
            F.col("left_event_id").alias("event_id"),
            "user_id",
            F.col("left_ts_us").alias("ts_us"),
            F.col("matched_event_id").alias("match_event_id"),
            F.col("matched_ts_us").alias("match_ts_us"),
            F.lit(None).cast("bigint").alias("n_right"),
            F.lit(None).cast("string").alias("attr"),
        )
    )

    # --- range leg: native watermarked stream-stream join ---
    s2 = _event_stream(spark, sf_dir)
    err_s = s2.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clk_s = s2.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    range_rows = run_to_parquet(
        spark,
        stream_range_join(
            err_s, clk_s, on="user_id", left_ts="ts", right_ts="ts",
            lower_s=-_HORIZON_S, upper_s=0, watermark_s=_HORIZON_S,
        ),
        "stsuite_range",
    )
    range_leg = (
        range_rows
        .groupBy("event_id", "user_id", "ts")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_right"))
        .select(
            F.lit("range").alias("part"),
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.lit(None).cast("bigint").alias("match_event_id"),
            F.lit(None).cast("bigint").alias("match_ts_us"),
            "n_right",
            F.lit(None).cast("string").alias("attr"),
        )
    )

    # --- scd2 leg: custom stateful change-capture kernel ---
    from ..streaming.scd2 import stream_scd2_history

    scd2_rows = run_to_parquet(
        spark,
        stream_scd2_history(
            _event_stream(spark, sf_dir), watermark_s=_HORIZON_S
        ),
        "stsuite_scd2",
    )
    # same deterministic cutoff, derived over ALL events (the scd2
    # stream is unfiltered, so its watermark comes from the global max)
    lim_all_us = int(
        e.agg(
            (
                (F.floor(F.max(ux) / 1000).cast("bigint") - _HORIZON_S * 1000)
                * 1000
                - 1_000_000
            ).alias("__lim_us")
        ).collect()[0][0]
    )
    scd2_leg = (
        scd2_rows
        .filter(F.col("valid_to_us") < F.lit(lim_all_us))
        .select(
            F.lit("scd2").alias("part"),
            F.col("version").alias("event_id"),
            "user_id",
            F.col("valid_from_us").alias("ts_us"),
            F.lit(None).cast("bigint").alias("match_event_id"),
            F.col("valid_to_us").alias("match_ts_us"),
            F.lit(None).cast("bigint").alias("n_right"),
            "attr",
        )
    )
    return asof_leg.unionByName(range_leg).unionByName(scd2_leg)


@spec(
    QUERIES,
    "incremental_dedup_corpus",
    sql="""
        WITH fps AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fp
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, fp,
                   row_number() OVER (PARTITION BY fp
                                      ORDER BY doc_id % 2, doc_id) AS rn
            FROM fps
        )
        SELECT doc_id, fp FROM ranked WHERE rn = 1
    """,
    doc="Incremental corpus dedup run as a REAL two-batch stream "
    "(streaming/incremental.start_incremental_dedup_stream — the "
    "reference's nightly-sync roadmap item, insights.md:169, composed "
    "with the content fingerprint): batch 1 streams the even-doc_id "
    "half of documents, batch 2 streams the odd half PLUS re-sent "
    "batch-1 docs (doc_id % 10 == 0) that must idempotently anti-join "
    "away against the accumulated corpus. Each micro-batch is "
    "fingerprinted in-stream (md5 over canonicalized text, JVM-side), "
    "deduped within the batch (min doc_id per fp), and anti-joined on "
    "the 32-char fp only — accumulated text never joins. The oracle "
    "re-derives arrival-order priority as ORDER BY (doc_id % 2, "
    "doc_id): a fingerprint keeps its earliest-batch, lowest-id doc.",
    tags=("streaming", "llm"),
)
def incremental_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil

    from ..scratch import scratch_dir
    from ..streaming.incremental import start_incremental_dedup_stream

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # removed at process exit — the returned frame reads `target` lazily
    root = scratch_dir("spark_graft_incdedup_")
    src = os.path.join(root, "incoming")
    target = os.path.join(root, "corpus")
    os.makedirs(src, exist_ok=True)

    def drop(batch_df: DataFrame, label: str) -> None:
        stage = os.path.join(root, f"stage_{label}")
        batch_df.coalesce(1).write.mode("overwrite").json(stage)
        part = glob.glob(os.path.join(stage, "part-*"))[0]
        shutil.move(part, os.path.join(src, f"{label}.json"))

    q = start_incremental_dedup_stream(spark, src, target)
    try:
        drop(docs.filter(F.col("doc_id") % 2 == 0), "b1")
        q.processAllAvailable()
        drop(
            docs.filter((F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 10 == 0)),
            "b2",
        )
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(target).select("doc_id", "fp")
