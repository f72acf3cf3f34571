"""Physical-layout strategies for 100 TB (SURVEY.md §4 scale notes):
bucketed co-located joins and salt-based skew mitigation.

These are the two levers Catalyst can't pull by itself:
- **Bucketing** is a write-time contract: both fact tables hashed into
  the same bucket count on the join key mean every subsequent join/agg
  on that key runs with ZERO exchange — the dominant cost of repeated
  big-big joins amortized to one write.
- **Salting** splits a pathologically hot key across ``salt`` synthetic
  sub-keys (AQE's skew-join split handles moderate skew; salting is the
  explicit fallback for adversarial distributions, e.g. a null-heavy FK
  or one customer with 10% of all orders).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Bucket count should divide evenly into total cores; sorted
    buckets additionally enable exchange-AND-sort-free sort-merge
    joins."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key. With
    matching bucket specs the plan contains NO Exchange on either side
    (verified by tests/test_layout.py)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys split across ``salt``
    sub-keys and the RIGHT side replicated ``salt``× (explode of a
    literal range — cheap when right is the smaller/mapping side).

    For ``how`` in (``inner``, ``left``) the result is identical to
    ``left.join(right, key)``; the difference is the shuffle key
    (key, salt_i), which spreads a hot key over ``salt`` reducers
    instead of one straggler. ``left_semi``/``left_anti`` are also
    correct: the right side is replicated across ALL salt values, so a
    left row with salt i (semi-)matches iff its key exists in right —
    identical to the unsalted join; anti/semi joins emit no right rows,
    so replication cannot duplicate anything. ``right``/``full`` ARE
    rejected: they emit unmatched right rows, and each would appear
    ``salt`` times."""
    if how not in (
        "inner",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "left_anti",
        "leftanti",
    ):
        raise ValueError(
            f"salted_join supports only inner/left/left_semi/left_anti joins "
            f"(right/full would emit each unmatched right row {salt}x, once per "
            f"replica); got how={how!r}"
        )
    salted_l = left.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_l.join(salted_r, on=[key, "__salt"], how=how).drop("__salt")


def salted_group_count(df: DataFrame, key: str, salt: int = 8) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial count on
    (key, salt) then final on key. Spark's partial aggregation already
    does this map-side; the explicit form matters for high-cardinality
    combiners (collect_list/distinct) where map-side combine is
    ineffective."""
    phase1 = (
        df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return phase1.groupBy(key).agg(F.sum("__partial").cast("bigint").alias("n"))


def repartition_by_range_for_write(
    df: DataFrame, cols: list[Column | str], target_partitions: int
) -> DataFrame:
    """Range-partition before a sorted write: produces globally ordered,
    evenly-sized files (sampled range bounds), the layout that makes
    min/max row-group skipping effective for time-series scans."""
    return df.repartitionByRange(target_partitions, *cols)


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 12
) -> tuple[DataFrame, str]:
    """Append a Morton (Z-order) key column interleaving ``cols`` (2+
    numeric columns) and return (df, key_col_name).

    Each column is affinely mapped onto ``bits``-bit integer grid
    coordinates using its global min/max (one tiny two-row agg collect —
    driver-side CONTROL data, same class as the k-means centroid
    collect), then bits interleave into a single long via pure
    shift/or expressions — whole-stage-codegen arithmetic, no UDF.

    Why: sorting a 100 TB table by (a, b) gives perfect file-level
    min/max pruning on `a` and NONE on `b`; sorting by the Z-value
    gives good pruning on BOTH — every file covers a small hyper-
    rectangle of the key space, so any single-dimension predicate
    skips most files. The classic lakehouse OPTIMIZE ZORDER BY, as a
    plain column expression.

    Caveats (documented, not hidden): min/max mapping is skew-sensitive
    (a heavy hitter collapses grid cells — use a quantile mapping if a
    dimension is Zipfian), and pruning quality decays past ~4 columns
    (bits per dimension shrink).
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    ).collect()[0]
    n = len(cols)
    grid_max = (1 << bits) - 1
    coords = []
    for c in cols:
        lo, hi = bounds[f"__lo_{c}"], bounds[f"__hi_{c}"]
        span = (hi - lo) or 1.0
        coords.append(
            F.least(
                F.lit(grid_max),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col(c).cast("double") - F.lit(lo))
                            / F.lit(span) * F.lit(grid_max + 1)).cast("bigint"),
                ),
            )
        )
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, coord in enumerate(coords):
            bit = F.shiftright(coord, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    key = "__zorder"
    return df.withColumn(key, z), key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    target_partitions: int = 8,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` Z-order-clustered on ``cols``: range-partition +
    sort on the Morton key so every output file covers a compact
    hyper-rectangle — multi-dimension min/max file skipping for the
    price of one write (tested quantitatively in test_layout)."""
    zdf, key = zorder_value(df, cols, bits)
    writer = (
        zdf.repartitionByRange(target_partitions, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
