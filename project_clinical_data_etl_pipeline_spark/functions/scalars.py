"""Scalar expression helpers — SURVEY.md §2.7 (OP-30..38).

Each helper returns a Column built purely from ``pyspark.sql.functions``
so it stays inside whole-stage codegen (no Python UDFs in the hot path).
Reference citations are the imperative Python each expression replaces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def upper_initial(col: Column | str, default: str = "U") -> Column:
    """OP-30: ``gender.upper()[0]`` (reference src/coding_task_5.py:119).

    The reference throws on empty strings; per SURVEY.md §2.10 we emit
    ``default`` instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) > 0, F.upper(F.substring(c, 1, 1))).otherwise(
        F.lit(default)
    )


def not_blank_or(col: Column | str, default: str) -> Column:
    """OP-18: null-or-blank defaulting (reference src/coding_task_1.py:210-212).

    Adopts the missing-OR-blank variant everywhere (SURVEY.md §2.10).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.nullif(F.trim(c), F.lit("")), F.lit(default))


def first_or_default(arr: Column | str, default: str = "") -> Column:
    """OP-36: ``(xs or [""])[0]`` (reference src/coding_task_1.py:214)."""
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.coalesce(F.element_at(c, 1), F.lit(default))


def hl7_field(*components: Column) -> Column:
    """OP-32: caret-joined HL7 component string (reference
    src/coding_task_5.py:117,156,164).

    ``concat_ws`` skips NULLs, which would shift HL7 component positions
    — so every component is coalesced to '' first (SURVEY.md §7.5.3).
    """
    return F.concat_ws("^", *[F.coalesce(c, F.lit("")) for c in components])


def display_string(fmt: str, *cols: Column) -> Column:
    """OP-19: derived display string (reference src/coding_task_1.py:214-220),
    e.g. ``"{line} {city}, {district}, {state} {postal}".strip()``."""
    return F.trim(F.format_string(fmt, *[F.coalesce(c, F.lit("")) for c in cols]))


def decimal_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact (engine-independent) money aggregation.

    Summing IEEE doubles is order-dependent, and Spark's partial
    aggregation order differs from any single-threaded oracle. Casting to
    DECIMAL first makes the sum exact and bit-identical across engines;
    the final cast back to DOUBLE is deterministic. Used by every
    money-typed aggregate in the query registry so DuckDB hash-comparison
    is stable.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
