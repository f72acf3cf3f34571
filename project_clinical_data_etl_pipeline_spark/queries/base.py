"""Query-registry plumbing.

A :class:`QuerySpec` binds one operator from SURVEY.md §2 to the
driver's synthetic tables, together with the ANSI-SQL oracle DuckDB
runs on the same parquet (``sql=None`` → genuinely non-SQL-expressible
op; the driver records a weaker rows-only check).

Determinism rules every spec follows (SURVEY.md §7.5):
- every computed column aliased identically in Spark and SQL;
- money aggregates via DECIMAL casts (exact, engine-independent) then
  cast to DOUBLE;
- every pick-one/top-k pinned by an explicit total order;
- timestamps emitted as formatted strings or DATE casts (DuckDB is
  TZ-naive; the Spark session is pinned to UTC).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..session import tune


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        return self.fn(spark, sf_dir)


def spec(
    registry: dict[str, QuerySpec],
    name: str,
    sql: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def wrap(fn):
        registry[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc, tags=tags)
        return fn

    return wrap
