"""DuckDB-oracle comparison harness mirroring the driver's t2 gate:
row-count + column set + order-insensitive exact value comparison.

Values are normalized to canonical strings (floats via repr → unique
17-significant-digit form, so two values compare equal iff they are the
same double). Any FP divergence between Spark and DuckDB therefore
fails here BEFORE it can fail in the driver.
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb

from project_clinical_data_etl_pipeline_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v: Any) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        import numpy as np

        if isinstance(v, np.floating):
            return _norm(float(v))
        if isinstance(v, np.integer):
            return str(int(v))
    except ImportError:
        pass
    return str(v)


def _rows(df_pandas, columns: list[str]) -> list[tuple[str, ...]]:
    out = []
    for row in df_pandas[columns].itertuples(index=False, name=None):
        out.append(tuple(_norm(v) for v in row))
    out.sort()
    return out


def compare(spark_df, oracle_df) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_df.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    spd = spark_df.toPandas()
    if len(spd) != len(oracle_df):
        problems.append(f"row count: spark={len(spd)} oracle={len(oracle_df)}")
    s_rows = _rows(spd, s_cols)
    o_rows = _rows(oracle_df, s_cols)
    if s_rows != o_rows:
        diffs = 0
        for a, b in zip(s_rows, o_rows):
            if a != b:
                problems.append(f"row diff:\n  spark : {a}\n  oracle: {b}")
                diffs += 1
                if diffs >= 3:
                    break
        extra_s = [r for r in s_rows[:2000] if r not in set(o_rows)][:2]
        extra_o = [r for r in o_rows[:2000] if r not in set(s_rows)][:2]
        if extra_s:
            problems.append(f"rows only in spark (sample): {extra_s}")
        if extra_o:
            problems.append(f"rows only in oracle (sample): {extra_o}")
        if not problems:
            problems.append("sorted row sets differ")
    return problems
