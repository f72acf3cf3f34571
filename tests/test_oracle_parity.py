"""Every registered query with an oracle must hash-match DuckDB — the
local pre-flight for the driver's CORRECTNESS gate. Queries without SQL
get a rows-run smoke check instead (mirroring the driver's weaker
rows-only record)."""

from __future__ import annotations

import pytest

from project_clinical_data_etl_pipeline_spark.queries import REGISTRY
from tests.oracle_harness import compare, duck_connection

ORACLE_NAMES = sorted(n for n, s in REGISTRY.items() if s.sql is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in REGISTRY.items() if s.sql is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    sdf = spec.run(spark, sf_dir)
    odf = duck.execute(spec.sql).fetchdf()
    problems = compare(sdf, odf)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.run(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
