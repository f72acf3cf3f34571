"""Assembled driver-facing query registry.

``REGISTRY`` maps query name → QuerySpec (Spark callable + DuckDB
oracle SQL). ``__spark_entry__.py`` exposes it through the driver
contract (queries() / oracle_sql()).
"""

from __future__ import annotations

from . import aggregates, clinical, core, extended, fhir_q, joins, llmdata, streaming_q
from .base import QuerySpec

REGISTRY: dict[str, QuerySpec] = {}
for _mod in (core, joins, aggregates, clinical, llmdata, streaming_q, extended, fhir_q):
    overlap = REGISTRY.keys() & _mod.QUERIES.keys()
    if overlap:
        raise ValueError(f"duplicate query names: {overlap}")
    REGISTRY.update(_mod.QUERIES)
