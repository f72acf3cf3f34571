"""Domain-layer queries in the driver contract: the reference's five
clinical pipelines run over the in-memory fixture tables, checked
against LITERAL oracles (the pipelines are deterministic, so expected
values embed directly in the SQL — the same values golden-tested
against /root/reference/src/data in tests/test_fhir_golden.py).

These ignore ``sf_dir``: the domain fixtures are the reference's own
one-patient world (FIXTURES.md §A), not the synthetic star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fhir import fixtures, pipelines
from .base import QuerySpec, spec

QUERIES: dict[str, QuerySpec] = {}

_MSG_TS = "20260101120000"

_ADT_EXPECTED = (
    "MSH|^~\\&|MyApp|OpenEMR|PrimaryCareEHR|PrimaryFacility|"
    f"{_MSG_TS}||ADT^A01|MSG00001|P|2.5\r"
    "PID|1||9d036484-c661-485c-899d-fcab43d40914||Russel^James||20000618|M|||"
    "555 Hahn Village Unit 34^Westford^Massachusetts^00000^^H\r"
    "PV1|1|O\r"
    "DG1|1||J30.4^Allergic rhinitis^I10|Allergic rhinitis"
)


@spec(
    QUERIES,
    "fhir_adt_message",
    sql=(
        "SELECT '9d036484-c661-485c-899d-fcab43d40914' AS patient_id, "
        + "concat_ws(chr(13), "
        # DuckDB standard strings treat backslash literally — only quotes double
        + ", ".join(
            "'" + seg.replace("'", "''") + "'" for seg in _ADT_EXPECTED.split("\r")
        )
        + ") AS er7"
    ),
    doc="End-to-end task-5 pipeline (reference src/coding_task_5.py:178-189): "
    "source patient → first condition → parent concept via IS-A broadcast "
    "join → ICD-10 first-priority map → 4-segment ER7 projection, with "
    "MSH-7 pinned. Oracle is the golden message bytes "
    "(src/data/adt_message.txt) as a literal.",
    tags=("fhir",),
)
def fhir_adt_message(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = pipelines.parent_concept(
        pipelines.first_condition_code(
            fixtures.conditions(spark), fixtures.SOURCE_PATIENT_ID
        ),
        fixtures.snomed_isa(spark),
        fixtures.snomed_concepts(spark),
    ).select(
        F.col("concept_id").alias("code"), F.col("preferred_term").alias("display")
    )
    mapped = pipelines.map_to_icd10(codes, fixtures.snomed_icd10_map(spark))
    return pipelines.task5_adt_message(
        fixtures.patients(spark),
        mapped,
        fixtures.SOURCE_PATIENT_ID,
        msg_ts=F.lit(_MSG_TS),
    )


@spec(
    QUERIES,
    "fhir_patient_clean",
    sql="""
        SELECT * FROM (VALUES
            ('Russel', 'Not found',
             '555 Hahn Village Unit 34 Westford, Not found, Massachusetts 00000',
             CAST(1 AS BIGINT)),
            ('Blank', 'Not found', 'Salem, Not found, Oregon 97301',
             CAST(0 AS BIGINT)),
            ('Homeless', NULL, NULL, CAST(0 AS BIGINT))
        ) AS t(family, district, address_text, n_identifiers)
    """,
    doc="Task-1 patient cleaning (reference src/coding_task_1.py:193-220) "
    "over the fixture patients: SSN identifiers removed (remove-ALL, "
    "SURVEY §2.10), district defaulted missing-or-blank, display text "
    "rebuilt — golden string from src/data/patient.json:47. Literal "
    "oracle, one row per fixture patient incl. the edge rows.",
    tags=("fhir",),
)
def fhir_patient_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    cleaned = pipelines.clean_patient(fixtures.patients(spark))
    addr0 = F.element_at(F.col("address"), 1)
    return cleaned.select(
        F.element_at(F.col("name"), 1)["family"].alias("family"),
        addr0["district"].alias("district"),
        addr0["text"].alias("address_text"),
        F.size(F.col("identifier")).cast("bigint").alias("n_identifiers"),
    )


@spec(
    QUERIES,
    "fhir_hierarchy_enrichment",
    sql="""
        SELECT * FROM (VALUES
            ('parent', '61582004', 'Allergic rhinitis'),
            ('child', '441978001', 'Allergic rhinitis due to food')
        ) AS t(direction, concept_id, preferred_term)
    """,
    doc="Tasks 1+2 terminology enrichment (reference "
    "src/coding_task_1.py:137-175 ECL >!, src/coding_task_2.py:115-153 "
    "ECL <!): the patient's first condition code hops one IS-A edge up "
    "and down via broadcast joins; both golden concepts as the literal "
    "oracle.",
    tags=("fhir",),
)
def fhir_hierarchy_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = pipelines.first_condition_code(
        fixtures.conditions(spark), fixtures.SOURCE_PATIENT_ID
    )
    isa = fixtures.snomed_isa(spark)
    concepts = fixtures.snomed_concepts(spark)
    parent = pipelines.parent_concept(codes, isa, concepts).select(
        F.lit("parent").alias("direction"), "concept_id", "preferred_term"
    )
    child = pipelines.child_concept(codes, isa, concepts).select(
        F.lit("child").alias("direction"), "concept_id", "preferred_term"
    )
    return parent.unionByName(child)
