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

# DuckDB standard strings treat backslash literally — only quotes double
_ADT_ER7_SQL = "concat_ws(chr(13), " + ", ".join(
    "'" + seg.replace("'", "''") + "'" for seg in _ADT_EXPECTED.split("\r")
) + ")"

_SUITE_SQL = f"""
    SELECT 'adt_message' AS pipeline,
           '9d036484-c661-485c-899d-fcab43d40914' AS f1,
           {_ADT_ER7_SQL} AS f2,
           CAST(NULL AS VARCHAR) AS f3
    UNION ALL
    SELECT 'patient_clean', family, district_or_null, extras FROM (VALUES
        ('Russel', 'Not found',
         '555 Hahn Village Unit 34 Westford, Not found, Massachusetts 00000|1'),
        ('Blank', 'Not found', 'Salem, Not found, Oregon 97301|0'),
        ('Homeless', CAST(NULL AS VARCHAR), '|0')
    ) AS t(family, district_or_null, extras)
    UNION ALL
    SELECT 'hierarchy', direction, concept_id, preferred_term FROM (VALUES
        ('parent', '61582004', 'Allergic rhinitis'),
        ('child', '441978001', 'Allergic rhinitis due to food')
    ) AS h(direction, concept_id, preferred_term)
"""


@spec(
    QUERIES,
    "fhir_pipeline_suite",
    sql=_SUITE_SQL,
    doc="The reference's end-to-end clinical pipelines as one union "
    "suite, each branch against its golden literal:\n"
    "- adt_message: task-5 (src/coding_task_5.py:178-189) source patient "
    "→ first condition → parent concept via IS-A broadcast join → ICD-10 "
    "first-priority map → 4-segment ER7 projection with MSH-7 pinned; "
    "oracle is the golden bytes (src/data/adt_message.txt).\n"
    "- patient_clean: task-1 (src/coding_task_1.py:193-220): SSN "
    "identifiers removed (remove-ALL, SURVEY §2.10), district defaulted "
    "missing-or-blank, display text rebuilt (golden src/data/patient.json:47), "
    "address_text and identifier count packed into one pipe-joined column.\n"
    "- hierarchy: tasks 1+2 (src/coding_task_1.py:137-175 ECL >!, "
    "src/coding_task_2.py:115-153 ECL <!): first condition code hops one "
    "IS-A edge up and down via broadcast joins.",
    tags=("fhir",),
)
def fhir_pipeline_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # --- adt_message branch -------------------------------------------
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
    adt = pipelines.task5_adt_message(
        fixtures.patients(spark),
        mapped,
        fixtures.SOURCE_PATIENT_ID,
        msg_ts=F.lit(_MSG_TS),
    ).select(
        F.lit("adt_message").alias("pipeline"),
        F.col("patient_id").alias("f1"),
        F.col("er7").alias("f2"),
        F.lit(None).cast("string").alias("f3"),
    )

    # --- patient_clean branch -----------------------------------------
    cleaned = pipelines.clean_patient(fixtures.patients(spark))
    addr0 = F.element_at(F.col("address"), 1)
    clean = cleaned.select(
        F.lit("patient_clean").alias("pipeline"),
        F.element_at(F.col("name"), 1)["family"].alias("f1"),
        addr0["district"].alias("f2"),
        F.concat_ws(
            "|",
            F.coalesce(addr0["text"], F.lit("")),
            F.size(F.col("identifier")).cast("string"),
        ).alias("f3"),
    )

    # --- hierarchy branch ---------------------------------------------
    first_code = pipelines.first_condition_code(
        fixtures.conditions(spark), fixtures.SOURCE_PATIENT_ID
    )
    isa = fixtures.snomed_isa(spark)
    concepts = fixtures.snomed_concepts(spark)
    parent = pipelines.parent_concept(first_code, isa, concepts).select(
        F.lit("hierarchy").alias("pipeline"),
        F.lit("parent").alias("f1"),
        F.col("concept_id").alias("f2"),
        F.col("preferred_term").alias("f3"),
    )
    child = pipelines.child_concept(first_code, isa, concepts).select(
        F.lit("hierarchy").alias("pipeline"),
        F.lit("child").alias("f1"),
        F.col("concept_id").alias("f2"),
        F.col("preferred_term").alias("f3"),
    )
    return adt.unionByName(clean).unionByName(parent).unionByName(child)


@spec(
    QUERIES,
    "fhir_conditional_create",
    sql="""
        SELECT * FROM (VALUES
            ('edge-blank-district', 'exists', '85354-9'),
            ('9d036484-c661-485c-899d-fcab43d40914', 'created', '85354-9')
        ) AS t(patient_id, action, panel_code)
    """,
    doc="Task-3 conditional construct-and-load (reference "
    "src/coding_task_3.py:63-87: search Observation?patient=&code=LOINC|"
    "85354-9; ONLY when the search is empty, build and POST the "
    "blood-pressure panel :89-206). Expressed set-based: patients whose "
    "panel search matches report 'exists'; the source patient anti-joins "
    "the match set, and the surviving row triggers the builder "
    "(src/data/observation.json golden) — the created row carries the "
    "panel code extracted back out of the built JSON, proving the "
    "when-empty branch actually constructed the resource.",
    tags=("fhir",),
)
def fhir_conditional_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = fixtures.observations(spark)
    # set-based twin of search_observations: patients with a matching panel
    has_code = F.exists(
        F.col("code.coding"),
        lambda c: (c["system"] == pipelines.LOINC) & (c["code"] == "85354-9"),
    )
    matching = obs.filter(has_code).select("patient_id").distinct()

    targets = fixtures.patients(spark).select(F.col("id").alias("patient_id"))
    exists_rows = targets.join(F.broadcast(matching), "patient_id", "left_semi").select(
        "patient_id",
        F.lit("exists").alias("action"),
        F.lit("85354-9").alias("panel_code"),
    )

    # the reference's else-branch, conditional via anti-join: the source
    # patient survives iff their panel search is empty
    candidate = targets.filter(F.col("patient_id") == fixtures.SOURCE_PATIENT_ID)
    missing = candidate.join(F.broadcast(matching), "patient_id", "left_anti")
    built = pipelines.build_observation(missing, fixtures.PRIMARY_PATIENT_ID)
    # missing has 0 or 1 rows (single source patient) → the crossJoin
    # yields the created row only when the when-empty branch fired
    created_rows = missing.crossJoin(F.broadcast(built.limit(1))).select(
        "patient_id",
        F.lit("created").alias("action"),
        F.get_json_object("observation_json", "$.code.coding[0].code").alias(
            "panel_code"
        ),
    )
    return exists_rows.unionByName(created_rows)
