"""Golden end-to-end parity: replay the five reference pipelines over
the FIXTURES.md domain tables and compare every produced resource
against the reference's committed artifacts (/root/reference/src/data/*),
modulo server-assigned volatility (id, meta.versionId/lastUpdated, the
uuid4 observation identifier, MSH-7 now()) — SURVEY.md §5.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.fhir import fixtures, pipelines

GOLDEN_DIR = "/root/reference/src/data"
needs_golden = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference golden artifacts not present"
)


def golden(name: str) -> dict:
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return json.load(f)


def strip_volatile(d: dict) -> dict:
    d = dict(d)
    d.pop("id", None)
    meta = dict(d.get("meta") or {})
    meta.pop("versionId", None)
    meta.pop("lastUpdated", None)
    if meta:
        d["meta"] = meta
    else:
        d.pop("meta", None)
    return d


@needs_golden
def test_task1_patient_clean_matches_golden(spark):
    p = fixtures.patients(spark)
    searched = pipelines.search_patients(p, "James", "male", "2000-01-01")
    assert searched.count() == 1  # the filter actually selects

    cleaned = pipelines.clean_patient(searched)
    out = json.loads(
        pipelines.patient_to_fhir_json(cleaned).collect()[0]["patient_json"]
    )
    assert out == strip_volatile(golden("patient.json"))


@needs_golden
def test_task1_parent_condition_matches_golden(spark):
    codes = pipelines.first_condition_code(
        fixtures.conditions(spark), fixtures.SOURCE_PATIENT_ID
    )
    assert codes.collect()[0]["code"] == "367498001"  # first by id, not cond-src-2

    concept = pipelines.parent_concept(
        codes, fixtures.snomed_isa(spark), fixtures.snomed_concepts(spark)
    )
    built = pipelines.build_condition(concept, fixtures.PRIMARY_PATIENT_ID)
    out = json.loads(built.collect()[0]["condition_json"])
    assert out == strip_volatile(golden("parent_condition.json"))


@needs_golden
def test_task2_child_condition_matches_golden(spark):
    codes = pipelines.first_condition_code(
        fixtures.conditions(spark), fixtures.SOURCE_PATIENT_ID
    )
    concept = pipelines.child_concept(
        codes, fixtures.snomed_isa(spark), fixtures.snomed_concepts(spark)
    )
    assert concept.collect()[0]["concept_id"] == "441978001"

    # task-2's builder stamps its own onset literal (src/coding_task_2.py)
    built = pipelines.build_condition(
        concept, fixtures.PRIMARY_PATIENT_ID, onset_date="2014-06-01"
    )
    out = json.loads(built.collect()[0]["condition_json"])
    assert out == strip_volatile(golden("child_condition.json"))


@needs_golden
def test_task3_observation_matches_golden(spark):
    # the conditional-construct path: no existing BP observation → build
    one_row = spark.range(1)
    built = pipelines.build_observation(one_row, fixtures.PRIMARY_PATIENT_ID)
    out = json.loads(built.collect()[0]["observation_json"])
    g = golden("observation.json")
    # identifier is uuid4 in the reference — compare structure, pin value
    assert out["identifier"][0]["system"] == g["identifier"][0]["system"]
    out["identifier"][0]["value"] = g["identifier"][0]["value"]
    # golden carries no profile upsert for observation (meta.profile is
    # the vitalsigns profile in both) — direct compare after volatility strip
    assert out == strip_volatile(g)


@needs_golden
def test_task4_procedure_matches_golden(spark):
    built = pipelines.build_procedure(spark.range(1), fixtures.PRIMARY_PATIENT_ID)
    out = json.loads(built.collect()[0]["procedure_json"])
    g = golden("procedure.json")
    # procedure golden keeps meta.versionId "1" in the constructed payload
    assert out == {**g, "meta": {"versionId": "1"}}


@needs_golden
def test_task5_adt_message_matches_golden_bytes(spark):
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
    row = mapped.collect()[0]
    assert (row["icd10_code"], row["icd10_term"]) == ("J30.4", "Allergic rhinitis")

    msg = pipelines.task5_adt_message(
        fixtures.patients(spark), mapped, fixtures.SOURCE_PATIENT_ID
    ).collect()[0]["er7"]

    with open(os.path.join(GOLDEN_DIR, "adt_message.txt")) as f:
        expected = f.read().rstrip("\n")
    got_segs = msg.split("\r")
    # the committed golden stores segments newline-separated (editor
    # normalization of the ER7 \r separators)
    exp_segs = expected.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    assert len(got_segs) == len(exp_segs) == 4
    # MSH-7 is now() in the reference — mask it on both sides
    got_msh = got_segs[0].split("|")
    exp_msh = exp_segs[0].split("|")
    got_msh[6] = exp_msh[6] = "<TS>"
    assert got_msh == exp_msh
    assert got_segs[1:] == exp_segs[1:]


@needs_golden
def test_unmapped_snomed_keeps_null_icd10(spark):
    codes = spark.createDataFrame(
        [("367498001", "Perennial allergic rhinitis")], "code string, display string"
    )
    row = pipelines.map_to_icd10(codes, fixtures.snomed_icd10_map(spark)).collect()[0]
    assert row["icd10_code"] is None and row["icd10_term"] == "Perennial allergic rhinitis"


@needs_golden
def test_orphan_code_parent_lookup_empty(spark):
    codes = spark.createDataFrame(
        [("11111111", "Orphan concept")], "code string, display string"
    )
    assert (
        pipelines.parent_concept(
            codes, fixtures.snomed_isa(spark), fixtures.snomed_concepts(spark)
        ).count()
        == 0
    )


def test_clean_patient_edge_rows(spark):
    cleaned = pipelines.clean_patient(fixtures.patients(spark))
    rows = {r["name"][0]["family"]: r for r in cleaned.collect()}
    # blank district → defaulted; missing line → leading space trimmed
    blank = rows["Blank"].asDict()["address"][0]
    assert blank["district"] == "Not found"
    assert blank["text"] == "Salem, Not found, Oregon 97301"
    # no address survives cleaning (engine processes unconditionally)
    assert rows["Homeless"]["address"] is None
    # remove-ALL ssn identifiers
    assert rows["Homeless"]["identifier"] == []
    assert [i["value"] for i in rows["Russel"]["identifier"]] == ["1501"]
