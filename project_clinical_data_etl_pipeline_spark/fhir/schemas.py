"""Explicit StructTypes for the FHIR-shaped domain tables (FIXTURES.md §A).

Schemas mirror the fields the reference actually touches
(src/data/patient.json:1-74, parent_condition.json:1-80,
observation.json, procedure.json; cleaning code src/coding_task_1.py:178-220).
Passthrough timestamps (meta.lastUpdated, address.period.start) are kept
as STRINGS: the reference never parses them, and string passthrough
preserves the original offset formatting byte-for-byte on re-export.

Nested-schema pruning (session.RUNTIME_CONF) keeps scans narrow despite
the deep nesting.
"""

from __future__ import annotations

CODING = "struct<system:string,code:string,display:string>"
CODEABLE = f"struct<coding:array<{CODING}>,text:string>"
NARRATIVE = "struct<status:string,div:string>"

PATIENT_DDL = f"""
    id string,
    meta struct<versionId:string,lastUpdated:string,profile:array<string>>,
    text {NARRATIVE},
    identifier array<struct<
        use:string,
        type:struct<coding:array<struct<system:string,code:string>>>,
        system:string,
        value:string>>,
    active boolean,
    name array<struct<use:string,family:string,given:array<string>>>,
    gender string,
    birthDate string,
    deceasedBoolean boolean,
    address array<struct<
        use:string,
        type:string,
        text:string,
        line:array<string>,
        city:string,
        district:string,
        state:string,
        postalCode:string,
        period:struct<start:string>>>,
    communication array<struct<language:{CODEABLE}>>,
    extension_json string
"""

CONDITION_DDL = f"""
    id string,
    patient_id string,
    subject_reference string,
    code {CODEABLE},
    onset_date string,
    recorded_ts timestamp
"""

SNOMED_CONCEPT_DDL = "concept_id string, preferred_term string"
SNOMED_ISA_DDL = "child_id string, parent_id string"
SNOMED_ICD10_MAP_DDL = "snomed_id string, map_target string, map_priority int"

OBSERVATION_DDL = f"""
    id string,
    patient_id string,
    code {CODEABLE},
    effective_date string
"""
