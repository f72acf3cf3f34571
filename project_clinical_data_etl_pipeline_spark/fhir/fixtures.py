"""Deterministic in-memory fixture tables (FIXTURES.md §A).

The primary patient row reproduces the reference's source patient
(src/data/patient.json values BEFORE cleaning: SSN identifier present,
district missing, extension present); extra rows exercise the edge
paths catalogued in SURVEY.md §2.10 (blank district, no address, empty
gender, no-parent concept, unmapped SNOMED code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import schemas

#: The OpenEMR-side patient id (PID-3 of the golden ADT message —
#: the source-system id, a preserved reference quirk, SURVEY §2.10).
SOURCE_PATIENT_ID = "9d036484-c661-485c-899d-fcab43d40914"
#: Server-assigned id on the primary EHR (src/data/patient.json:3).
PRIMARY_PATIENT_ID = "12"

_NARRATIVE = {
    "status": "generated",
    "div": '<div xmlns="http://www.w3.org/1999/xhtml"> <p>James Russel</p></div>',
}

_PRIMARY_PATIENT = {
    "id": SOURCE_PATIENT_ID,
    "meta": {"versionId": "3", "lastUpdated": "2025-12-01T00:00:00.000+00:00",
             "profile": None},
    "text": _NARRATIVE,
    "identifier": [
        {
            "use": "official",
            "type": {
                "coding": [
                    {
                        "system": "http://terminology.hl7.org/CodeSystem/v2-0203",
                        "code": "PT",
                    }
                ]
            },
            "system": "http://terminology.hl7.org/CodeSystem/v2-0203",
            "value": "1501",
        },
        {
            # removed by the clean step (src/coding_task_1.py:199-204)
            "use": "official",
            "type": {"coding": [{"system": "http://hl7.org/fhir/sid/us-ssn",
                                 "code": "SS"}]},
            "system": "http://hl7.org/fhir/sid/us-ssn",
            "value": "123-45-6789",
        },
    ],
    "active": True,
    "name": [{"use": "official", "family": "Russel", "given": ["James"]}],
    "gender": "male",
    "birthDate": "2000-06-18",
    "deceasedBoolean": False,
    "address": [
        {
            "use": "home",
            "type": "both",
            "text": "stale source text",
            "line": ["555 Hahn Village Unit 34"],
            "city": "Westford",
            "district": None,  # → "Not found" (src/coding_task_1.py:210-212)
            "state": "Massachusetts",
            "postalCode": "00000",
            "period": {"start": "2024-09-15T05:42:48.000-04:00"},
        }
    ],
    "communication": [
        {
            "language": {
                "coding": [
                    {"system": "urn:ietf:bcp:47", "code": "en", "display": "English"}
                ],
                "text": "English",
            }
        }
    ],
    "extension_json": '{"url":"http://example.org/ext","valueString":"dropped"}',
}

_EDGE_PATIENTS = [
    {  # blank (not null) district — missing-OR-blank rule must fire
        "id": "edge-blank-district",
        "meta": None, "text": None,
        "identifier": [],
        "active": True,
        "name": [{"use": "official", "family": "Blank", "given": ["Dora"]}],
        "gender": "female",
        "birthDate": "1999-01-01",
        "deceasedBoolean": False,
        "address": [{"use": "home", "type": "both", "text": None,
                     "line": None,  # missing line → '' in display string
                     "city": "Salem", "district": "  ",
                     "state": "Oregon", "postalCode": "97301",
                     "period": None}],
        "communication": [], "extension_json": None,
    },
    {  # no address at all — reference accidentally skips export
        #   (src/coding_task_1.py:368-386); engine processes unconditionally
        "id": "edge-no-address",
        "meta": None, "text": None,
        "identifier": [{"use": "official", "type": None,
                        "system": "http://hl7.org/fhir/sid/us-ssn",
                        "value": "999-99-9999"}],
        "active": False,
        "name": [{"use": "official", "family": "Homeless", "given": ["Hank"]}],
        "gender": "",  # empty gender → 'U' in HL7 (SURVEY §2.10)
        "birthDate": "1980-05-05",
        "deceasedBoolean": False,
        "address": None,
        "communication": [], "extension_json": None,
    },
]


def patients(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [_PRIMARY_PATIENT, *_EDGE_PATIENTS], schema=schemas.PATIENT_DDL
    )


#: Source-side condition: "Perennial allergic rhinitis" (367498001), whose
#: direct PARENT is 61582004 "Allergic rhinitis" (golden parent_condition)
#: and whose direct CHILD is 441978001 "Allergic rhinitis due to food"
#: (golden child_condition).
def conditions(spark: SparkSession) -> DataFrame:
    rows = [
        {
            "id": "cond-src-1",
            "patient_id": SOURCE_PATIENT_ID,
            "subject_reference": f"Patient/{SOURCE_PATIENT_ID}",
            "code": {
                "coding": [
                    {
                        "system": "http://snomed.info/sct",
                        "code": "367498001",
                        "display": "Perennial allergic rhinitis",
                    }
                ],
                "text": "Perennial allergic rhinitis",
            },
            "onset_date": "2012-05-24",
            "recorded_ts": None,
        },
        {
            "id": "cond-src-2",  # second condition: first-pick must ignore it
            "patient_id": SOURCE_PATIENT_ID,
            "subject_reference": f"Patient/{SOURCE_PATIENT_ID}",
            "code": {
                "coding": [
                    {
                        "system": "http://snomed.info/sct",
                        "code": "11111111",
                        "display": "Orphan concept",
                    }
                ],
                "text": "Orphan concept",
            },
            "onset_date": "2020-01-01",
            "recorded_ts": None,
        },
    ]
    return spark.createDataFrame(rows, schema=schemas.CONDITION_DDL)


def snomed_concepts(spark: SparkSession) -> DataFrame:
    rows = [
        ("61582004", "Allergic rhinitis"),
        ("367498001", "Perennial allergic rhinitis"),
        ("441978001", "Allergic rhinitis due to food"),
        ("24484000", "Severe"),
        ("11111111", "Orphan concept"),  # no IS-A edges → empty-result path
        ("22222222", "Deep leaf concept"),
    ]
    return spark.createDataFrame(rows, schema=schemas.SNOMED_CONCEPT_DDL)


def snomed_isa(spark: SparkSession) -> DataFrame:
    rows = [
        ("367498001", "61582004"),
        ("441978001", "367498001"),
        ("22222222", "441978001"),  # 3-deep chain for the closure build
    ]
    return spark.createDataFrame(rows, schema=schemas.SNOMED_ISA_DDL)


def snomed_icd10_map(spark: SparkSession) -> DataFrame:
    rows = [
        ("61582004", "J30.4", 1),
        ("61582004", "J30.9", 2),  # lower priority: first-match must skip
        # 367498001 has NO row → (None, None) path (src/coding_task_5.py:85-87)
    ]
    return spark.createDataFrame(rows, schema=schemas.SNOMED_ICD10_MAP_DDL)


#: Pre-existing Observations for the task-3 conditional-create path
#: (src/coding_task_3.py:63-87): the edge patient already HAS the LOINC
#: 85354-9 blood-pressure panel (search non-empty → skip create); the
#: source patient has only a non-matching Observation, so the panel
#: search comes back empty and the build+load branch must run.
def observations(spark: SparkSession) -> DataFrame:
    rows = [
        {
            "id": "obs-edge-bp",
            "patient_id": "edge-blank-district",
            "code": {
                "coding": [
                    {
                        "system": "http://loinc.org",
                        "code": "85354-9",
                        "display": "Blood pressure panel with all children optional",
                    }
                ],
                "text": "Blood pressure",
            },
            "effective_date": "2025-10-01",
        },
        {
            # different code — must NOT satisfy the 85354-9 search
            "id": "obs-src-hr",
            "patient_id": SOURCE_PATIENT_ID,
            "code": {
                "coding": [
                    {
                        "system": "http://loinc.org",
                        "code": "8867-4",
                        "display": "Heart rate",
                    }
                ],
                "text": "Heart rate",
            },
            "effective_date": "2025-11-01",
        },
    ]
    return spark.createDataFrame(rows, schema=schemas.OBSERVATION_DDL)
