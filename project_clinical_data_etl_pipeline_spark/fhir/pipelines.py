"""The reference's five ETL tasks as lazy DataFrame compositions.

Each reference script (src/coding_task_{1..5}.py) becomes a pure
function chain; the cross-task *.txt id handoffs become in-DAG columns
(SURVEY.md §3.4). The N+1 per-row HTTP terminology lookups become
broadcast joins against the snomed_* dimension tables.

Quirk decisions follow SURVEY.md §2.10: SSN identifiers removed ALL (not
first-only), district defaulted when missing OR blank, empty gender →
'U', exports unconditional, every pick-one pinned to an explicit order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.encoders import adt_a01_message

PATIENT_PROFILE = "http://example.org/StructureDefinition/my-patient-profile"
CONDITION_PROFILE = "http://example.org/StructureDefinition/my-condition-profile"

SCT = "http://snomed.info/sct"
LOINC = "http://loinc.org"
_TERM = "http://terminology.hl7.org/CodeSystem"


# ---------------------------------------------------------------- task 1: E
def search_patients(
    patients: DataFrame, name_contains: str, gender: str, birthdate_gt: str
) -> DataFrame:
    """OP-09 filtered patient search (src/coding_task_1.py:64-83): the
    FHIR params name= & gender= & birthdate=gt{d} as pushed-down scan
    predicates; projection mirrors the reference's printed fields."""
    name_match = F.exists(
        F.col("name"),
        lambda nm: nm["family"].contains(name_contains)
        | F.exists(nm["given"], lambda g: g.contains(name_contains)),
    )
    return patients.filter(
        (F.col("gender") == gender) & (F.col("birthDate") > birthdate_gt) & name_match
    )


# ---------------------------------------------------------------- task 1: T
def _not_blank_or(col: Column, default: str) -> Column:
    return F.coalesce(F.nullif(F.trim(col), F.lit("")), F.lit(default))


def clean_patient(df: DataFrame) -> DataFrame:
    """The task-1 clean (src/coding_task_1.py:193-220):

    1. drop server/meta/extension columns (OP-15),
    2. remove every identifier whose system contains 'us-ssn' (OP-13,
       remove-ALL variant),
    3. default district to 'Not found' when missing or blank (OP-18),
    4. rebuild address.text as '{line} {city}, {district}, {state}
       {postal}' trimmed (OP-19) — golden string
       '555 Hahn Village Unit 34 Westford, Not found, Massachusetts 00000'.
    """
    cleaned_ident = F.filter(
        F.col("identifier"),
        lambda i: ~F.coalesce(i["system"].contains("us-ssn"), F.lit(False)),
    )

    def fix_address(a: Column) -> Column:
        district = _not_blank_or(a["district"], "Not found")
        line0 = F.coalesce(F.element_at(a["line"], 1), F.lit(""))
        text = F.trim(
            F.format_string(
                "%s %s, %s, %s %s",
                line0,
                F.coalesce(a["city"], F.lit("")),
                district,
                F.coalesce(a["state"], F.lit("")),
                F.coalesce(a["postalCode"], F.lit("")),
            )
        )
        return a.withField("district", district).withField("text", text)

    return (
        df.drop("id", "meta", "extension_json")
        .withColumn("identifier", cleaned_ident)
        .withColumn("address", F.transform(F.col("address"), fix_address))
    )


def patient_to_fhir_json(df: DataFrame, profile: str = PATIENT_PROFILE) -> DataFrame:
    """Assemble the export resource (src/coding_task_1.py:341-386 with the
    meta.profile upsert at :351-354) as one canonical-JSON column; key
    order mirrors src/data/patient.json."""
    resource = F.struct(
        F.lit("Patient").alias("resourceType"),
        F.struct(F.array(F.lit(profile)).alias("profile")).alias("meta"),
        F.col("text"),
        F.col("identifier"),
        F.col("active"),
        F.col("name"),
        F.col("gender"),
        F.col("birthDate"),
        F.col("deceasedBoolean"),
        F.col("address"),
        F.col("communication"),
    )
    return df.select(F.to_json(resource).alias("patient_json"))


# ------------------------------------------------------- task 1/2: enrich
def first_condition_code(conditions: DataFrame, patient_id: str) -> DataFrame:
    """The patient's first Condition code (src/coding_task_1.py:111-135,
    data['entry'][0]) — pick-one pinned to ORDER BY id (SURVEY §7.5.1).
    Returns (code, display)."""
    w = Window.orderBy(F.col("id").asc())
    return (
        conditions.filter(F.col("patient_id") == patient_id)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("code.coding")[0]["code"].alias("code"),
            F.col("code.coding")[0]["display"].alias("display"),
        )
    )


def _pick_first_concept(joined: DataFrame) -> DataFrame:
    """Deterministic row-0 of a terminology result: order by concept_id
    (the reference trusted Hermes result order, src/coding_task_1.py:166)."""
    w = Window.orderBy(F.col("concept_id").asc())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("concept_id", "preferred_term")
    )


def parent_concept(
    codes: DataFrame, isa: DataFrame, concepts: DataFrame
) -> DataFrame:
    """ECL ``>!`` parent lookup (src/coding_task_1.py:137-175) as two
    broadcast joins: code → IS-A edge (up) → concept dim."""
    hop = codes.join(F.broadcast(isa), codes["code"] == isa["child_id"])
    named = hop.join(
        F.broadcast(concepts), hop["parent_id"] == concepts["concept_id"]
    )
    return _pick_first_concept(named)


def child_concept(
    codes: DataFrame, isa: DataFrame, concepts: DataFrame
) -> DataFrame:
    """ECL ``<!`` child lookup (src/coding_task_2.py:115-153): same join,
    reversed edge direction."""
    hop = codes.join(F.broadcast(isa), codes["code"] == isa["parent_id"])
    named = hop.join(
        F.broadcast(concepts), hop["child_id"] == concepts["concept_id"]
    )
    return _pick_first_concept(named)


# ------------------------------------------------------- task 1/2: build+L
def _codeable(system: str, code: Column, display: Column, text: Column | None = None):
    coding = F.array(
        F.struct(
            F.lit(system).alias("system"), code.alias("code"), display.alias("display")
        )
    )
    if text is None:
        return F.struct(coding.alias("coding"))
    return F.struct(coding.alias("coding"), text.alias("text"))


def build_condition(
    concept: DataFrame, patient_ref_id: str, onset_date: str = "2012-05-24"
) -> DataFrame:
    """The Condition builder (src/coding_task_1.py:238-319 /
    src/coding_task_2.py:156-237): literal clinicalStatus/verification/
    category/severity/bodySite structs parameterized by the looked-up
    (concept_id, preferred_term); narrative div from the term (OP-20);
    subject = Patient/{primary id} (OP-27). Golden:
    src/data/parent_condition.json / child_condition.json."""
    term = F.col("preferred_term")
    resource = F.struct(
        F.lit("Condition").alias("resourceType"),
        F.struct(F.array(F.lit(CONDITION_PROFILE)).alias("profile")).alias("meta"),
        F.struct(
            F.lit("generated").alias("status"),
            F.format_string(
                '<div xmlns="http://www.w3.org/1999/xhtml"><p>%s</p></div>', term
            ).alias("div"),
        ).alias("text"),
        _codeable(
            f"{_TERM}/condition-clinical", F.lit("active"), F.lit("Active")
        ).alias("clinicalStatus"),
        _codeable(
            f"{_TERM}/condition-ver-status", F.lit("confirmed"), F.lit("Confirmed")
        ).alias("verificationStatus"),
        F.array(
            _codeable(
                f"{_TERM}/condition-category",
                F.lit("encounter-diagnosis"),
                F.lit("Encounter Diagnosis"),
            )
        ).alias("category"),
        _codeable(SCT, F.lit("24484000"), F.lit("Severe"), F.lit("Severe")).alias(
            "severity"
        ),
        _codeable(SCT, F.col("concept_id"), term, term).alias("code"),
        F.array(
            _codeable(
                SCT,
                F.lit("34508005"),
                F.lit("Structure of mucous membrane of nose"),
                F.lit("Mucous membrane of nose"),
            )
        ).alias("bodySite"),
        F.struct(
            F.lit(f"Patient/{patient_ref_id}").alias("reference")
        ).alias("subject"),
        F.lit(onset_date).alias("onsetDateTime"),
    )
    return concept.select(F.to_json(resource).alias("condition_json"))


# ---------------------------------------------------------------- task 3
def search_observations(
    observations: DataFrame, patient_id: str, system: str = LOINC,
    code: str = "85354-9",
) -> DataFrame:
    """OP-11 nested-array search (src/coding_task_3.py:54-87):
    patient= & code=system|code via higher-order exists over
    code.coding."""
    has_code = F.exists(
        F.col("code.coding"),
        lambda c: (c["system"] == system) & (c["code"] == code),
    )
    return observations.filter((F.col("patient_id") == patient_id) & has_code)


def build_observation(
    base: DataFrame,
    patient_ref_id: str,
    identifier_value: str = "urn:uuid:187e0c12-8dd2-67e2-99b2-bf273c878281",
    effective_date: str = "2025-11-27",
    systolic: int = 120,
    diastolic: int = 80,
) -> DataFrame:
    """The blood-pressure panel builder (src/coding_task_3.py:89-206):
    LOINC 85354-9 panel, two components (8480-6 / 8462-4) with dual
    LOINC+SNOMED codings, valueQuantity mmHg, Normal interpretations.
    Golden: src/data/observation.json. The reference derives the
    identifier from uuid4 — pinned here for determinism (deliberate
    deviation, documented)."""

    def interp(display: str):
        return F.array(
            F.struct(
                F.array(
                    F.struct(
                        F.lit(f"{_TERM}/v3-ObservationInterpretation").alias("system"),
                        F.lit("N").alias("code"),
                        F.lit(display).alias("display"),
                    )
                ).alias("coding"),
                F.lit("Normal").alias("text"),
            )
        )

    def component(loinc_code: str, sct_code: str, display: str, value: int):
        return F.struct(
            F.struct(
                F.array(
                    F.struct(
                        F.lit(LOINC).alias("system"),
                        F.lit(loinc_code).alias("code"),
                        F.lit(display).alias("display"),
                    ),
                    F.struct(
                        F.lit(SCT).alias("system"),
                        F.lit(sct_code).alias("code"),
                        F.lit(display).alias("display"),
                    ),
                ).alias("coding")
            ).alias("code"),
            F.struct(
                F.lit(value).alias("value"),
                F.lit("mmHg").alias("unit"),
                F.lit("http://unitsofmeasure.org").alias("system"),
                F.lit("mm[Hg]").alias("code"),
            ).alias("valueQuantity"),
            interp("normal").alias("interpretation"),
        )

    resource = F.struct(
        F.lit("Observation").alias("resourceType"),
        F.struct(
            F.array(
                F.lit("http://hl7.org/fhir/StructureDefinition/vitalsigns")
            ).alias("profile")
        ).alias("meta"),
        F.array(
            F.struct(
                F.lit("urn:ietf:rfc:3986").alias("system"),
                F.lit(identifier_value).alias("value"),
            )
        ).alias("identifier"),
        F.lit("final").alias("status"),
        F.array(
            _codeable(
                f"{_TERM}/observation-category",
                F.lit("vital-signs"),
                F.lit("Vital Signs"),
            )
        ).alias("category"),
        _codeable(
            LOINC,
            F.lit("85354-9"),
            F.lit("Blood pressure panel with all children optional"),
            F.lit("Blood pressure systolic & diastolic"),
        ).alias("code"),
        F.struct(F.lit(f"Patient/{patient_ref_id}").alias("reference")).alias(
            "subject"
        ),
        F.array(
            F.struct(
                F.lit("Practitioner/8").alias("reference"),
                F.lit("Dr. Careful").alias("display"),
            )
        ).alias("performer"),
        F.lit(effective_date).alias("effectiveDateTime"),
        interp("Normal").alias("interpretation"),
        _codeable(SCT, F.lit("368209003"), F.lit("Right arm")).alias("bodySite"),
        F.array(
            component("8480-6", "271649006", "Systolic blood pressure", systolic),
            component("8462-4", "271650006", "Diastolic blood pressure", diastolic),
        ).alias("component"),
    )
    return base.select(F.to_json(resource).alias("observation_json"))


# ---------------------------------------------------------------- task 4
def build_procedure(base: DataFrame, patient_ref_id: str) -> DataFrame:
    """The Procedure builder (src/coding_task_4.py:87-148). Golden:
    src/data/procedure.json."""
    resource = F.struct(
        F.lit("Procedure").alias("resourceType"),
        F.struct(F.lit("1").alias("versionId")).alias("meta"),
        F.struct(
            F.lit("generated").alias("status"),
            F.lit(
                '<div xmlns="http://www.w3.org/1999/xhtml">Subcutaneous allergen '
                "immunotherapy for perennial allergic rhinitis</div>"
            ).alias("div"),
        ).alias("text"),
        F.lit("completed").alias("status"),
        _codeable(
            SCT,
            F.lit("180256009"),
            F.lit("Subcutaneous immunotherapy"),
            F.lit("Subcutaneous immunotherapy"),
        ).alias("code"),
        F.struct(F.lit(f"Patient/{patient_ref_id}").alias("reference")).alias(
            "subject"
        ),
        F.lit("2008-09-04").alias("performedDateTime"),
        F.array(
            F.struct(
                F.struct(
                    F.lit("Practitioner/8").alias("reference"),
                    F.lit("Dr. Careful").alias("display"),
                ).alias("actor")
            )
        ).alias("performer"),
        F.array(
            F.struct(
                F.struct(
                    F.lit(
                        "Perennial allergic rhinitis not controlled with medication"
                    ).alias("text")
                ).alias("concept")
            )
        ).alias("reasonCode"),
        F.array(
            F.struct(F.lit("Follow-up visit in 4 weeks").alias("text"))
        ).alias("followUp"),
        F.array(
            F.struct(
                F.lit(
                    "First dose of maintenance allergen immunotherapy administered "
                    "without complications."
                ).alias("text")
            )
        ).alias("note"),
    )
    return base.select(F.to_json(resource).alias("procedure_json"))


# ---------------------------------------------------------------- task 5
def map_to_icd10(codes: DataFrame, icd10_map: DataFrame) -> DataFrame:
    """SNOMED→ICD-10 map lookup (src/coding_task_5.py:71-94): broadcast
    left join on the refset, first row by map_priority wins; the term
    passes through unchanged (icd10_term = snomed_term, :91). A code
    with no mapping keeps NULLs (:85-87)."""
    w = Window.partitionBy("snomed_id").orderBy(F.col("map_priority").asc())
    best = (
        icd10_map.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("snomed_id", "map_target")
    )
    return codes.join(
        F.broadcast(best), codes["code"] == best["snomed_id"], "left"
    ).select(
        codes["code"].alias("snomed_code"),
        codes["display"].alias("snomed_term"),
        F.col("map_target").alias("icd10_code"),
        codes["display"].alias("icd10_term"),
    )


def task5_adt_message(
    patients: DataFrame,
    mapped: DataFrame,
    source_patient_id: str,
    msg_ts: Column | None = None,
) -> DataFrame:
    """FHIR → HL7 v2 ADT^A01 (src/coding_task_5.py:97-175): source
    patient demographics × mapped diagnosis → 4-segment ER7 projection.
    PID-3 deliberately carries the SOURCE-system id (SURVEY §2.10).
    Golden bytes: src/data/adt_message.txt."""
    p = patients.filter(F.col("id") == source_patient_id)
    joined = p.crossJoin(mapped)
    addr0 = F.element_at(F.col("address"), 1)
    name0 = F.element_at(F.col("name"), 1)
    return adt_a01_message(
        joined,
        patient_id=F.col("id"),
        family=name0["family"],
        given=F.coalesce(F.element_at(name0["given"], 1), F.lit("")),
        gender=F.col("gender"),
        birth_date=F.to_date("birthDate"),
        line=F.coalesce(F.element_at(addr0["line"], 1), F.lit("")),
        city=addr0["city"],
        state=addr0["state"],
        postal=addr0["postalCode"],
        icd10_code=F.col("icd10_code"),
        icd10_term=F.col("icd10_term"),
        msg_ts=msg_ts,
    )
