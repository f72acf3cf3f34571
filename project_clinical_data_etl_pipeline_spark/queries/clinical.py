"""Format-conversion & validation queries (SURVEY.md §2.9) bound to the
testdata tables: the ER7 encoder and the $validate-analog findings
operator, exercised as general operators so DuckDB can oracle-check
them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import validation as V
from ..operators.encoders import adt_a01_message
from ..tables import load
from .base import QuerySpec, spec

QUERIES: dict[str, QuerySpec] = {}

# Fixed MSH-7 timestamp: the reference stamps now() (src/coding_task_5.py:138);
# pinned here so the oracle hash is stable.
_MSG_TS = "20260101120000"

_ER7_SQL = f"""
    SELECT CAST(c_custkey AS VARCHAR) AS patient_id,
           concat_ws(chr(13),
             'MSH|^~\\&|MyApp|OpenEMR|PrimaryCareEHR|PrimaryFacility|{_MSG_TS}||ADT^A01|'
               || CAST(o_orderkey AS VARCHAR) || '|P|2.5',
             'PID|1||' || CAST(c_custkey AS VARCHAR) || '||'
               || 'Customer' || '^' || split_part(c_name, '#', 2) || '||'
               || strftime(o_orderdate, '%Y%m%d') || '|'
               || upper(substr(c_mktsegment, 1, 1)) || '|||'
               || '1 Main St' || '^' || n_name || '^XX^00000^^H',
             'PV1|1|O',
             'DG1|1||' || o_orderpriority || '^' || o_orderstatus || '^I10|'
               || o_orderstatus)
             AS er7
    FROM orders, customer, nation
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
"""


def op45_er7_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-45 FHIR→HL7 v2 ER7 encoder (reference src/coding_task_5.py:97-175,
    golden bytes src/data/adt_message.txt) as a pure string projection: one
    concat_ws('|') per segment, concat_ws('\\r') across segments — no
    hl7apy, no UDF, whole-stage codegen. Exercised over
    orders×customer×nation standing in for patient×condition. Graded as
    the 'er7' leg of op45_46_conformance_suite."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return adt_a01_message(
        joined,
        patient_id=F.col("c_custkey"),
        family=F.lit("Customer"),
        given=F.element_at(F.split("c_name", "#"), 2),
        gender=F.col("c_mktsegment"),
        birth_date=F.col("o_orderdate"),
        line=F.lit("1 Main St"),
        city=F.col("n_name"),
        state=F.lit("XX"),
        postal=F.lit("00000"),
        icd10_code=F.col("o_orderpriority"),
        icd10_term=F.col("o_orderstatus"),
        msg_ts=F.lit(_MSG_TS),
        msg_ctl_id=F.col("o_orderkey").cast("string"),
    )


@spec(
    QUERIES,
    "op33_live_timestamp",
    sql="""
        SELECT CAST(c_custkey AS VARCHAR) AS patient_id, 1 AS msh7_live_ok
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderkey <= 50
    """,
    doc="OP-33 current-timestamp default (reference stamps now() into "
    "MSH-7, src/coding_task_5.py:138): runs the ER7 encoder WITHOUT a "
    "pinned msg_ts so the live current_timestamp() branch "
    "(operators/encoders.py) actually executes, then verifies MSH-7 is a "
    "well-formed yyyyMMddHHmmss value in-plan. The oracle pins the "
    "deterministic verdict (1), not the wall-clock value — a broken "
    "now() branch (null/empty/misformatted) yields 0 and hash-fails.",
)
def op33_live_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 50)
    c = load(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    msg = adt_a01_message(
        joined,
        patient_id=F.col("c_custkey"),
        family=F.lit("Customer"),
        given=F.element_at(F.split("c_name", "#"), 2),
        gender=F.col("c_mktsegment"),
        birth_date=F.col("o_orderdate"),
        line=F.lit("1 Main St"),
        city=F.lit("Springfield"),
        state=F.lit("XX"),
        postal=F.lit("00000"),
        icd10_code=F.col("o_orderpriority"),
        icd10_term=F.col("o_orderstatus"),
        # msg_ts intentionally omitted → live current_timestamp() path
        msg_ctl_id=F.col("o_orderkey").cast("string"),
    )
    msh7 = F.element_at(F.split(F.col("er7"), "\\|"), 7)
    return msg.select(
        "patient_id",
        msh7.rlike("^[0-9]{14}$").cast("int").alias("msh7_live_ok"),
    )


_VALIDATE_SQL = """
    SELECT CAST(c_custkey AS VARCHAR) AS resource_id,
           'error' AS severity,
           'required.c_name' AS rule,
           'missing required field c_name' AS diagnostics
    FROM customer WHERE c_name IS NULL OR trim(c_name) = ''
    UNION ALL
    SELECT CAST(c_custkey AS VARCHAR), 'warning', 'valueset.c_mktsegment',
           'value of c_mktsegment not in segment valueset'
    FROM customer
    WHERE c_mktsegment IS NOT NULL
      AND c_mktsegment NOT IN ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD')
    UNION ALL
    SELECT CAST(c_custkey AS VARCHAR), 'warning', 'range.c_acctbal',
           'negative account balance'
    FROM customer WHERE c_acctbal < 0
"""


def op46_validation_findings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-46 conformance validation as a findings table (reference FHIR
    $validate → OperationOutcome, src/validation.py:8-24; findings classes
    per insights.md:105-118: required-element error, valueset warning,
    range warning). Single map-only pass: rules → conditional struct
    array → filter+explode. Graded as the 'validate' leg of
    op45_46_conformance_suite."""
    c = load(spark, sf_dir, "customer")
    rules = [
        V.required_fields(c, "c_custkey", ["c_name"])[0],
        V.Rule(
            name="valueset.c_mktsegment",
            severity="warning",
            violation=F.col("c_mktsegment").isNotNull()
            & ~F.col("c_mktsegment").isin(
                ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD"]
            ),
            diagnostics="value of c_mktsegment not in segment valueset",
        ),
        V.Rule(
            name="range.c_acctbal",
            severity="warning",
            violation=F.col("c_acctbal") < 0,
            diagnostics="negative account balance",
        ),
    ]
    return V.validate(c, "c_custkey", rules)


def _conformance_sql() -> str:
    from .extended import OP42_SQL

    return f"""
        SELECT 'er7' AS part, patient_id AS id, er7,
               CAST(NULL AS VARCHAR) AS severity,
               CAST(NULL AS VARCHAR) AS rule,
               CAST(NULL AS VARCHAR) AS diagnostics
        FROM ({_ER7_SQL})
        UNION ALL
        SELECT 'validate' AS part, resource_id AS id,
               CAST(NULL AS VARCHAR) AS er7,
               severity, rule, diagnostics
        FROM ({_VALIDATE_SQL})
        UNION ALL
        SELECT 'flags' AS part, entity_id AS id,
               CAST(NULL AS VARCHAR) AS er7,
               CAST(NULL AS VARCHAR) AS severity,
               flag AS rule,
               CAST(NULL AS VARCHAR) AS diagnostics
        FROM ({OP42_SQL})
    """


@spec(
    QUERIES,
    "op45_46_conformance_suite",
    sql=_conformance_sql(),
    doc="Format-conversion & conformance suite: the OP-45 ER7 encoder "
    "leg (pure string projection, whole-stage codegen) unioned with "
    "the OP-46 $validate-analog findings leg (rules → conditional "
    "struct array → filter+explode) and the OP-42 data-quality flag "
    "leg (anti-join findings across two entity types — the rule name "
    "lands in the shared `rule` column). Three independent legs; "
    "zero-shuffle concat.",
)
def op45_46_conformance_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .extended import op42_quality_flags

    flags = op42_quality_flags(spark, sf_dir).select(
        F.lit("flags").alias("part"),
        F.col("entity_id").alias("id"),
        F.lit(None).cast("string").alias("er7"),
        F.lit(None).cast("string").alias("severity"),
        F.col("flag").alias("rule"),
        F.lit(None).cast("string").alias("diagnostics"),
    )
    er7 = op45_er7_encode(spark, sf_dir).select(
        F.lit("er7").alias("part"),
        F.col("patient_id").alias("id"),
        "er7",
        F.lit(None).cast("string").alias("severity"),
        F.lit(None).cast("string").alias("rule"),
        F.lit(None).cast("string").alias("diagnostics"),
    )
    findings = op46_validation_findings(spark, sf_dir).select(
        F.lit("validate").alias("part"),
        F.col("resource_id").alias("id"),
        F.lit(None).cast("string").alias("er7"),
        "severity",
        "rule",
        "diagnostics",
    )
    return er7.unionByName(findings).unionByName(flags)
