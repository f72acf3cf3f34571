"""OP-46: conformance validation as a constraint-check operator.

The reference validates by POSTing resources to the FHIR server's
``$validate`` and reading the OperationOutcome (src/validation.py:8-24;
observed findings insights.md:105-118). The engine re-expresses that as
a rule library over stock expressions, producing a findings DataFrame
``(resource_id, severity, rule, diagnostics)`` — the OperationOutcome
analog. Rules are plain Column predicates → the whole check is one
projection + filter per rule unioned together, map-only at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One conformance rule: fires when ``violation`` is true."""

    name: str
    severity: str  # error | warning | information
    violation: Column
    diagnostics: str


def validate(df: DataFrame, id_col: str, rules: list[Rule]) -> DataFrame:
    """Apply all rules; one findings row per (row, fired rule).

    Single pass: each rule becomes a conditional struct in an array,
    then filter+explode drops non-firing entries. No shuffle, no UDF.
    """
    finding_structs = F.array(
        *[
            F.when(
                r.violation,
                F.struct(
                    F.lit(r.severity).alias("severity"),
                    F.lit(r.name).alias("rule"),
                    F.lit(r.diagnostics).alias("diagnostics"),
                ),
            )
            for r in rules
        ]
    )
    return (
        df.select(
            F.col(id_col).cast("string").alias("resource_id"),
            F.explode(F.filter(finding_structs, lambda x: x.isNotNull())).alias("__f"),
        )
        .select(
            "resource_id",
            F.col("__f.severity").alias("severity"),
            F.col("__f.rule").alias("rule"),
            F.col("__f.diagnostics").alias("diagnostics"),
        )
    )


def required_fields(df: DataFrame, id_col: str, fields: list[str]) -> list[Rule]:
    """Rule factory: every listed field must be non-null/non-blank —
    the '$validate required element' class of findings."""
    return [
        Rule(
            name=f"required.{f}",
            severity="error",
            violation=F.col(f).isNull() | (F.trim(F.col(f).cast("string")) == ""),
            diagnostics=f"missing required field {f}",
        )
        for f in fields
    ]


def valueset_rule(field: str, allowed: list[str], severity: str = "warning") -> Rule:
    """Rule factory: field value must be in a fixed valueset — the
    'code not in valueset' class (insights.md:110-114 gender finding)."""
    return Rule(
        name=f"valueset.{field}",
        severity=severity,
        violation=~F.col(field).isin(allowed) & F.col(field).isNotNull(),
        diagnostics=f"value of {field} not in valueset {allowed}",
    )
