"""Format-conversion operators — SURVEY.md §2.9.

OP-45: FHIR → HL7 v2 ``ADT^A01`` ER7 encoder. The reference builds four
segments (MSH, PID, PV1, DG1) field-by-field with hl7apy
(src/coding_task_5.py:97-175); here each segment is ONE ``concat_ws('|')``
projection and the message is ``concat_ws('\\r')`` of the segments —
pure whole-stage-codegen string expressions, no library, no UDF,
per-row map work at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import hl7_field, upper_initial


def _f(*cols: Column) -> Column:
    """Pipe-join segment fields, preserving empty positions
    (SURVEY.md §7.5.3: coalesce-to-empty, never skip).

    Field CONTENT is sanitized: literal ``|`` becomes the HL7 escape
    ``\\F\\`` and stray CR/LF are dropped, so data can never corrupt
    segment/field framing. (The reference performs no escaping — its
    golden data contains no delimiters, so this is byte-compatible.)"""
    def clean(c: Column) -> Column:
        s = F.coalesce(c.cast("string"), F.lit(""))
        s = F.replace(s, F.lit("|"), F.lit("\\F\\"))
        return F.regexp_replace(s, "[\r\n]", "")

    return F.concat_ws("|", *[clean(c) for c in cols])


def adt_a01_message(
    df: DataFrame,
    *,
    patient_id: Column,
    family: Column,
    given: Column,
    gender: Column,
    birth_date: Column,
    line: Column,
    city: Column,
    state: Column,
    postal: Column,
    icd10_code: Column,
    icd10_term: Column,
    msg_ts: Column | None = None,
    msg_ctl_id: Column | None = None,
) -> DataFrame:
    """Project an ER7 ``ADT^A01`` message column per input row.

    Segment grammar mirrors the reference exactly
    (src/coding_task_5.py:140-165; golden bytes src/data/adt_message.txt):
    - MSH: field sep, encoding chars, sending/receiving apps, timestamp
      (MSH-7, reference uses now() — parameterized here for determinism),
      message type ``ADT^A01``, control id, processing id P, version 2.5.
    - PID: set id 1, patient id (PID-3 = SOURCE-system id, a deliberate
      reference quirk preserved per SURVEY.md §2.10), name
      ``family^given``, birth date YYYYMMDD (OP-31), gender initial
      (OP-30, empty → 'U'), address ``line^^city^state^postal^^H``.
    - PV1: set id 1, patient class O (outpatient).
    - DG1: set id 1, ``icd10^term^I10`` coding (OP-32).
    """
    ts = msg_ts if msg_ts is not None else F.date_format(
        F.current_timestamp(), "yyyyMMddHHmmss"
    )
    ctl = msg_ctl_id if msg_ctl_id is not None else F.lit("MSG00001")

    # Sending/receiving apps fixed to the reference's values
    # (src/coding_task_5.py:140-146; golden src/data/adt_message.txt).
    msh = _f(
        F.lit("MSH"),
        F.lit("^~\\&"),
        F.lit("MyApp"),
        F.lit("OpenEMR"),
        F.lit("PrimaryCareEHR"),
        F.lit("PrimaryFacility"),
        ts,
        F.lit(""),
        F.lit("ADT^A01"),
        ctl,
        F.lit("P"),
        F.lit("2.5"),
    )
    pid = _f(
        F.lit("PID"),
        F.lit("1"),
        F.lit(""),
        patient_id.cast("string"),
        F.lit(""),
        hl7_field(family, given),
        F.lit(""),
        F.date_format(birth_date, "yyyyMMdd"),
        upper_initial(gender),
        F.lit(""),
        F.lit(""),
        # PID-11 per the reference f-string "{line}^{city}^{state}^{postal}^^H"
        # (src/coding_task_5.py:156; golden bytes confirm the single carets)
        hl7_field(line, city, state, postal, F.lit(""), F.lit("H")),
    )
    pv1 = _f(F.lit("PV1"), F.lit("1"), F.lit("O"))
    # DG1-4 repeats the term as the free-text description (golden bytes:
    # "DG1|1||J30.4^Allergic rhinitis^I10|Allergic rhinitis").
    dg1 = _f(
        F.lit("DG1"),
        F.lit("1"),
        F.lit(""),
        hl7_field(icd10_code, icd10_term, F.lit("I10")),
        icd10_term,
    )
    return df.select(
        patient_id.cast("string").alias("patient_id"),
        F.concat_ws("\r", msh, pid, pv1, dg1).alias("er7"),
    )
