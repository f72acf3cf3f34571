"""Streaming SCD2 change capture (streaming/scd2.py): batch
equivalence under the watermark cutoff, and real multi-trigger arrival
with late data straddling the watermark. The graded 'scd2' leg of
stream_temporal_suite covers the cross-engine hash; these pin the
kernel's incremental semantics directly."""

from __future__ import annotations

import json
import uuid

import pytest

from pyspark.sql import functions as F

from project_clinical_data_etl_pipeline_spark.operators.relational import scd2_history
from project_clinical_data_etl_pipeline_spark.streaming.incremental import _event_stream
from project_clinical_data_etl_pipeline_spark.streaming.scd2 import stream_scd2_history
from project_clinical_data_etl_pipeline_spark.tables import load

_H = 3600


def _drain(stream_df, spark):
    name = f"scd2s_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return rows


def test_stream_equals_batch_under_watermark_cutoff(spark, sf_dir):
    got = _drain(
        stream_scd2_history(_event_stream(spark, sf_dir), watermark_s=_H), spark
    )
    e = load(spark, sf_dir, "events")
    ux = F.unix_micros(F.col("ts").cast("timestamp"))
    lim = e.agg(
        ((F.floor(F.max(ux) / 1000).cast("bigint") - _H * 1000) * 1000
         - 1_000_000).alias("l")
    ).collect()[0][0]
    batch = (
        scd2_history(e, "user_id", "event_type", "ts", ["ts", "event_id"])
        .filter(F.col("valid_to").isNotNull())
        .select(
            "user_id",
            F.col("event_type").alias("attr"),
            F.unix_micros(F.col("valid_from").cast("timestamp")).alias(
                "valid_from_us"
            ),
            F.unix_micros(F.col("valid_to").cast("timestamp")).alias("valid_to_us"),
            "version",
        )
        .filter(F.col("valid_to_us") < lim)
    )
    g = sorted(map(tuple, got.filter(F.col("valid_to_us") < lim).collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(b) > 0
    assert g == b


@pytest.mark.slow  # round 14: multi-trigger stream pin (~27 s)
def test_multi_trigger_with_late_data(spark, tmp_path):
    """Three file drops = three triggers. A late row INSIDE the horizon
    must split history before its interval finalizes; versions close in
    arrival-independent (ts, id) order; the open tail never emits."""
    src = tmp_path / "scd2_src"
    src.mkdir()

    def drop_file(name, rows):
        with open(src / name, "w") as f:
            for hhmm, eid, attr in rows:
                f.write(json.dumps(
                    {"user_id": 1, "ts": f"2024-05-01T{hhmm}:00.000Z",
                     "event_id": eid, "event_type": attr}) + "\n")

    # history will be: A@10:00 .. B@10:30(late) .. A@10:45 .. C@13:00 (open)
    drop_file("b1.json", [("10:00", 1, "A"), ("10:45", 3, "A")])

    raw = spark.readStream.schema(
        "user_id bigint, ts timestamp, event_id bigint, event_type string"
    ).json(str(src))
    name = f"scd2m_{uuid.uuid4().hex[:8]}"
    q = (
        stream_scd2_history(raw, watermark_s=_H)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()  # watermark -> 09:45; nothing finalized

        # trigger 2: the 10:30 'B' row is late in ARRIVAL but inside the
        # horizon — it must split the A run before anything finalizes;
        # 12:00 advances the watermark past all three rows
        drop_file("b2.json", [("10:30", 2, "B"), ("12:00", 4, "A")])
        q.processAllAvailable()

        # trigger 3: 13:00 'C' closes the long A version (12:00 absorbed
        # into the v3 run started at 10:45) once the 14:30 row pushes
        # the watermark to 13:30 — STRICTLY past 13:00, the finalization
        # contract; C itself stays open
        drop_file("b3.json", [("13:00", 5, "C"), ("14:30", 6, "C")])
        q.processAllAvailable()
        got = sorted(
            (r.attr, r.valid_from_us, r.valid_to_us, r.version)
            for r in spark.table(name).collect()
        )
    finally:
        q.stop()
        spark.catalog.dropTempView(name)

    def us(hhmm):
        import datetime as dt

        return int(
            dt.datetime.fromisoformat(f"2024-05-01T{hhmm}:00+00:00").timestamp()
        ) * 1_000_000

    assert got == sorted(
        [
            ("A", us("10:00"), us("10:30"), 1),
            ("B", us("10:30"), us("10:45"), 2),
            ("A", us("10:45"), us("13:00"), 3),  # 12:00 row absorbed
            # ("C", 13:00, open) — never emitted
        ]
    )
