#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries (and the bench's
direct-only paths) into plans/r13/<name>_<tag>.txt.

Usage:
    python scripts/explain_all.py before [name ...]
    python scripts/explain_all.py after  [name ...]

With no names, captures every REGISTRY entry plus the bench _DIRECT
paths. Plan capture constructs each query's DataFrame (some operators
run bounded driver-side training jobs while building the frame — that
cost is paid, but nothing is executed beyond what the query function
itself runs) and prints the formatted physical plan of the RETURNED
frame only.
"""

from __future__ import annotations

import io
import os
import sys
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "plans", "r13")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)

    from bench import _DIRECT, _runner
    from project_clinical_data_etl_pipeline_spark.queries import REGISTRY
    from project_clinical_data_etl_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="explain_all")

    names = list(REGISTRY) + [n for n in _DIRECT if n not in REGISTRY]
    if only:
        names = [n for n in names if n in only]

    for name in names:
        spark.sparkContext.setJobDescription(f"explain:{name}")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        try:
            df = _runner(name)(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception:
            text = "EXPLAIN FAILED\n" + traceback.format_exc()
        with open(path, "w") as fh:
            fh.write(f"# {name} [{tag}] sf_dir={sf_dir}\n")
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)", flush=True)


if __name__ == "__main__":
    main()
