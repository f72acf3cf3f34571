#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries (and the bench's
direct-only paths) into plans/<round>/<name>_<tag>.txt.

Usage:
    python scripts/explain_all.py before [name ...]
    python scripts/explain_all.py after  [name ...]

The output round directory is plans/$SPARK_GRAFT_PLAN_ROUND (default
r14).

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
OUT_DIR = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    # r13 ADVICE: validate the CLI — a forgotten tag (e.g. a query name
    # in position 1) must not silently write plans under a bogus tag
    if tag not in ("before", "after"):
        sys.exit(f"tag must be 'before' or 'after', got {tag!r}")
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)

    from bench import _DIRECT, _runner
    from project_clinical_data_etl_pipeline_spark.queries import REGISTRY
    from project_clinical_data_etl_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="explain_all")

    names = list(REGISTRY) + [n for n in _DIRECT if n not in REGISTRY]
    if only:
        # r13 ADVICE: a typo'd name must error, not produce no output
        unknown = only - set(names)
        if unknown:
            sys.exit(f"unknown query names: {sorted(unknown)}")
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
