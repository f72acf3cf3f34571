"""Contract tests for bench.py's one-line stdout JSON.

The driver captures only the last ~2000 chars of combined stdout; a
line that outgrows the window arrives front-truncated and the round's
numbers are lost (this happened in round 6: BENCH_r06 "parsed": null).
These tests pin the size budget and the payload shape WITHOUT starting
Spark — they reconstruct the payload exactly as bench.main() does.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, COMPARABLE10, _DIRECT  # noqa: E402


def _payload(timings, cv):
    # Mirrors the dict literal in bench.main() — keep in sync.
    return {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "comparable10": round(sum(timings[n] for n in COMPARABLE10), 3),
        "cv": cv,
        "ivfpq": {"build": 99.99, "probe": 99.99},
        "sf": 0.1,
    }


def test_stdout_line_fits_driver_window_realistic():
    # Generous realism: every query at a 5-char timing, HALF the
    # entries flagged noisy. Budget 1500 leaves ~500 chars of headroom
    # inside the 2000-char tail window for trailing newline/noise.
    timings = {n: 9.999 for n in BENCH_QUERIES}
    cv = {n: 0.99 for i, n in enumerate(BENCH_QUERIES) if i % 2 == 0}
    line = json.dumps(_payload(timings, cv))
    assert len(line) <= 1500, (
        f"bench stdout line would be {len(line)} chars; the driver tail "
        "window truncates past ~2000 and round numbers are lost. Trim "
        "the payload or merge bench entries."
    )


def test_stdout_line_fits_even_degraded_worst_case():
    # The in-bench guard drops cv when the line exceeds 1500; the
    # degraded line must fit no matter what the timings are.
    timings = {n: 9999.999 for n in BENCH_QUERIES}
    payload = _payload(timings, {n: 0.99 for n in BENCH_QUERIES})
    payload.pop("cv")
    assert len(json.dumps(payload)) <= 1500


def test_comparable10_is_a_benched_subset():
    assert len(COMPARABLE10) == 10
    assert set(COMPARABLE10) <= set(BENCH_QUERIES)


def test_direct_entries_are_benched():
    # _DIRECT maps demoted/bench-only names to modules; every key must
    # still be in the bench list or its timing series silently dies.
    assert set(_DIRECT) <= set(BENCH_QUERIES)
