"""Contract tests for bench.py's one-line stdout JSON.

The driver captures only the last ~2000 chars of combined stdout; a
line that outgrows the window arrives front-truncated and the round's
numbers are lost (round 6: BENCH_r06 "parsed": null). Round 7 lost its
numbers differently — one raising query aborted the whole run (rc=1).
These tests pin BOTH failure modes without starting Spark: the size
budget via the same build_payload/render_line code main() uses (no
hand-mirrored dict literal to drift), and per-query failure isolation
by driving main() end-to-end with fake runners.
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stderr, redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from bench import (  # noqa: E402
    BENCH_QUERIES,
    COMPARABLE10,
    _DIRECT,
    build_payload,
    render_line,
)


def test_stdout_line_fits_driver_window_realistic():
    # Generous realism: every query at a 5-char timing, HALF the
    # entries flagged noisy, two regression flags, the 4-run canary
    # (cold + 3 warm, 2dp in main — mirrored here). Budget 1600 leaves
    # ~400 chars of headroom inside the 2000-char tail window for
    # newline/noise, with render_line's own 1700 ladder behind it.
    timings = {n: 9.999 for n in BENCH_QUERIES}
    cv = {n: 0.99 for i, n in enumerate(BENCH_QUERIES) if i % 2 == 0}
    payload = build_payload(
        timings, cv, {"build": 99.99, "probe": 99.99}, 0.1,
        canary=99.999, canary_runs=[99.99, 99.99, 99.99, 99.99],
        regress=[BENCH_QUERIES[0], BENCH_QUERIES[1]],
        ann_maint={"build": 99.99, "append": 99.99, "compact": 99.99,
                   "probe": 99.99, "drift": 9.999},
    )
    line, overflow = render_line(payload)
    assert overflow is None, "realistic payload should not need degrading"
    assert len(line) <= 1600, (
        f"bench stdout line would be {len(line)} chars; the driver tail "
        "window truncates past ~2000 and round numbers are lost. Trim "
        "the payload or merge bench entries."
    )


def test_degrade_ladder_never_prints_oversized():
    # Worst case: absurd timings, full cv, every query errored too.
    timings = {n: 99999.9999 for n in BENCH_QUERIES}
    cv = {n: 0.99 for n in BENCH_QUERIES}
    errors = {n + "_x": "RuntimeError" for n in BENCH_QUERIES}
    payload = build_payload(timings, cv, {"build": 9.9, "probe": 9.9},
                            0.1, errors=errors)
    line, overflow = render_line(payload, budget=400)  # force last resort
    assert len(line) <= 400
    parsed = json.loads(line)
    assert parsed["queries"] == "dropped:size-budget:see-stderr"
    assert parsed["errors"].startswith("dropped:")
    assert overflow["dropped_queries"] == timings


def test_comparable10_none_when_member_errored():
    timings = {n: 1.0 for n in BENCH_QUERIES if n != COMPARABLE10[0]}
    payload = build_payload(timings, {}, {"build": None, "probe": None}, 0.1,
                            errors={COMPARABLE10[0]: "ValueError"})
    assert payload["comparable10"] is None
    assert payload["errors"] == {COMPARABLE10[0]: "ValueError"}


def test_comparable10_is_a_benched_subset():
    assert len(COMPARABLE10) == 10
    assert set(COMPARABLE10) <= set(BENCH_QUERIES)


def test_direct_entries_are_benched():
    # _DIRECT maps demoted/bench-only names to modules; every key must
    # still be in the bench list or its timing series silently dies.
    assert set(_DIRECT) <= set(BENCH_QUERIES)


class _FakeDF:
    def count(self):
        return 1


def _drive_main(monkeypatch, failing: set[str]):
    """Run bench.main() with fake runners (no Spark): queries in
    `failing` raise on every pass; the rest 'succeed' instantly."""

    def fake_runner(name):
        def run(spark, sf_dir):
            if name in failing:
                raise RuntimeError(f"boom:{name}")
            return _FakeDF()

        return run

    monkeypatch.setattr(bench, "_runner", fake_runner)
    monkeypatch.setattr(bench, "get_spark", lambda app_name: object())
    out, err = io.StringIO(), io.StringIO()
    with redirect_stdout(out), redirect_stderr(err):
        bench.main()
    line = out.getvalue().strip().splitlines()[-1]
    return json.loads(line)


def test_main_isolates_one_failing_query(monkeypatch):
    # The r7 failure mode: ivfpq_probe raising must not zero the run.
    parsed = _drive_main(monkeypatch, failing={"ivfpq_probe"})
    assert parsed["errors"] == {"ivfpq_probe": "RuntimeError"}
    assert len(parsed["queries"]) == len(BENCH_QUERIES) - 1
    assert "ivfpq_probe" not in parsed["queries"]
    # The guarded split reports None instead of raising on no runs.
    assert parsed["ivfpq"] == {"build": None, "probe": None}
    # comparable10 members all succeeded, so the subtotal is real.
    assert parsed["comparable10"] is not None


def test_main_all_queries_failing_still_prints_parseable_line(monkeypatch):
    parsed = _drive_main(monkeypatch, failing=set(BENCH_QUERIES))
    assert parsed["queries"] == {}
    assert parsed["value"] == 0
    assert parsed["comparable10"] is None
    assert len(parsed["errors"]) == len(BENCH_QUERIES)


def test_main_reports_ivfpq256_split_and_survives_its_failure(monkeypatch):
    parsed = _drive_main(monkeypatch, failing=set())
    assert set(parsed["ivfpq256"]) == {"build", "probe"}
    parsed = _drive_main(monkeypatch, failing={"ivfpq256_probe"})
    assert parsed["errors"] == {"ivfpq256_probe": "RuntimeError"}
    assert parsed["ivfpq256"] == {"build": None, "probe": None}
    # the toy-ks split and the headline set are untouched
    assert parsed["ivfpq"]["build"] is not None
    assert parsed["comparable10"] is not None


def test_canary_cold_series_and_warm_median_in_payload():
    """`canary` stays the COLD run (r11-r12 series continuity, c10n
    unchanged); `canary_warm` is the median of the warm repeats — the
    low-variance gate normalizer — and c10nw is its series."""
    payload = build_payload(
        {n: 1.0 for n in BENCH_QUERIES}, {}, {"build": 1, "probe": 1},
        0.1, canary=10.5, canary_runs=[10.5, 1.9, 1.4, 1.6],
    )
    assert payload["canary"] == 10.5
    assert payload["canary_runs"] == [10.5, 1.9, 1.4, 1.6]
    assert payload["canary_warm"] == 1.6
    assert payload["c10n"] == round(payload["comparable10"] / 10.5, 3)
    assert payload["c10nw"] == round(payload["comparable10"] / 1.6, 3)
    # regress absent when empty — size budget stays clean
    assert "regress" not in payload
    assert bench._median([10.5, 8.0, 7.9]) == 8.0
    assert bench._median([4.0, 2.0]) == 3.0
    assert bench._median([5.0]) == 5.0


def test_regression_gate_trips_on_injected_slowdown():
    """The r12 verdict's 'done' condition: a synthetic slowdown in one
    query trips the per-query c10n-normalized gate BY NAME, queries
    inside their band don't, and a faster canary (slower box
    normalized away) doesn't false-trip."""
    baseline = {
        "q1_pricing_summary": {"norm": 0.20, "band": 0.5},
        "q6_forecast_revenue": {"norm": 0.10, "band": 0.5},
    }
    canary = 8.0
    healthy = {"q1_pricing_summary": 0.20 * canary,
               "q6_forecast_revenue": 0.10 * canary}
    assert bench.check_regressions(healthy, canary, baseline) == []
    # inside the band: 1.4x on a 0.5 band is noise, not a flag
    inband = dict(healthy, q1_pricing_summary=0.20 * canary * 1.4)
    assert bench.check_regressions(inband, canary, baseline) == []
    # injected slowdown: 2x normalized — flagged by name
    slow = dict(healthy, q1_pricing_summary=0.20 * canary * 2.0)
    assert bench.check_regressions(slow, canary, baseline) == [
        "q1_pricing_summary"
    ]
    # the same raw seconds on a 2x-slower box (canary doubles too)
    # normalizes back inside the band — weather, not regression
    slow_box = {k: v * 2 for k, v in healthy.items()}
    assert bench.check_regressions(slow_box, canary * 2, baseline) == []
    # no baseline / no canary → gate silent, never crashes
    assert bench.check_regressions(slow, None, baseline) == []
    assert bench.check_regressions(slow, canary, None) == []
    # unknown queries in timings are ignored
    assert bench.check_regressions({"brand_new": 9.9}, canary, baseline) == []


def test_baseline_file_parses_and_covers_bench_queries():
    """BENCH_BASELINE.json (when present) must parse and only name
    benched queries with positive norms/bands — a malformed baseline
    would silence the gate without anyone noticing."""
    import pytest

    baseline = bench._load_baseline()
    if baseline is None:
        pytest.skip("no BENCH_BASELINE.json recorded yet")
    assert set(baseline) <= set(BENCH_QUERIES)
    for name, ref in baseline.items():
        assert ref["norm"] > 0, name
        assert 0 < ref["band"] <= 2.0, name
