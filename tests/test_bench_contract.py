"""Bench stdout contract: the driver keeps a ~2000-char stdout tail and
parses the LAST JSON line from it.

Round 3 regression (VERDICT r03 "What's wrong" #1): plan signatures were
embedded inside bench.py's single JSON line, the line overflowed the
driver's tail, and BENCH_r03.json recorded parsed:null. These tests pin
the contract so it cannot silently regress:

  * the timing line fits in the tail even with worst-case float widths,
  * the timing line contains no `plans` key (bulk goes to
    PLANS_BENCH.json),
  * the tail-parse the driver performs (last JSON line of the final
    2000 chars) recovers the timing payload intact.
"""

from __future__ import annotations

import json

import bench


def _worst_case_timings() -> dict[str, float]:
    # every headline query at an implausibly wide timing value
    return {name: 99999.999 for name in bench.HEADLINE}


def _worst_case_spread() -> dict[str, list[float]]:
    # r13 protocol: ALL 12 headliner medians carry a [min, max] spread
    return {name: [99999.999, 99999.999] for name in bench.HEADLINE}


def test_timing_line_fits_driver_tail():
    line = bench.timing_line(
        _worst_case_timings(), 799999.992, 0.1, _worst_case_spread()
    )
    assert len(line) < bench.DRIVER_TAIL_CHARS * 3 // 4, (
        f"timing line is {len(line)} chars; must stay well under the "
        f"driver's ~{bench.DRIVER_TAIL_CHARS}-char stdout tail"
    )


def test_timing_line_has_no_bulk_keys():
    payload = json.loads(
        bench.timing_line(_worst_case_timings(), 1.0, 0.1, _worst_case_spread())
    )
    assert set(payload) == {
        "metric", "value", "unit", "queries", "core8", "sf",
        "protocol", "spread",
    }
    assert "plans" not in payload


def test_driver_tail_parse_recovers_payload():
    # Simulate the driver: arbitrary Spark log noise, then our line;
    # keep the last 2000 chars; parse the last line that is JSON.
    noise = "\n".join(f"26/08/14 12:00:{i:02d} INFO noise line {i}" for i in range(200))
    line = bench.timing_line(_worst_case_timings(), 799999.992, 0.1)
    stdout = noise + "\n" + line + "\n"
    tail = stdout[-bench.DRIVER_TAIL_CHARS:]
    parsed = None
    for cand in tail.splitlines():
        cand = cand.strip()
        if cand.startswith("{"):
            try:
                parsed = json.loads(cand)
            except json.JSONDecodeError:
                continue
    assert parsed is not None
    assert parsed["metric"] == "headline_queries_wall_clock"
    assert set(parsed["queries"]) == set(bench.HEADLINE)
