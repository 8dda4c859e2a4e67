"""Pin the bench stdout contract.

The driver captures only the TAIL (~2 KB) of bench.py's stdout and
json-parses the FINAL line. Rounds 5 and 7 both lost the headline
artifact (`parsed: null`) because the single emitted line outgrew that
tail. These tests pin the round-8 contract: whatever the query count,
the FINAL emitted line parses as JSON, fits the tail budget, and
carries `value`, `regressions`, and `sf` — with those keys LAST in the
line so even a future mid-line truncation leaves them readable.

No SparkSession needed: emit_output_lines is a pure function.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import HEADLINE_QUERIES, emit_output_lines  # noqa: E402

TAIL_BUDGET = 2000  # the driver's documented capture size


def _emit(n_queries: int, n_regressions: int = 3) -> list[str]:
    timings = {
        f"some_longish_query_name_{i:03d}": 0.1 + (i % 17) / 10
        for i in range(n_queries)
    }
    names = list(timings)
    regressions = {
        names[i]: {"sec": 1.5, "median": 0.9, "x": 1.67}
        for i in range(min(n_regressions, len(names)))
    }
    return emit_output_lines(
        total=sum(timings.values()),
        timings=timings,
        layout_speedup=1.36,
        scan_scaling_x=8.47,
        regressions=regressions,
        missing_baseline=[names[-1]] if names else [],
        sf=0.1,
    )


def test_final_line_fits_tail_and_parses_at_200_queries():
    lines = _emit(200)
    final = lines[-1]
    assert len(final.encode()) <= TAIL_BUDGET - 100, (
        "final stdout line must fit the driver's ~2KB tail with margin"
    )
    rec = json.loads(final)
    assert rec["metric"] == "headline_queries_total_sec"
    assert rec["value"] > 0
    assert rec["n_queries"] == 200
    assert rec["sf"] == 0.1
    assert len(rec["regressions"]) == 3
    # elided queries are declared, and what survives is the slowest:
    # every elided timing must be <= the slowest kept one
    assert rec["queries_elided"] + len(rec["queries"]) == 200
    if rec["queries_elided"]:
        full = json.loads(lines[0])
        elided = {
            n: t for n, t in full["queries"].items()
            if n not in rec["queries"]
        }
        assert max(elided.values()) <= min(rec["queries"].values())


def test_value_and_regressions_land_in_last_2000_bytes():
    # The r7 verdict's literal acceptance test: at 200+ queries the last
    # 2,000 bytes of the emitted output contain "value" and "regressions".
    out = "\n".join(_emit(250))
    tail = out.encode()[-2000:].decode(errors="replace")
    assert '"value":' in tail
    assert '"regressions":' in tail
    assert '"sf":' in tail


def test_headline_keys_ordered_value_regressions_sf_last():
    final = _emit(200)[-1]
    rec = json.loads(final)
    assert list(rec)[-3:] == ["value", "regressions", "sf"]


def test_small_query_count_emits_single_full_line():
    lines = _emit(10)
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert len(rec["queries"]) == 10
    assert list(rec)[-3:] == ["value", "regressions", "sf"]


def test_current_headline_set_final_line_fits():
    # The real registry size today (77+): the actual failure mode of r5/r7.
    lines = _emit(len(HEADLINE_QUERIES))
    assert len(lines) >= 1
    final = lines[-1]
    assert len(final.encode()) <= TAIL_BUDGET - 100
    json.loads(final)


def test_pathological_regression_count_still_fits():
    lines = _emit(200, n_regressions=200)
    final = lines[-1]
    assert len(final.encode()) <= TAIL_BUDGET - 100
    rec = json.loads(final)
    assert rec["regressions"]["_elided"] == 180


def test_regression_elision_keeps_most_severe():
    """The worst regressions must survive elision — a 10x blowup can
    never be the entry dropped from the driver-visible line."""
    timings = {f"q_{i:03d}": 0.5 for i in range(200)}
    regressions = {
        f"q_{i:03d}": {"sec": 1.0, "median": 0.5,
                       "x": 1.5 + (199 - i) / 100}
        for i in range(30)
    }
    # q_000 has the HIGHEST x (3.49) but sorts first alphabetically;
    # severity ordering must keep it and drop the 1.5x tail instead
    final = emit_output_lines(
        total=100.0, timings=timings, layout_speedup=None,
        scan_scaling_x=None, regressions=regressions,
        missing_baseline=[], sf=0.1,
    )[-1]
    rec = json.loads(final)
    kept = {k: v for k, v in rec["regressions"].items() if k != "_elided"}
    assert "q_000" in kept
    assert min(kept.values()) >= max(
        1.5 + (199 - i) / 100 for i in range(20, 30)
    )


def test_huge_regression_names_cannot_bust_envelope():
    """Even the queries-free envelope must fit the tail: 20 kept
    regressions with 80-char names would alone exceed 2 KB, so the
    shrink loop has to elide further."""
    timings = {f"q_{i:03d}": 0.5 for i in range(100)}
    regressions = {
        ("verylongqueryname_" + "x" * 60 + f"_{i:02d}"): {
            "sec": 1.0, "median": 0.5, "x": 2.0}
        for i in range(40)
    }
    lines = emit_output_lines(
        total=50.0, timings=timings, layout_speedup=None,
        scan_scaling_x=None, regressions=regressions,
        missing_baseline=[], sf=0.1,
    )
    final = lines[-1]
    assert len(final.encode()) <= TAIL_BUDGET
    rec = json.loads(final)
    assert rec["regressions"]["_elided"] >= 20


def test_watch_and_anchor_keys_present_and_bounded():
    """r9: the final line carries the report-only drift telemetry —
    `watch` (over-budget-but-under-floor ratios, worst-first, capped)
    and `anchor_ratio_r1` (cumulative ratio vs the frozen round-1
    anchor) — without busting the tail budget at 200+ queries."""
    timings = {
        f"some_longish_query_name_{i:03d}": 0.1 + (i % 17) / 10
        for i in range(220)
    }
    watch = {f"some_longish_query_name_{i:03d}": 1.5 + i / 50
             for i in range(30)}
    lines = emit_output_lines(
        total=sum(timings.values()), timings=timings,
        layout_speedup=1.3, scan_scaling_x=7.0, regressions={},
        missing_baseline=[], sf=0.1, watch=watch, anchor_ratio_r1=0.41,
    )
    full, final = json.loads(lines[0]), json.loads(lines[-1])
    assert full["watch"] == dict(
        sorted(watch.items(), key=lambda kv: -kv[1])
    )
    assert full["anchor_ratio_r1"] == 0.41
    assert len(lines[-1].encode()) <= TAIL_BUDGET
    assert final["anchor_ratio_r1"] == 0.41
    kept_watch = final["watch"]
    assert 0 < len(kept_watch) <= 8
    # worst-first: the kept entries are exactly the highest ratios
    worst = sorted(watch.values(), reverse=True)[: len(kept_watch)]
    assert sorted(kept_watch.values(), reverse=True) == worst
    # value/regressions/sf still the LAST keys (truncation contract)
    assert list(final)[-3:] == ["value", "regressions", "sf"]


def test_watch_yields_envelope_space_before_regressions():
    """When the envelope is tight, watch entries are dropped before any
    regression entry — regressions are the gating signal."""
    timings = {f"q_{i:03d}": 0.5 for i in range(100)}
    longname = "verylongqueryname_" + "x" * 60
    regressions = {
        f"{longname}_r{i:02d}": {"sec": 1.0, "median": 0.5, "x": 2.0}
        for i in range(15)
    }
    watch = {f"{longname}_w{i:02d}": 1.6 for i in range(8)}
    final = emit_output_lines(
        total=50.0, timings=timings, layout_speedup=None,
        scan_scaling_x=None, regressions=regressions,
        missing_baseline=[], sf=0.1, watch=watch, anchor_ratio_r1=1.0,
    )[-1]
    assert len(final.encode()) <= TAIL_BUDGET
    rec = json.loads(final)
    # all 15 regressions survive; watch gave way
    kept_reg = {k for k in rec["regressions"] if k != "_elided"}
    assert len(kept_reg) == 15
    assert len(rec["watch"]) < 8
