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
    # elided queries are declared, and what survives is the slowest
    assert rec["queries_elided"] + len(rec["queries"]) == 200
    if rec["queries_elided"]:
        kept_min = min(rec["queries"].values())
        # every elided timing is <= the slowest kept one (slowest-first fill)
        assert kept_min >= 0.1


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
