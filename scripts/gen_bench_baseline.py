"""Generate BENCH_BASELINE.json: per-query median of N idle-host bench
runs, the reference for bench.py's per-query regression budget.

Each run is a FRESH `python bench.py` subprocess (cold JVM, cold plan
caches) with the layout/twin extras skipped — the same measurement
procedure bench.py's headline loop uses, so budget comparisons are
apples-to-apples. Run on an IDLE host (the shared host's load noise is
documented at +/-40%; a baseline captured under contention would flag
phantom regressions forever).

Usage:  python scripts/gen_bench_baseline.py [n_runs]
"""
from __future__ import annotations

import datetime
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    per_query: dict[str, list[float]] = {}
    per_query_cold: dict[str, list[float]] = {}
    env = dict(os.environ, SPARK_GRAFT_BENCH_SKIP_EXTRAS="1")
    for run in range(n_runs):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        # bench.py prints the FULL record first and (past ~60 queries) a
        # compact tail-budget summary line last whose queries dict is
        # truncated — the baseline needs every query, so parse line 1
        line = out.stdout.strip().splitlines()[0]
        parsed = json.loads(line)
        assert "queries_elided" not in parsed, "expected the full record"
        for name, sec in parsed["queries"].items():
            per_query.setdefault(name, []).append(float(sec))
        # first-call (cold) times are too large for the driver-captured
        # stdout tail; bench.py writes them to BENCH_PLANS.json instead
        try:
            with open(os.path.join(REPO, "BENCH_PLANS.json")) as fh:
                cold = json.load(fh).get("cold_queries", {})
            for name, sec in cold.items():
                per_query_cold.setdefault(name, []).append(float(sec))
        except (OSError, ValueError):
            pass
        print(
            f"# run {run + 1}/{n_runs}: total {parsed['value']}s",
            file=sys.stderr,
        )
    medians = {
        name: round(statistics.median(vals), 3)
        for name, vals in sorted(per_query.items())
    }
    payload = {
        "medians": medians,
        "cold_medians": {
            name: round(statistics.median(vals), 3)
            for name, vals in sorted(per_query_cold.items())
        },
        "runs": n_runs,
        "samples": {n: v for n, v in sorted(per_query.items())},
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds"),
    }
    path = os.path.join(REPO, "BENCH_BASELINE.json")
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"# wrote {path} ({len(medians)} queries)", file=sys.stderr)


if __name__ == "__main__":
    main()
