"""Per-query optimization profiler (r13): noop-sink timing + formatted
plans for any subset of registered queries.

For each selected query this measures what the optimization guide §1
asks for: the computation isolated from the sink (df.write.format
("noop") — eagerly computes every column of every row), labeled jobs,
and the `.explain("formatted")` text written to plans/r13/<query>_<tag>.txt
so plan claims in OPTIMIZATION_r13.md are checkable offline.

Usage:
    python scripts/profile_queries.py <tag> [name_substring ...]
        [--sf DIR] [--reps N] [--count]

`tag` is "before" / "after" (the plan file suffix). Substrings filter
query names (OR-ed); no filter = the full bench headline set. --count
times `df.count()` instead of the noop sink (the bench's historical
action) so both methodologies can be compared.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_DIR = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")

    def _positive_int(v: str) -> int:
        # ADVICE r13: reps < 1 left df=None -> AttributeError on
        # explain and ValueError on min([]) — reject at parse time
        iv = int(v)
        if iv < 1:
            raise argparse.ArgumentTypeError("--reps must be >= 1")
        return iv

    ap.add_argument("--reps", type=_positive_int, default=3)
    ap.add_argument("--count", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    os.makedirs(PLANS_DIR, exist_ok=True)

    from trino_adaptive_partitioning_tool_spark.queries import registry
    from trino_adaptive_partitioning_tool_spark.session import get_spark

    import bench

    spark = get_spark(app_name=f"profile-{args.tag}")
    qs = registry.queries()
    names = [
        n for n in bench.HEADLINE_QUERIES
        if n in qs
        and (not args.names or any(s in n for s in args.names))
    ]
    # also allow profiling non-headline registered queries by name
    for n in args.names:
        if n in qs and n not in names:
            names.append(n)

    # session warm-up (same as bench.py): JVM + parquet footers
    qs["pricing_summary"](spark, args.sf).count()

    out: dict[str, dict] = {}
    for name in names:
        sc = spark.sparkContext
        times = []
        df = None
        for i in range(args.reps):
            sc.setJobDescription(f"{name} [{args.tag} rep{i}]")
            start = time.perf_counter()
            df = qs[name](spark, args.sf)
            if args.count:
                n_rows = df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
                n_rows = None
            times.append(round(time.perf_counter() - start, 3))
        sc.setJobDescription(None)
        if not args.no_plans:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(PLANS_DIR, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        out[name] = {
            "times": times,
            "min": min(times),
            "warm_min": min(times[1:]) if len(times) > 1 else times[0],
        }
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps({"tag": args.tag, "sf": args.sf,
                      "action": "count" if args.count else "noop",
                      "queries": out}, indent=1))


if __name__ == "__main__":
    main()
