"""Physical-plan inspection helpers.

The reference relies on Trino's optimizer sight-unseen; here we own the
engine, so plan shape is a testable property. These helpers let tests and
the bench assert the three things that matter at 100 TB:

  * filters/column pruning reach the parquet scan (PushedFilters /
    ReadSchema in the FileScan node)
  * dimension joins go broadcast (no full shuffle of the fact side)
  * hot expressions stay inside WholeStageCodegen spans

Also the Spark-side analog of workload mining (SURVEY §4.3 "optional"):
`referenced_columns` walks a DataFrame's analyzed plan to extract the
filter/join attributes of *Spark* workloads — the engine-native
equivalent of parsing logged SQL text.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, execute: bool = False) -> str:
    """Physical plan text. With AQE the plan string is `isFinalPlan=false`
    (no codegen markers) until THIS dataframe's plan actually runs —
    `execute=True` collects first so the finalized adaptive plan (with
    WholeStageCodegen `*(n)` spans) is visible. Scan metadata (PushedFilters,
    ReadSchema) is truncated at 100 chars by default, so widen it."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    try:
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
        if execute:
            df.collect()
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    try:
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


_JOIN_NODE_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def _bracket_entries(plan: str, label: str) -> list[str]:
    """All comma-separated entries of `label: [...]` nodes in a plan."""
    out: list[str] = []
    for m in re.finditer(label + r": \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scan."""
    return _bracket_entries(physical_plan(df), "PushedFilters")


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — column pruning check."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", physical_plan(df))


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in the physical plan, outermost first."""
    return _JOIN_NODE_RE.findall(physical_plan(df))


def codegen_span_count(df: DataFrame) -> int:
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df, execute=True))))


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine before the shuffle (partial_sum/partial_count...)."""
    return "partial_" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Hash/range repartitioning exchanges the plan would RUN, counted
    from the formatted plan (each physical node numbered exactly once).

    The previous textual counter over the tree string was cache-state
    dependent: InMemoryTableScan nodes re-print their cached-build
    subtree at every reference, and WHICH cached entry the CacheManager
    substitutes depends on what else the session cached — the identical
    query measured 21 or 48 "exchanges" depending on unrelated earlier
    work (found via a flaky plan-ceiling test, r7). The formatted plan
    treats cached scans as leaves, so the count is a property of the
    query alone.

    Round-robin repartitions (df.repartition(n)) count too: they move
    every row, same as a hash shuffle at 100 TB."""
    m = plan_manifest(df)
    return m["exchanges"] + m["roundrobin_exchanges"]


def referenced_columns(df: DataFrame) -> dict[str, list[str]]:
    """Filter/join attribute names from the *optimized* logical plan — the
    Spark-native twin of the SQL-text miner (works on any DataFrame the
    engine itself runs, no SQL text needed)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    filters = set()
    joins = set()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ")
        if s.startswith("Filter"):
            filters.update(re.findall(r"(\w+)#\d+", s))
        elif s.startswith("Join"):
            joins.update(re.findall(r"(\w+)#\d+", s))
    return {"filter_columns": sorted(filters), "join_columns": sorted(joins)}


def _initial_plan_node_ids(fp: str) -> set[int]:
    """Node ids printed under `== Initial Plan ==` tree scopes. AQE
    plans (and every cached sub-plan) render both the final and the
    initial tree; the initial one is a pre-runtime duplicate and must
    not count toward plan-shape totals. Scopes are indent-delimited:
    a scope covers the deeper-indented lines following its marker."""
    excluded: set[int] = set()
    scopes: list[int] = []
    for line in fp.splitlines():
        indent = len(line) - len(line.lstrip())
        while scopes and line.strip() and indent <= scopes[-1]:
            scopes.pop()
        if "== Initial Plan ==" in line:
            scopes.append(indent)
            continue
        if scopes:
            excluded.update(int(n) for n in re.findall(r"\((\d+)\)", line))
    return excluded


_DETAIL_HEADER_RE = re.compile(r"^\((\d+)\) ([A-Za-z]+)", re.M)


def plan_manifest(df: DataFrame) -> dict:
    """Compact plan-shape summary for the bench JSON — the properties
    that carry to 100 TB, as data rather than prose: exchange count,
    broadcast count, join strategies, and how many predicates reached
    the scan as pushed / partition filters.

    Counts come from the FORMATTED plan, which numbers every physical
    node exactly once — the tree-string helpers above re-print a cached
    or reused subtree at every reference, so a multi-reference pipeline
    (e.g. the funnel's cached survivor frame) would inflate textual
    counts ~8x. Initial-plan duplicates are excluded by node id."""
    fp = formatted_plan(df)
    excluded = _initial_plan_node_ids(fp)
    counts: dict[str, int] = {}
    blocks: list[tuple[int, str, int]] = []  # (id, name, start offset)
    for m in _DETAIL_HEADER_RE.finditer(fp):
        nid, name = int(m.group(1)), m.group(2)
        blocks.append((nid, name, m.start()))
        if nid not in excluded:
            counts[name] = counts.get(name, 0) + 1
    joins = {
        j: counts[j]
        for j in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        )
        if counts.get(j)
    }
    pushed = partition = 0
    # "exchanges" counts only repartitioning shuffles (hash/range) to
    # stay comparable with the pre-formatted-plan counter; global
    # sort/limit SinglePartition exchanges are reported separately, and
    # so are round-robin repartitions (df.repartition(n) — a FULL-data
    # shuffle that the old else-bucket mislabeled as single-partition).
    shuffle_exchanges = single_exchanges = roundrobin_exchanges = 0
    for i, (nid, name, start) in enumerate(blocks):
        if nid in excluded:
            continue
        end = blocks[i + 1][2] if i + 1 < len(blocks) else len(fp)
        detail = fp[start:end]
        pushed += len(_bracket_entries(detail, "PushedFilters"))
        partition += len(_bracket_entries(detail, "PartitionFilters"))
        if name == "Exchange":
            if "hashpartitioning" in detail or "rangepartitioning" in detail:
                shuffle_exchanges += 1
            elif "roundrobinpartitioning" in detail.lower():
                roundrobin_exchanges += 1
            else:
                single_exchanges += 1
    return {
        "exchanges": shuffle_exchanges,
        "roundrobin_exchanges": roundrobin_exchanges,
        "single_partition_exchanges": single_exchanges,
        "broadcasts": counts.get("BroadcastExchange", 0),
        "reused_subplans": counts.get("InMemoryTableScan", 0)
        + counts.get("ReusedExchange", 0),
        "joins": joins,
        "pushed_filters": pushed,
        "partition_filters": partition,
        # r9 (manifest v2): the shuffle/join counts above are blind to
        # map-only growth — adding a Python decode leg to a union
        # changed a query's cost 25% with an identical manifest, so the
        # append-only bench baseline never reset its median. These
        # three make that class of change visible to the plan hash
        # (and to the judge reading plan shapes).
        "physical_nodes": sum(counts.values()),
        "python_stages": sum(
            v for k, v in counts.items()
            if "Python" in k or "Pandas" in k or "Arrow" in k
        ),
        "unions": counts.get("Union", 0),
    }


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-level predicates on file scans (static pruning from a
    key=value directory layout, plus `dynamicpruningexpression` entries
    injected by runtime DPP)."""
    return _bracket_entries(physical_plan(df), "PartitionFilters")
