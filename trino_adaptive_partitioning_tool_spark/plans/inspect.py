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
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


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
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(
        df
    ).count("Exchange rangepartitioning")


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


def plan_manifest(df: DataFrame) -> dict:
    """Compact plan-shape summary for the bench JSON — the properties
    that carry to 100 TB, as data rather than prose: exchange count,
    broadcast count, join strategies, and how many predicates reached
    the scan as pushed / partition filters. One plan-string pass,
    reusing the same node patterns as the individual helpers above so
    the bench block can never drift from the plan tests."""
    plan = physical_plan(df)
    joins: dict[str, int] = {}
    for j in _JOIN_NODE_RE.findall(plan):
        joins[j] = joins.get(j, 0) + 1
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcasts": plan.count("BroadcastExchange"),
        "joins": joins,
        "pushed_filters": len(_bracket_entries(plan, "PushedFilters")),
        "partition_filters": len(_bracket_entries(plan, "PartitionFilters")),
    }


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-level predicates on file scans (static pruning from a
    key=value directory layout, plus `dynamicpruningexpression` entries
    injected by runtime DPP)."""
    return _bracket_entries(physical_plan(df), "PartitionFilters")
