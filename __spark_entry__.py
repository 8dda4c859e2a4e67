"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full workload-driven partition-recommendation
    pipeline (catalog mining → query-log mining → per-table stats →
    scoring → transform selection) over /root/testdata/sf0.001."""
    from trino_adaptive_partitioning_tool_spark.operators.recommend import (
        recommendations,
    )

    return recommendations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from trino_adaptive_partitioning_tool_spark.queries import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL (DuckDB) for each hash-checkable query."""
    from trino_adaptive_partitioning_tool_spark.queries import registry

    return registry.oracle_sql()
