"""Spark-native workload capture — the engine-native query history.

The reference mines Trino's `system.runtime.queries` SQL text because it
sits OUTSIDE the engine (SURVEY §4.3). This engine owns execution, so the
workload log can come straight from the plans Spark runs: every captured
action records its filter/join attribute names (from the optimized
logical plan — no SQL text parsing) plus runtime metrics, producing rows
shaped exactly like the miner's output. The SAME scoring pipeline then
runs on either source.

Usage:
    cap = WorkloadCapture(spark)
    df = cap.run("q1", orders.join(customer, ...).where(...))  # executes
    logs, mined = cap.to_dataframes()   # query_logs-shaped + mined-shaped
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .inspect import referenced_columns

_LOG_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("query", T.StringType(), False),
        T.StructField("execution_time_ms", T.LongType(), False),
        T.StructField("row_count", T.LongType(), False),
    ]
)


class WorkloadCapture:
    """Accumulates (query_id, plan columns, runtime) for executed
    DataFrames. Driver-side state is O(captured queries), never O(rows)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._log_rows: list[tuple] = []
        self._mined_rows: list[tuple] = []

    def run(self, query_id: str, df: DataFrame) -> int:
        """Execute `df` (count action), recording plan attributes and
        wall time. Returns the row count."""
        cols = referenced_columns(df)
        start = time.perf_counter()
        n = df.count()
        elapsed_ms = int((time.perf_counter() - start) * 1000)
        self._log_rows.append(
            (query_id, "<captured-plan>", elapsed_ms, n)
        )
        for c in cols["filter_columns"]:
            self._mined_rows.append((query_id, "where_column", c, 1))
        for c in cols["join_columns"]:
            self._mined_rows.append((query_id, "join_column", c, 1))
        return n

    def to_dataframes(self) -> tuple[DataFrame, DataFrame]:
        """(query_logs-shaped, mined-shaped) DataFrames — drop-in inputs
        for scoring.column_performance / weighted_column_usage."""
        from ..operators.mining import MINED_SCHEMA

        logs = self.spark.createDataFrame(self._log_rows, schema=_LOG_SCHEMA)
        mined = self.spark.createDataFrame(
            self._mined_rows, schema=MINED_SCHEMA
        )
        return logs, mined
