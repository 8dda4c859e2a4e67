"""Query registry backing the driver contract (__spark_entry__.py).

Each implemented operator from SURVEY.md §2 registers a named PySpark
callable `(spark, sf_dir) -> DataFrame` and, when the semantics are
ANSI-SQL-expressible, a DuckDB oracle string computing the identical
result (same column names — the driver sorts columns by name and
hash-compares values). Non-SQL-expressible ops (sketch-based, stateful
streaming) register Spark-only and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}

# Prepared-plan cache (opt-in via register(..., memo=True)) for queries
# whose LOGICAL PLAN construction alone costs real driver time (hundreds
# of Py4J column-expression round trips). The plan for a given (session,
# sf_dir, query) is immutable — rebuilding it per call is pure waste,
# exactly what prepared statements avoid. Execution still runs normally
# on every call; only the lazy DataFrame object is reused.
_PLAN_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def register(
    name: str, oracle: str | None = None, memo: bool = False
) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        if memo:
            def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
                key = (id(spark), sf_dir, name)
                if key not in _PLAN_CACHE:
                    _PLAN_CACHE[key] = fn(spark, sf_dir)
                return _PLAN_CACHE[key]

            wrapped.__doc__ = fn.__doc__
            wrapped.__name__ = fn.__name__
            _QUERIES[name] = wrapped
        else:
            _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # import for registration side effects
    from . import (  # noqa: F401
        advisor,
        cdc,
        core_sql,
        core_sql2,
        dedup,
        multimodal,
        quality,
        relational_ext,
        sampling,
        similarity,
        streaming_q,
        text,
        timeseries,
        tpch_shapes,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
