"""Scale-regime plan tests: simulate the 100 TB cluster locally.

At 100 TB no join side fits in a broadcast, so every headline join query
must still (a) plan as a shuffle join — SortMergeJoin or
ShuffledHashJoin, never BroadcastNestedLoopJoin / CartesianProduct —
and (b) return byte-identical results when broadcasting is disabled
(`spark.sql.autoBroadcastJoinThreshold=-1`). Catalyst picks broadcast
plans at test SF purely from size estimates; these tests prove the
queries don't *depend* on that choice.

Separately, AQE's skew-join splitting is exercised end-to-end: a hot-key
fact join is shown to split the skewed partition at runtime
(`skew=true` in the final adaptive plan) while matching the plain
join's result — the runtime complement to the explicit salting
operators in operators/skew.py.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

from trino_adaptive_partitioning_tool_spark.plans import inspect

from conftest import SMOKE_SF_DIR

_QUERIES = entrymod.queries()

# Join-heavy oracle-checked queries with no intentional all-pairs stage.
_JOIN_QUERIES = [
    "shipping_priority",
    "region_revenue",
    "volume_shipping_bilateral",
    "asof_last_click_before_purchase",
    "range_interval_join",
    "nation_market_share",
    "top_revenue_supplier",
    "semi_join_suppliers",
    "anti_join_customers",
]


@contextmanager
def _confs(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _canon_rows(df):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(map(str, t)))


@pytest.mark.parametrize("name", _JOIN_QUERIES)
def test_joins_survive_no_broadcast_regime(spark, name):
    fn = _QUERIES[name]
    want = _canon_rows(fn(spark, SMOKE_SF_DIR))
    with _confs(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        df = fn(spark, SMOKE_SF_DIR)
        plan = inspect.physical_plan(df)
        assert "CartesianProduct" not in plan, f"{name} degenerates to cartesian"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} degenerates to nested-loop at scale"
        )
        got = _canon_rows(df)
    assert got == want, f"{name} changes results without broadcast joins"


def test_aqe_splits_skewed_sort_merge_join(spark, tmp_path):
    """A 100k-row hot key must trigger AQE skew-join splitting
    (skew=true in the final plan) and still aggregate correctly."""
    fact = spark.range(120_000).select(
        F.when(F.col("id") < 100_000, F.lit(0))
        .otherwise((F.col("id") % 50) + 1)
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(51).select(
        F.col("id").alias("k"), F.concat(F.lit("g"), F.col("id")).alias("grp")
    )
    # write fact out so AQE sees real shuffle statistics, not an in-memory range
    fact_path = str(tmp_path / "skew_fact")
    fact.write.mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)

    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    ):
        joined = fact.join(dim, "k").groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("sv")
        )
        rows = {r["grp"]: (r["n"], r["sv"]) for r in joined.collect()}
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, "AQE did not split the skewed partition"
    assert rows["g0"][0] == 100_000
    assert len(rows) == 51
