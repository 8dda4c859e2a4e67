"""Proof that an applied recommendation actually buys partition pruning —
the end goal of the whole advisor (the reference only ever *claims* this
downstream in Trino; here the engine is ours, so it's a testable plan
property)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SMOKE_SF_DIR

from trino_adaptive_partitioning_tool_spark.operators import transforms
from trino_adaptive_partitioning_tool_spark.plans import inspect as pi
from trino_adaptive_partitioning_tool_spark.sources import tables


def _write_day_layout(spark, tmp_path) -> str:
    events = tables.load_table(spark, SMOKE_SF_DIR, "events")
    path = str(tmp_path / "events_by_day")
    keys = transforms.apply_recommendation(events, path, ["day(ts)"])
    assert keys == ["ts_day"]
    return path


def test_applied_layout_enables_static_pruning(spark, tmp_path):
    path = _write_day_layout(spark, tmp_path)
    layout = tables.partition_layout(path)
    assert "ts_day" in layout and len(layout["ts_day"]) > 1

    one_day = layout["ts_day"][0]
    df = spark.read.parquet(path).where(F.col("ts_day") == one_day)
    pf = " ".join(pi.partition_filters(df))
    assert "ts_day" in pf, f"no partition filter reached the scan: {pf}"
    # the partition predicate must NOT appear as a data filter — it is
    # resolved from directory names alone
    assert not any("ts_day" in f for f in pi.pushed_filters(df))
    assert df.count() > 0


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """A selective dim-side filter prunes fact partitions at runtime (DPP:
    the scan's PartitionFilters gains a dynamicpruningexpression)."""
    path = _write_day_layout(spark, tmp_path)
    fact = spark.read.parquet(path)
    days = sorted(tables.partition_layout(path)["ts_day"])[:2]
    dim = spark.createDataFrame(
        [(d, "keep") for d in days], "dim_day string, tag string"
    )
    joined = fact.join(
        F.broadcast(dim),
        (fact["ts_day"] == dim["dim_day"]) & (dim["tag"] == "keep"),
    )
    plan = pi.physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() > 0
