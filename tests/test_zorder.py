"""Z-order layout: multi-dimensional file skipping that 1-D sorting
cannot provide.

The crisp claim: sort lineitem by l_partkey alone and every file's
l_suppkey range spans the whole domain — a suppkey predicate prunes
NOTHING. Z-order the same rows over (partkey, suppkey) and a suppkey
range intersects only the files owning matching z-ranges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trino_adaptive_partitioning_tool_spark.operators import zorder as zo
from trino_adaptive_partitioning_tool_spark.sources import tables

from conftest import SMOKE_SF_DIR

N_FILES = 8
BITS = 8


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("zorder")
    li = tables.load_table(spark, SMOKE_SF_DIR, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    bounds = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    pmin, pmax, smin, smax = [float(v) for v in bounds]

    linear = str(root / "linear")
    (
        li.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(root / "zorder")
    z = zo.zvalue2(
        F.col("l_partkey"), pmin, pmax + 1,
        F.col("l_suppkey"), smin, smax + 1,
        BITS,
    )
    zo.zorder_write(li, zpath, z, N_FILES)
    return linear, zpath, (pmin, pmax, smin, smax)


def test_zorder_roundtrip_preserves_rows(spark, layouts):
    linear, zpath, _ = layouts
    a = spark.read.parquet(linear)
    b = spark.read.parquet(zpath)
    assert a.count() == b.count()
    assert (
        a.agg(F.sum("l_quantity")).collect()[0][0]
        == b.agg(F.sum("l_quantity")).collect()[0][0]
    )


def test_second_dimension_prunes_only_under_zorder(layouts):
    linear, zpath, (pmin, pmax, smin, smax) = layouts
    # a ~12%-wide range on the SECOND dimension
    lo = smin
    hi = smin + (smax - smin) / 8.0
    lin_hit, lin_total = zo.files_overlapping(linear, "l_suppkey", lo, hi)
    z_hit, z_total = zo.files_overlapping(zpath, "l_suppkey", lo, hi)
    assert lin_total == N_FILES and z_total == N_FILES
    # partkey-sorted files all span the suppkey domain: zero skipping
    assert lin_hit == N_FILES
    # z-ordered files keep suppkey locality: real skipping
    assert z_hit < N_FILES


def test_first_dimension_still_prunes_under_zorder(layouts):
    _linear, zpath, (pmin, pmax, _smin, _smax) = layouts
    lo = pmin
    hi = pmin + (pmax - pmin) / 8.0
    z_hit, z_total = zo.files_overlapping(zpath, "l_partkey", lo, hi)
    assert z_hit < z_total
