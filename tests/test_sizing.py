"""Sizing advice operators (operators/sizing.py): shuffle partition
counts and the partition-layout what-if report."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_adaptive_partitioning_tool_spark.operators import sizing


def test_advise_shuffle_partitions_clamps_and_handles_null(spark):
    logs = spark.createDataFrame(
        [
            ("q1", None),                      # null -> 1
            ("q2", 1),                         # tiny -> 1
            ("q3", 64 * 1024 * 1024),          # exactly one target -> 1
            ("q4", 64 * 1024 * 1024 + 1),      # just over -> 2
            ("q5", 10**15),                    # enormous -> clamp 2000
        ],
        "query_id string, input_bytes long",
    )
    got = {
        r["query_id"]: r["advised_partitions"]
        for r in sizing.advise_shuffle_partitions(logs).collect()
    }
    assert got == {"q1": 1, "q2": 1, "q3": 1, "q4": 2, "q5": 2000}


def test_partition_layout_whatif_skew_and_fraction(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 4)], "k string, v int"
    )
    rows = {
        r["candidate_key"]: r
        for r in sizing.partition_layout_whatif(
            df, {"by_k": F.col("k"), "by_v": F.col("v")}
        ).collect()
    }
    bk = rows["by_k"]
    assert bk["n_partitions"] == 2
    assert bk["n_rows"] == 4
    assert bk["max_partition_rows"] == 3
    assert bk["skew_ratio"] == 1.5  # max 3 / mean 2
    assert bk["est_scan_fraction"] == 0.5
    bv = rows["by_v"]
    assert bv["n_partitions"] == 4
    assert bv["skew_ratio"] == 1.0
    assert bv["est_scan_fraction"] == 0.25


def test_partition_layout_whatif_single_scan(spark):
    """All candidates must come from ONE scan of the input (the stack
    explode), not one scan per candidate."""
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    plan = sizing.partition_layout_whatif(
        df, {"by_k": F.col("k"), "by_v": F.col("v")}
    )._jdf.queryExecution().optimizedPlan().toString()
    # a per-candidate implementation would plan a Union of one subtree
    # (and one input scan) per candidate; the stack explode plans none
    assert "Union" not in plan
    assert plan.count("LocalRelation") <= 1


def test_advise_salt_factors_clamps(spark):
    df = spark.createDataFrame(
        [("hot",)] * 120 + [("warm",)] * 60 + [("cold",)] * 3, "k string"
    )
    got = {
        r["key"]: (r["n_rows"], r["salt_factor"])
        for r in sizing.advise_salt_factors(
            df, F.col("k"), target_rows_per_task=50, max_salts=2
        ).collect()
    }
    assert got == {"hot": (120, 2), "warm": (60, 2), "cold": (3, 1)}


def test_with_keyed_salt_consumes_advice(spark):
    """The advertised integration: advise_salt_factors output feeds
    skew.with_keyed_salt — hot keys fan out to their advised factor,
    cold keys stay at salt 0."""
    from trino_adaptive_partitioning_tool_spark.operators import skew

    df = spark.createDataFrame(
        [("hot",)] * 100 + [("cold",)] * 2, "k string"
    )
    advice = sizing.advise_salt_factors(
        df, F.col("k"), target_rows_per_task=25, max_salts=8
    )
    salted = skew.with_keyed_salt(df, advice, "k")
    rows = salted.groupBy("k").agg(
        F.countDistinct("__salt").alias("n_salts"),
        F.max("__salt").alias("max_salt"),
    ).collect()
    got = {r["k"]: (r["n_salts"], r["max_salt"]) for r in rows}
    assert got["hot"][0] == 4      # 100/25 -> 4 distinct salt buckets
    assert got["hot"][1] == 3
    assert got["cold"] == (1, 0)   # factor 1 -> unsalted
    # aggregation over (key, salt) then key reproduces plain counts
    two_phase = (
        salted.groupBy("k", "__salt").count()
        .groupBy("k").agg(F.sum("count").alias("n"))
    )
    assert {r["k"]: r["n"] for r in two_phase.collect()} == {
        "hot": 100, "cold": 2
    }


def test_table_file_metadata_rejects_scale_mismatch(spark):
    """table_file_metadata's oracle pins footer paths to PARITY_SF_DIR at
    registration; running the Spark side against another scale must fail
    loudly instead of silently comparing two different directories."""
    import pytest

    from trino_adaptive_partitioning_tool_spark.queries import advisor

    with pytest.raises(ValueError, match="pinned to the parity scale"):
        advisor.table_file_metadata(spark, "/root/testdata/sf0.001")
