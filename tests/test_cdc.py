"""Unit tests for CDC operators on tiny frames with explicit
insert/update/delete cases (the parity suite covers the real stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_adaptive_partitioning_tool_spark.operators import cdc


def test_merge_upsert_insert_update_delete(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, state string, v double",
    )
    changes = spark.createDataFrame(
        [(2, "b2", 21.0), (3, "DEL", 0.0), (4, "d", 40.0)],
        "id int, state string, v double",
    )
    merged = cdc.merge_upsert(
        target, changes, ["id"], delete_when=F.col("state") == "DEL"
    )
    got = {r["id"]: (r["state"], r["v"]) for r in merged.collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 4: ("d", 40.0)}


def test_merge_upsert_change_with_null_attr_still_wins(spark):
    # a change row whose attribute is NULL must still replace the target
    # (presence is tracked via the delete marker, not the attributes)
    target = spark.createDataFrame([(1, "a")], "id int, state string")
    changes = spark.createDataFrame([(1, None)], "id int, state string")
    merged = cdc.merge_upsert(target, changes, ["id"])
    assert merged.collect()[0]["state"] is None


def test_scd2_collapses_consecutive_states(spark):
    rows = [
        (1, "x", 1, 1),
        (1, "x", 2, 2),
        (1, "y", 3, 3),
        (1, "x", 4, 4),
        (2, "z", 1, 5),
    ]
    df = spark.createDataFrame(rows, "k int, s string, t int, eid int")
    hist = cdc.scd2_history(df, "k", "s", "t", "eid").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    u1 = sorted(by_key[1], key=lambda r: r["valid_from"])
    assert [(r["s"], r["valid_from"], r["valid_to"], r["n_events"]) for r in u1] == [
        ("x", 1, 3, 2),
        ("y", 3, 4, 1),
        ("x", 4, None, 1),
    ]
    assert [r["is_current"] for r in u1] == [False, False, True]
    assert by_key[2][0]["is_current"] is True


def test_collapse_latest_breaks_ties_deterministically(spark):
    df = spark.createDataFrame(
        [(1, 5, 100, "first"), (1, 5, 101, "second")],
        "k int, t int, eid int, s string",
    )
    got = cdc.collapse_latest(df, ["k"], ["t", "eid"]).collect()
    assert len(got) == 1 and got[0]["s"] == "second"
