"""Unit tests for the data-quality operators on tiny frames with KNOWN
violations (the parity suite covers the real tables, where several FK
checks are legitimately zero)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_adaptive_partitioning_tool_spark.operators import quality


def _report_map(df):
    return {r["check_name"]: r for r in df.collect()}


def test_row_constraints_and_uniqueness_single_pass(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (1, -5.0, "A"),   # dup id, below range
            (2, None, "B"),   # null amount
            (3, 200.0, "X"),  # above range, bad code
        ],
        "id int, amount double, code string",
    )
    rep = quality.evaluate_constraints(
        df,
        "t",
        [
            quality.not_null("amount"),
            quality.in_range("amount", 0, 100),
            quality.accepted_values("code", ("A", "B")),
            quality.matches("amount_under_50x_id", F.col("amount") < F.col("id") * 50),
        ],
        unique_keys=[["id"]],
    )
    m = _report_map(rep)
    assert m["not_null(amount)"]["n_violations"] == 1
    # null counts as a range violation too
    assert m["range(amount,0,100)"]["n_violations"] == 3
    assert m["accepted_values(code)"]["n_violations"] == 1
    # null predicate => violated (fail-closed)
    assert m["amount_under_50x_id"]["n_violations"] == 2
    assert m["unique(id)"]["n_violations"] == 1
    assert all(r["n_rows"] == 4 for r in m.values())
    # ONE pass over the data: exactly one scan feeds every check (the
    # distinct-aggregate rewrite adds shuffles of 1-row partials, which
    # is fine — the expensive side is the scan)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ") == 1


def test_referential_orphans_counts_keys_and_rows(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (7,), (7,), (7,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = quality.referential_orphans(child, "fk", parent, "pk", "c->p").collect()[0]
    assert row["relation"] == "c->p"
    assert row["n_child_rows"] == 6  # nulls excluded
    assert row["n_orphan_keys"] == 1  # key 7
    assert row["n_orphan_rows"] == 3


def test_referential_orphans_pathological_all_orphans(spark):
    """A fully-orphaned child table: the orphan key set equals the whole
    child key set, so the op must neither force-broadcast it (it is
    corpus-sized here) nor miscount. The plan assertion pins the r5 fix:
    no forced broadcast hint survives under threshold=-1."""
    child = spark.createDataFrame([(i,) for i in range(500)], "fk int")
    parent = spark.createDataFrame([(10_000,)], "pk int")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = quality.referential_orphans(child, "fk", parent, "pk", "c->p")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan.split("== Initial Plan ==")[0]
        row = df.collect()[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert row["n_child_rows"] == 500
    assert row["n_orphan_keys"] == 500
    assert row["n_orphan_rows"] == 500


def test_childless_parents(spark):
    parent = spark.createDataFrame([(1,), (2,), (3,), (4,)], "pk int")
    child = spark.createDataFrame([(1,), (1,), (3,)], "fk int")
    row = quality.childless_parents(parent, "pk", child, "fk", "p->c").collect()[0]
    assert row["n_parents"] == 4
    assert row["n_childless"] == 2
