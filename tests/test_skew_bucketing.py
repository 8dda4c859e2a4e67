"""Scale-path mechanics: salting spreads hot keys; bucketed tables join
without exchanges (plan-asserted, not just row-correct)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SMOKE_SF_DIR

from trino_adaptive_partitioning_tool_spark.operators import skew
from trino_adaptive_partitioning_tool_spark.plans import inspect as pi
from trino_adaptive_partitioning_tool_spark.sources import bucketing, tables


def test_salted_groupby_count_matches_plain(spark):
    docs = tables.load_table(spark, SMOKE_SF_DIR, "documents")
    plain = {
        r["key"]: r["n"]
        for r in docs.groupBy(F.col("lang").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["key"]: r["count"]
        for r in skew.salted_groupby_count(docs, "lang", n_salts=8).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark):
    orders = tables.load_table(spark, SMOKE_SF_DIR, "orders")
    customer = tables.load_table(spark, SMOKE_SF_DIR, "customer")
    dim = customer.select(F.col("c_custkey").alias("o_custkey"), "c_name")
    plain = orders.join(dim, "o_custkey").count()
    salted = skew.salted_join(orders, dim, "o_custkey", n_salts=4).count()
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    """Regression: salt must vary WITHIN a key's rows (a salt computed
    from the key itself puts every hot-key row in one bucket)."""
    docs = tables.load_table(spark, SMOKE_SF_DIR, "documents")
    spread = (
        skew.with_salt(docs.select("lang"), 8)
        .groupBy("lang")
        .agg(F.countDistinct("__salt").alias("n_buckets"), F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 8)
        .collect()
    )
    assert spread, "fixture should have at least one lang with >=8 rows"
    assert all(r["n_buckets"] > 1 for r in spread), spread


def test_salt_is_deterministic(spark):
    docs = tables.load_table(spark, SMOKE_SF_DIR, "documents")
    a = skew.with_salt(docs, 16).select("doc_id", "__salt").collect()
    b = skew.with_salt(docs, 16).select("doc_id", "__salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["__salt"] < 16 for r in a)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = tables.load_table(spark, SMOKE_SF_DIR, "orders")
    lineitem = tables.load_table(spark, SMOKE_SF_DIR, "lineitem")
    bucketing.write_bucketed(orders, "b_orders", "o_orderkey", 8)
    bucketing.write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8)
    try:
        joined = bucketing.bucketed_join(
            spark, "b_lineitem", "l_orderkey", "b_orders", "o_orderkey"
        )
        assert pi.shuffle_count(joined) == 0, pi.physical_plan(joined)[:500]
        # and it's still a correct join
        assert joined.count() == lineitem.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
