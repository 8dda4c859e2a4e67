"""Data-quality / validation queries (training-pipeline surface).

The constraint report is the dbt-test / Deequ shape as one conditional
aggregation per table; referential checks are key-distinct anti-joins.
Both are fully ANSI-SQL-expressible, so every query here is
hash-checked against DuckDB. The synthetic corpus has REAL violations
(duplicate (l_orderkey, l_linenumber) pairs, customers with no events),
so the counts are non-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import quality
from ..sources import tables
from .registry import register

# (table, check_name, SQL violation predicate) — single source of truth
# for the oracle legs; the Spark constraints below mirror each predicate.
_ROW_CHECKS = [
    ("lineitem", "not_null(l_quantity)", "l_quantity IS NULL"),
    (
        "lineitem",
        "range(l_quantity,1,30)",
        "l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 30",
    ),
    (
        "lineitem",
        "range(l_discount,0,0.05)",
        "l_discount IS NULL OR l_discount < 0 OR l_discount > 0.05",
    ),
    (
        "lineitem",
        "accepted_values(l_returnflag)",
        "l_returnflag IS NULL OR l_returnflag NOT IN ('R','A','N')",
    ),
    (
        "lineitem",
        "positive_net_price",
        "NOT COALESCE(l_extendedprice * (1 - l_discount) > 0, FALSE)",
    ),
    ("orders", "not_null(o_custkey)", "o_custkey IS NULL"),
    (
        "orders",
        "accepted_values(o_orderstatus)",
        "o_orderstatus IS NULL OR o_orderstatus NOT IN ('F','O','P')",
    ),
    (
        "orders",
        "range(o_totalprice,0,300000)",
        "o_totalprice IS NULL OR o_totalprice < 0 OR o_totalprice > 300000",
    ),
    ("documents", "not_null(text)", "text IS NULL"),
    (
        "documents",
        "n_chars_consistent",
        "NOT COALESCE(length(text) = n_chars, FALSE)",
    ),
]

# (table, check_name, COUNT(DISTINCT ...) SQL) — uniqueness legs
_UNIQUE_CHECKS = [
    (
        "lineitem",
        "unique(l_orderkey,l_linenumber)",
        "COUNT(DISTINCT (l_orderkey, l_linenumber))",
    ),
    ("orders", "unique(o_orderkey)", "COUNT(DISTINCT o_orderkey)"),
    ("documents", "unique(doc_id)", "COUNT(DISTINCT doc_id)"),
]


def _dq_oracle() -> str:
    legs = []
    for table, name, pred in _ROW_CHECKS:
        legs.append(
            f"SELECT '{table}' AS table_name, '{name}' AS check_name,\n"
            f"  CAST(COUNT(*) AS BIGINT) AS n_rows,\n"
            f"  CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_violations\nFROM {table}"
        )
    for table, name, dexpr in _UNIQUE_CHECKS:
        legs.append(
            f"SELECT '{table}' AS table_name, '{name}' AS check_name,\n"
            f"  CAST(COUNT(*) AS BIGINT) AS n_rows,\n"
            f"  CAST(COUNT(*) - {dexpr} AS BIGINT) AS n_violations\n"
            f"FROM {table}"
        )
    union = "\nUNION ALL\n".join(legs)
    return (
        f"SELECT table_name, check_name, n_rows, n_violations,\n"
        f"  CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE)"
        f" AS violation_rate\nFROM (\n{union}\n)"
    )


@register("dq_constraint_report", oracle=_dq_oracle())
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass-per-table constraint report over lineitem / orders /
    documents: null, range, accepted-values, cross-column, and
    uniqueness rules, all inside a single agg per table (shared scan,
    map-side partials, 1-row shuffle). At 100 TB adding a rule costs
    one more conditional sum, not another pass."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    od = tables.load_table(spark, sf_dir, "orders")
    docs = tables.load_table(spark, sf_dir, "documents")

    li_report = quality.evaluate_constraints(
        li,
        "lineitem",
        [
            quality.not_null("l_quantity"),
            quality.in_range("l_quantity", 1, 30),
            quality.in_range("l_discount", 0, 0.05),
            quality.accepted_values("l_returnflag", ("R", "A", "N")),
            quality.matches(
                "positive_net_price",
                F.col("l_extendedprice") * (1 - F.col("l_discount")) > 0,
            ),
        ],
        unique_keys=[["l_orderkey", "l_linenumber"]],
    )
    od_report = quality.evaluate_constraints(
        od,
        "orders",
        [
            quality.not_null("o_custkey"),
            quality.accepted_values("o_orderstatus", ("F", "O", "P")),
            quality.in_range("o_totalprice", 0, 300000),
        ],
        unique_keys=[["o_orderkey"]],
    )
    doc_report = quality.evaluate_constraints(
        docs,
        "documents",
        [
            quality.not_null("text"),
            quality.matches(
                "n_chars_consistent",
                F.length("text") == F.col("n_chars"),
            ),
        ],
        unique_keys=[["doc_id"]],
    )
    out = li_report.unionByName(od_report).unionByName(doc_report)
    # exact integer ratio: IEEE division of the same two bigints is
    # bit-identical in Spark and DuckDB — no rounding boundary to hit
    return out.withColumn(
        "violation_rate",
        F.col("n_violations").cast("double") / F.col("n_rows").cast("double"),
    )


@register(
    "dq_referential_orphans",
    oracle="""
    WITH legs AS (
      SELECT 'lineitem->orders' AS relation,
        (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL) AS n_child_rows,
        (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL)
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphan_keys,
        (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL
          AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphan_rows
      UNION ALL
      SELECT 'orders->customer',
        (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL),
        (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN (SELECT c_custkey FROM customer))
      UNION ALL
      SELECT 'events->customer',
        (SELECT COUNT(*) FROM events WHERE user_id IS NOT NULL),
        (SELECT COUNT(*) FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)
          WHERE user_id NOT IN (SELECT c_custkey FROM customer)),
        (SELECT COUNT(*) FROM events WHERE user_id IS NOT NULL
          AND user_id NOT IN (SELECT c_custkey FROM customer))
    )
    SELECT relation, CAST(n_child_rows AS BIGINT) AS n_child_rows,
           CAST(n_orphan_keys AS BIGINT) AS n_orphan_keys,
           CAST(n_orphan_rows AS BIGINT) AS n_orphan_rows
    FROM legs
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan audit for three relations. The anti-join runs on
    key-DISTINCT inputs (shuffle |keys|, not |rows|); the resulting
    orphan key set broadcasts back for the row count, so the fact
    tables are never shuffled — the shape that survives 100 TB."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    od = tables.load_table(spark, sf_dir, "orders")
    cust = tables.load_table(spark, sf_dir, "customer")
    ev = tables.load_table(spark, sf_dir, "events")
    return (
        quality.referential_orphans(li, "l_orderkey", od, "o_orderkey", "lineitem->orders")
        .unionByName(
            quality.referential_orphans(od, "o_custkey", cust, "c_custkey", "orders->customer")
        )
        .unionByName(
            quality.referential_orphans(ev, "user_id", cust, "c_custkey", "events->customer")
        )
    )


@register(
    "dq_coverage_gaps",
    oracle="""
    SELECT 'customer->orders' AS relation,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_parents,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS n_childless
    UNION ALL
    SELECT 'customer->events',
      (SELECT COUNT(*) FROM customer),
      (SELECT COUNT(*) FROM customer
        WHERE c_custkey NOT IN (SELECT user_id FROM events))
    UNION ALL
    SELECT 'part->lineitem',
      (SELECT COUNT(*) FROM part),
      (SELECT COUNT(*) FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem))
    """,
)
def dq_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage direction of the FK audit: parents with zero children
    (customers who never ordered / never emitted an event, parts never
    sold). Anti-join against the child's distinct keys."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    od = tables.load_table(spark, sf_dir, "orders")
    cust = tables.load_table(spark, sf_dir, "customer")
    ev = tables.load_table(spark, sf_dir, "events")
    part = tables.load_table(spark, sf_dir, "part")
    return (
        quality.childless_parents(cust, "c_custkey", od, "o_custkey", "customer->orders")
        .unionByName(
            quality.childless_parents(cust, "c_custkey", ev, "user_id", "customer->events")
        )
        .unionByName(
            quality.childless_parents(part, "p_partkey", li, "l_partkey", "part->lineitem")
        )
    )
