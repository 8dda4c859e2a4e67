"""Core relational operator inventory (SURVEY.md §2.1-2.8).

These are the operators the reference delegates to Trino, owned natively
here as Spark SQL / DataFrame plans. Every query is registered with a
DuckDB oracle computing the identical result; where the two SQL dialects
coincide the SAME string is executed by both engines (guaranteeing column
-name parity), otherwise the Spark side uses the DataFrame API and the
oracle is hand-matched.

Determinism rules for hash-comparison:
  * every double aggregate is ROUND()ed on both sides
  * timestamps never appear raw in results — always formatted to strings
    or truncated to date strings
  * integer aggregates are BIGINT on both sides (DuckDB SUM(int) returns
    HUGEINT → always CAST ... AS BIGINT in oracles)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, name)


def _shared_sql(name: str, sql: str) -> None:
    """Register a dialect-neutral SQL query: Spark executes the same text
    DuckDB does (tables pre-registered as temp views on the Spark side).

    memo=True is safe despite the session-global temp views: spark.sql
    analyzes eagerly, so the memoized DataFrame's plan holds the RESOLVED
    parquet relations for its own (session, sf_dir) key — later view
    re-registrations for another sf_dir cannot re-bind it. Skipping the
    per-call re-register + re-parse saves ~0.1-0.3s of driver time per
    query."""

    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        tables.register_tables(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = name
    register(name, oracle=sql, memo=True)(fn)


# ---------------------------------------------------------------------------
# S5/P1/P2/O2 — scan, project, filter, sort (query-log analog over orders)
# ---------------------------------------------------------------------------
_shared_sql(
    "scan_filter_sort_limit",
    """
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)

# ---------------------------------------------------------------------------
# A1-analog groupBy aggregation — TPC-H Q1 pricing summary
# ---------------------------------------------------------------------------
_shared_sql(
    "pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
      ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
      ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
      ROUND(AVG(l_discount), 4)                                   AS avg_disc,
      COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)

# ---------------------------------------------------------------------------
# J3-analog multi-join + aggregation + top-N (TPC-H Q3 shape)
# ---------------------------------------------------------------------------
_shared_sql(
    "shipping_priority",
    """
    SELECT
      l_orderkey,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)

# ---------------------------------------------------------------------------
# Star join through dimension chain (broadcast-able dims) — TPC-H Q5 shape
# ---------------------------------------------------------------------------
_shared_sql(
    "region_revenue",
    """
    SELECT
      n_name,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      COUNT(*) AS line_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name
    """,
)


@register(
    "segment_topn_window",
    oracle="""
    SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal, rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey
             ) AS BIGINT) AS rn
      FROM customer
    ) t
    WHERE rn <= 5
    """,
)
def segment_topn_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 per-group top-N as a ranking window (SURVEY §2.5/2.6)."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 5)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# A6 min/max range probe — one pass over every numeric lineitem column
# ---------------------------------------------------------------------------
_shared_sql(
    "minmax_ranges",
    """
    SELECT
      ROUND(MIN(l_quantity), 2)      AS min_qty,
      ROUND(MAX(l_quantity), 2)      AS max_qty,
      ROUND(MAX(l_quantity) - MIN(l_quantity), 2) AS range_qty,
      ROUND(MIN(l_extendedprice), 2) AS min_price,
      ROUND(MAX(l_extendedprice), 2) AS max_price,
      ROUND(MAX(l_extendedprice) - MIN(l_extendedprice), 2) AS range_price,
      ROUND(MIN(l_discount), 2)      AS min_disc,
      ROUND(MAX(l_discount), 2)      AS max_disc,
      CAST(MIN(l_linenumber) AS BIGINT) AS min_linenumber,
      CAST(MAX(l_linenumber) AS BIGINT) AS max_linenumber
    FROM lineitem
    """,
)

# ---------------------------------------------------------------------------
# A7 date-granularity probe: distinct days / months / years + threshold pick
# ---------------------------------------------------------------------------
_shared_sql(
    "date_granularity_probe",
    """
    SELECT
      day_count, month_count, year_count,
      CASE
        WHEN day_count > 20 * month_count THEN 'day'
        WHEN month_count > 8 * year_count THEN 'month'
        ELSE 'year'
      END AS granularity
    FROM (
      SELECT
        COUNT(DISTINCT CAST(o_orderdate AS DATE))        AS day_count,
        COUNT(DISTINCT date_trunc('month', o_orderdate)) AS month_count,
        COUNT(DISTINCT year(o_orderdate))                AS year_count
      FROM orders
    ) t
    """,
)

# ---------------------------------------------------------------------------
# A5 distribution stats: exact percentiles, skew ratio, density
# (oracle uses quantile_cont — DuckDB's exact interpolated percentile —
#  matching Spark's `percentile`)
# ---------------------------------------------------------------------------


@register(
    "distribution_stats",
    oracle="""
    SELECT
      ROUND(quantile_cont(o_totalprice, 0.1), 4) AS p10,
      ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      ROUND(quantile_cont(o_totalprice, 0.9) / quantile_cont(o_totalprice, 0.1), 4) AS skew_ratio,
      ROUND(CAST(COUNT(DISTINCT o_totalprice) AS DOUBLE) / COUNT(*), 4) AS density,
      COUNT(DISTINCT o_totalprice) AS distinct_count,
      COUNT(*) AS total_count
    FROM orders
    """,
)
def distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    pct = F.percentile(
        F.col("o_totalprice"), F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9))
    )
    return orders.agg(
        F.round(pct[0], 4).alias("p10"),
        F.round(pct[1], 4).alias("p50"),
        F.round(pct[2], 4).alias("p90"),
        F.round(pct[2] / pct[0], 4).alias("skew_ratio"),
        F.round(
            F.count_distinct(F.col("o_totalprice")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("density"),
        F.count_distinct(F.col("o_totalprice")).alias("distinct_count"),
        F.count(F.lit(1)).alias("total_count"),
    )


# ---------------------------------------------------------------------------
# A2 cardinality profile — exact NDV per column, long format, one pass per
# table via UNION ALL (dialect-neutral)
# ---------------------------------------------------------------------------
_shared_sql(
    "cardinality_profile",
    """
    SELECT 'orders' AS table_name, 'o_custkey' AS column_name,
           COUNT(DISTINCT o_custkey) AS distinct_count FROM orders
    UNION ALL
    SELECT 'orders', 'o_orderstatus', COUNT(DISTINCT o_orderstatus) FROM orders
    UNION ALL
    SELECT 'orders', 'o_orderpriority', COUNT(DISTINCT o_orderpriority) FROM orders
    UNION ALL
    SELECT 'customer', 'c_mktsegment', COUNT(DISTINCT c_mktsegment) FROM customer
    UNION ALL
    SELECT 'customer', 'c_nationkey', COUNT(DISTINCT c_nationkey) FROM customer
    UNION ALL
    SELECT 'lineitem', 'l_returnflag', COUNT(DISTINCT l_returnflag) FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'l_partkey', COUNT(DISTINCT l_partkey) FROM lineitem
    UNION ALL
    SELECT 'events', 'event_type', COUNT(DISTINCT event_type) FROM events
    UNION ALL
    SELECT 'events', 'user_id', COUNT(DISTINCT user_id) FROM events
    """,
)

# ---------------------------------------------------------------------------
# §2.4 grouping sets — ROLLUP (absent in the reference; Spark-native)
# ---------------------------------------------------------------------------
_shared_sql(
    "rollup_returns",
    """
    SELECT
      COALESCE(l_returnflag, '(all)') AS returnflag,
      COALESCE(l_linestatus, '(all)') AS linestatus,
      COUNT(*) AS n_rows,
      ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)

# ---------------------------------------------------------------------------
# §2.7 set operations — INTERSECT / EXCEPT
# ---------------------------------------------------------------------------
_shared_sql(
    "set_ops_customers",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_acctbal < 0.0
    """,
)


@register(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority LIKE '1%'
    )
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — customers with no URGENT order.
    (The unfiltered variant is empty at every sf — the synthetic data is
    dense — which would make the hash check trivially true.)"""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").startswith("1")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "semi_join_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
      SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey
    )
    """,
)
def semi_join_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — suppliers that ship at least one line."""
    supplier = _t(spark, sf_dir, "supplier")
    lineitem = _t(spark, sf_dir, "lineitem")
    return supplier.join(
        lineitem, supplier.s_suppkey == lineitem.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# §2.8 scalar functions — string / math / conditional projection
# ---------------------------------------------------------------------------
_shared_sql(
    "scalar_functions",
    """
    SELECT
      p_partkey,
      UPPER(p_brand)                              AS brand_upper,
      CAST(LENGTH(p_name) AS BIGINT)              AS name_len,
      ROUND(p_retailprice * 1.1, 2)               AS uplifted_price,
      SUBSTR(p_type, 1, 5)                        AS type_prefix,
      CASE WHEN p_size >= 25 THEN 'large'
           WHEN p_size >= 10 THEN 'medium'
           ELSE 'small' END                       AS size_band
    FROM part
    """,
)

# ---------------------------------------------------------------------------
# F3-analog date-part extraction + tumbling-window batch rollup over events
# (the batch twin of the streaming query-log tail)
# ---------------------------------------------------------------------------


@register(
    "event_hourly_rollup",
    oracle="""
    SELECT
      strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
      event_type,
      COUNT(*) AS n_events,
      ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def event_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# A9 cardinality banding (dashboard constants 8/10/7/5/2, ui/app.py:220-231)
# ---------------------------------------------------------------------------
_shared_sql(
    "cardinality_bands",
    """
    SELECT
      column_name,
      distinct_count,
      CAST(CASE
        WHEN distinct_count < 10 THEN 8
        WHEN distinct_count < 100 THEN 10
        WHEN distinct_count < 1000 THEN 7
        WHEN distinct_count < 10000 THEN 5
        ELSE 2
      END AS BIGINT) AS cardinality_score
    FROM (
      SELECT 'o_orderstatus' AS column_name,
             COUNT(DISTINCT o_orderstatus) AS distinct_count FROM orders
      UNION ALL
      SELECT 'o_custkey', COUNT(DISTINCT o_custkey) FROM orders
      UNION ALL
      SELECT 'c_mktsegment', COUNT(DISTINCT c_mktsegment) FROM customer
      UNION ALL
      SELECT 'p_brand', COUNT(DISTINCT p_brand) FROM part
      UNION ALL
      SELECT 'l_partkey', COUNT(DISTINCT l_partkey) FROM lineitem
    ) t
    """,
)

# ---------------------------------------------------------------------------
# P2-analog time filter + between predicate + group (order-priority counts)
# ---------------------------------------------------------------------------
_shared_sql(
    "priority_counts_windowed",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1994-01-01'
      AND o_orderdate < DATE '1996-01-01'
    GROUP BY o_orderpriority
    """,
)
