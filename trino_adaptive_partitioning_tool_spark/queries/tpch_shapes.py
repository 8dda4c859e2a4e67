"""Classic TPC-H query shapes adapted to the testdata schema (columns the
synthetic tables lack — shipmode, phone, commitdate — are mapped to the
nearest available column; the OPERATOR shape is what's exercised).

All shared-dialect: the same SQL text runs on Spark and DuckDB.
"""

from __future__ import annotations

from .core_sql import _shared_sql

# Q4 shape: EXISTS-correlated date-window count
_shared_sql(
    "late_ship_priority_counts",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1994-01-01'
      AND o.o_orderdate < DATE '1995-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)

# Q12 shape: two-channel CASE aggregation over a join
_shared_sql(
    "priority_shipping_channels",
    """
    SELECT
      l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1994-01-01'
      AND l_shipdate < DATE '1995-01-01'
    GROUP BY l_linestatus
    """,
)

# Q15 shape: CTE revenue view + max-revenue supplier join-back
_shared_sql(
    "top_revenue_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01'
        AND l_shipdate < DATE '1996-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)

# Q19 shape: disjunction of conjunctive range predicates across a join
_shared_sql(
    "disjunctive_predicate_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE
      (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity >= 1 AND l_quantity <= 20)
      OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        AND l_quantity >= 10 AND l_quantity <= 40)
      OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)

# Q22 shape: substring bucketing + uncorrelated avg subquery + anti-EXISTS
_shared_sql(
    "idle_wealthy_customers",
    """
    SELECT
      SUBSTR(c_name, 1, 10) AS name_bucket,
      COUNT(*) AS numcust,
      ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority LIKE '1%'
      )
    GROUP BY SUBSTR(c_name, 1, 10)
    """,
)
