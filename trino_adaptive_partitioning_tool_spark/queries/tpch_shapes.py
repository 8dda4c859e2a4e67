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

# Q2 shape: correlated scalar MIN subquery choosing the best supplier row
_shared_sql(
    "min_acctbal_supplier_per_part",
    """
    SELECT DISTINCT p_partkey, p_name, s_name,
           s_acctbal AS supplier_acctbal
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size = 10
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM supplier s2
        JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
        WHERE l2.l_partkey = p_partkey
      )
    """,
)

# Q7 shape: bilateral volume shipping between two nations by year
_shared_sql(
    "volume_shipping_bilateral",
    """
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)

# Q8 shape: one nation's share of regional revenue by order year (share
# reported as rounded numerator/denominator pairs — cross-engine ratio
# rounding at tie boundaries is not hash-stable)
_shared_sql(
    "nation_market_share",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0.0 END), 2)
             AS nation_volume,
           ROUND(SUM(volume), 2) AS total_volume
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
)

# Q9 shape: product profit by supplier nation and year (supply cost
# proxied from p_retailprice — the synthetic schema has no partsupp)
_shared_sql(
    "product_profit_by_nation_year",
    """
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)

# Q10 shape: returned-item revenue ranking (group on customer, top 20).
# Revenue reported in whole units: at sf0.01 one customer's sum lands on a
# .005 boundary where engine-dependent addition order flips a 2-digit
# round (cross-engine hash instability).
_shared_sql(
    "returned_item_revenue_topk",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS BIGINT)
             AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)

# Q11 shape: value concentration — groups exceeding a global-scalar
# threshold (HAVING against an uncorrelated aggregate subquery)
_shared_sql(
    "part_value_concentration",
    """
    WITH part_value AS (
      SELECT l_partkey, SUM(l_extendedprice) AS part_value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(part_value, 2) AS part_value
    FROM part_value
    WHERE part_value > (SELECT SUM(part_value) * 0.002 FROM part_value)
    """,
)

# Q13 shape: distribution of per-customer order counts (left outer join
# with a join-side filter, two-level aggregation)
_shared_sql(
    "customer_order_count_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)

# Q14 shape: promo revenue vs total over a month window (CASE-gated sum;
# reported as rounded numerator/denominator, not a ratio)
_shared_sql(
    "promo_revenue_share",
    """
    SELECT
      ROUND(SUM(CASE WHEN p_type = 'PROMO'
                THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2)
        AS promo_revenue,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1997-02-01'
    """,
)

# Q16 shape: supplier variety per part attribute, NOT IN exclusion +
# COUNT(DISTINCT)
_shared_sql(
    "part_supplier_variety",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)

# Q20 shape: nested IN over a grouped-HAVING inner query (suppliers who
# shipped bulk volume of a part family)
_shared_sql(
    "bulk_suppliers_for_part_family",
    """
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%anvil%'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 500.0
    )
    ORDER BY s_name
    """,
)

# Q21 shape: the only-late-supplier-in-a-multi-supplier-order hunt
# (EXISTS + NOT EXISTS, both correlated through the outer order AND the
# outer lineitem's supplier)
_shared_sql(
    "multi_supplier_late_orders",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)

# Q6 shape: the classic fully-pushable selective-predicate aggregate (no
# join, no group — predicate pushdown + map-side partial sum is the whole
# query)
_shared_sql(
    "simple_predicate_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
)

# histogram shape: fixed-width value bucketing (width_bucket analog via
# FLOOR + LEAST clamp) — the binning behind dashboard score histograms
# (reference ui/app.py:416-421)
_shared_sql(
    "order_price_histogram",
    """
    SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(o_totalprice), 0) AS BIGINT) AS bucket_value
    FROM orders
    GROUP BY CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9.0) AS BIGINT)
    """,
)
