"""Advanced relational operators (SURVEY §2.4-2.7 gaps + Spark-native
extensions the reference lacks): full window-function suite, cube /
grouping sets, conditional & correlated aggregation, range and as-of
joins, session windows, multiset set-ops, null-safe semantics.

Shared-dialect queries run the same SQL text on Spark and DuckDB;
engine-specific ones (as-of via union-window, session_window) pair a
Spark-first implementation with an independently-written oracle — the
strongest correctness check, since the two engines compute the result by
different algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import fixtures, tables
from .core_sql import _shared_sql
from .registry import register

# ---------------------------------------------------------------------------
# §2.5 window functions: ranking, offsets, frames
# ---------------------------------------------------------------------------
_shared_sql(
    "window_functions_suite",
    """
    SELECT
      o_custkey,
      o_orderkey,
      CAST(RANK() OVER w AS BIGINT) AS price_rank,
      CAST(DENSE_RANK() OVER w AS BIGINT) AS price_dense_rank,
      ROUND(LAG(o_totalprice, 1, 0.0) OVER w2, 2) AS prev_price,
      ROUND(LEAD(o_totalprice, 1, 0.0) OVER w2, 2) AS next_price,
      ROUND(SUM(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
      ROUND(SUM(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum3
    FROM orders
    WINDOW
      w  AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
      w2 AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)

# ---------------------------------------------------------------------------
# §2.4 cube / grouping sets
# ---------------------------------------------------------------------------
_shared_sql(
    "cube_aggregation",
    """
    SELECT
      COALESCE(o_orderstatus, '(all)')   AS orderstatus,
      COALESCE(o_orderpriority, '(all)') AS orderpriority,
      COUNT(*) AS n_orders,
      ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)

_shared_sql(
    "grouping_sets_agg",
    """
    SELECT
      COALESCE(l_returnflag, '(all)') AS returnflag,
      COALESCE(l_linestatus, '(all)') AS linestatus,
      ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)

# ---------------------------------------------------------------------------
# pivot via conditional aggregation (dialect-neutral form of PIVOT)
# ---------------------------------------------------------------------------
_shared_sql(
    "pivot_status_by_priority",
    """
    SELECT
      o_orderpriority,
      COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
      ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS rev_f
    FROM orders
    GROUP BY o_orderpriority
    """,
)

# ---------------------------------------------------------------------------
# correlated scalar subquery (TPC-H Q17 shape)
# ---------------------------------------------------------------------------
_shared_sql(
    "correlated_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.5 * AVG(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    """,
)

# ---------------------------------------------------------------------------
# HAVING over grouped sum (TPC-H Q18 shape)
# ---------------------------------------------------------------------------
_shared_sql(
    "having_large_orders",
    """
    SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 250
    """,
)

# ---------------------------------------------------------------------------
# conditional aggregation share (TPC-H Q14 shape)
# ---------------------------------------------------------------------------
_shared_sql(
    "conditional_revenue_share",
    """
    SELECT ROUND(
      100.0 * SUM(CASE WHEN p_type LIKE 'SMALL%'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      / SUM(l_extendedprice * (1 - l_discount)), 4) AS small_type_share_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    """,
)

# ---------------------------------------------------------------------------
# IN (subquery) semi-filter
# ---------------------------------------------------------------------------
_shared_sql(
    "in_subquery_filter",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN (SELECT r_name FROM region ORDER BY r_name LIMIT 2)
    )
    """,
)

# ---------------------------------------------------------------------------
# range (interval) join — ship-date within 90 days of order date
# ---------------------------------------------------------------------------
_shared_sql(
    "range_interval_join",
    """
    SELECT
      o_orderpriority,
      COUNT(*) AS lines_shipped_90d,
      ROUND(SUM(l_extendedprice), 2) AS revenue_90d
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
)

# ---------------------------------------------------------------------------
# multiset set operations
# ---------------------------------------------------------------------------
_shared_sql(
    "multiset_ops",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority LIKE '1%'
    """,
)


# ---------------------------------------------------------------------------
# as-of join: for each purchase, the most recent click at-or-before it per
# user. Spark side: tagged-union + running max over one window (single
# shuffle on user_id — the scalable as-of pattern, no per-row subquery).
# Oracle: DuckDB's native ASOF JOIN — an independent algorithm.
# ---------------------------------------------------------------------------
@register(
    "asof_last_click_before_purchase",
    oracle="""
    SELECT
      p.user_id,
      epoch_us(p.ts) AS purchase_us,
      epoch_us(c.ts) AS last_click_us
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tables.load_table(spark, sf_dir, "events")
    tagged = events.where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    # clicks sort before purchases at identical ts → an equal-ts click
    # counts as "at-or-before", matching ASOF's >= semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_purchase"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_click = F.max(
        F.when(~F.col("is_purchase"), F.col("ts"))
    ).over(w)
    return (
        tagged.withColumn("last_click_ts", last_click)
        .where(F.col("is_purchase") & F.col("last_click_ts").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("purchase_us"),
            F.unix_micros("last_click_ts").alias("last_click_us"),
        )
    )


# ---------------------------------------------------------------------------
# session windows: 30-minute-gap sessionization per user.
# Spark side: native session_window aggregation (the streaming-capable
# operator, run in batch). Oracle: gaps-and-islands (lag + cumulative sum)
# — again an independent algorithm computing the same sessions.
# ---------------------------------------------------------------------------
@register(
    "sessionize_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT
      user_id,
      epoch_us(MIN(ts)) AS session_start_us,
      COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tables.load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# null-safe semantics over the fixture log (the only NULL-bearing source)
# ---------------------------------------------------------------------------
@register(
    "null_safe_aggregation",
    oracle=f"""
    WITH {fixtures.query_logs_values_cte()}
    SELECT
      COUNT(*) AS n_rows,
      COUNT(execution_time_ms) AS n_with_exec,
      CAST(COALESCE(SUM(execution_time_ms), 0) AS BIGINT) AS total_exec_ms,
      COUNT(CASE WHEN execution_time_ms IS NULL THEN 1 END) AS n_null_exec,
      CAST(SUM(CASE WHEN cpu_time_ms IS NOT DISTINCT FROM NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_null_cpu
    FROM query_logs
    """,
)
def null_safe_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs = fixtures.query_logs_df(spark)
    return logs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("execution_time_ms").alias("n_with_exec"),
        F.coalesce(F.sum("execution_time_ms"), F.lit(0)).alias("total_exec_ms"),
        F.count(
            F.when(F.col("execution_time_ms").isNull(), F.lit(1))
        ).alias("n_null_exec"),
        F.sum(
            F.when(F.col("cpu_time_ms").eqNullSafe(F.lit(None)), 1).otherwise(0)
        ).alias("n_null_cpu"),
    )


# ---------------------------------------------------------------------------
# robust central tendency: exact median + dispersion
# ---------------------------------------------------------------------------
@register(
    "json_extract_rollup",
    oracle="""
    SELECT
      event_type,
      CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
      COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column (F9 family) aggregated
    per group — get_json_object stays JVM-side, no UDF."""
    events = tables.load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "array_agg_lines",
    oracle="""
    SELECT
      l_orderkey,
      array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
      CAST(len(list(l_linenumber)) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_orderkey <= 1000
    GROUP BY l_orderkey
    """,
)
def array_agg_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_list) with deterministic ordering.

    The array is rendered as a comma-joined string: the driver's pandas
    canonicalizer cannot hash list cells (r01 TypeError), and the joined
    form hash-checks the same content."""
    lineitem = tables.load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.col("l_orderkey") <= 1000)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("line_numbers"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "string_agg_brands",
    oracle="""
    SELECT
      p_type,
      string_agg(DISTINCT p_brand, ',' ORDER BY p_brand) AS brands,
      COUNT(DISTINCT p_brand) AS n_brands
    FROM part
    GROUP BY p_type
    """,
)
def string_agg_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct string aggregation (listagg/group_concat form)."""
    part = tables.load_table(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.array_join(
            F.sort_array(F.collect_set("p_brand")), ","
        ).alias("brands"),
        F.count_distinct("p_brand").alias("n_brands"),
    )


@register(
    "pivot_api_segment_status",
    oracle="""
    SELECT
      c_mktsegment,
      CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
      CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
      CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def pivot_api_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame-API pivot (columns from data values) — the relational
    PIVOT operator; oracle is the dialect-neutral CASE form."""
    customer = tables.load_table(spark, sf_dir, "customer")
    orders = tables.load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): Spark's native unpivot/melt operator."""
    part = tables.load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "salted_group_count",
    oracle="""
    SELECT lang AS key, COUNT(*) AS count
    FROM documents
    GROUP BY lang
    """,
)
def salted_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation (salt → partial → merge) must
    be semantically IDENTICAL to the plain group-by — the oracle is the
    plain form, so the hash check proves the salting is transparent."""
    from ..operators import skew

    docs = tables.load_table(spark, sf_dir, "documents")
    return skew.salted_groupby_count(docs, "lang", n_salts=16)


@register(
    "approx_distinct_profile",
    oracle="""
    SELECT 'ndv_orders' AS metric,
           CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS value_checked
    FROM lineitem
    UNION ALL
    SELECT 'ndv_parts', CAST(COUNT(DISTINCT l_partkey) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'price_p10', ROUND(quantile_cont(l_extendedprice, 0.1), 4)
    FROM lineitem
    UNION ALL
    SELECT 'price_p50', ROUND(quantile_cont(l_extendedprice, 0.5), 4)
    FROM lineitem
    UNION ALL
    SELECT 'price_p90', ROUND(quantile_cont(l_extendedprice, 0.9), 4)
    FROM lineitem
    ORDER BY metric
    """,
)
def approx_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A5 approx variants — HLL approx_count_distinct + t-digest-style
    percentile_approx, the sketches the reference pushes to Trino
    (approx_distinct / approx_percentile, src/partitioning.py:102-121).

    Sketch internals differ across engines, so the oracle is a TOLERANCE
    gate rather than a sketch replay: each row emits the EXACT value when
    the Spark-side sketch estimate lands within ±2% of the Spark-side
    exact value, and the raw estimate (guaranteed hash mismatch) when it
    does not. The DuckDB oracle computes the exact values independently,
    so a green row proves (a) the approx sketch is within tolerance and
    (b) the exact computation matches the oracle engine."""
    lineitem = tables.load_table(spark, sf_dir, "lineitem")
    qs = [0.1, 0.5, 0.9]
    approx_pct = F.percentile_approx(
        "l_extendedprice", F.array(*[F.lit(q) for q in qs]), 10000
    )
    exact_pct = F.percentile(
        "l_extendedprice", F.array(*[F.lit(q) for q in qs])
    )
    stats = lineitem.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("a_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("a_orders"),
        F.count_distinct("l_partkey").alias("e_parts"),
        F.count_distinct("l_orderkey").alias("e_orders"),
        approx_pct.alias("a_pct"),
        exact_pct.alias("e_pct"),
    )

    def gated(approx: F.Column, exact: F.Column) -> F.Column:
        within = F.abs(approx - exact) <= 0.02 * F.abs(exact)
        return F.round(F.when(within, exact).otherwise(approx), 4)

    rows = [
        ("ndv_orders", gated(F.col("a_orders"), F.col("e_orders"))),
        ("ndv_parts", gated(F.col("a_parts"), F.col("e_parts"))),
    ] + [
        (
            f"price_p{int(q * 100)}",
            gated(F.col("a_pct")[i], F.col("e_pct")[i]),
        )
        for i, q in enumerate(qs)
    ]
    out = None
    for metric, col in rows:
        leg = stats.select(
            F.lit(metric).alias("metric"),
            col.cast("double").alias("value_checked"),
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("metric")


@register(
    "median_and_spread",
    oracle="""
    SELECT
      c_mktsegment,
      ROUND(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
      ROUND(AVG(c_acctbal), 4) AS mean_bal,
      ROUND(STDDEV_SAMP(c_acctbal), 4) AS sd_bal,
      COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def median_and_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = tables.load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median_bal"),
        F.round(F.avg("c_acctbal"), 4).alias("mean_bal"),
        F.round(F.stddev_samp("c_acctbal"), 4).alias("sd_bal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# §2.5 extension — distribution-ranking windows missing from the base
# suite: NTILE quartiles, PERCENT_RANK, CUME_DIST (exact rationals, so
# cross-engine double comparison is stable)
# ---------------------------------------------------------------------------
_shared_sql(
    "ranking_distribution_suite",
    """
    SELECT c_mktsegment, c_custkey,
      CAST(NTILE(4) OVER w AS BIGINT) AS acctbal_quartile,
      ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      ROUND(CUME_DIST() OVER w, 6) AS cume_distribution
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)

# ---------------------------------------------------------------------------
# fuzzy matching — edit-distance pairs over the distinct name domain
# (blocked self-join + levenshtein; the dedup-adjacent string operator)
# ---------------------------------------------------------------------------
_shared_sql(
    "part_name_fuzzy_pairs",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_distance
    FROM names a
    JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)


def _zorder_oracle() -> str:
    from ..operators import zorder as zo

    qx = zo.quantize_sql("l_quantity", 0.0, 50.0, 8)
    qy = zo.quantize_sql("l_extendedprice", 800.0, 110000.0, 8)
    z = zo.interleave2_sql("qx", "qy", 8)
    return f"""
    WITH cells AS (
      SELECT {qx} AS qx, {qy} AS qy, l_quantity FROM lineitem
    )
    SELECT {z} >> 8 AS zcell,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM cells
    GROUP BY 1
    """


@register("zorder_cell_stats", oracle=_zorder_oracle())
def zorder_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-cell rollup of lineitem over (l_quantity, l_extendedprice):
    quantize both dims to 8-bit cells, interleave to a 16-bit z-value,
    aggregate per coarse cell (z >> 8). Hash-equality with the DuckDB
    twin proves the bit-interleave layout math is portable — the same
    z-values drive zorder_write's file clustering (operators/zorder.py,
    tests/test_zorder.py). Pure Column bit arithmetic: one shuffle, no
    UDFs, whole-stage codegen end to end."""
    from ..operators import zorder as zo

    li = tables.load_table(spark, sf_dir, "lineitem")
    z = zo.zvalue2(
        F.col("l_quantity"), 0.0, 50.0,
        F.col("l_extendedprice"), 800.0, 110000.0,
        8,
    )
    return (
        li.select(F.shiftright(z, 8).alias("zcell"), "l_quantity")
        .groupBy("zcell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Session-gap sensitivity sweep (r10): the "what-if" tuning row for the
# sessionizer — the same events sessionized under four gap configs in one
# query, so an analyst sees how session counts collapse as the gap widens
# before committing a pipeline to one number. Spark side uses the NATIVE
# session_window operator per gap; the oracle recomputes every gap with
# the independent gaps-and-islands algorithm (lag + cumulative sum) on
# integer microseconds — four configs, two algorithms, one green row.

_SESSION_GAPS_MIN = (10, 30, 60, 120)


def _gap_sensitivity_oracle() -> str:
    legs = []
    for gap in _SESSION_GAPS_MIN:
        legs.append(f"""
    SELECT {gap} AS gap_minutes, COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singleton_sessions,
           MAX(n_events) AS max_session_events,
           CAST(SUM(n_events) AS BIGINT) AS total_events
    FROM (
      SELECT user_id, session_id, COUNT(*) AS n_events FROM (
        SELECT user_id, ts,
               SUM(is_new) OVER (
                 PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                           > CAST({gap} AS BIGINT) * 60000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ) marked
      ) sessions
      GROUP BY user_id, session_id
    ) per_session""")
    return (
        "SELECT CAST(gap_minutes AS BIGINT) AS gap_minutes, n_sessions,"
        " n_singleton_sessions, max_session_events, total_events FROM (\n"
        + "\nUNION ALL\n".join(legs)
        + "\n) gaps"
    )


@register("sessionize_gap_sensitivity", oracle=_gap_sensitivity_oracle())
def sessionize_gap_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-gap sessionization stats for 10/30/60/120-minute gaps: session
    count, singleton share (as exact counts), largest session, and the
    invariant total event count (a per-gap checksum — every gap must
    account for every event exactly once).

    Scale: one native session_window aggregation per gap config —
    shuffle key (user_id) is identical across legs, and each leg's
    session collapse is the same plan the production sessionizer runs;
    the final per-gap rollup is 4 rows."""
    events = tables.load_table(spark, sf_dir, "events")
    out: DataFrame | None = None
    for gap in _SESSION_GAPS_MIN:
        sessions = events.groupBy(
            "user_id", F.session_window("ts", f"{gap} minutes").alias("w")
        ).agg(F.count(F.lit(1)).alias("n_events"))
        leg = sessions.agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_singleton_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").cast("bigint").alias("total_events"),
        ).select(
            F.lit(gap).cast("bigint").alias("gap_minutes"),
            "n_sessions",
            "n_singleton_sessions",
            "max_session_events",
            "total_events",
        )
        out = leg if out is None else out.unionByName(leg)
    assert out is not None
    return out
