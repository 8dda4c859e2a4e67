"""Time-series completion operators over the events table.

Not in the reference (its surface is partition advice); these are the
standard OLAP time-series patterns a workload-driven engine serves:
gap-filling a sparse daily rollup against a generated date spine, and
forward-filling missing values with the last observation. Both are pure
DataFrame algebra — the spine comes from `sequence()` + explode, the fill
from `last(ignorenulls=True)` over an ordered window — so they scale as
one shuffle per aggregation plus one window sort, no UDFs.

Counts use a high-value filter (value > 200) so the daily series is
genuinely sparse in the synthetic data (18-23 of 30 days per type at
sf0.01) and the fill paths do real work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import tables
from .registry import register

_VALUE_THRESHOLD = 200.0


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tables.load_table(spark, sf_dir, "events")
    return (
        events.where(F.col("value") > _VALUE_THRESHOLD)
        .groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 0).cast("bigint").alias("sum_value"),
        )
    )


def _spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day) for every type x every day in the observed range
    — the date spine is data-driven (min/max of the filtered stream), so
    the same query works at any scale factor."""
    counts = _daily_counts(spark, sf_dir)
    bounds = counts.agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    days = bounds.select(
        F.explode(F.sequence("mn", "mx")).alias("day")
    )
    types = counts.select("event_type").distinct()
    # both sides are dimension-sized; the cross join output is
    # |types| x |days| — still dimension-sized
    return types.crossJoin(days)


@register(
    "daily_gap_fill",
    oracle="""
    WITH counts AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n_events,
             CAST(ROUND(SUM(value), 0) AS BIGINT) AS sum_value
      FROM events WHERE value > 200.0
      GROUP BY event_type, CAST(ts AS DATE)
    ), bounds AS (
      SELECT MIN(day) AS mn, MAX(day) AS mx FROM counts
    ), spine AS (
      SELECT t.event_type, CAST(d.day AS DATE) AS day
      FROM (SELECT DISTINCT event_type FROM counts) t
      CROSS JOIN (
        SELECT UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
        FROM bounds
      ) d
    )
    SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(c.sum_value, 0) AS BIGINT) AS sum_value
    FROM spine s
    LEFT JOIN counts c ON s.event_type = c.event_type AND s.day = c.day
    """,
)
def daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily rollup: generated date spine left-joined to the sparse
    counts, absent days filled with zero."""
    counts = _daily_counts(spark, sf_dir)
    spine = _spine(spark, sf_dir)
    return spine.join(counts, ["event_type", "day"], "left").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0)).alias("sum_value"),
    )


@register(
    "forward_fill_daily_value",
    oracle="""
    WITH counts AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value), 0) AS BIGINT) AS sum_value
      FROM events WHERE value > 200.0
      GROUP BY event_type, CAST(ts AS DATE)
    ), bounds AS (
      SELECT MIN(day) AS mn, MAX(day) AS mx FROM counts
    ), spine AS (
      SELECT t.event_type, CAST(d.day AS DATE) AS day
      FROM (SELECT DISTINCT event_type FROM counts) t
      CROSS JOIN (
        SELECT UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
        FROM bounds
      ) d
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(last_value(sum_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS filled_value
    FROM spine
    LEFT JOIN counts USING (event_type, day)
    """,
)
def forward_fill_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over the gap-filled spine
    (`last(ignorenulls=True)` ordered window; leading gaps stay NULL)."""
    counts = _daily_counts(spark, sf_dir).drop("n_events")
    spine = _spine(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(counts, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@register(
    "user_value_trend",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(regr_slope(value, epoch_us(ts) / 86400000000.0), 4)
             AS slope_per_day,
           ROUND(corr(value, epoch_us(ts) / 86400000000.0), 4)
             AS value_time_corr
    FROM events
    WHERE user_id < 50
    GROUP BY user_id
    HAVING COUNT(*) >= 3
    """,
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of event value over time, entirely
    with JVM-side moment aggregates (slope = covar_pop/var_pop) — the
    no-UDF form of grouped regression; DuckDB's native regr_slope is an
    independent oracle. Time comes from exact microseconds (Spark
    unix_timestamp would truncate to seconds while DuckDB epoch() keeps
    fractions) scaled to days, so slopes are O(1) and 4-digit rounding
    is stable."""
    events = tables.load_table(spark, sf_dir, "events")
    x = F.unix_micros("ts") / 86400000000.0
    df = events.where(F.col("user_id") < 50).select(
        "user_id", F.col("value").alias("y"), x.alias("x")
    )
    return (
        df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.covar_pop("y", "x").alias("cxy"),
            F.var_pop("x").alias("vx"),
            F.corr("y", "x").alias("r"),
        )
        .where(F.col("n_events") >= 3)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("cxy") / F.col("vx"), 4).alias("slope_per_day"),
            F.round("r", 4).alias("value_time_corr"),
        )
    )


@register(
    "rolling_7day_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority,
             CAST(o_orderdate AS DATE) AS day,
             ROUND(SUM(o_totalprice), 2) AS day_rev
      FROM orders
      GROUP BY 1, 2
    )
    SELECT o_orderpriority, day,
      ROUND(SUM(day_rev) OVER w, 2) AS rev_7d,
      CAST(COUNT(*) OVER w AS BIGINT) AS days_in_window
    FROM daily
    WINDOW w AS (
      PARTITION BY o_orderpriority
      ORDER BY datediff('day', DATE '1992-01-01', day)
      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
    )
    """,
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue per order priority with a RANGE frame over
    epoch-day offsets — the range frame closes over calendar gaps (a
    missing day still ages out of the window), which a ROWS frame gets
    wrong on sparse series. One shuffle for the daily rollup, one window
    sort per priority partition; at scale the partition key fans out and
    the frame is O(1) running state per partition."""
    orders = tables.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("day_rev"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.datediff(F.col("day"), F.lit("1992-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "o_orderpriority",
        "day",
        F.round(F.sum("day_rev").over(w), 2).alias("rev_7d"),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


@register(
    "user_retention_cohorts",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events WHERE ts IS NOT NULL
    ),
    cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size
      FROM cohort GROUP BY cohort_week
    ),
    joined AS (
      SELECT c.cohort_week,
             CAST(datediff('day', c.cohort_week, a.week) / 7 AS BIGINT)
               AS week_offset,
             a.user_id
      FROM act a JOIN cohort c USING (user_id)
    )
    SELECT j.cohort_week,
           j.week_offset,
           CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(ROUND(CAST(COUNT(DISTINCT j.user_id)
                 / CAST(s.cohort_size AS DOUBLE) AS VARCHAR)::DECIMAL(38,12), 6)
                AS DOUBLE) AS retention_rate
    FROM joined j JOIN sizes s USING (cohort_week)
    GROUP BY j.cohort_week, j.week_offset, s.cohort_size
    ORDER BY j.cohort_week, j.week_offset
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events table: users cohorted by
    their first active week (Monday-truncated on both engines), then
    per (cohort, week-offset) the share of the cohort still active —
    the standard product-analytics retention triangle, as two
    aggregations plus an equi-join on user_id (no window, no UDF).
    Retention is a single IEEE division rounded to 6dp, so the oracle
    hash-matches exactly."""
    events = tables.load_table(spark, sf_dir, "events")
    act = (
        events.where(F.col("ts").isNotNull())
        .select(
            "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
        )
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = act.join(cohort, "user_id").select(
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("bigint")
        .alias("week_offset"),
        "user_id",
    )
    return (
        joined.join(sizes, "cohort_week")
        .groupBy("cohort_week", "week_offset", "cohort_size")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention_rate"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "event_funnel_conversion",
    oracle="""
    WITH u AS (SELECT COUNT(DISTINCT user_id) AS n FROM events),
    v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT (SELECT n FROM u) AS n0,
             (SELECT COUNT(*) FROM v) AS n1,
             (SELECT COUNT(*) FROM c) AS n2,
             (SELECT COUNT(*) FROM p) AS n3
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS step_idx, 'any_event' AS step,
             CAST(n0 AS BIGINT) AS n_users, CAST(1.0 AS DOUBLE)
               AS conversion_rate FROM counts
      UNION ALL
      SELECT 1, 'view', CAST(n1 AS BIGINT),
             CAST(ROUND(CAST(n1 / CAST(n0 AS DOUBLE) AS VARCHAR)::DECIMAL(38,12), 6) AS DOUBLE) FROM counts
      UNION ALL
      SELECT 2, 'click_after_view', CAST(n2 AS BIGINT),
             CAST(ROUND(CAST(n2 / CAST(n1 AS DOUBLE) AS VARCHAR)::DECIMAL(38,12), 6) AS DOUBLE) FROM counts
      UNION ALL
      SELECT 3, 'purchase_after_click', CAST(n3 AS BIGINT),
             CAST(ROUND(CAST(n3 / CAST(n2 AS DOUBLE) AS VARCHAR)::DECIMAL(38,12), 6) AS DOUBLE) FROM counts
    ) f ORDER BY step_idx
    """,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click → purchase) with
    sequential-first-occurrence semantics: a step counts only when it
    happens at or after the user's qualifying previous step. Three
    filtered min-aggregations chained by equi-joins on user_id — the
    time-ordering constraint rides in the join predicate, no window and
    no per-user state. Step counts cross-join into one 4-row report
    with per-step conversion rates (single IEEE divisions, 6dp)."""
    events = tables.load_table(spark, sf_dir, "events")
    n0 = events.agg(F.count_distinct("user_id").alias("n0"))
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        n0.crossJoin(v.agg(F.count(F.lit(1)).alias("n1")))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n3")))
    )
    return counts.select(
        F.expr(
            "stack(4, "
            "CAST(0 AS BIGINT), 'any_event', CAST(n0 AS BIGINT), "
            "CAST(1.0 AS DOUBLE), "
            "CAST(1 AS BIGINT), 'view', CAST(n1 AS BIGINT), "
            "CAST(ROUND(n1 / CAST(n0 AS DOUBLE), 6) AS DOUBLE), "
            "CAST(2 AS BIGINT), 'click_after_view', CAST(n2 AS BIGINT), "
            "CAST(ROUND(n2 / CAST(n1 AS DOUBLE), 6) AS DOUBLE), "
            "CAST(3 AS BIGINT), 'purchase_after_click', CAST(n3 AS BIGINT), "
            "CAST(ROUND(n3 / CAST(n2 AS DOUBLE), 6) AS DOUBLE)"
            ") AS (step_idx, step, n_users, conversion_rate)"
        )
    ).orderBy("step_idx")
