"""Relational-surface extensions, round 2: function families the base
inventory (SURVEY §2.4/§2.5/§2.8) did not yet exercise end-to-end —
full-outer joins, window frames (ntile/percent_rank/nth_value), moment
aggregates (corr/covariance/variance), boolean/filtered aggregates,
date-part kitchen sink, deterministic mode, single-pass frequency
shares, regexp functions — plus two LLM-pipeline operators: a
hash-deterministic weighted Bernoulli document sampler and per-vector
int8 embedding quantization with reconstruction-error stats.

Every query here is DuckDB-oracle hash-checked. Engine-difference notes
are inline where a naive translation would diverge (DuckDB
regexp_replace needs the 'g' flag; Spark ntile/quarter return INT vs
DuckDB BIGINT; months_between has engine-specific semantics so day
arithmetic uses datediff only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import md5_60, md5_60_sql
from ..sources import tables
from .registry import register


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — large-volume orders (HAVING over a grouped join key,
# then a 3-way join back). The aggregate feeds a key-set that Spark joins
# as a build side; no LIMIT so cross-engine tie ordering can't bite.
# ---------------------------------------------------------------------------
@register(
    "large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 220
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: who ordered the biggest orders. The HAVING key-set is
    order-count-sized (small fraction of orders), so it broadcasts as a
    semi-join build side; the main join tree stays a two-join pipeline
    on the already-shuffled l_orderkey key."""
    lineitem = tables.load_table(spark, sf_dir, "lineitem")
    orders = tables.load_table(spark, sf_dir, "orders")
    customer = tables.load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 220)
        .select("l_orderkey")
    )
    return (
        lineitem.join(big, "l_orderkey", "left_semi")
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


# ---------------------------------------------------------------------------
# FULL OUTER join — the one join type the inventory had not executed.
# Order days (1995-2001) and event days (2024) are disjoint ranges, so
# both null-sides genuinely materialize.
# ---------------------------------------------------------------------------
@register(
    "full_outer_daily_activity",
    oracle="""
    WITH od AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ), ev AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT COALESCE(od.day, ev.day) AS day,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events
    FROM od FULL OUTER JOIN ev ON od.day = ev.day
    """,
)
def full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order volume FULL OUTER daily event volume with coalesced
    keys — both inputs are pre-aggregated to day grain first, so the
    outer join runs over two dimension-sized sides, never over raw
    fact rows."""
    orders = tables.load_table(spark, sf_dir, "orders")
    events = tables.load_table(spark, sf_dir, "events")
    od = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    ev = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        od.join(ev, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Window frames — ntile / percent_rank / nth_value / last_value with an
# explicit ROWS frame (frame defaults differ across engines, so both
# sides pin UNBOUNDED PRECEDING .. UNBOUNDED FOLLOWING).
# ---------------------------------------------------------------------------
@register(
    "window_frame_suite",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER w_ord AS BIGINT) AS balance_quartile,
           ROUND(PERCENT_RANK() OVER w_ord, 6) AS balance_pct_rank,
           ROUND(NTH_VALUE(c_acctbal, 2) OVER w_full, 2) AS second_lowest_bal,
           ROUND(LAST_VALUE(c_acctbal) OVER w_full, 2) AS max_bal
    FROM customer
    WHERE c_custkey < 400
    WINDOW
      w_ord AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
      w_full AS (
        PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      )
    """,
)
def window_frame_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles, percent_rank, nth_value and last_value over a
    pinned full-partition ROWS frame; ordering is total (balance, key)
    so every rank is deterministic."""
    customer = tables.load_table(spark, sf_dir, "customer")
    w_ord = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_full = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return customer.where(F.col("c_custkey") < 400).select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w_ord).cast("bigint").alias("balance_quartile"),
        F.round(F.percent_rank().over(w_ord), 6).alias("balance_pct_rank"),
        F.round(F.nth_value("c_acctbal", 2).over(w_full), 2).alias(
            "second_lowest_bal"
        ),
        F.round(F.last("c_acctbal").over(w_full), 2).alias("max_bal"),
    )


# ---------------------------------------------------------------------------
# Moment aggregates — corr / covar / variance family (A5-adjacent:
# skew detection generalized to second-moment statistics). Price is
# scaled to thousands so 4-digit rounding sits far above accumulated
# float error in either engine's one-pass moment formulas.
# ---------------------------------------------------------------------------
@register(
    "stat_moments_suite",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           ROUND(corr(l_quantity, l_extendedprice / 1000.0), 4) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice / 1000.0), 4) AS qty_price_covar,
           ROUND(covar_pop(l_quantity, l_extendedprice / 1000.0), 4) AS qty_price_covar_pop,
           ROUND(var_samp(l_quantity), 4) AS qty_var,
           ROUND(var_pop(l_quantity), 4) AS qty_var_pop,
           ROUND(stddev_samp(l_quantity), 4) AS qty_sd
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stat_moments_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped second-moment statistics, all JVM-side partial-merge
    aggregates (one shuffle of constant-size state per group)."""
    lineitem = tables.load_table(spark, sf_dir, "lineitem")
    price_k = F.col("l_extendedprice") / 1000.0
    qty = F.col("l_quantity")
    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.corr(qty, price_k), 4).alias("qty_price_corr"),
        F.round(F.covar_samp(qty, price_k), 4).alias("qty_price_covar"),
        F.round(F.covar_pop(qty, price_k), 4).alias("qty_price_covar_pop"),
        F.round(F.var_samp(qty), 4).alias("qty_var"),
        F.round(F.var_pop(qty), 4).alias("qty_var_pop"),
        F.round(F.stddev_samp(qty), 4).alias("qty_sd"),
    )


# ---------------------------------------------------------------------------
# Boolean + filtered aggregates (every/any/count-if). The oracle spells
# count_if as COUNT(*) FILTER — identical semantics, portable SQL.
# ---------------------------------------------------------------------------
@register(
    "grouped_bool_aggregates",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_orderstatus = 'F')   AS any_finished,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
             AS n_open,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000.0) AS BIGINT)
             AS n_large
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def grouped_bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or / count_if — the predicate-aggregate family."""
    orders = tables.load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
        F.count_if(F.col("o_totalprice") > 150000.0).alias("n_large"),
    )


# ---------------------------------------------------------------------------
# Date-part kitchen sink (F3 family widened): quarter / last_day /
# dayofyear / datediff. months_between is deliberately absent — Spark
# and ANSI engines disagree on its fractional semantics, so interval
# arithmetic here is day-based only.
# ---------------------------------------------------------------------------
@register(
    "date_functions_suite",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           COUNT(*) AS n_orders,
           MIN(last_day(CAST(o_orderdate AS DATE))) AS first_month_end,
           CAST(MAX(dayofyear(o_orderdate)) AS BIGINT) AS max_day_of_year,
           CAST(MAX(datediff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE))) AS BIGINT)
             AS max_days_since_1995
    FROM orders
    GROUP BY 1, 2
    """,
)
def date_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (year, quarter): last_day / dayofyear / datediff rollups."""
    orders = tables.load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.last_day(d)).alias("first_month_end"),
            F.max(F.dayofyear(d)).cast("bigint").alias("max_day_of_year"),
            F.max(F.datediff(d, F.lit("1995-01-01").cast("date")))
            .cast("bigint")
            .alias("max_days_since_1995"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic MODE — native mode() tiebreak is engine-defined, so the
# portable form is count + rank with an explicit (count DESC, value)
# total order. Same shape as the reference's "most common value" needs.
# ---------------------------------------------------------------------------
@register(
    "mode_per_segment",
    oracle="""
    SELECT c_mktsegment, c_nationkey AS modal_nation, n AS n_customers
    FROM (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY COUNT(*) DESC, c_nationkey
             ) AS rk
      FROM customer
      GROUP BY c_mktsegment, c_nationkey
    ) t WHERE rk = 1
    """,
)
def mode_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent nation per market segment with a deterministic
    tiebreak (smallest key wins) — count-then-rank, no native mode()."""
    customer = tables.load_table(spark, sf_dir, "customer")
    counts = customer.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), "c_nationkey"
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("modal_nation"),
            F.col("n").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# Single-pass frequency shares (heavy-hitter detection). The global
# total rides in via a 1-row crossJoin — never Window.partitionBy()
# (a single-task funnel at scale).
# ---------------------------------------------------------------------------
@register(
    "event_type_share",
    oracle="""
    WITH c AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1
    ), t AS (SELECT SUM(n) AS total FROM c)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS share,
           CAST(n AS DOUBLE) / total >= 0.2 AS is_heavy
    FROM c, t
    """,
)
def event_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency share per event type against a broadcast 1-row total;
    the heavy-hitter flag compares unrounded doubles, which both engines
    derive from the same two integers — bit-identical."""
    events = tables.load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    share = F.col("n").cast("double") / F.col("total")
    return counts.crossJoin(F.broadcast(total)).select(
        "event_type",
        "n",
        F.round(share, 6).alias("share"),
        (share >= 0.2).alias("is_heavy"),
    )


# ---------------------------------------------------------------------------
# Regexp function family — extract / replace-all / split. DuckDB's
# regexp_replace is first-match-only by default, so the oracle passes
# the 'g' flag to match Spark's replace-all semantics.
# ---------------------------------------------------------------------------
@register(
    "regexp_functions_suite",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT)
             AS extracted_id,
           regexp_replace(c_name, '0+', '', 'g') AS name_dezeroed,
           CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_name_parts,
           regexp_matches(c_name, '#0{3}') AS has_triple_zero
    FROM customer
    WHERE c_custkey < 500
    """,
)
def regexp_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / split / rlike over c_name."""
    customer = tables.load_table(spark, sf_dir, "customer")
    return customer.where(F.col("c_custkey") < 500).select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1)
        .cast("bigint")
        .alias("extracted_id"),
        F.regexp_replace("c_name", "0+", "").alias("name_dezeroed"),
        F.size(F.split("c_name", "#")).cast("bigint").alias("n_name_parts"),
        F.col("c_name").rlike("#0{3}").alias("has_triple_zero"),
    )


# ---------------------------------------------------------------------------
# LLM-pipeline: hash-deterministic weighted Bernoulli sampling.
# Longer documents get proportionally higher keep probability (quality-
# weighted corpus downsampling); membership is a pure function of
# doc_id, so it survives re-partitioning, retries and backfills.
# ---------------------------------------------------------------------------
_WSAMPLE_SALT = "wsample"
_U60 = float(1 << 60)


@register(
    "weighted_bernoulli_sample",
    oracle=f"""
    WITH scored AS (
      SELECT lang, n_chars,
             {md5_60_sql(f"concat_ws('|', '{_WSAMPLE_SALT}', CAST(doc_id AS VARCHAR))")}
               / {_U60!r} AS u01,
             LEAST(n_chars, 400) / 400.0 AS keep_p
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) FILTER (WHERE u01 < keep_p) AS BIGINT) AS n_kept,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COALESCE(SUM(n_chars) FILTER (WHERE u01 < keep_p), 0) AS BIGINT)
             AS kept_chars
    FROM scored
    GROUP BY lang
    """,
)
def weighted_bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional document sampling without RNG: keep a doc when
    hash-uniform(doc_id) < min(n_chars,400)/400. Both engines derive the
    uniform from the same md5-60 integer, so the kept set is identical —
    the hash check proves the sampler is deterministic, not just
    statistically similar."""
    docs = tables.load_table(spark, sf_dir, "documents")
    u01 = md5_60(
        F.concat_ws("|", F.lit(_WSAMPLE_SALT), F.col("doc_id").cast("string"))
    ) / F.lit(_U60)
    keep_p = F.least(F.col("n_chars"), F.lit(400)) / 400.0
    kept = u01 < keep_p
    return docs.groupBy("lang").agg(
        F.count_if(kept).alias("n_kept"),
        F.count(F.lit(1)).alias("n_total"),
        F.coalesce(F.sum(F.when(kept, F.col("n_chars"))), F.lit(0)).alias(
            "kept_chars"
        ),
    )


# ---------------------------------------------------------------------------
# LLM-pipeline: per-vector symmetric int8 quantization of embeddings +
# reconstruction error — the storage-shrink step before ANN indexing.
# Pure array expressions (transform/aggregate), no UDF; max() folds are
# order-independent so float results are bit-stable across engines.
# ---------------------------------------------------------------------------
@register(
    "embedding_quantization_stats",
    oracle="""
    WITH scaled AS (
      SELECT vec_id, label,
             CAST(len(embedding) AS BIGINT) AS n_dims,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      FROM embeddings
    )
    SELECT s.vec_id, s.label, s.n_dims,
           ROUND(s.scale, 6) AS scale,
           ROUND(list_max(list_transform(e.embedding,
             x -> abs(CAST(x AS DOUBLE)
                      - GREATEST(LEAST(round(CAST(x AS DOUBLE) / s.scale),
                                       127.0), -127.0) * s.scale))), 6)
             AS max_abs_err
    FROM scaled s JOIN embeddings e USING (vec_id)
    """,
)
def embedding_quantization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization: scale = max|x|/127 per vector,
    q = clamp(round(x/scale)), error = max|x - q*scale|. One projection,
    no shuffle — at 100 TB this is a map-only pass that cuts embedding
    storage 4x before any index build."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    scale = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(xd(x))),
    ) / F.lit(127.0)
    # the raw scale keeps a distinct name end-to-end: aliasing the
    # ROUNDED output to "scale" in the same projection that computes the
    # error would shadow the reference inside the fold lambda and
    # silently quantize against the 6-digit scale
    with_scale = emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("n_dims"),
        scale.alias("scale_raw"),
        "embedding",
    )
    err = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: F.greatest(
            acc,
            F.abs(
                xd(x)
                - F.greatest(
                    F.least(
                        F.round(xd(x) / F.col("scale_raw")), F.lit(127.0)
                    ),
                    F.lit(-127.0),
                )
                * F.col("scale_raw")
            ),
        ),
    )
    return with_scale.select(
        "vec_id",
        "label",
        "n_dims",
        F.round("scale_raw", 6).alias("scale"),
        F.round(err, 6).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# Audience overlap — exact set-intersection analytics across segments
# (the query pattern HLL-sketch unions approximate; this is the exact
# twin, expressed as distinct-pair self-join + per-set sizes).
# ---------------------------------------------------------------------------
@register(
    "event_type_user_overlap",
    oracle="""
    WITH e AS (SELECT DISTINCT user_id, event_type FROM events),
    sizes AS (SELECT event_type, COUNT(*) AS n FROM e GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           ROUND(p.n_both / CAST(sa.n + sb.n - p.n_both AS DOUBLE), 6)
             AS user_jaccard
    FROM pairs p
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    """,
)
def event_type_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: distinct-user
    intersection sizes and Jaccard similarity of the user sets. The
    distinct (user, type) projection shuffles once; the pair join fans
    out per user (bounded by |types| per user), never |users|² — the
    exact-set twin of HLL-union overlap estimation."""
    events = tables.load_table(spark, sf_dir, "events")
    e = events.select("user_id", "event_type").distinct()
    a = e.select("user_id", F.col("event_type").alias("type_a"))
    b = e.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sizes = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double"),
                6,
            ).alias("user_jaccard"),
        )
    )
