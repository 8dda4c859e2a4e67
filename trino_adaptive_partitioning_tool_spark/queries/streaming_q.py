"""Structured Streaming queries surfaced through the driver contract.

Each call provisions a fresh file-stream source from the deterministic
fixture log, drains it with an availableNow trigger, and returns the
materialized result — a real streaming execution (watermark, windowed
state), not a batch rewrite. rows-only checks: the stream==batch
equivalence is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..sources import fixtures
from ..streaming import query_log_stream as qls
from .multimodal import MIXED_CORPUS_ORACLE
from .registry import register


# Session-cached streaming feed directories: feed CONTENTS are a pure
# function of (sf_dir, variant), and each streaming query runs several
# times per session (digest fold + direct row + parity tests), so the
# feed is written once per session. Checkpoint dirs are NEVER cached —
# a reused checkpoint replays committed offsets and drains nothing.
_FEED_CACHE: dict[tuple, str] = {}


def _memo_feed(spark: SparkSession, variant: str, sf_dir: str, write) -> str:
    key = (spark.sparkContext.applicationId, sf_dir, variant)
    if key not in _FEED_CACHE:
        tmp = tempfile.mkdtemp(prefix=f"tapt_feed_{variant}_")
        write(tmp)
        _FEED_CACHE[key] = tmp
    return _FEED_CACHE[key]


def _fresh_ckpt() -> str:
    return tempfile.mkdtemp(prefix="tapt_ckpt_") + "/ckpt"


def _ensure_outer_feed(spark: SparkSession, sf_dir: str) -> str:
    """Click/purchase feed plus two far-future SENTINEL events (one per
    side, disjoint negative user ids, 10 days past the real maximum).
    Outer/full stream-stream joins only emit unmatched rows once the
    watermark proves no match can still arrive; the sentinels push the
    global watermark (the min of both sides') past every real row's join
    window, making the emitted set equal the batch outer join exactly —
    independent of the engine's internal eviction-boundary arithmetic.
    The sentinels themselves never emit (their own windows never close)
    and consumers filter user_id >= 0 defensively."""
    from pyspark.sql import functions as F

    from ..sources import tables

    def _write(d: str) -> None:
        ev = tables.load_table(spark, sf_dir, "events").where(
            "event_type IN ('click', 'purchase')"
        )
        far = ev.agg(
            (F.max("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts")
        )
        sentinels = far.selectExpr(
            "stack(2, "
            "CAST(-1 AS BIGINT), ts, CAST(-1 AS BIGINT), 'click', "
            "CAST(0.0 AS DOUBLE), CAST(NULL AS STRING), "
            "CAST(-2 AS BIGINT), ts, CAST(-2 AS BIGINT), 'purchase', "
            "CAST(0.0 AS DOUBLE), CAST(NULL AS STRING)) "
            "AS (event_id, ts, user_id, event_type, value, props)"
        )
        ev.unionByName(sentinels).coalesce(4).write.mode(
            "overwrite"
        ).json(f"{d}/events")

    return _memo_feed(spark, "clickpurchase_outer", sf_dir, _write)


def _assert_single_batch(feed_subdir: str) -> None:
    """The click-attribution and dedup oracles are deterministic only
    when the whole feed drains in ONE availableNow micro-batch (see
    stream_join.MAX_FILES_PER_TRIGGER). The feed writers coalesce(4),
    so this holds with a wide margin — but the two constants live in
    different modules, so pin the invariant where the feed is built."""
    import os

    from ..streaming.stream_join import MAX_FILES_PER_TRIGGER

    n = len(
        [f for f in os.listdir(feed_subdir) if f.endswith(".json")]
    )
    assert 0 < n <= MAX_FILES_PER_TRIGGER, (
        f"feed {feed_subdir} has {n} files > maxFilesPerTrigger="
        f"{MAX_FILES_PER_TRIGGER}: the availableNow drain would be "
        "multi-batch and the single-batch streaming oracles unsound"
    )


def _drain(spark: SparkSession, build) -> DataFrame:
    tmp = _memo_feed(
        spark, "logs", "fixture",
        lambda d: fixtures.query_logs_df(spark)
        .coalesce(2)
        .write.mode("overwrite")
        .json(f"{d}/logs"),
    )
    stream = qls.stream_query_logs(spark, f"{tmp}/logs")
    name = f"stream_q_{uuid.uuid4().hex[:8]}"
    return qls.run_available_now(build(stream), name, _fresh_ckpt())


@register(
    "streaming_window_rollup",
    oracle=f"""
    WITH {fixtures.query_logs_values_cte()}
    SELECT
      -- DuckDB date_trunc('day') yields DATE; cast back so the VARCHAR
      -- rendering matches Spark's timestamp ('... 00:00:00')
      CAST(date_trunc('day', create_time) AS TIMESTAMP) AS window_start,
      date_trunc('day', create_time) + INTERVAL 1 DAY AS window_end,
      COUNT(*) AS query_count,
      SUM(execution_time_ms) AS total_exec_ms,
      MAX(execution_time_ms) AS max_exec_ms,
      SUM(input_bytes) AS total_input_bytes
    FROM query_logs
    WHERE create_time IS NOT NULL
    GROUP BY 1, 2
    ORDER BY window_start
    """,
)
def streaming_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window resource rollup executed as a stream.

    A complete-mode availableNow drain of a static fixture directory is
    deterministic, and 1-day tumbling windows under the UTC session
    align with calendar days — so unlike the other streaming rows this
    one carries a full DuckDB oracle (date_trunc twin): the hash check
    proves stream == SQL, not just stream == batch."""
    return _drain(
        spark, lambda s: qls.windowed_resource_rollup(s, "1 day", "2 days")
    ).orderBy("window_start")


@register(
    "streaming_interactive_share",
    oracle=f"""
    WITH {fixtures.query_logs_values_cte()}
    SELECT
      CAST(date_trunc('day', create_time) AS TIMESTAMP) AS window_start,
      (COALESCE(execution_time_ms < 10000, FALSE)
       OR upper(query) LIKE '%LIMIT%') AS is_interactive,
      COUNT(*) AS query_count
    FROM query_logs
    WHERE create_time IS NOT NULL
    GROUP BY 1, 2
    ORDER BY window_start, is_interactive
    """,
)
def streaming_interactive_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive-vs-batch share per window, executed as a stream.

    Same determinism argument as streaming_window_rollup (complete-mode
    availableNow drain of a static fixture, UTC day windows), so it
    carries a full DuckDB oracle replaying the reference's 10s/LIMIT
    classification heuristic per day window."""
    return _drain(
        spark, lambda s: qls.interactive_share_stream(s, "1 day", "2 days")
    ).orderBy("window_start", "is_interactive")


@register(
    "streaming_stateful_user_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(COALESCE(value, 0.0)), 4) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): cross-batch
    per-user running totals kept in managed executor state, drained with
    an availableNow trigger.

    Full oracle (r5): the FINAL state per user is slicing-invariant — no
    matter how the feed micro-batches, the last emitted (n_events,
    total_value) per user equals the batch aggregate over all events —
    and the rn=1 extraction below selects exactly that final row, so the
    result is deterministic and SQL-expressible. The state operator
    emits the RAW running total; rounding happens here with F.round
    (HALF_UP, the same convention DuckDB's ROUND applies) rather than
    Python round() (banker's), so exact 4-decimal ties agree.
    stream==batch equivalence per micro-batch stays asserted in
    tests/test_stateful_streaming.py."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from ..streaming import stateful

    name = f"stream_s_{_uuid.uuid4().hex[:8]}"
    tmp = tempfile.mkdtemp(prefix="tapt_state_")
    out = stateful.running_user_totals(stateful.stream_events(spark, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink appends one row per (batch, user); keep the
    # final state per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("total_value").desc()
    )
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .withColumn("total_value", F.round(F.col("total_value"), 4))
    )


def _events_json_dir(spark: SparkSession, sf_dir: str, dupes: bool = False) -> str:
    """Session-cached JSON-lines event feed for file-source streams; with
    dupes=True each row appears twice (an at-least-once feed)."""
    from ..sources import tables

    def _write(tmp: str) -> None:
        ev = tables.load_table(spark, sf_dir, "events")
        if dupes:
            ev = ev.unionAll(ev)
        ev.coalesce(4).write.mode("overwrite").json(f"{tmp}/events")

    return _memo_feed(
        spark, "events_dup" if dupes else "events", sf_dir, _write
    )


@register(
    "streaming_sessionize",
    oracle="""
    WITH e AS (
      -- the file feed serializes timestamps as JSON with millisecond
      -- precision (truncation), so the oracle replays that truncation
      SELECT user_id, date_trunc('milliseconds', ts) AS ts, value
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM e
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    -- append mode only emits sessions the final watermark (= max event
    -- time at 0s delay) has passed; sessions still open at end-of-feed
    -- stay in state — the oracle replays that cutoff
    HAVING MAX(ts) + INTERVAL 30 MINUTE
           <= (SELECT MAX(date_trunc('milliseconds', ts)) FROM events)
    ORDER BY user_id, session_start
    """,
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window aggregation executed as a watermarked stream
    (append mode) — the streaming twin of the batch sessionize_events
    query. An availableNow drain emits every closed session exactly
    once, so the output is deterministic and the gaps-and-islands SQL
    twin (session end = last event + gap) is a full oracle; the
    stream==batch equivalence remains asserted in
    tests/test_streaming.py."""
    import uuid as _uuid

    from ..streaming import sessions as ss
    from ..streaming import stream_join as sj

    tmp = _events_json_dir(spark, sf_dir)
    stream = sj.stream_events_json(spark, f"{tmp}/events")
    name = f"stream_sess_{_uuid.uuid4().hex[:8]}"
    return sj.run_append_available_now(
        ss.user_session_rollup(stream, "30 minutes", "0 seconds"),
        name,
        _fresh_ckpt(),
    )


@register(
    "streaming_dedup_events",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup (dropDuplicatesWithinWatermark)
    of a doubled (at-least-once) event feed, rolled up per event_type
    batch-side after the drain.

    Full oracle (r5): event_id is unique in the fixture, so deduping the
    doubled feed by event_id keeps exactly one copy of each original row
    (both copies are byte-identical — first-arrival choice cannot
    matter), making the rollup equal to the plain batch rollup over
    `events` regardless of micro-batch slicing; the 4-file feed also
    drains in a single availableNow batch (maxFilesPerTrigger=16), so no
    duplicate pair ever straddles an evicted watermark. The deduped
    stream == batch DISTINCT assertion stays in tests/test_streaming.py."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from ..streaming import sessions as ss
    from ..streaming import stream_join as sj

    tmp = _events_json_dir(spark, sf_dir, dupes=True)
    _assert_single_batch(f"{tmp}/events")
    stream = sj.stream_events_json(spark, f"{tmp}/events")
    name = f"stream_dd_{_uuid.uuid4().hex[:8]}"
    deduped = sj.run_append_available_now(
        ss.dedup_events_stream(stream), name, _fresh_ckpt()
    )
    return (
        deduped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


# Shared oracle scaffolding for the three attribution-join variants:
# the e/c/p CTE block (incl. the JSON feed's millisecond truncation)
# and the output projection exist ONCE; only the join keyword varies.
_ATTRIB_CTES = """
    WITH e AS (
      -- the JSON feed truncates timestamps to millisecond precision
      SELECT event_id, date_trunc('milliseconds', ts) AS ts,
             user_id, event_type, value
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    c AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM e WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id AS p_user_id, event_id AS purchase_id,
             ts AS purchase_ts, value AS purchase_value
      FROM e WHERE event_type = 'purchase'
    )"""


def _attribution_oracle(join_kw: str) -> str:
    return f"""{_ATTRIB_CTES}
    SELECT COALESCE(c.user_id, p.p_user_id) AS user_id,
           c.click_id, p.purchase_id,
           epoch_us(c.click_ts) AS click_us,
           epoch_us(p.purchase_ts) AS purchase_us,
           p.purchase_value
    FROM c {join_kw} p ON c.user_id = p.p_user_id
       AND p.purchase_ts >= c.click_ts
       AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    ORDER BY user_id, click_id, purchase_id
    """


def _run_attribution(
    spark: SparkSession, sf_dir: str, join_fn_name: str, prefix: str,
    outer_feed: bool,
) -> DataFrame:
    """Drain one attribution-join variant. Outer variants use the
    sentinel feed (_ensure_outer_feed) and drop the sentinel rows by
    their reserved NEGATIVE user ids — real rows, including any with a
    NULL user_id (which the batch oracles keep), pass through."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from ..sources import tables
    from ..streaming import stream_join as sj

    if outer_feed:
        tmp = _ensure_outer_feed(spark, sf_dir)
    else:
        tmp = _memo_feed(
            spark, "clickpurchase", sf_dir,
            lambda d: tables.load_table(spark, sf_dir, "events")
            .where("event_type IN ('click', 'purchase')")
            .coalesce(4)
            .write.mode("overwrite")
            .json(f"{d}/events"),
        )
    _assert_single_batch(f"{tmp}/events")
    stream = sj.stream_events_json(spark, f"{tmp}/events")
    out = sj.run_append_available_now(
        getattr(sj, join_fn_name)(stream),
        f"{prefix}_{_uuid.uuid4().hex[:8]}",
        _fresh_ckpt(),
    )
    if outer_feed:
        out = out.where(
            F.col("user_id").isNull() | (F.col("user_id") >= 0)
        )
    return out


@register(
    "streaming_click_attribution",
    oracle=_attribution_oracle("JOIN"),
)
def streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases attributed to a same-user
    click within 1 hour, both sides watermarked (append mode).

    Full oracle (r5): the 4-file feed drains in ONE availableNow
    micro-batch (maxFilesPerTrigger=16 > 4 files), so every click is in
    state when every purchase probes and the inner interval join emits
    exactly the batch join result — no cross-batch watermark eviction
    can drop a match. The oracle replays the JSON feed's millisecond
    timestamp truncation and the same interval predicate."""
    return _run_attribution(
        spark, sf_dir, "click_purchase_interval_join", "stream_j", False
    )


@register(
    "streaming_click_attribution_outer",
    oracle=_attribution_oracle("LEFT JOIN"),
)
def streaming_click_attribution_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT OUTER stream-stream interval join with a FULL oracle — the
    hardest streaming semantic to determinize, because outer rows only
    emit when the watermark proves no match can still arrive, and the
    engine's internal eviction boundary is version-specific arithmetic.

    Determinization: the feed carries two far-future SENTINEL events
    (one per side, disjoint negative user ids, 10 days past the real
    maximum — the global watermark is the min of both sides'). After the
    availableNow drain plus the no-data finalization batch, the
    watermark sits ~10 days past every real click's join window, so ALL
    real unmatched clicks have provably emitted regardless of where the
    internal boundary falls; the sentinels stay in state and are dropped
    by their reserved negative user ids. The emitted set then equals the
    batch LEFT JOIN over real events exactly."""
    return _run_attribution(
        spark, sf_dir, "click_purchase_interval_join_outer", "stream_jo",
        True,
    )


@register(
    "streaming_click_attribution_full",
    oracle=_attribution_oracle("FULL JOIN"),
)
def streaming_click_attribution_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FULL OUTER stream-stream interval join, fully oracled — both
    sides' watermark-gated state eviction exercised (unmatched clicks
    AND unmatched purchases emit null-padded rows). Same sentinel pin as
    the left-outer variant."""
    return _run_attribution(
        spark, sf_dir, "click_purchase_interval_join_full", "stream_jf",
        True,
    )


@register(
    "streaming_incremental_stats",
    oracle="""
    SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_partitions,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct_user_id,
           CAST(COUNT(DISTINCT event_type) AS BIGINT)
             AS exact_distinct_event_type,
           TRUE AS user_id_gate_ok,
           TRUE AS event_type_gate_ok
    FROM events
    """,
)
def streaming_incremental_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch-maintained sketch store: the event stream folds
    per-micro-batch HLL sketches into a persisted per-day stats table;
    the returned rollup reads ONLY that table.

    Full oracle (r5): the deterministic parts of the store — partition
    count and exact row count (a plain sum of per-batch counts, slicing
    invariant) — are hash-checked directly; the HLL estimates, which no
    other engine reproduces bit-for-bit, are certified through a ±2 %
    gate against exact distinct counts (same contract as
    approx_distinct_profile). HLL union is order-independent, so the
    merged estimate itself is micro-batch-slicing invariant; streaming ==
    batch-recompute equality stays asserted in
    tests/test_incremental_sink.py."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from ..operators import incremental
    from ..sources import tables
    from ..streaming import incremental_sink as isink
    from ..streaming import stream_join as sj

    keys = ["user_id", "event_type"]
    tmp = _events_json_dir(spark, sf_dir)
    stats_path = f"{tmp}/stats_{_uuid.uuid4().hex[:8]}"
    stream = sj.stream_events_json(spark, f"{tmp}/events")
    isink.maintain_partition_stats(stream, stats_path, _fresh_ckpt(), keys)
    merged = incremental.merge_sketch_stats(
        spark.read.parquet(stats_path), keys
    )
    exact = tables.load_table(spark, sf_dir, "events").agg(
        *[
            F.countDistinct(k).cast("long").alias(f"exact_distinct_{k}")
            for k in keys
        ]
    )
    gates = [
        (
            F.abs(F.col(f"approx_distinct_{k}") - F.col(f"exact_distinct_{k}"))
            <= F.lit(0.02) * F.col(f"exact_distinct_{k}")
        ).alias(f"{k}_gate_ok")
        for k in keys
    ]
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_partitions",
        "n_rows",
        "exact_distinct_user_id",
        "exact_distinct_event_type",
        *gates,
    )


@register(
    "streaming_static_enrichment",
    oracle="""
    SELECT c.c_mktsegment,
           e.event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    ORDER BY c_mktsegment, event_type
    """,
)
def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment: the event stream joined to the
    static customer dimension, rolled up per (segment, event_type) in
    complete mode. The complete-mode availableNow drain of a static file
    feed is deterministic, so the join+rollup carries a full DuckDB
    oracle over the same events/customer tables (stream == SQL, not
    just stream == batch; tests/test_streaming.py keeps the
    stream==batch assertion)."""
    import uuid as _uuid

    from ..sources import tables
    from ..streaming import query_log_stream as qls
    from ..streaming import stream_join as sj

    tmp = _events_json_dir(spark, sf_dir)
    stream = sj.stream_events_json(spark, f"{tmp}/events")
    customer = tables.load_table(spark, sf_dir, "customer")
    name = f"stream_enr_{_uuid.uuid4().hex[:8]}"
    return qls.run_available_now(
        sj.enriched_segment_rollup(stream, customer), name, _fresh_ckpt()
    ).orderBy("c_mktsegment", "event_type")


@register(
    "streaming_pii_scrub",
    oracle="""
    WITH aug AS (
      SELECT doc_id, lang, text || ' contact: user' ||
        CAST(doc_id AS VARCHAR) || '@example.com via https://example.org/d/'
        || CAST(doc_id AS VARCHAR) || ' or call +1 (555) 010-' ||
        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents
    )
    SELECT lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS BIGINT)
        AS total_emails,
      CAST(SUM(len(regexp_extract_all(text, 'https?://[^\\s]+'))) AS BIGINT)
        AS total_urls,
      CAST(SUM(len(regexp_extract_all(text,
        '\\+?[0-9][0-9()\\-. ]{7,}[0-9]'))) AS BIGINT) AS total_phones
    FROM aug
    GROUP BY lang
    ORDER BY lang
    """,
)
def streaming_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub executed as a Structured Streaming pipeline: the
    fixture-augmented corpus (same deterministic suffix as
    pii_redaction_stats) streams from JSON files, operators/text.
    redact_pii applies UNCHANGED on the streaming DataFrame (stateless
    projection), and a per-language rollup drains with availableNow.

    The map-only scrub plus a complete-mode aggregate is deterministic,
    so this is the one streaming query with a full DuckDB oracle — the
    hash check proves stream == SQL, not just stream == batch."""
    from pyspark.sql import functions as F

    from ..operators import text as text_ops
    from ..sources import tables
    from .text import _pii_suffix_col

    def _write(d: str) -> None:
        tables.load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "lang",
            F.concat(F.col("text"), _pii_suffix_col()).alias("text"),
        ).coalesce(4).write.mode("overwrite").json(f"{d}/docs")

    tmp = _memo_feed(spark, "piidocs", sf_dir, _write)
    stream = (
        spark.readStream.schema("doc_id long, lang string, text string")
        .json(f"{tmp}/docs")
    )
    scrubbed = text_ops.redact_pii(stream)
    rollup = scrubbed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("total_emails"),
        F.sum("n_url").cast("bigint").alias("total_urls"),
        F.sum("n_phone").cast("bigint").alias("total_phones"),
    )
    name = f"stream_pii_{uuid.uuid4().hex[:8]}"
    q = (
        rollup.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", _fresh_ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("lang")


_INGEST_LO, _INGEST_HI = 40, 60  # the streamed "new vector" id range


def _ingest_oracle() -> str:
    from .similarity import _lsh_topk_oracle

    return _lsh_topk_oracle(
        f"q.vec_id >= {_INGEST_LO} AND q.vec_id < {_INGEST_HI}"
    )


@register("streaming_similarity_ingest", oracle=_ingest_oracle())
def streaming_similarity_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous vector ingest: new embeddings stream in, every
    micro-batch computes quantized LSH signatures and joins the STATIC
    pre-bucketed corpus (stream-static equi-join on (table_idx,
    signature), stateless — no watermark), candidates append to the
    sink, and exact-cosine top-k ranks once at drain time
    (streaming/vector_ingest.py).

    Full oracle: the candidate set is slicing-invariant (a union of
    per-batch inner joins against static state), so the drained result
    equals batch lsh_bucketed_topk for the same query set — the oracle
    IS the batch LSH SQL with this query-id range."""
    from pyspark.sql import functions as F

    from ..operators import similarity as sim_ops
    from ..sources import tables
    from ..streaming import vector_ingest

    emb = tables.load_table(spark, sf_dir, "embeddings")
    new_vecs = emb.where(
        (F.col("vec_id") >= _INGEST_LO) & (F.col("vec_id") < _INGEST_HI)
    )

    def _write(d: str) -> None:
        # cast float32 -> double BEFORE the JSON write so the feed
        # round-trips the exact widened values the batch path quantizes
        new_vecs.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).coalesce(2).write.mode("overwrite").json(f"{d}/vecs")

    tmp = _memo_feed(spark, "vecingest", sf_dir, _write)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .json(f"{tmp}/vecs")
    )
    cand = vector_ingest.ingest_candidates(stream, emb)
    name = f"stream_vec_{uuid.uuid4().hex[:8]}"
    q = (
        cand.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", _fresh_ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cand_ids = spark.table(name).distinct()
    queries = new_vecs.select(F.col("vec_id").alias("query_id"), "embedding")
    return sim_ops.rank_candidates(emb, queries, cand_ids, k=5)


_GATE_MOD, _GATE_REM = 10, 7  # doc_id % 10 == 7 -> the streamed ingest split
_GATE_THRESHOLD = 0.6


def _dedup_gate_oracle() -> str:
    from ..operators import dedup as dops
    from .dedup import _minhash_banded_cte, _minhash_sig_ctes

    n = dops.DEFAULT_NUM_HASHES
    eq_sum = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(n)
    )
    return f"""
    WITH {_minhash_sig_ctes()},
    new_sig AS (SELECT * FROM sig WHERE doc_id % {_GATE_MOD} = {_GATE_REM}),
    corpus_sig AS (
      SELECT * FROM sig WHERE doc_id % {_GATE_MOD} <> {_GATE_REM}
    ),
    {_minhash_banded_cte(source="new_sig", name="new_banded")},
    {_minhash_banded_cte(source="corpus_sig", name="corpus_banded")},
    cand AS (
      SELECT DISTINCT q.doc_id AS new_id, c.doc_id AS corpus_id
      FROM new_banded q
      JOIN corpus_banded c
        ON q.band = c.band AND q.band_hash = c.band_hash
    ),
    rolled AS (
      SELECT new_id, COUNT(*) AS n_candidates FROM cand GROUP BY new_id
    ),
    scored AS (
      SELECT c.new_id, c.corpus_id,
             CAST({eq_sum} AS DOUBLE) / {n} AS est
      FROM cand c
      JOIN new_sig sa ON sa.doc_id = c.new_id
      JOIN corpus_sig sb ON sb.doc_id = c.corpus_id
    ),
    best AS (
      SELECT new_id, corpus_id, est,
             ROW_NUMBER() OVER (
               PARTITION BY new_id ORDER BY est DESC, corpus_id
             ) AS rn
      FROM scored
    )
    SELECT d.doc_id,
           CAST(COALESCE(r.n_candidates, 0) AS BIGINT) AS n_candidates,
           b.corpus_id AS best_match_id,
           b.est AS best_est_jaccard,
           COALESCE(b.est >= {_GATE_THRESHOLD}, FALSE) AS is_near_dup
    FROM (SELECT doc_id FROM documents
          WHERE doc_id % {_GATE_MOD} = {_GATE_REM}) d
    LEFT JOIN rolled r ON r.new_id = d.doc_id
    LEFT JOIN best b ON b.new_id = d.doc_id AND b.rn = 1
    ORDER BY d.doc_id
    """


@register("streaming_dedup_gate", oracle=_dedup_gate_oracle())
def streaming_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online near-duplicate gate: newly ingested documents stream in,
    every micro-batch computes a STATELESS per-row minhash signature
    (operators/dedup.minhash_signature_expr — same family math as the
    batch operator, legal in a streaming projection) plus LSH band
    hashes, and joins the static pre-banded corpus on (band, band_hash)
    — the admission check a continuously-fed training corpus runs
    before accepting a document.

    Full oracle: the stream-static candidate join is stateless →
    slicing-invariant; scoring (signature-agreement Jaccard, exact
    /64 binary rational) and the per-document best-match rollup run
    once at drain time, so the result equals the batch replay in SQL."""
    from pyspark.sql import Window, functions as F

    from ..operators import dedup as dops
    from ..sources import tables

    docs = tables.load_table(spark, sf_dir, "documents")
    is_new = (F.col("doc_id") % _GATE_MOD) == _GATE_REM
    corpus = docs.where(~is_new)
    new_docs = docs.where(is_new)

    corpus_banded = dops.band_hashes(
        dops.minhash_signatures(corpus)
    ).select(
        F.col("id").alias("corpus_id"), "band", "band_hash"
    )

    def _write(d: str) -> None:
        new_docs.select("doc_id", "text").coalesce(2).write.mode(
            "overwrite"
        ).json(f"{d}/docs")

    tmp = _memo_feed(spark, "dedupgate", sf_dir, _write)
    stream = (
        spark.readStream.schema("doc_id long, text string").json(f"{tmp}/docs")
    )
    stream_banded = dops.band_hashes(
        stream.select(
            F.col("doc_id").alias("id"),
            dops.minhash_signature_expr("text").alias("minhash"),
        )
    ).select(F.col("id").alias("new_id"), "band", "band_hash")
    cand_stream = stream_banded.join(
        corpus_banded, ["band", "band_hash"]
    ).select("new_id", "corpus_id")

    name = f"stream_gate_{uuid.uuid4().hex[:8]}"
    q = (
        cand_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", _fresh_ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cand = spark.table(name).distinct()

    n_hashes = dops.DEFAULT_NUM_HASHES
    new_sigs = dops.minhash_signatures(new_docs).select(
        F.col("id").alias("new_id"), F.col("minhash").alias("mh_new")
    )
    corpus_sigs = dops.minhash_signatures(corpus).select(
        F.col("id").alias("corpus_id"), F.col("minhash").alias("mh_corpus")
    )
    est = F.aggregate(
        F.zip_with(
            "mh_new",
            "mh_corpus",
            lambda a, b: F.when(a == b, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("double") / F.lit(float(n_hashes))
    scored = (
        cand.join(new_sigs, "new_id")
        .join(corpus_sigs, "corpus_id")
        .select("new_id", "corpus_id", est.alias("est"))
    )
    w = Window.partitionBy("new_id").orderBy(
        F.col("est").desc(), F.col("corpus_id")
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("new_id", "corpus_id", "est")
    )
    rolled = cand.groupBy("new_id").agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    return (
        new_docs.select("doc_id")
        .join(rolled, F.col("doc_id") == rolled.new_id, "left")
        .drop("new_id")
        .join(best, F.col("doc_id") == best.new_id, "left")
        .drop("new_id")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0))
            .cast("bigint")
            .alias("n_candidates"),
            F.col("corpus_id").alias("best_match_id"),
            F.col("est").alias("best_est_jaccard"),
            F.coalesce(
                F.col("est") >= _GATE_THRESHOLD, F.lit(False)
            ).alias("is_near_dup"),
        )
        .orderBy("doc_id")
    )


# streamed "new vector" id range for the clustering ingest twin — kept
# disjoint from the LSH ingest range so the two feeds' memo dirs never
# alias semantically
_CLUSTER_INGEST_LO, _CLUSTER_INGEST_HI = 420, 470


def _cluster_ingest_oracle() -> str:
    from ..operators import clustering as cops
    from .clustering import _ITERS, _K

    cte, final = cops.kmeans_oracle_cte(_K, _ITERS)
    return (
        f"WITH {cte}\n    SELECT vec_id, cluster, dist2 FROM {final}"
        f" WHERE vec_id >= {_CLUSTER_INGEST_LO}"
        f" AND vec_id < {_CLUSTER_INGEST_HI}"
    )


@register("streaming_cluster_ingest", oracle=_cluster_ingest_oracle())
def streaming_cluster_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous cluster assignment: new embeddings stream in and every
    micro-batch runs the MAP-ONLY integer-lattice nearest-centroid
    assignment against the static corpus fit (queries/clustering.py's
    session-memoized centroids) — the streaming topic-router in front of
    a curation pipeline (route to cluster-balanced queues, flag
    outlier-distance arrivals).

    Determinism argument: the assignment is stateless and per-row (a
    centroid literal folded into codegen — no stream-static join at
    all), so the drained union over micro-batches equals the batch
    assignment of the same id range regardless of feed slicing. The
    oracle replays the full k-means fit (unrolled CTEs) filtered to the
    streamed ids — exact integer arithmetic end to end, so this
    streaming query is fully hash-checked, not rows-only."""
    from pyspark.sql import functions as F

    from ..operators import clustering as cops
    from ..sources import tables
    from .clustering import fitted_centroids

    centroids = fitted_centroids(spark, sf_dir)
    emb = tables.load_table(spark, sf_dir, "embeddings")
    new_vecs = emb.where(
        (F.col("vec_id") >= _CLUSTER_INGEST_LO)
        & (F.col("vec_id") < _CLUSTER_INGEST_HI)
    )

    def _write(d: str) -> None:
        # widen float32 -> double BEFORE the JSON write so the feed
        # round-trips the exact values the batch path quantizes
        new_vecs.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        ).coalesce(2).write.mode("overwrite").json(f"{d}/vecs")

    tmp = _memo_feed(spark, "clusteringest", sf_dir, _write)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .json(f"{tmp}/vecs")
    )
    quantized = stream.select(
        "vec_id", cops.quantize_expr(F.col("embedding")).alias("v")
    )
    assigned = cops.assign_clusters(quantized, centroids)
    name = f"stream_cluster_{uuid.uuid4().hex[:8]}"
    q = (
        assigned.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", _fresh_ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _drift_triggers_oracle() -> str:
    # The streaming increment store sums EXACTLY what the batch drift
    # query aggregates in one shot (per-column early/late mention
    # counts are additive over micro-batches), so the streaming twin
    # shares the batch query's full DuckDB oracle verbatim.
    from .advisor import _DRIFT_TRIGGERS_ORACLE

    return _DRIFT_TRIGGERS_ORACLE


@register("streaming_drift_triggers", oracle=_drift_triggers_oracle())
def streaming_drift_triggers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming half of the adaptive partitioning loop: the
    query-log stream drains through a foreachBatch-maintained
    mined-usage increment store (streaming/usage_store.py — per-batch
    miner pass, per-column early/late counts folded into a persisted
    KB-sized table), and the drift trigger logic
    (advisor.drift_triggers_from_usage) runs off ONLY that store. The
    reference re-runs its one-shot analysis on a fresh log window by
    hand (src/partitioning.py:294-325); the r7 batch loop scheduled it;
    this makes "fresh" continuous — triggers re-derive per drain with
    no log re-scan.

    Determinism argument: the store holds pure sums of per-row counts,
    so ANY micro-batch slicing of the feed yields the same final table
    (exact stream == batch, asserted in tests/test_streaming.py with a
    forced multi-batch drain), and the result equals
    partition_recommendation_drift row-for-row — certified by sharing
    its full DuckDB oracle."""
    import tempfile as _tempfile

    from ..streaming import usage_store
    from .advisor import _DRIFT_CUTOFF, drift_triggers_from_usage

    tmp = _memo_feed(
        spark, "logs", "fixture",
        lambda d: fixtures.query_logs_df(spark)
        .coalesce(2)
        .write.mode("overwrite")
        .json(f"{d}/logs"),
    )
    store = _tempfile.mkdtemp(prefix="tapt_usage_store_") + "/usage"
    stream = qls.stream_query_logs(spark, f"{tmp}/logs")
    usage_store.maintain_usage_store(
        stream, store, _fresh_ckpt(), _DRIFT_CUTOFF
    )
    return drift_triggers_from_usage(
        spark, sf_dir, spark.read.parquet(store)
    )


@register("streaming_multimodal_ingest", oracle=MIXED_CORPUS_ORACLE)
def streaming_multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-modality decode as a Structured Streaming pipeline: the
    PNG+JPEG+WAV+Y4M+TIFF+FLAC+AVI+WEBP corpus (synth_mixed_assets —
    binary, so the feed is parquet, not JSON) streams from files, the
    production Arrow decode stage applies UNCHANGED on the streaming
    frame (mapInPandas is stateless), and the per-format rollup drains
    in complete mode with availableNow — the ingest shape of a crawl
    pipeline decoding media as it lands.

    Same full DuckDB oracle as the batch twin
    (multimodal_mixed_corpus_stats): the decode arithmetic is
    positional in the md5 conventions, so hash-green here proves
    stream == SQL across all eight real decoders, not just
    stream == batch."""
    from ..operators import multimodal as mm
    from .multimodal import mixed_corpus_rollup

    def _write(d: str) -> None:
        mm.synth_mixed_assets(spark).coalesce(4).write.mode(
            "overwrite"
        ).parquet(f"{d}/assets")

    tmp = _memo_feed(spark, "mixed_assets", "synth", _write)
    stream = spark.readStream.schema(mm.SYNTH_ASSET_SCHEMA).parquet(
        f"{tmp}/assets"
    )
    decoded = mm.decode_assets(
        stream, require_codec=True, codec=mm.PixmapCodec()
    )
    rollup = mixed_corpus_rollup(decoded)
    name = f"stream_mm_{uuid.uuid4().hex[:8]}"
    return qls.run_available_now(rollup, name, _fresh_ckpt()).orderBy("fmt")


from .crawl import JSONL_INGEST_ORACLE as _JSONL_ORACLE


@register("streaming_jsonl_ingest", oracle=_JSONL_ORACLE)
def streaming_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip JSONL corpus ingestion as a Structured Streaming pipeline:
    the same shards the batch twin reads (queries/crawl._jsonl_shards)
    stream through Spark's PERMISSIVE json source with the
    corrupt-record quarantine column, and the same one-pass rollup
    (crawl.jsonl_quarantine_rollup — stateless over stateless) drains
    in complete mode with availableNow.

    Oracle: the batch twin's table-derived SQL (crawl.JSONL_INGEST_
    ORACLE), attached after definition — hash-green proves
    stream == batch == source-table arithmetic, including that the
    quarantine routing is slicing-invariant (a malformed line is
    malformed in whatever micro-batch it lands)."""
    from ..operators import jsonl as jops
    from .crawl import _jsonl_shards, jsonl_quarantine_rollup

    feed = _jsonl_shards(spark, sf_dir)
    stream = (
        spark.readStream.schema(jops.READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(feed)
    )
    rollup = jsonl_quarantine_rollup(stream)
    name = f"stream_jsonl_{uuid.uuid4().hex[:8]}"
    return qls.run_available_now(rollup, name, _fresh_ckpt()).orderBy("lang")


from .registry import _ORACLES as _oracle_registry


@register(
    "streaming_warc_ingest", oracle=None  # attached below from the twin
)
def streaming_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC crawl ingestion as a Structured Streaming pipeline: the
    same .warc.gz shard table the batch twin parses
    (crawl.warc_ingest_stats) streams from parquet files, the gzip
    member walk + WARC/HTTP header parse applies UNCHANGED on the
    streaming frame (parse_warc_records is a stateless mapInPandas),
    and the per-status rollup drains in complete mode with
    availableNow — a crawl pipeline ingesting shards as the fetcher
    lands them.

    Oracle: the batch twin's shard-convention arithmetic — hash-green
    proves stream == batch == synthesis arithmetic through a REAL
    multi-member gzip walk on the streaming side, including that
    record framing is slicing-invariant (a shard parses identically
    in whatever micro-batch it lands)."""
    from pyspark.sql import functions as F

    from ..operators import crawl as cops

    def _write(d: str) -> None:
        cops.synth_warc_shards(spark, n_shards=64).coalesce(4).write.mode(
            "overwrite"
        ).parquet(f"{d}/shards")

    tmp = _memo_feed(spark, "warc_shards", "synth", _write)
    stream = spark.readStream.schema(cops.SHARD_SCHEMA).parquet(
        f"{tmp}/shards"
    )
    records = cops.parse_warc_records(stream)
    rollup = records.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("body_bytes").cast("bigint").alias("total_body_bytes"),
        F.round(F.avg("body_bytes"), 4).alias("avg_body_bytes"),
    )
    name = f"stream_warc_{uuid.uuid4().hex[:8]}"
    return qls.run_available_now(rollup, name, _fresh_ckpt()).orderBy(
        "status"
    )


# the twin's oracle string is registered under the batch name; reuse it
# verbatim so the two can never drift
_oracle_registry["streaming_warc_ingest"] = _oracle_registry[
    "warc_ingest_stats"
]


from .multimodal import _phash_oracle as _phash_oracle_sql


@register("streaming_phash_ingest", oracle=_phash_oracle_sql())
def streaming_phash_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection on a STREAM: the planted-duplicate PNG
    corpus streams from parquet files, the Arrow perceptual-hash stage
    applies unchanged (stateless mapInPandas), and the banded self-join
    + hamming verify run as a stream-static join against the BATCH
    hash table of the same corpus — the shape of an online ingest
    gate asking "does this incoming image duplicate anything in the
    existing corpus?" while keeping the drained result equal to the
    batch pair set (id_a < id_b dedupes the two directions).

    Same convention-arithmetic oracle as the batch twin
    (multimodal_phash_near_dup): hash-green proves stream == batch ==
    synth arithmetic through a REAL PNG decode on the streaming side."""
    from pyspark.sql import functions as F

    from ..operators import multimodal as mm
    from .multimodal import (
        _PHASH_BAND_BITS,
        _PHASH_BAND_MASK,
        _PHASH_BANDS,
        _PHASH_HAMMING_MAX,
        _PHASH_N,
    )

    def _write(d: str) -> None:
        mm.synth_phash_assets(spark, n=_PHASH_N).coalesce(4).write.mode(
            "overwrite"
        ).parquet(f"{d}/assets")

    tmp = _memo_feed(spark, "phash_assets", "synth", _write)
    stream = spark.readStream.schema(mm.SYNTH_ASSET_SCHEMA).parquet(
        f"{tmp}/assets"
    )
    static_hashes = mm.perceptual_hashes(
        spark.read.schema(mm.SYNTH_ASSET_SCHEMA).parquet(f"{tmp}/assets"),
        require_codec=True,
        codec=mm.PixmapCodec(),
    )
    stream_hashes = mm.perceptual_hashes(
        stream, require_codec=True, codec=mm.PixmapCodec()
    )

    def bands(df: DataFrame, idc: str) -> DataFrame:
        return df.select(
            F.col("asset_id").alias(idc), "w", "h", "ch",
            F.col("phash").alias(f"ph_{idc}"),
            F.posexplode(
                F.array(*[
                    F.shiftright(F.col("phash"), _PHASH_BAND_BITS * k)
                    .bitwiseAND(F.lit(_PHASH_BAND_MASK))
                    for k in range(_PHASH_BANDS)
                ])
            ).alias("band_idx", "band"),
        )

    cand = (
        bands(stream_hashes, "id_a")
        .join(
            bands(static_hashes, "id_b"),
            ["w", "h", "ch", "band_idx", "band"],
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.expr("bit_count(ph_id_a ^ ph_id_b)").cast("bigint").alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= _PHASH_HAMMING_MAX)
        .dropDuplicates(["id_a", "id_b"])
    )
    rollup = cand.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    name = f"stream_phash_{uuid.uuid4().hex[:8]}"
    return qls.run_available_now(rollup, name, _fresh_ckpt()).orderBy(
        "hamming"
    )


from .multimodal import _afp_oracle as _afp_oracle_sql


@register(
    "streaming_audio_fingerprint_ingest", oracle=_afp_oracle_sql()
)
def streaming_audio_fingerprint_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audio near-dup detection on a STREAM (r13, the audio twin of
    streaming_phash_ingest): the planted-duplicate WAV/AIFF corpus
    streams from parquet, the Arrow fingerprint stage applies
    unchanged (stateless mapInPandas), and the pigeonhole-banded join
    + hamming verify run stream-static against the BATCH fingerprint
    table — the online "does this incoming clip duplicate the corpus"
    ingest gate, drained equal to the batch pair set. Same
    integer-exact oracle as multimodal_audio_fingerprint_near_dup."""
    from pyspark.sql import functions as F

    from ..operators import multimodal as mm
    from .multimodal import (
        _AFP_N,
        _PHASH_BAND_BITS,
        _PHASH_BAND_MASK,
        _PHASH_BANDS,
        _PHASH_HAMMING_MAX,
    )

    def _write(d: str) -> None:
        mm.synth_afp_assets(spark, n=_AFP_N).coalesce(4).write.mode(
            "overwrite"
        ).parquet(f"{d}/assets")

    tmp = _memo_feed(spark, "afp_assets", "synth", _write)
    static_fps = mm.audio_fingerprints(
        spark.read.schema(mm.SYNTH_ASSET_SCHEMA).parquet(f"{tmp}/assets"),
        require_codec=True,
        codec=mm.PixmapCodec(),
    )
    stream_fps = mm.audio_fingerprints(
        spark.readStream.schema(mm.SYNTH_ASSET_SCHEMA).parquet(
            f"{tmp}/assets"
        ),
        require_codec=True,
        codec=mm.PixmapCodec(),
    )

    def bands(df: DataFrame, idc: str) -> DataFrame:
        return df.select(
            F.col("asset_id").alias(idc),
            F.col("afp").alias(f"fp_{idc}"),
            F.posexplode(
                F.array(*[
                    F.shiftright(F.col("afp"), _PHASH_BAND_BITS * k)
                    .bitwiseAND(F.lit(_PHASH_BAND_MASK))
                    for k in range(_PHASH_BANDS)
                ])
            ).alias("band_idx", "band"),
        )

    cand = (
        bands(stream_fps, "id_a")
        .join(bands(static_fps, "id_b"), ["band_idx", "band"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.expr("bit_count(fp_id_a ^ fp_id_b)").cast("bigint").alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= _PHASH_HAMMING_MAX)
        .dropDuplicates(["id_a", "id_b"])
    )
    rollup = cand.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    name = f"stream_afp_{uuid.uuid4().hex[:8]}"
    return qls.run_available_now(rollup, name, _fresh_ckpt()).orderBy(
        "hamming"
    )
