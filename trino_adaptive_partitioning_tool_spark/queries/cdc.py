"""CDC / mutation queries over the events change stream (operators/cdc).

The events table doubles as a change log: user_id is the entity key,
(ts, event_id) the deterministic change order. All three queries are
window/join algebra, fully hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cdc
from ..sources import tables
from .registry import register

_CUTOFF = "2024-01-15"


@register(
    "cdc_latest_snapshot",
    oracle="""
    SELECT user_id,
           event_type AS last_event_type,
           value AS last_value,
           epoch_us(ts) AS last_ts_us
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins collapse of the change stream: one row per entity,
    deterministic under timestamp ties via the event_id tiebreaker.
    One shuffle on the entity key."""
    ev = tables.load_table(spark, sf_dir, "events")
    return cdc.collapse_latest(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.unix_micros("ts").alias("last_ts_us"),
    )


@register(
    "scd2_event_type_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
        CASE WHEN LAG(event_type) OVER w IS NULL
               OR LAG(event_type) OVER w <> event_type
             THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT *, SUM(chg) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS island
      FROM ordered
    ), periods AS (
      SELECT user_id, island, event_type,
             MIN(ts) AS valid_from, COUNT(*) AS n_events
      FROM islands GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type,
           epoch_us(valid_from) AS valid_from_us,
           epoch_us(LEAD(valid_from) OVER w2) AS valid_to_us,
           CAST(n_events AS BIGINT) AS n_events,
           LEAD(valid_from) OVER w2 IS NULL AS is_current
    FROM periods
    WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)
    """,
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals of each user's event_type: consecutive
    equal states collapse into one period (gaps-and-islands), periods
    chain via lead(). Both window passes share one key shuffle."""
    ev = tables.load_table(spark, sf_dir, "events")
    hist = cdc.scd2_history(ev, "user_id", "event_type", "ts", "event_id")
    return hist.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        F.col("n_events").cast("bigint").alias("n_events"),
        "is_current",
    )


@register(
    "cdc_merge_apply",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_type, value, ts FROM (
        SELECT user_id, event_type, value, ts,
          ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < DATE '{_CUTOFF}'
      ) WHERE rn = 1
    ),
    c AS (
      SELECT user_id, event_type, value, ts FROM (
        SELECT user_id, event_type, value, ts,
          ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= DATE '{_CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT COALESCE(t.user_id, c.user_id) AS user_id,
      CASE WHEN c.user_id IS NOT NULL THEN c.event_type
           ELSE t.event_type END AS event_type,
      CASE WHEN c.user_id IS NOT NULL THEN c.value
           ELSE t.value END AS value,
      epoch_us(CASE WHEN c.user_id IS NOT NULL THEN c.ts
                    ELSE t.ts END) AS ts_us
    FROM t FULL OUTER JOIN c ON t.user_id = c.user_id
    WHERE NOT (c.user_id IS NOT NULL AND c.event_type = 'error')
    """,
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emulated MERGE INTO: the pre-cutoff latest snapshot receives the
    post-cutoff changeset (latest-wins upserts; a trailing 'error'
    state deletes the entity). Full-outer shuffle join on the key —
    the Iceberg/Delta MERGE physical shape."""
    ev = tables.load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts", "event_id"
    )
    cutoff = F.lit(_CUTOFF).cast("date").cast("timestamp")
    target = cdc.collapse_latest(
        ev.where(F.col("ts") < cutoff), ["user_id"], ["ts", "event_id"]
    ).drop("event_id")
    changes = cdc.collapse_latest(
        ev.where(F.col("ts") >= cutoff), ["user_id"], ["ts", "event_id"]
    ).drop("event_id")
    merged = cdc.merge_upsert(
        target, changes, ["user_id"], delete_when=F.col("event_type") == "error"
    )
    return merged.select(
        "user_id", "event_type", "value", F.unix_micros("ts").alias("ts_us")
    )
