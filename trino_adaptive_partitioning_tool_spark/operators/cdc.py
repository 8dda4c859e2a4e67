"""Change-data-capture shapes: latest-wins collapse, emulated MERGE
(upsert + delete), and SCD2 interval histories (training-pipeline
surface; no reference analog — the reference reads static catalogs).

All three are pure DataFrame algebra — windows and one full-outer join —
so they are fully oracle-checkable and inherit Spark's scale behavior:

  * collapse_latest / scd2: ONE shuffle on the entity key; the window
    frame is O(1) running state per partition. Skewed entities fan out
    via AQE; ordering is (ts, tiebreaker) so results are deterministic
    under ties.
  * merge_upsert: one full-outer shuffle join on the key (the Iceberg/
    Delta MERGE INTO physical shape); at 100 TB both sides arrive
    key-partitioned so co-partitioned storage (bucketing) removes the
    target-side shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_latest(
    changes: DataFrame, keys: list[str], order_cols: list[str]
) -> DataFrame:
    """One row per key: the change record with the highest
    (order_cols...) — deterministic when order_cols ends in a unique
    tiebreaker."""
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    delete_when: Column | None = None,
) -> DataFrame:
    """Emulated MERGE INTO: apply a latest-wins changeset to a snapshot.

    Rows present in `changes` replace the target row (or insert); rows
    matching `delete_when` (evaluated on the change record) are dropped.
    Non-key columns must match by name. Returns the merged snapshot.
    """
    non_keys = [c for c in target.columns if c not in keys]
    if delete_when is not None:
        changes = changes.withColumn("__del", delete_when)
    else:
        changes = changes.withColumn("__del", F.lit(False))
    t = target.alias("t")
    c = changes.alias("c")
    joined = t.join(c, keys, "full_outer")
    picked = joined.select(
        *[F.col(k) for k in keys],
        # change side wins when present: detect presence via its __del
        # marker (never NULL on a real change row)
        *[
            F.when(F.col("c.__del").isNotNull(), F.col(f"c.{col}"))
            .otherwise(F.col(f"t.{col}"))
            .alias(col)
            for col in non_keys
        ],
        F.coalesce(F.col("c.__del"), F.lit(False)).alias("__del"),
    )
    return picked.where(~F.col("__del")).drop("__del")


def scd2_history(
    changes: DataFrame,
    key: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 intervals from an event stream:
    collapse CONSECUTIVE equal states into one validity period
    (gaps-and-islands), then chain periods with lead().

    Returns (key, state, valid_from, valid_to, n_events, is_current)
    with valid_to NULL on the open period. Two window passes over the
    same key partitioning — Catalyst reuses one shuffle."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    prev = F.lag(state_col).over(w)
    df = changes.withColumn(
        "__chg",
        F.when(prev.isNull() | (prev != F.col(state_col)), 1).otherwise(0),
    ).withColumn(
        "__island",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    periods = df.groupBy(key, "__island", state_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key).orderBy("valid_from")
    return (
        periods.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__island")
    )
