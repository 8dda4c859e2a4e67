"""foreachBatch maintenance of the mined-usage increment store.

The streaming half of the adaptive partitioning loop: the reference's
whole pitch is re-running its analysis on a fresh query-log window
(reference src/partitioning.py:294-325, a manual one-shot); batch
round 7 closed that loop on a schedule (drift -> triggers -> patched
DDL), and this module makes "fresh" CONTINUOUS. Each micro-batch of
the query-log stream is mined (the same Arrow-batched miner the batch
advisor uses), reduced to per-column early/late mention counts, and
folded into a persisted usage table; the trigger logic
(queries/advisor.drift_triggers_from_usage) then reads ONLY that
table — no log re-scan, ever.

Correctness under slicing: the stored quantities are pure SUMS of
per-row counts, so any micro-batch partitioning of the log produces
the same final table — the stream==batch equivalence is exact (not
approximate like the HLL store) and is asserted per-drain in
tests/test_streaming.py and certified against the batch DuckDB oracle
by the streaming_drift_triggers driver row.

At 100 TB: the log stream is consumed once, per-batch cost is one
miner pass over just the batch (map-side combined into <= distinct
columns rows), and the store stays column-count-sized (KB). The
read-merge-overwrite below becomes a transactional MERGE on a real
deployment — the checkpoint already makes batch ids replay-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def usage_increments(
    batch_df: DataFrame, cutoff: str
) -> DataFrame:
    """Mine one micro-batch of query-log rows into per-column
    (column_name, n_early, n_late) mention counts — the additive unit
    the store folds. Same mining + filtering as the batch drift query
    (join/where mention kinds, empty names dropped); the join back to
    create_time is batch-local (each log row lives in exactly one
    micro-batch)."""
    from ..operators import mining

    mined = mining.mine_query_log(batch_df).where(
        F.col("kind").isin("join_column", "where_column")
        & (F.col("name") != "")
    )
    cut = F.lit(cutoff).cast("timestamp")
    return (
        mined.join(batch_df.select("query_id", "create_time"), "query_id")
        .groupBy(F.col("name").alias("column_name"))
        .agg(
            F.sum(F.when(F.col("create_time") < cut, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_early"),
            F.sum(
                F.when(F.col("create_time") >= cut, F.col("cnt")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_late"),
        )
    )


def upsert_usage_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    cutoff: str,
) -> None:
    """Fold one micro-batch's usage increments into the persisted store
    (read-merge-overwrite; the store is distinct-column-count-sized, so
    the rewrite is trivially small)."""
    inc = usage_increments(batch_df, cutoff)
    try:
        existing = spark.read.parquet(store_path)
        has_existing = True
    except Exception:
        has_existing = False
    if has_existing:
        merged = (
            existing.unionByName(inc)
            .groupBy("column_name")
            .agg(
                F.sum("n_early").cast("bigint").alias("n_early"),
                F.sum("n_late").cast("bigint").alias("n_late"),
            )
        )
    else:
        merged = inc
    # break lineage from the path we are about to overwrite
    merged = merged.localCheckpoint(eager=True)
    merged.coalesce(1).write.mode("overwrite").parquet(store_path)


def maintain_usage_store(
    logs_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    cutoff: str,
) -> None:
    """Drain the query-log stream (availableNow), maintaining the
    mined-usage store one micro-batch at a time."""
    spark = logs_stream.sparkSession

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        upsert_usage_batch(spark, batch_df, store_path, cutoff)

    q = (
        logs_stream.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
