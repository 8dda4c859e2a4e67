"""foreachBatch maintenance of the incremental sketch store.

Closes the loop between Structured Streaming and the mergeable-sketch
statistics (operators/incremental.py): each micro-batch of the event
stream is sketched and UNIONED into a persisted per-partition stats
table, so advisor statistics stay fresh without ever rescanning base
data. This is the canonical `foreachBatch` upsert topology — the sink
is a tiny parquet table (one row per ingest day), the per-batch work is
one sketch pass over just the batch, and HLL union order-independence
makes the result identical to a full batch recompute no matter how the
stream is micro-batched (asserted in tests/test_incremental_sink.py).

At 100 TB: base events never re-read; per-batch cost is O(batch); the
stats table stays KB-sized. For exactly-once on a real deployment the
swap-write below becomes a transactional table (Iceberg/Delta) MERGE —
the checkpoint already makes the batch ids replay-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    stats_path: str,
    key_cols: list[str],
    lg_k: int = 12,
) -> None:
    """Sketch one micro-batch and fold it into the persisted stats table
    (read-merge-overwrite; the table is partition-stats-sized, so the
    rewrite is trivially small)."""
    from ..operators import incremental

    new = incremental.sketch_partition_stats(
        batch_df, F.to_date("ts"), key_cols, lg_k
    )
    try:
        existing = spark.read.parquet(stats_path)
        has_existing = True
    except Exception:
        has_existing = False
    if has_existing:
        aggs = [F.sum("n_rows").alias("n_rows")]
        for c in key_cols:
            aggs.append(F.hll_union_agg(F.col(f"hll_{c}")).alias(f"hll_{c}"))
        merged = existing.unionByName(new).groupBy("part").agg(*aggs)
    else:
        merged = new
    # break lineage from the path we are about to overwrite
    merged = merged.localCheckpoint(eager=True)
    merged.coalesce(1).write.mode("overwrite").parquet(stats_path)


def maintain_partition_stats(
    events_stream: DataFrame,
    stats_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    lg_k: int = 12,
) -> None:
    """Drain the stream (availableNow), maintaining the sketch store one
    micro-batch at a time."""
    spark = events_stream.sparkSession

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(spark, batch_df, stats_path, key_cols, lg_k)

    q = (
        events_stream.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
