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
by the streaming_drift_triggers driver row. PRECONDITION: query_id is
unique per log row (true of any real query log and the fixture). With
duplicated ids the batch query's mined-rows-to-create_time join fans
out across ALL same-id rows, which a per-batch join can only replicate
when the duplicates land in one batch — uniqueness makes the
equivalence slicing-proof.

Replay safety: Spark re-executes a foreachBatch micro-batch with the
SAME batch_id after a crash between the sink write and the checkpoint
commit; upsert_usage_batch records the last applied (run_token,
batch_id) next to the store and skips replays, so counts are never
folded twice. The token is the checkpoint location, coupling the
marker to the checkpoint lifecycle: a FRESH checkpoint (reprocessing a
corrected feed into the same store) restarts ids at 0 and must fold,
not skip.

At 100 TB: the log stream is consumed once, per-batch cost is one
miner pass over just the batch (map-side combined into <= distinct
columns rows), and the store stays column-count-sized (KB). The
read-merge-overwrite + marker below becomes a transactional MERGE on
a real deployment (one atomic commit instead of two files).
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def usage_increments(
    batch_df: DataFrame, cutoff: str
) -> DataFrame:
    """Mine one micro-batch of query-log rows into per-column
    (column_name, n_early, n_late) mention counts — the additive unit
    the store folds. Same mining + filtering as the batch drift query
    (join/where mention kinds, empty names dropped). The join back to
    create_time is batch-local, which matches the batch query's
    whole-log join exactly when query_id is unique per log row (the
    module-docstring precondition); duplicated ids split across batches
    would fan out less here than in the batch join."""
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


def _marker_path(store_path: str) -> str:
    return store_path.rstrip("/") + ".last_batch"


def upsert_usage_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    cutoff: str,
    batch_id: int | None = None,
    run_token: str | None = None,
) -> None:
    """Fold one micro-batch's usage increments into the persisted store
    (read-merge-overwrite; the store is distinct-column-count-sized, so
    the rewrite is trivially small). When ``batch_id`` is given
    (foreachBatch replay contract), a replayed batch — same id already
    recorded in the sidecar marker UNDER THE SAME run_token — is a
    no-op, so crash-replay never double-counts. The token (the
    checkpoint location; maintain_usage_store passes it) couples the
    marker's lifecycle to the checkpoint's: a fresh checkpoint restarts
    batch ids at 0, and without the token match those real batches
    would read as replays and be silently dropped (r8 second review).
    Only a MISSING store reads as empty; any other read failure
    (partial overwrite, transient FS error) propagates rather than
    silently resetting the accumulated history."""
    import json as _json

    marker = _marker_path(store_path)
    if batch_id is not None and os.path.exists(marker):
        with open(marker) as fh:
            try:
                rec = _json.loads(fh.read() or "{}")
            except ValueError:
                rec = {}
        if (
            rec.get("token") == run_token
            and batch_id <= rec.get("batch_id", -1)
        ):
            return  # checkpointed replay of an already-applied batch
    inc = usage_increments(batch_df, cutoff)
    try:
        existing = spark.read.parquet(store_path)
        has_existing = True
    except AnalysisException as exc:
        # PATH_NOT_FOUND on the first batch is the expected empty-store
        # case; anything else (corrupt store, permissions) must surface
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise
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
    if batch_id is not None:
        # Marker trails the store write, so the exposure is exactly the
        # gap between these two statements: a crash there replays a
        # batch the store already folded (double-count), while the
        # pre-marker ordering would instead LOSE a batch on a crash
        # before the write. The marker shrinks the r8-review finding
        # (every replay double-counts) to that one-statement window;
        # only a transactional table's single commit closes it fully
        # (module docstring) — the checkpointed batch_id makes that
        # MERGE idempotent for free.
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as fh:
            fh.write(
                _json.dumps({"token": run_token, "batch_id": batch_id})
            )
        os.replace(tmp, marker)


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
        upsert_usage_batch(
            spark, batch_df, store_path, cutoff,
            batch_id=batch_id, run_token=checkpoint_dir,
        )

    q = (
        logs_stream.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
