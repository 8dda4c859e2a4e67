"""Deterministic sampling, splits, and sequence packing for training-data
pipelines (extension beyond the reference, per the rebuild's north star —
the reference has no sampling surface).

Everything here is HASH-deterministic, not RNG-seeded: membership depends
only on a row's id, never on partitioning, executor count, or Spark's
sample() Bernoulli draw. That is the property a 100 TB pipeline needs —
re-runs, backfills, and per-partition retries all assign the same rows to
the same split/sample/pack — and it makes every operator exactly
reproducible in the DuckDB oracle via the portable 60-bit md5 hash
(operators/dedup.md5_60).

Scale notes:
* split/sample are map-only (no shuffle, no global count); the hash
  predicate sits right above the scan so column pruning and partition
  pruning are unaffected.
* packing needs an ordered running sum, which is only parallel if the
  window key fans out. `pack_sequences` therefore packs per
  (group, shard) with shard = hash(id) % n_shards: at 1000 executors you
  pick n_shards ≈ a few × cores; each shard packs independently and bin
  ids are globally unique via (group, shard, bin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_60, md5_60_sql

SPLIT_BUCKETS = 10_000


def split_bucket(id_col: Column, salt: str = "split") -> Column:
    """Stable bucket in [0, 10000) from a row id + salt. The salt keeps
    independent uses (split vs sample) uncorrelated."""
    return F.pmod(
        md5_60(F.concat_ws("|", F.lit(salt), id_col.cast("string"))),
        F.lit(SPLIT_BUCKETS),
    )


def split_bucket_sql(id_expr: str, salt: str = "split") -> str:
    """DuckDB rendering of split_bucket for oracle builders."""
    h = md5_60_sql(f"concat_ws('|', '{salt}', CAST({id_expr} AS VARCHAR))")
    return f"({h} % {SPLIT_BUCKETS})"


def train_test_split(
    df: DataFrame,
    id_col: str,
    train_frac: float = 0.8,
    valid_frac: float = 0.0,
) -> DataFrame:
    """Tag each row train/valid/test by hash bucket — disjoint, exhaustive,
    and stable under any reshuffling or re-ingestion of the data."""
    b = split_bucket(F.col(id_col))
    train_hi = int(train_frac * SPLIT_BUCKETS)
    valid_hi = train_hi + int(valid_frac * SPLIT_BUCKETS)
    tag = (
        F.when(b < train_hi, F.lit("train"))
        .when(b < valid_hi, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", tag)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    bucket falls under its stratum's quota. Unlike df.sampleBy this is
    reproducible across runs/planners and needs no RNG state."""
    b = split_bucket(F.col(id_col), salt="sample")
    quota = F.lit(int(default_frac * SPLIT_BUCKETS))
    for value, frac in sorted(fractions.items()):
        quota = F.when(
            F.col(strata_col) == value, F.lit(int(frac * SPLIT_BUCKETS))
        ).otherwise(quota)
    return df.where(b < quota)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Deterministic per-group row cap ("domain throttling"): keep at
    most ``cap`` rows per group, selected by stable id-hash rank — the
    web-corpus curation step that stops a single domain/source from
    dominating the training mixture.

    Hash-rank selection (not first-N-in-scan-order) keeps the choice
    reproducible across re-runs and re-partitioning, and uniform over
    each group rather than biased toward early files. One shuffle on
    ``group_col``; a hot group sorts within its own partitions only
    (row_number, no global sort). For groups big enough that even one
    group exceeds a task, pre-thin with `stratified_sample` at a rate
    just above cap/count first — the hash order is salted differently,
    so thinning then capping stays deterministic."""
    order = md5_60(
        F.concat_ws("|", F.lit("cap"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col))
    return (
        df.withColumn("__cap_rank", F.row_number().over(w))
        .where(F.col("__cap_rank") <= cap)
        .drop("__cap_rank")
    )


def pack_sequences(
    df: DataFrame,
    group_col: str,
    id_col: str,
    token_count_col: str,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """Assign documents to fixed token-budget packs (context-window
    bins) by offset binning: within each (group, shard), documents are
    laid end-to-end in stable id-hash order and a pack boundary falls
    every `budget` tokens. A document starting inside pack k belongs to
    pack k (packs can overhang by < 1 doc — the truncation-style packing
    used for LLM pretraining batches).

    Window-sum over (group, shard) keys → parallelism = groups×shards,
    independent of total rows."""
    return _pack_annotated(
        df, group_col, id_col, token_count_col, budget, n_shards
    ).drop("pack_order", "tokens_before")


def _pack_annotated(
    df: DataFrame,
    group_col: str,
    id_col: str,
    token_count_col: str,
    budget: int,
    n_shards: int,
) -> DataFrame:
    """pack_sequences' annotated core: input plus shard, pack_order
    (stable hash), tokens_before (end-to-end start offset within the
    (group, shard) lane), and pack_id."""
    shard = F.pmod(md5_60(F.col(id_col).cast("string")), F.lit(n_shards))
    order = md5_60(F.concat_ws("|", F.lit("packorder"), F.col(id_col).cast("string")))
    w = (
        Window.partitionBy(group_col, "shard")
        .orderBy("pack_order", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("pack_order", order)
        .withColumn(
            "tokens_before",
            F.coalesce(F.sum(token_count_col).over(w), F.lit(0)),
        )
        .withColumn(
            "pack_id", (F.col("tokens_before") / F.lit(budget)).cast("bigint")
        )
    )


def pack_sequences_manifest(
    df: DataFrame,
    group_col: str,
    id_col: str,
    token_count_col: str,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """The MATERIALIZABLE per-document packing manifest: for every
    document its (group, shard, pack_id), its position within the pack
    (seq_in_pack, 1-based in stable hash order), its token count, and
    its start offset inside the pack (pack_offset = tokens_before -
    pack_id * budget, in [0, budget) by construction). Written as a
    parquet artifact (write_pack_manifest), this is sufficient to
    reconstruct every batch exactly: ordering a lane by (pack_id,
    seq_in_pack) and laying documents end-to-end reproduces each
    document's recorded offset, so every token is accounted for exactly
    once and no pack starts a document at an offset >= budget —
    round-trip-verified in tests/test_sampling.py. Same two-window plan
    shape as pack_sequences (parallelism = groups x shards)."""
    ann = _pack_annotated(
        df, group_col, id_col, token_count_col, budget, n_shards
    )
    w_seq = Window.partitionBy(group_col, "shard", "pack_id").orderBy(
        "pack_order", id_col
    )
    return ann.select(
        F.col(group_col),
        F.col("shard").cast("bigint").alias("shard"),
        "pack_id",
        F.row_number().over(w_seq).cast("bigint").alias("seq_in_pack"),
        F.col(id_col),
        F.col(token_count_col).cast("bigint").alias("token_count"),
        (F.col("tokens_before") - F.col("pack_id") * budget)
        .cast("bigint")
        .alias("pack_offset"),
    )


def write_pack_manifest(
    manifest: DataFrame, path: str, partition_cols: tuple[str, ...] = ()
) -> None:
    """Persist a pack_sequences_manifest frame as the parquet artifact a
    training-data loader consumes (optionally hive-partitioned by e.g.
    the group column so one lane's packs prune to one directory)."""
    writer = manifest.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
