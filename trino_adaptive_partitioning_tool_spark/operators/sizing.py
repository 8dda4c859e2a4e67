"""Sizing advice: shuffle-partition counts and partition-layout what-if.

The reference advises TABLE partition layouts (src/partitioning.py); on
Spark the same adaptive-partitioning question recurs one level down — how
many SHUFFLE partitions should a query use, and what would each candidate
layout cost at read time? These operators answer both from data the
pipeline already has:

* ``advise_shuffle_partitions`` — per logged query, the shuffle partition
  count that puts ~``target_bytes`` in each task (the same arithmetic
  AQE's advisoryPartitionSizeInBytes applies at runtime, surfaced as
  advice for static `spark.sql.shuffle.partitions` settings on clusters
  without AQE, or for sizing `repartition()` calls).
* ``partition_layout_whatif`` — for each candidate partition key, the
  partition count, per-partition row skew, and the expected scan
  fraction of an equality predicate (1/n_partitions): the quantitative
  side of the advisor's layout recommendation. One scan regardless of
  candidate count (stack-exploded), so at 100 TB this costs one pass —
  or one pass over a sample, since only ratios are needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def advise_shuffle_partitions(
    logs_df: DataFrame,
    target_bytes: int = 64 * 1024 * 1024,
    max_partitions: int = 2000,
) -> DataFrame:
    """(query_id, input_bytes, advised_partitions): ceil(bytes/target)
    clamped to [1, max_partitions]; null byte counts advise 1."""
    advised = F.least(
        F.greatest(
            F.ceil(
                F.coalesce(F.col("input_bytes"), F.lit(0)).cast("double")
                / F.lit(float(target_bytes))
            ),
            F.lit(1),
        ),
        F.lit(max_partitions),
    )
    return logs_df.select(
        "query_id",
        "input_bytes",
        advised.cast("bigint").alias("advised_partitions"),
    )


def partition_layout_whatif(
    df: DataFrame, candidates: dict[str, Column]
) -> DataFrame:
    """Per candidate partition key: (candidate_key, n_partitions, n_rows,
    max_partition_rows, skew_ratio, est_scan_fraction).

    skew_ratio = max partition rows / mean partition rows (1.0 = flat);
    est_scan_fraction = 1/n_partitions, the cost of an equality
    predicate under that layout. All candidates are evaluated in ONE
    scan: each row is stack-exploded into (key name, key value) pairs,
    then two hash aggregations derive the report.
    """
    if not candidates:
        raise ValueError(
            "partition_layout_whatif needs at least one candidate key"
        )
    pairs = [
        p
        for name, col in candidates.items()
        for p in (F.lit(name), col.cast("string"))
    ]
    exploded = df.select(
        F.stack(F.lit(len(candidates)), *pairs).alias("candidate_key", "k")
    )
    per = exploded.groupBy("candidate_key", "k").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per.groupBy("candidate_key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.max("n").cast("bigint").alias("max_partition_rows"),
            F.round(
                F.max("n").cast("double") * F.count(F.lit(1)) / F.sum("n"), 4
            ).alias("skew_ratio"),
            F.round(F.lit(1.0) / F.count(F.lit(1)), 6).alias(
                "est_scan_fraction"
            ),
        )
        .orderBy("candidate_key")
    )


def advise_salt_factors(
    df: DataFrame,
    key: Column,
    target_rows_per_task: int = 50,
    max_salts: int = 64,
) -> DataFrame:
    """(key, n_rows, salt_factor): per group key, the salt fan-out that
    caps each (key, salt) bucket at ~``target_rows_per_task`` rows —
    static sizing advice consumed by operators/skew.with_keyed_salt
    when the hot-key set is known up front (AQE skew-join covers joins
    at runtime, but not aggregations). One count aggregation; advice
    rows are group-cardinality-sized."""
    return (
        df.groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "key",
            "n_rows",
            F.least(
                F.greatest(
                    F.ceil(
                        F.col("n_rows").cast("double")
                        / F.lit(float(target_rows_per_task))
                    ),
                    F.lit(1),
                ),
                F.lit(max_salts),
            )
            .cast("bigint")
            .alias("salt_factor"),
        )
    )


# NDV-tiered bucket counts for co-located join layouts: smallest power
# of two with ~1000 distinct keys per bucket, clamped to [4, 64]. A CASE
# ladder over exact integer thresholds (not POWER/LOG2 floats) so the
# advice is bit-reproducible in any engine.
JOIN_BUCKET_TIERS: tuple[tuple[int, int], ...] = (
    (4_000, 4),
    (8_000, 8),
    (16_000, 16),
    (32_000, 32),
)
JOIN_BUCKET_MAX = 64


def bucket_tier_col(ndv: Column) -> Column:
    """advised bucket count for an exact-NDV column (JOIN_BUCKET_TIERS)."""
    expr: Column | None = None
    for bound, buckets in JOIN_BUCKET_TIERS:
        leg = F.when(ndv <= bound, F.lit(buckets))
        expr = leg if expr is None else expr.when(ndv <= bound, F.lit(buckets))
    assert expr is not None
    return expr.otherwise(F.lit(JOIN_BUCKET_MAX)).cast("bigint")


def bucket_tier_sql(ndv_expr: str) -> str:
    """DuckDB rendering of bucket_tier_col (identical CASE ladder)."""
    legs = " ".join(
        f"WHEN {ndv_expr} <= {bound} THEN {buckets}"
        for bound, buckets in JOIN_BUCKET_TIERS
    )
    return f"CAST(CASE {legs} ELSE {JOIN_BUCKET_MAX} END AS BIGINT)"
