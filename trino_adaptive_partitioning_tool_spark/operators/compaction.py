"""Small-file compaction for parquet datasets (extensions layer).

Training-data pipelines accumulate small files from incremental ingests
and partitioned writes; scan throughput then dies on open/footer
overhead. Compaction = read → repartition to size-targeted file count →
rewrite. At 100 TB the same code runs per-partition (pass
`partition_cols` so files only merge within their partition).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def dataset_file_stats(path: str) -> dict[str, float]:
    """File-count / byte-size profile of a local dataset directory.
    (Cluster deployments swap this for a Hadoop FileSystem listing.)"""
    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                sizes.append(os.path.getsize(os.path.join(root, f)))
    total = float(sum(sizes))
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "avg_bytes": total / len(sizes) if sizes else 0.0,
    }


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_cols: list[str] | None = None,
) -> dict[str, float]:
    """Rewrite `src` into `dest` with size-targeted files. Returns the
    before/after file stats. With `partition_cols`, data is repartitioned
    on those columns (hash) so each partition directory compacts locally
    — the write stays partitionBy'd and prunable."""
    before = dataset_file_stats(src)
    df = spark.read.parquet(src)
    n_files = max(int(math.ceil(before["total_bytes"] / target_file_bytes)), 1)
    if partition_cols:
        out = df.repartition(*[F.col(c) for c in partition_cols])
        writer = out.write.mode("overwrite").partitionBy(*partition_cols)
    else:
        out = df.repartition(n_files)
        writer = out.write.mode("overwrite")
    writer.parquet(dest)
    after = dataset_file_stats(dest)
    return {
        "before_files": before["n_files"],
        "after_files": after["n_files"],
        "total_bytes": before["total_bytes"],
    }
