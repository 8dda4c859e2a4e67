"""Bucketed tables for shuffle-free co-located joins (SURVEY §4.3).

Writing both sides of a hot join bucketed on the join key means the join
needs NO exchange at read time — at 100 TB this turns the biggest
fact-to-fact join from a full-cluster shuffle into a local zip of
matching buckets. Spark requires bucketed data to live in the catalog
(`saveAsTable`), so these helpers manage warehouse tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_key: str | None = None,
) -> None:
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_key)
    )
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    left_key: str,
    right_table: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs
    Catalyst plans a SortMergeJoin with NO Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
