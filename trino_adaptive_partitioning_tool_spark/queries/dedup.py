"""Deduplication operators over the `documents` table (extensions layer).

Exact dedup lands here; MinHash/SimHash/Jaccard variants are added in
operators/dedup.py and registered as they land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables
from .registry import register


@register(
    "dedup_exact",
    oracle="""
    SELECT
      CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
      COUNT(*) AS dup_count,
      CAST(MIN(n_chars) AS BIGINT) AS n_chars
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (full-text hash) dedup: one canonical row per distinct text,
    keeping the lowest doc_id — a single hash-aggregate, the 100 TB-safe
    shape (shuffle on text hash, map-side partial agg)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
        F.min("n_chars").alias("n_chars"),
    ).drop("text")
