"""Text-analysis operators over the `documents` table (extensions).

Token counting / quality scoring land first; language-ID and
fingerprinting are added in operators/text.py as they land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables
from .registry import register


@register(
    "text_token_stats",
    oracle="""
    SELECT
      doc_id,
      CAST(length(text) AS BIGINT) AS char_count,
      CAST(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
           AS BIGINT) AS token_count
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting — all JVM-side string ops, no UDF."""
    docs = tables.load_table(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("char_count"),
        (
            F.length(trimmed) - F.length(F.replace(trimmed, F.lit(" "), F.lit("")))
            + 1
        ).cast("bigint").alias("token_count"),
    )
