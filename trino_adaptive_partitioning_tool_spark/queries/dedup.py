"""Deduplication queries over the `documents` table (extensions layer).

SQL-expressible variants (exact dedup, grouped token-Jaccard) carry DuckDB
oracles; sketch-based variants (MinHash LSH, SimHash) hash with Spark's
xxhash64, which DuckDB can't reproduce → rows-only checks, with their
verify stages (exact Jaccard) oracle-checked separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as ops
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
    """Exact (full-text) dedup: one canonical row per distinct text — a
    single hash-aggregate, the 100 TB-safe shape."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("dup_count"),
        F.min("n_chars").alias("n_chars"),
    ).drop("text")


@register(
    "dedup_exact_groups",
    oracle="""
    SELECT
      CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
      COUNT(*) AS dup_count
    FROM documents
    GROUP BY text
    HAVING COUNT(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Only the actual duplicate groups (dup_count > 1)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return ops.exact_duplicates(docs, ["text"], "doc_id").select(
        "canonical_id", "dup_count"
    )


@register(
    "dedup_token_jaccard",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, source,
             list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS toks
      FROM documents
    )
    SELECT
      a.doc_id AS id_a,
      b.doc_id AS id_b,
      ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
    FROM tok a
    JOIN tok b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
    """,
)
def dedup_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-token Jaccard ≥ 0.8 within (lang, source) blocks —
    blocked pairing keeps the join quadratic only within small groups
    (classic blocking strategy; at scale the blocks are the shuffle key).
    """
    docs = tables.load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", "source",
        F.array_distinct(ops.tokens_expr("text")).alias("toks"),
    )
    a = tok.select(
        F.col("doc_id").alias("id_a"), "lang", "source",
        F.col("toks").alias("toks_a"),
    )
    b = tok.select(
        F.col("doc_id").alias("id_b"), "lang", "source",
        F.col("toks").alias("toks_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("double")
    raw = inter / union
    return (
        a.join(b, ["lang", "source"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(raw >= 0.8)
        .select("id_a", "id_b", F.round(raw, 4).alias("jaccard"))
    )


@register("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (shingle→minhash→band→bucket-join).
    xxhash64-based → rows-only check; the exact-Jaccard verify stage is
    oracle-checked as dedup_token_jaccard."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return ops.minhash_lsh_pairs(docs, jaccard_threshold=0.5)


@register("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within hamming distance 3 (pigeonhole
    chunk-join candidates). rows-only (xxhash64-based)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return ops.simhash_near_pairs(docs, max_hamming=3)


@register("dedup_minhash_verified")
def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full two-stage pipeline: LSH candidates → exact-Jaccard verify
    (≥0.7). rows-only; the verify math itself is oracle-covered."""
    docs = tables.load_table(spark, sf_dir, "documents")
    cands = ops.minhash_lsh_pairs(docs, jaccard_threshold=0.0).select(
        "id_a", "id_b"
    )
    return ops.token_jaccard_pairs(docs, cands, threshold=0.7)


@register(
    "dedup_keep_canonical",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE doc_id IN (
      SELECT MIN(doc_id) FROM documents GROUP BY text
    )
    """,
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus itself: keep exactly one (lowest-id) row
    per distinct text. Implemented as a rank-1 window over the text key —
    one shuffle on the dedup key, no join back against the corpus (the
    IN-subquery oracle form would be a second pass at 100 TB)."""
    from pyspark.sql.window import Window

    docs = tables.load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )
