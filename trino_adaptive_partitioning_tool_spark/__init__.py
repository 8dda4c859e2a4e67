"""PySpark-native rebuild of the Trino Adaptive Partitioning Tool.

A workload-driven partition-recommendation engine plus the full relational
operator surface the reference delegates to Trino, re-expressed Spark-first
(reference: javaids33/Trino-Adaptive-Partitioning-Tool, surveyed in
/root/repo/SURVEY.md). Everything here is built on the public PySpark
DataFrame / SQL / Structured Streaming APIs.

Layout:
    session       SparkSession factory (AQE, arrow, UTC)
    sources/      parquet table loaders + deterministic engine fixtures
    operators/    mining, stats, scoring, transforms, recommend, dedup,
                  similarity, text, multimodal
    functions/    reusable Column-expression helpers
    plans/        plan-inspection utilities (pushdown/broadcast checks)
    streaming/    Structured Streaming query-log tail
"""

__version__ = "0.1.0"
