"""Iceberg partition-transform selection + DDL generation.

Parity target: the whole of reference src/iceberg_utils.py:1-46 plus the
DDL assembly at src/partitioning.py:327-440, re-expressed as a single
`when/otherwise` Column expression (no UDF needed) over the per-column
stats profile:

  date/timestamp  → day(col) / month(col) / year(col) by granularity probe
  string family   → bucket(16, col) when cardinality > 10,000 else identity
  int/bigint      → bucket(clamp(card/500, 4, 32), col) when card > 1,000
                    else truncate(col, 100) when value range > 10,000
                    else identity
  anything else   → identity

The recommendation carries `partition_keys` as a real array<string>
column (fixing the reference's reparse bug, SURVEY §8.2 — the dashboard
splits on "SET PARTITIONING" while the generator emits "REPLACE
PARTITION SPEC", so keys always parsed empty).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VARCHAR_BUCKET_THRESHOLD = 10_000  # src/iceberg_utils.py:23
VARCHAR_BUCKET_COUNT = 16
INT_BUCKET_THRESHOLD = 1_000  # src/iceberg_utils.py:33
INT_BUCKET_DIVISOR = 500
INT_BUCKET_MIN, INT_BUCKET_MAX = 4, 32  # src/iceberg_utils.py:34
INT_TRUNCATE_RANGE = 10_000  # src/iceberg_utils.py:38-41
INT_TRUNCATE_WIDTH = 100

_STRING_TYPES = ("string", "varchar", "char")
_INT_TYPES = ("int", "bigint", "smallint", "tinyint")
_DATE_TYPES = ("date", "timestamp", "timestamp_ntz")


def _base_type(data_type: Column) -> Column:
    return F.split(data_type, r"\(")[0]


def transform_expr(
    column: Column, data_type: Column, cardinality: Column,
    value_range: Column, granularity: Column,
) -> Column:
    """Iceberg transform string for one candidate column."""
    base = _base_type(data_type)
    bucket_n = F.least(
        F.greatest(
            F.floor(cardinality / INT_BUCKET_DIVISOR).cast("int"),
            F.lit(INT_BUCKET_MIN),
        ),
        F.lit(INT_BUCKET_MAX),
    )
    return (
        F.when(
            base.isin(*_DATE_TYPES),
            F.format_string(
                "%s(%s)", F.coalesce(granularity, F.lit("month")), column
            ),
        )
        .when(
            base.isin(*_STRING_TYPES),
            F.when(
                cardinality > VARCHAR_BUCKET_THRESHOLD,
                F.format_string(
                    "bucket(%d, %s)", F.lit(VARCHAR_BUCKET_COUNT), column
                ),
            ).otherwise(column),
        )
        .when(
            base.isin(*_INT_TYPES),
            F.when(
                cardinality > INT_BUCKET_THRESHOLD,
                F.format_string("bucket(%d, %s)", bucket_n, column),
            )
            .when(
                value_range > INT_TRUNCATE_RANGE,
                F.format_string(
                    "truncate(%s, %d)", column, F.lit(INT_TRUNCATE_WIDTH)
                ),
            )
            .otherwise(column),
        )
        .otherwise(column)
    )


def with_transforms(top_df: DataFrame) -> DataFrame:
    """Attach the chosen Iceberg transform to each top-N candidate row."""
    return top_df.withColumn(
        "transform",
        transform_expr(
            F.col("column"),
            F.col("data_type"),
            F.col("distinct_count"),
            F.col("value_range"),
            F.col("granularity"),
        ),
    )


def partition_scripts(transformed_df: DataFrame, all_views: DataFrame) -> DataFrame:
    """Assemble one DDL script per view (reference src/partitioning.py:414-440).

    Output: (view, partition_keys array<string>, transforms array<string>,
    total_score double, script string). Views with no positive-score
    candidate get the reference's comment-only script ("-- No suitable
    partition columns identified..."), which the execute path skips
    (src/cli.py:126).
    """
    per_view = transformed_df.groupBy("view").agg(
        F.sort_array(
            F.collect_list(F.struct("rank", "column", "transform", "score"))
        ).alias("cands")
    ).select(
        "view",
        F.col("cands.column").alias("partition_keys"),
        F.col("cands.transform").alias("transforms"),
        F.aggregate(
            F.col("cands.score"), F.lit(0.0), lambda a, x: a + x
        ).alias("total_score"),
    ).withColumn(
        "script",
        F.format_string(
            "-- Partition recommendation (score %.1f)\nALTER TABLE %s REPLACE PARTITION SPEC (%s);",
            F.col("total_score"),
            F.col("view"),
            F.array_join("transforms", ", "),
        ),
    )
    views = all_views.select(
        F.concat_ws(".", "table_schema", "table_name").alias("view")
    )
    return (
        views.join(per_view, "view", "left")
        .withColumns(
            {
                "partition_keys": F.coalesce(
                    "partition_keys", F.array().cast("array<string>")
                ),
                "transforms": F.coalesce(
                    "transforms", F.array().cast("array<string>")
                ),
                "total_score": F.coalesce("total_score", F.lit(0.0)),
                "script": F.coalesce(
                    "script",
                    F.format_string(
                        "-- No suitable partition columns identified for %s",
                        F.col("view"),
                    ),
                ),
            }
        )
    )


_TRANSFORM_RE = re.compile(
    r"^(?:(day|month|year)\((\w+)\)|bucket\((\d+),\s*(\w+)\)"
    r"|truncate\((\w+),\s*(\d+)\)|(\w+))$"
)


def transform_to_partition_column(transform: str) -> tuple[str, Column] | None:
    """Iceberg transform string → (partition column name, expression).

    day(c)→to_date, month(c)→'yyyy-MM', year(c)→year, bucket(n,c)→
    pmod(xxhash64(c), n), truncate(c,w)→floor(c/w)*w, identity→the column.
    Mirrors how Iceberg derives partition values from its transforms, so
    the written layout matches what the emitted DDL would produce.
    """
    m = _TRANSFORM_RE.match(transform.strip())
    if not m:
        return None
    dpart, dcol, bn, bcol, tcol, tw, ident = m.groups()
    if dpart:
        expr = {
            "day": F.to_date(F.col(dcol)).cast("string"),
            "month": F.date_format(F.col(dcol), "yyyy-MM"),
            "year": F.year(F.col(dcol)).cast("string"),
        }[dpart]
        return f"{dcol}_{dpart}", expr
    if bn:
        return f"{bcol}_bucket", F.pmod(F.xxhash64(F.col(bcol)), int(bn))
    if tcol:
        w = int(tw)
        return f"{tcol}_trunc", (F.floor(F.col(tcol) / w) * w).cast("bigint")
    return ident, F.col(ident)


def apply_recommendation(
    df: DataFrame,
    path: str,
    transforms_list: list[str],
    max_keys: int = 1,
) -> list[str]:
    """Spark-native "execute" path: rewrite the table partitioned by the
    recommended transform(s). The reference ships `ALTER TABLE ... REPLACE
    PARTITION SPEC` to Trino (src/cli.py:124-133); plain Spark applies
    layout at write time. Dry-run remains the CLI default (reference
    src/config.py:15).

    `max_keys=1` applies the top transform only — nesting all top-N specs
    multiplies leaf directories, and a repartition by the partition
    column(s) precedes the write so each leaf gets one file instead of
    one per task (the classic small-files trap at scale).
    Returns the partition column names used.
    """
    derived: list[tuple[str, Column]] = []
    for t in transforms_list[:max_keys]:
        pc = transform_to_partition_column(t)
        if pc is not None and (pc[0] in df.columns or pc[1] is not None):
            derived.append(pc)
    out = df
    keys = []
    for name, expr in derived:
        out = out.withColumn(name, expr)
        keys.append(name)
    writer = (
        out.repartition(*[F.col(k) for k in keys]) if keys else out
    ).write.mode("overwrite")
    if keys:
        writer = writer.partitionBy(*keys)
    writer.parquet(path)
    return keys
