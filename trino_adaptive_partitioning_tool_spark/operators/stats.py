"""Per-table column statistics — ONE aggregation pass per table.

Parity targets (reference, all N+1 per-(view,column) SQL round-trips the
rebuild collapses into a single distributed agg per table):
  * approx-distinct cardinality      src/partitioning.py:102-121 (A2)
  * percentile/skew/density profile  src/partitioning.py:240-292 (A5)
  * min/max value range              src/partitioning.py:368-375 (A6)
  * date-granularity probe           src/partitioning.py:378-408 (A7)

Design for 100 TB: the wide `agg()` produces ONE row per table (partial
aggregation map-side, tiny shuffle), which is then unpivoted to a long
(column, stats...) DataFrame via an array-of-structs explode — no
`.collect()`, no per-column jobs, no driver loops.

Deviation from the reference, documented: the reference's granularity
probe counts DISTINCT day-of-month / month-of-year numbers (Trino `day()`
is day-of-month), capping day_count at 31 and making the "day" branch
nearly unreachable. The intent is clearly "how many distinct days vs
months vs years does the data span", so we count distinct truncated
dates. Thresholds keep the reference's 20x / 8x constants
(src/partitioning.py:401-406).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUMERIC_TYPES = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}
DATETIME_TYPES = {"date", "timestamp", "timestamp_ntz"}

PERCENTILE_POINTS = (0.1, 0.5, 0.9)
PERCENTILE_ACCURACY = 10000


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in NUMERIC_TYPES


def _is_datetime(dtype: str) -> bool:
    return dtype.split("(")[0] in DATETIME_TYPES


def _profilable(dtype: str) -> bool:
    base = dtype.split("(")[0]
    return base in NUMERIC_TYPES or base in DATETIME_TYPES or base in {
        "string", "varchar", "char", "boolean"
    }


def column_profiles(
    df: DataFrame,
    table: str,
    columns: list[str] | None = None,
    exact: bool = False,
    percentiles: bool = True,
) -> DataFrame:
    """Profile every (profilable) column of `df` in one aggregation.

    Returns a long DataFrame:
      (table, column, data_type, total_count, non_null_count,
       distinct_count, min_value, max_value, value_range,
       p10, p50, p90, skew_ratio, density,
       day_count, month_count, year_count)

    `exact=True` swaps approx sketches (HLL / approx percentiles — the
    reference's approx_distinct / approx_percentile family) for exact
    variants, used by oracle-checked queries. `percentiles=False` skips
    the percentile aggregates entirely (p10/p50/p90 come back NULL,
    skew_ratio 1.0) — callers that only need cardinality/range/
    granularity (the scoring+transform path) shouldn't pay for a sort
    aggregate per numeric column.
    """
    dtypes = dict(df.dtypes)
    cols = [c for c in (columns or df.columns) if _profilable(dtypes[c])]

    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        col = F.col(c)
        if exact:
            aggs.append(F.count_distinct(col).alias(f"{c}__dc"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"{c}__dc"))
        aggs.append(F.count(col).alias(f"{c}__nn"))
        if _is_numeric(dtypes[c]):
            aggs.append(F.min(col).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(col).cast("double").alias(f"{c}__max"))
            if percentiles:
                pcts = F.array(*[F.lit(p) for p in PERCENTILE_POINTS])
                if exact:
                    aggs.append(F.percentile(col, pcts).alias(f"{c}__pct"))
                else:
                    aggs.append(
                        F.percentile_approx(
                            col, pcts, F.lit(PERCENTILE_ACCURACY)
                        ).alias(f"{c}__pct")
                    )
        if _is_datetime(dtypes[c]):
            # exact path: COUNT(DISTINCT ...) like the reference probe; the
            # approx path swaps in HLL so the agg stays Expand-free (three
            # distinct aggregates per datetime column would multiply every
            # input row through a Catalyst Expand — ruinous at 100 TB).
            ndv = F.count_distinct if exact else F.approx_count_distinct
            aggs.append(ndv(F.to_date(col)).alias(f"{c}__days"))
            aggs.append(ndv(F.date_trunc("month", col)).alias(f"{c}__months"))
            aggs.append(ndv(F.year(col)).alias(f"{c}__years"))

    wide = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("bigint")
    null_a = F.lit(None).cast("array<double>")
    # Keep the struct fields raw (min/max/pct array as-is); derived values
    # (value_range, p10/p50/p90 extraction) are projected AFTER the explode
    # so the analyzer sees ~12 expressions per column here instead of ~17
    # with casts/arithmetic — plan-compile time scales with this tree.
    structs = []
    for c in cols:
        numeric = _is_numeric(dtypes[c])
        dt = _is_datetime(dtypes[c])
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("data_type"),
                F.col("__total").alias("total_count"),
                F.col(f"{c}__nn").alias("non_null_count"),
                F.col(f"{c}__dc").alias("distinct_count"),
                (F.col(f"{c}__min") if numeric else null_d).alias("min_value"),
                (F.col(f"{c}__max") if numeric else null_d).alias("max_value"),
                (
                    F.col(f"{c}__pct").cast("array<double>")
                    if numeric and percentiles
                    else null_a
                ).alias("pct"),
                (F.col(f"{c}__days") if dt else null_l).alias("day_count"),
                (F.col(f"{c}__months") if dt else null_l).alias("month_count"),
                (F.col(f"{c}__years") if dt else null_l).alias("year_count"),
            )
        )

    long = (
        wide.select(F.explode(F.array(*structs)).alias("p"))
        .select(F.lit(table).alias("table"), "p.*")
    )
    long = long.withColumns(
        {
            "value_range": F.col("max_value") - F.col("min_value"),
            "p10": F.element_at("pct", 1),
            "p50": F.element_at("pct", 2),
            "p90": F.element_at("pct", 3),
        }
    ).drop("pct")
    return long.withColumns(
        {
            # skew_ratio = p90/p10, 1.0 when undefined (p10 == p90 or p10
            # == 0 — reference guard src/partitioning.py:272-275) plus the
            # §8.6 fix: NULL-safe and guarded for p10 <= 0, not just == 0.
            "skew_ratio": F.when(
                F.col("p10").isNotNull()
                & (F.col("p10") > 0)
                & (F.col("p10") != F.col("p90")),
                F.col("p90") / F.col("p10"),
            ).otherwise(F.lit(1.0)),
            "density": F.when(
                F.col("total_count") > 0,
                F.col("distinct_count").cast("double") / F.col("total_count"),
            ).otherwise(F.lit(0.0)),
        }
    )


def with_date_granularity(profiles: DataFrame) -> DataFrame:
    """Pick day/month/year partition granularity per datetime column.

    Reference thresholds (src/partitioning.py:401-406): 'day' when
    day_count > 20 x month_count, 'month' when month_count > 8 x
    year_count, else 'year'.
    """
    return profiles.withColumn(
        "granularity",
        F.when(F.col("day_count").isNull(), F.lit(None).cast("string"))
        .when(F.col("day_count") > 20 * F.col("month_count"), F.lit("day"))
        .when(F.col("month_count") > 8 * F.col("year_count"), F.lit("month"))
        .otherwise(F.lit("year")),
    )


def profile_tables(
    dfs: dict[str, DataFrame], exact: bool = False, percentiles: bool = True
) -> DataFrame:
    """Union of per-table profiles (one agg pass each, unioned lazily)."""
    out: DataFrame | None = None
    for name, df in dfs.items():
        p = with_date_granularity(
            column_profiles(df, name, exact=exact, percentiles=percentiles)
        )
        out = p if out is None else out.unionByName(p)
    assert out is not None, "no tables to profile"
    return out
