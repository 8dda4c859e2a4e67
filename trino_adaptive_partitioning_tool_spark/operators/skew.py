"""Skew mitigation utilities (SURVEY §4.3 scale contract).

Two mechanisms, composable with any join/agg in the engine:

  * AQE skew-join splitting is ON by default in session.get_spark
    (spark.sql.adaptive.skewJoin.enabled) — handles runtime-detected
    skew with zero code changes.
  * Explicit salting below, for when the skewed key set is known (or for
    aggregations, which AQE skew-join doesn't cover): fan hot keys out
    over N salt buckets, aggregate partially per salted key, then merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Row salt in [0, n_salts) derived from row POSITION
    (monotonically_increasing_id), never from the row's values: a salt
    that is a function of the group key (or of columns correlated with
    it — including exact-duplicate rows in dedup workloads) would send
    every row of a hot key to the same (key, salt) bucket and defeat the
    fan-out. Position-based salt is stable under recomputation for a
    deterministic scan (parquet splits), unlike rand()."""
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), n_salts)
    )


def salted_groupby_count(
    df: DataFrame, key: str | Column, n_salts: int = 16
) -> DataFrame:
    """Two-phase count for skewed group keys: groupBy(key, salt) partial
    counts (spreads a hot key over n_salts reducers), then groupBy(key)
    final merge — the same partial/final split Spark applies map-side,
    extended across the shuffle boundary."""
    keyc = F.col(key) if isinstance(key, str) else key
    # Salt BEFORE projecting down to the key: the salt must vary within a
    # key's rows, so it cannot be computed from the key alone.
    salted = with_salt(df, n_salts).select(keyc.alias("key"), "__salt")
    partial = salted.groupBy("key", "__salt").agg(
        F.count(F.lit(1)).alias("partial_count")
    )
    return partial.groupBy("key").agg(
        F.sum("partial_count").alias("count")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side, replicate the dim
    side n_salts times, join on (key, salt). Shuffle spreads each hot key
    over n_salts partitions at the cost of replicating the (small) dim.
    Prefer broadcast() when the dim fits; this is for mid-size dims with
    a skewed fact key."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    fact_s = with_salt(fact, n_salts)
    dim_s = dim.select("*", salts)
    return fact_s.join(dim_s, [key, "__salt"]).drop("__salt")


def with_keyed_salt(
    df: DataFrame,
    advice: DataFrame,
    key: str,
    salt_col: str = "__salt",
) -> DataFrame:
    """Per-key salting driven by sizing advice: join the (key,
    salt_factor) frame produced by operators/sizing.advise_salt_factors
    and salt each row in [0, its key's salt_factor) — hot keys fan out
    wide, cold keys stay unsalted (factor 1), instead of paying one
    global fan-out everywhere. The advice side is group-cardinality
    sized; no broadcast hint, AQE picks one when it fits. Same
    position-derived salt as with_salt (never a function of the key)."""
    adv = advice.select(
        F.col("key").alias(key), F.col("salt_factor").alias("__sf")
    )
    return (
        df.join(adv, key, "left")
        .withColumn(
            salt_col,
            F.pmod(
                F.monotonically_increasing_id(),
                F.coalesce(F.col("__sf"), F.lit(1)),
            ),
        )
        .drop("__sf")
    )
