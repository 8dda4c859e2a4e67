"""Declarative data-quality constraints (training-pipeline surface; no
reference analog — the reference trusts its inputs, SURVEY §5.1 notes it
ships zero validation).

A constraint set over a table evaluates in ONE aggregation pass
(conditional sums share the scan and the map-side partial agg), emitting
a long report row per constraint — the dbt-test / Deequ shape expressed
as plain DataFrame algebra so Catalyst fuses it with the scan.

Scale contract (100 TB):
  * row constraints: one scan, one 1-row shuffle per table — no per-check
    jobs, no driver loops over rules.
  * uniqueness: COUNT(*) - COUNT(DISTINCT keys) inside the same agg pass
    (no groupBy-then-filter second shuffle).
  * referential integrity: orphan KEYS found on key-distinct inputs
    (shuffles |distinct keys|, not |rows|), then broadcast back against
    the child for the row count — the child table is never shuffled.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowConstraint:
    """A named per-row predicate; `violated` is TRUE when the row FAILS."""

    name: str
    violated: Column


def not_null(col: str) -> RowConstraint:
    return RowConstraint(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> RowConstraint:
    c = F.col(col)
    return RowConstraint(
        f"range({col},{lo},{hi})", c.isNull() | (c < lo) | (c > hi)
    )


def accepted_values(col: str, values: tuple) -> RowConstraint:
    c = F.col(col)
    return RowConstraint(
        f"accepted_values({col})", c.isNull() | ~c.isin(*values)
    )


def matches(name: str, ok: Column) -> RowConstraint:
    """Arbitrary row predicate (`ok` TRUE when the row passes) — for
    cross-column rules like price * (1 - discount) >= 0."""
    return RowConstraint(name, ~F.coalesce(ok, F.lit(False)))


def evaluate_constraints(
    df: DataFrame,
    table: str,
    constraints: list[RowConstraint],
    unique_keys: list[list[str]] | None = None,
) -> DataFrame:
    """One-pass report: (table_name, check_name, n_rows, n_violations,
    violation_rate). Uniqueness checks ride in the SAME agg as
    COUNT(*) - COUNT(DISTINCT key...): zero extra passes."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    names: list[str] = []
    for rc in constraints:
        idx = len(names)
        names.append(rc.name)
        aggs.append(
            F.sum(F.when(rc.violated, 1).otherwise(0)).alias(f"__v{idx}")
        )
    for keys in unique_keys or []:
        idx = len(names)
        names.append(f"unique({','.join(keys)})")
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(*[F.col(k) for k in keys])
            ).alias(f"__v{idx}")
        )
    one = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("constraint"),
                F.col(f"__v{i}").cast("bigint").alias("n_violations"),
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        one.select(F.col("__total").alias("n_rows"), F.explode(pairs).alias("p"))
        .select(
            F.lit(table).alias("table_name"),
            F.col("p.constraint").alias("check_name"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("p.n_violations").alias("n_violations"),
            F.round(F.col("p.n_violations") / F.col("n_rows"), 6).alias(
                "violation_rate"
            ),
        )
    )


def referential_orphans(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    relation: str,
) -> DataFrame:
    """(relation, n_child_rows, n_orphan_keys, n_orphan_rows).

    Anti-join on DISTINCT keys (shuffle is O(|keys|)), then the orphan
    key set joins back onto the child for the row count. No forced
    broadcast: "orphans are tiny" only holds for HEALTHY data — a fully
    orphaned child table would broadcast its entire key set. AQE picks
    broadcast at runtime when the orphan set actually fits."""
    child_keys = child.select(F.col(child_key).alias("k")).where(
        F.col("k").isNotNull()
    )
    parent_keys = parent.select(F.col(parent_key).alias("k")).distinct()
    orphan_keys = child_keys.distinct().join(parent_keys, "k", "left_anti")
    orphan_rows = child_keys.join(orphan_keys, "k", "left_semi")
    return (
        orphan_keys.agg(F.count(F.lit(1)).alias("n_orphan_keys"))
        .crossJoin(child_keys.agg(F.count(F.lit(1)).alias("n_child_rows")))
        .crossJoin(orphan_rows.agg(F.count(F.lit(1)).alias("n_orphan_rows")))
        .select(
            F.lit(relation).alias("relation"),
            F.col("n_child_rows").cast("bigint").alias("n_child_rows"),
            F.col("n_orphan_keys").cast("bigint").alias("n_orphan_keys"),
            F.col("n_orphan_rows").cast("bigint").alias("n_orphan_rows"),
        )
    )


def childless_parents(
    parent: DataFrame,
    parent_key: str,
    child: DataFrame,
    child_key: str,
    relation: str,
) -> DataFrame:
    """(relation, n_parents, n_childless) — coverage direction of the
    FK check (e.g. customers who never ordered)."""
    child_keys = child.select(F.col(child_key).alias("k")).distinct()
    parents = parent.select(F.col(parent_key).alias("k"))
    childless = parents.join(child_keys, "k", "left_anti")
    return (
        parents.agg(F.count(F.lit(1)).alias("n_parents"))
        .crossJoin(childless.agg(F.count(F.lit(1)).alias("n_childless")))
        .select(
            F.lit(relation).alias("relation"),
            F.col("n_parents").cast("bigint").alias("n_parents"),
            F.col("n_childless").cast("bigint").alias("n_childless"),
        )
    )
