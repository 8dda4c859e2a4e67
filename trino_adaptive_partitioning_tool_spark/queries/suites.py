"""Digest suites: fold verified queries into single checked rows.

The driver's correctness gate checks the FIRST 50 registered queries
(registration order). Rounds 1-2 proved more than 50 queries green, and
round 3 adds the LLM-pipeline flagships to the checked window — so the
lower-traffic relational/grouping/function queries are *folded*: each
digest query re-executes the original registered queries and reduces
every result to one row

    (op, n_rows, key_hash, num_sum)

where ``key_hash`` is an order-independent sum of a 36-bit md5 hash over
the exact-typed columns (strings / integers) of every row, and
``num_sum`` is an exact DECIMAL sum of the double columns rounded to 4
decimals (>= the intrinsic decimal precision of the money-typed data, so
engine-side fp accumulation noise cannot flip a rounding boundary).
The DuckDB oracle applies the identical reduction to the original
oracle SQL, so a digest row is green iff the full underlying result
still matches the oracle value-for-value on its exact columns and to 4
decimals on its double columns.

The folded queries all remain individually registered (past the window)
and are still verified 1:1 against their oracles by
tests/test_oracle_parity.py every run; the digests keep them inside the
driver-visible window without spending 16 slots.

36-bit hash (not the 60-bit dedup hash): the per-row hashes are summed,
and sum(36-bit x 15k rows) < 2^50 stays exactly representable in the
final DOUBLE on both engines (DuckDB SUM(BIGINT) returns INT128, which
its pandas bridge would otherwise narrow lossily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import registry
# the folded sub-queries live in these modules; importing them here makes
# the digest oracles buildable even when suites is imported standalone
# (outside registry._load_all's ordering)
from . import core_sql, core_sql2  # noqa: F401
from .registry import register

# (query_name, exact_cols, double_cols) — column split per live schema;
# tests/test_suites.py asserts this table matches the registered query
# schemas so drift is caught immediately.
_RELATIONAL: list[tuple[str, list[str], list[str]]] = [
    ("anti_join_customers", ["c_custkey", "c_name"], []),
    ("having_large_orders", ["l_orderkey"], ["total_qty"]),
    ("in_subquery_filter", ["c_custkey", "c_name"], []),
    ("multiset_ops", ["o_custkey"], []),
    ("semi_join_suppliers", ["s_suppkey", "s_name"], []),
    ("set_ops_customers", ["c_custkey"], []),
]
_GROUPING: list[tuple[str, list[str], list[str]]] = [
    (
        "cube_aggregation",
        ["orderstatus", "orderpriority", "n_orders"],
        ["total_price"],
    ),
    ("grouping_sets_agg", ["returnflag", "linestatus"], ["revenue"]),
    (
        "pivot_status_by_priority",
        ["o_orderpriority", "n_f", "n_o", "n_p"],
        ["rev_f"],
    ),
    ("rollup_returns", ["returnflag", "linestatus", "n_rows"], ["sum_qty"]),
]
_FUNCTIONS: list[tuple[str, list[str], list[str]]] = [
    ("array_agg_lines", ["l_orderkey", "line_numbers", "n_lines"], []),
    ("conditional_revenue_share", [], ["small_type_share_pct"]),
    ("correlated_small_quantity_revenue", [], ["avg_yearly"]),
    ("json_extract_rollup", ["event_type", "sum_k", "max_k", "n_events"], []),
    (
        "scalar_functions",
        ["p_partkey", "brand_upper", "name_len", "type_prefix", "size_band"],
        ["uplifted_price"],
    ),
    (
        "window_functions_suite",
        ["o_custkey", "o_orderkey", "price_rank", "price_dense_rank"],
        ["prev_price", "next_price", "running_total", "moving_sum3"],
    ),
]

_DEC = "decimal(38,6)"


def _md5_36(col: F.Column) -> F.Column:
    """36-bit non-negative hash: first 9 hex chars of md5 (JVM codegen,
    no UDF). DuckDB twin: ('0x' || substr(md5(x), 1, 9))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 9), 16, 10).cast("bigint")


def _digest_df(
    spark: SparkSession, sf_dir: str, spec: list[tuple[str, list[str], list[str]]]
) -> DataFrame:
    out: DataFrame | None = None
    for name, exact_cols, dbl_cols in spec:
        df = registry._QUERIES[name](spark, sf_dir)
        if exact_cols:
            key = F.concat_ws(
                "|", *[F.col(c).cast("string") for c in exact_cols]
            )
        else:
            key = F.lit("")
        num: F.Column | None = None
        for c in dbl_cols:
            term = F.coalesce(
                F.round(F.col(c), 4).cast(_DEC), F.lit(0).cast(_DEC)
            )
            num = term if num is None else num + term
        num_agg = (
            F.coalesce(F.sum(num), F.lit(0).cast(_DEC))
            if num is not None
            else F.lit(0).cast(_DEC)
        )
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.sum(_md5_36(key)), F.lit(0))
            .cast("double")
            .alias("key_hash"),
            num_agg.cast("double").alias("num_sum"),
        ).select(F.lit(name).alias("op"), "n_rows", "key_hash", "num_sum")
        out = agg if out is None else out.unionByName(agg)
    assert out is not None
    return out.orderBy("op")


def _digest_sql(spec: list[tuple[str, list[str], list[str]]]) -> str:
    parts: list[str] = []
    for name, exact_cols, dbl_cols in spec:
        sub = registry._ORACLES[name]
        if exact_cols:
            key = (
                "concat_ws('|', "
                + ", ".join(f"CAST({c} AS VARCHAR)" for c in exact_cols)
                + ")"
            )
        else:
            key = "''"
        row_hash = f"('0x' || substr(md5({key}), 1, 9))::BIGINT"
        num = (
            " + ".join(
                f"COALESCE(ROUND({c}, 4)::DECIMAL(38,6), 0)"
                for c in dbl_cols
            )
            or "0::DECIMAL(38,6)"
        )
        parts.append(
            f"SELECT '{name}' AS op, COUNT(*) AS n_rows,\n"
            f"  CAST(COALESCE(SUM({row_hash}), 0) AS DOUBLE) AS key_hash,\n"
            f"  CAST(COALESCE(SUM({num}), 0) AS DOUBLE) AS num_sum\n"
            f"FROM ({sub}) AS digest_sub"
        )
    return (
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(parts)
        + "\n) digest_union ORDER BY op"
    )


@register("relational_ops_digest", oracle=_digest_sql(_RELATIONAL))
def relational_ops_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds P7/§2.7 + subquery-filter queries (anti/semi joins, set and
    multiset ops, IN-subquery, HAVING) into one checked digest row each.
    See module docstring for the reduction and why it is hash-faithful."""
    return _digest_df(spark, sf_dir, _RELATIONAL)


@register("grouping_analytics_digest", oracle=_digest_sql(_GROUPING))
def grouping_analytics_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds the multi-dimensional grouping surface (CUBE, GROUPING SETS,
    ROLLUP, pivot) into one checked digest row each."""
    return _digest_df(spark, sf_dir, _GROUPING)


@register("functions_windows_digest", oracle=_digest_sql(_FUNCTIONS))
def functions_windows_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folds the scalar-function / JSON / array-agg / window-function
    suites and the correlated-subquery scalars into one checked digest
    row each."""
    return _digest_df(spark, sf_dir, _FUNCTIONS)
