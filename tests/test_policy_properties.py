"""Property-based tests (SURVEY §5.2.4) for the pure policy layer:
hypothesis generates adversarial inputs, each example batch is evaluated
in ONE Spark job so the suite stays fast.

Properties:
  * cardinality band bonus ∈ {1, 5, 8, 10} for every card ≥ 0
  * int bucket count clamped to [4, 32] and equal to clamp(card//500)
  * transform policy is TOTAL — every (dtype, stats) combination yields
    a non-empty transform string
  * profile guards: density ∈ [0, 1], skew_ratio ≥ 1 and never null,
    value_range ≥ 0 — for arbitrary numeric data with nulls
  * top-N: ≤ N rows per view, all scores > 0, ranks are 1..k
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trino_adaptive_partitioning_tool_spark.operators import (
    scoring,
    stats,
    transforms,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DTYPES = ("bigint", "int", "string", "varchar(10)", "double", "date", "timestamp", "boolean")


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(_DTYPES),
            st.integers(min_value=0, max_value=10**9),   # cardinality
            st.integers(min_value=0, max_value=10**9),   # value_range
            st.sampled_from(["day", "month", "year", None]),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_transform_policy_total_and_bucket_clamped(spark, rows):
    df = spark.createDataFrame(
        [(f"c{i}", d, c, r, g) for i, (d, c, r, g) in enumerate(rows)],
        "column string, data_type string, distinct_count long, "
        "value_range long, granularity string",
    )
    out = df.select(
        "distinct_count",
        transforms.transform_expr(
            F.col("column"),
            F.col("data_type"),
            F.col("distinct_count"),
            F.col("value_range"),
            F.col("granularity"),
        ).alias("transform"),
        scoring.cardinality_band_bonus(F.col("distinct_count")).alias("bonus"),
    ).collect()
    for r in out:
        assert r["transform"] is not None and r["transform"] != ""
        assert r["bonus"] in (1.0, 5.0, 8.0, 10.0)
        m = re.match(r"bucket\((\d+), c\d+\)", r["transform"])
        if m:
            n = int(m.group(1))
            assert 4 <= n <= 32
            if r["distinct_count"] > 10_000 and n == 16:
                pass  # varchar bucket(16) branch
            else:
                assert n == min(max(r["distinct_count"] // 500, 4), 32)


@settings(**_SETTINGS)
@given(
    values=st.lists(
        st.one_of(
            st.none(),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_profile_guards_hold_for_arbitrary_numeric_data(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    prof = stats.column_profiles(df, "t", exact=True).collect()
    [r] = prof
    assert 0.0 <= r["density"] <= 1.0
    assert r["skew_ratio"] is not None and r["skew_ratio"] >= 1.0
    if r["value_range"] is not None:
        assert r["value_range"] >= 0.0


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # view index
            st.floats(
                min_value=-50.0, max_value=200.0,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_top_candidates_bounded_and_positive(spark, rows):
    df = spark.createDataFrame(
        [(f"v{v}", f"c{i}", s) for i, (v, s) in enumerate(rows)],
        "view string, column string, score double",
    )
    out = scoring.top_candidates(df, top_n=3).collect()
    per_view: dict[str, list[int]] = {}
    for r in out:
        assert r["score"] > 0
        per_view.setdefault(r["view"], []).append(r["rank"])
    for ranks in per_view.values():
        assert len(ranks) <= 3
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
