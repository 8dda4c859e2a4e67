"""Mergeable HLL partition sketches: incremental union must equal a full
recompute exactly, survive parquet persistence, and estimate well."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_adaptive_partitioning_tool_spark.operators import incremental
from trino_adaptive_partitioning_tool_spark.sources import tables

from conftest import SMOKE_SF_DIR

KEYS = ["user_id", "event_type"]


def _events(spark):
    return tables.load_table(spark, SMOKE_SF_DIR, "events")


def _rollup_row(df):
    return incremental.merge_sketch_stats(df, KEYS).collect()[0]


def test_estimates_close_to_exact(spark):
    ev = _events(spark)
    got = _rollup_row(
        incremental.sketch_partition_stats(ev, F.to_date("ts"), KEYS)
    )
    exact = ev.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("event_type").alias("t"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert got["n_rows"] == exact["n"]
    assert abs(got["approx_distinct_user_id"] - exact["u"]) <= 0.02 * exact["u"]
    assert got["approx_distinct_event_type"] == exact["t"]  # tiny cardinality: exact


def test_incremental_union_equals_full_recompute(spark, tmp_path):
    """Persist base-partition sketches to parquet, fold in a delta slice
    (including late rows for an existing day), and compare against
    sketching the full table in one pass: identical estimates and counts."""
    ev = _events(spark)
    cutoff = ev.agg(F.percentile_approx(F.unix_timestamp("ts"), 0.7)).collect()[0][0]
    base = ev.where(F.unix_timestamp("ts") <= cutoff)
    delta = ev.where(F.unix_timestamp("ts") > cutoff)
    assert base.count() > 0 and delta.count() > 0

    stats_path = str(tmp_path / "partition_stats")
    incremental.sketch_partition_stats(
        base, F.to_date("ts"), KEYS
    ).write.mode("overwrite").parquet(stats_path)
    persisted = spark.read.parquet(stats_path)  # binary sketches round-trip

    updated = incremental.incremental_update(
        persisted, delta, F.to_date("ts"), KEYS
    )
    got = _rollup_row(updated)
    want = _rollup_row(
        incremental.sketch_partition_stats(ev, F.to_date("ts"), KEYS)
    )
    assert got.asDict() == want.asDict()


def test_partition_stats_partial_aggregation(spark):
    """The sketch build must keep map-side partial aggregation (the
    exchange carries sketches, not rows)."""
    from trino_adaptive_partitioning_tool_spark.plans import inspect

    parts = incremental.sketch_partition_stats(
        _events(spark), F.to_date("ts"), KEYS
    )
    assert inspect.has_partial_aggregation(parts)
    assert inspect.shuffle_count(parts) <= 1


def test_histogram_partials_merge_equals_direct(spark):
    from pyspark.sql import functions as F

    from trino_adaptive_partitioning_tool_spark.operators import incremental
    from trino_adaptive_partitioning_tool_spark.sources import tables

    from conftest import SMOKE_SF_DIR

    ev = tables.load_table(spark, SMOKE_SF_DIR, "events")
    lo, hi, nb = 0.0, 500.0, 20
    # split the stream arbitrarily; merge of independently-built partials
    # must equal the single-pass histogram exactly
    a = incremental.histogram_partials(
        ev.where(F.col("event_id") % 2 == 0), F.to_date("ts"), F.col("value"), lo, hi, nb
    )
    b = incremental.histogram_partials(
        ev.where(F.col("event_id") % 2 == 1), F.to_date("ts"), F.col("value"), lo, hi, nb
    )
    merged = {
        r["bucket"]: r["n"]
        for r in incremental.merge_histograms(a.unionByName(b), lo, hi, nb).collect()
    }
    direct = {
        r["bucket"]: r["n"]
        for r in incremental.merge_histograms(
            incremental.histogram_partials(ev, F.to_date("ts"), F.col("value"), lo, hi, nb),
            lo, hi, nb,
        ).collect()
    }
    assert merged == direct
    assert sum(merged.values()) == ev.where(F.col("value").isNotNull()).count()


def test_cms_merge_equals_direct_and_overestimates(spark):
    """Count-min: (a) splitting the feed into two partial-sketch builds
    and merging == sketching once (the merge is exact); (b) every point
    estimate >= the true count (CM never underestimates)."""
    from conftest import SMOKE_SF_DIR

    from trino_adaptive_partitioning_tool_spark.sources import tables

    ev = tables.load_table(spark, SMOKE_SF_DIR, "events")
    part, key = F.to_date("ts"), F.col("user_id")
    a = incremental.cms_partials(
        ev.where(F.col("event_id") % 2 == 0), part, key, depth=4, width=256
    )
    b = incremental.cms_partials(
        ev.where(F.col("event_id") % 2 == 1), part, key, depth=4, width=256
    )
    merged = {
        (r["row"], r["bucket"]): r["n"]
        for r in incremental.cms_merge(a.unionByName(b)).collect()
    }
    direct = {
        (r["row"], r["bucket"]): r["n"]
        for r in incremental.cms_merge(
            incremental.cms_partials(ev, part, key, depth=4, width=256)
        ).collect()
    }
    assert merged == direct

    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    est = incremental.cms_estimate(
        incremental.cms_merge(
            incremental.cms_partials(ev, part, key, depth=4, width=256)
        ),
        exact,
        "user_id",
        depth=4,
        width=256,
    )
    joined = exact.join(est, "user_id").collect()
    assert joined and all(r["cms_count"] >= r["n"] for r in joined)


def test_histogram_quantiles_within_one_bucket_of_exact(spark):
    from conftest import SMOKE_SF_DIR

    from trino_adaptive_partitioning_tool_spark.sources import tables

    lo, hi, nb = 0.0, 500.0, 32
    width = (hi - lo) / nb
    ev = tables.load_table(spark, SMOKE_SF_DIR, "events")
    merged = incremental.merge_histograms(
        incremental.histogram_partials(
            ev, F.to_date("ts"), F.col("value"), lo, hi, nb
        ),
        lo, hi, nb,
    )
    qs = [0.25, 0.5, 0.9]
    est = {
        float(r["q"]): r["quantile_est"]
        for r in incremental.histogram_quantiles(
            merged, qs, lo, hi, nb
        ).collect()
    }
    exact = ev.where(F.col("value").isNotNull()).agg(
        *[F.percentile("value", F.lit(q)).alias(str(q)) for q in qs]
    ).collect()[0]
    for q in qs:
        assert abs(est[q] - exact[str(q)]) <= width, (q, est[q], exact[str(q)])
