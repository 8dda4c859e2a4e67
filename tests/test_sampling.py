"""Properties of the deterministic sampling/split/packing operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_adaptive_partitioning_tool_spark.operators import sampling
from trino_adaptive_partitioning_tool_spark.sources import tables

from conftest import SMOKE_SF_DIR


def _docs(spark):
    return tables.load_table(spark, SMOKE_SF_DIR, "documents")


def test_split_disjoint_exhaustive_stable(spark):
    docs = _docs(spark)
    tagged = sampling.train_test_split(docs, "doc_id", 0.8, 0.1)
    n = docs.count()
    assert tagged.count() == n  # exhaustive
    assert tagged.select("doc_id").distinct().count() == n  # disjoint
    # stable under repartitioning: same assignment per doc
    again = sampling.train_test_split(
        docs.repartition(13), "doc_id", 0.8, 0.1
    )
    diff = (
        tagged.select("doc_id", "split")
        .join(again.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .where("split != s2")
        .count()
    )
    assert diff == 0
    shares = dict(
        tagged.groupBy("split").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert shares["train"] > shares["test"] > 0


def test_stratified_sample_subset_and_quota(spark):
    docs = _docs(spark)
    frac = {"en": 0.5, "de": 1.0}
    sampled = sampling.stratified_sample(docs, "lang", "doc_id", frac, 0.1)
    # subset of the corpus, keyed identically
    assert sampled.join(docs, "doc_id", "left_anti").count() == 0
    per = {
        r["lang"]: r["cnt"]
        for r in sampled.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    base = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert per["de"] == base["de"]  # 100% stratum keeps everything
    assert 0 < per["en"] < base["en"]


def test_pack_sequences_fill_and_budget(spark):
    from trino_adaptive_partitioning_tool_spark.operators.dedup import tokens_expr

    docs = _docs(spark).withColumn(
        "token_count", F.size(tokens_expr("text")).cast("bigint")
    )
    packed = sampling.pack_sequences(
        docs, "lang", "doc_id", "token_count", budget=512, n_shards=4
    )
    assert packed.count() == docs.count()  # no rows lost
    packs = packed.groupBy("lang", "shard", "pack_id").agg(
        F.sum("token_count").alias("tok"), F.max("token_count").alias("mx")
    )
    # offset binning: a pack holds >= budget tokens minus at most one doc's
    # overhang; every non-final pack of a (lang, shard) run must be >= 512
    # minus its largest doc (the doc that straddles the boundary).
    from pyspark.sql import Window

    w = Window.partitionBy("lang", "shard")
    nonfinal = packs.withColumn(
        "last", F.max("pack_id").over(w)
    ).where("pack_id < last")
    bad = nonfinal.where(F.col("tok") + F.col("mx") < 512).count()
    assert bad == 0


def test_pack_manifest_parquet_round_trip_reconstructs_exactly(spark, tmp_path):
    """Write the per-document packing manifest to parquet, read it back,
    and prove exact reconstruction: every document appears once, every
    in-pack start offset is < budget, and laying each (lang, shard) lane
    end-to-end in (pack_id, seq_in_pack) order reproduces every recorded
    offset with no gap or overlap (= every token accounted for exactly
    once)."""
    from pyspark.sql import Window

    from trino_adaptive_partitioning_tool_spark.operators.dedup import tokens_expr

    budget = 512
    docs = _docs(spark).withColumn(
        "token_count", F.size(tokens_expr("text")).cast("bigint")
    )
    manifest = sampling.pack_sequences_manifest(
        docs.select("lang", "doc_id", "token_count"),
        "lang", "doc_id", "token_count", budget=budget, n_shards=4,
    )
    path = str(tmp_path / "packs")
    sampling.write_pack_manifest(manifest, path, partition_cols=("lang",))
    back = spark.read.parquet(path)

    n_docs = docs.count()
    assert back.count() == n_docs
    assert back.select("doc_id").distinct().count() == n_docs
    assert back.where(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= budget)
    ).count() == 0
    # token-count totals survive the round trip exactly
    assert (
        back.agg(F.sum("token_count")).first()[0]
        == docs.agg(F.sum("token_count")).first()[0]
    )
    # contiguity: within a (lang, shard) lane ordered by (pack_id,
    # seq_in_pack), each document's global start offset equals the
    # running sum of all previous documents' tokens
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("pack_id", "seq_in_pack")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    recon = back.withColumn(
        "expected_start", F.coalesce(F.sum("token_count").over(w), F.lit(0))
    ).withColumn(
        "recorded_start", F.col("pack_id") * budget + F.col("pack_offset")
    )
    assert recon.where(
        F.col("expected_start") != F.col("recorded_start")
    ).count() == 0


def test_pack_manifest_handles_doc_longer_than_budget(spark):
    """A document longer than the budget overhangs into later packs:
    the manifest stays contiguous (next doc's recorded start = previous
    cumulative tokens) even when intermediate pack ids are skipped."""
    rows = [
        ("en", 1, 2000),  # spans packs 0..3
        ("en", 2, 100),
        ("en", 3, 100),
        ("en", 4, 100),
    ]
    docs = spark.createDataFrame(rows, ["lang", "doc_id", "token_count"])
    m = sampling.pack_sequences_manifest(
        docs, "lang", "doc_id", "token_count", budget=512, n_shards=1
    ).orderBy("pack_id", "seq_in_pack").collect()
    assert len(m) == 4
    starts = [r["pack_id"] * 512 + r["pack_offset"] for r in m]
    sizes = [r["token_count"] for r in m]
    assert starts[0] == 0
    for k in range(1, 4):
        assert starts[k] == starts[k - 1] + sizes[k - 1]


def test_cap_per_group_deterministic_and_capped(spark):
    docs = _docs(spark)
    capped = sampling.cap_per_group(docs, "lang", "doc_id", cap=7)
    per = {
        r["lang"]: r["n"]
        for r in capped.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    full = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, n in per.items():
        assert n == min(7, full[lang])
    # hash-rank selection: identical membership on a re-run and under a
    # different partitioning of the input
    a = {r["doc_id"] for r in capped.select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in sampling.cap_per_group(
            docs.repartition(13), "lang", "doc_id", cap=7
        )
        .select("doc_id")
        .collect()
    }
    assert a == b
