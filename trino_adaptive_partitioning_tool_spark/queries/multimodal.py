"""Multimodal pipeline queries (extensions layer) — rows-only checks:
the payloads are synthetic binaries and the decode stage is a documented
deterministic stub (no codec libraries in this environment), but the
Spark plumbing (binary columns, Arrow-batched mapInPandas stages, UDTF
frame explosion, feature handoff to similarity search) is the real thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as mm
from ..operators import similarity
from .registry import register


@register("multimodal_decode_stats")
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary assets → Arrow-batched decode → per-media-type rollup."""
    decoded = mm.decode_assets(mm.synth_assets(spark, n=256))
    return decoded.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.round(F.avg("mean_intensity"), 4).alias("avg_intensity"),
        F.sum("payload_bytes").alias("total_bytes"),
    )


@register("multimodal_feature_search")
def multimodal_feature_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub feature extraction feeding the real cosine top-k operator."""
    feats = (
        mm.extract_features(mm.synth_assets(spark, n=128), dim=64)
        .withColumnRenamed("feature", "embedding")
        .withColumnRenamed("asset_id", "vec_id")
    )
    queries = feats.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.cosine_topk(feats, queries, k=5)


@register("multimodal_resize_stats")
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize (thumbnail / model-input prep) stage → per-media rollup of
    output sizes and scale factors."""
    resized = mm.resize_assets(mm.synth_assets(spark, n=256))
    return resized.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("resized_bytes").alias("total_resized_bytes"),
        F.round(F.avg("scale_x"), 4).alias("avg_scale_x"),
        F.round(F.avg("scale_y"), 4).alias("avg_scale_y"),
    )


@register("multimodal_frame_sample")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped frame sampling: one video asset → many frame rows."""
    frames = mm.sample_frames(mm.synth_assets(spark, n=128), every_ms=10_000)
    return frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_ms").alias("last_frame_ms"),
    )
