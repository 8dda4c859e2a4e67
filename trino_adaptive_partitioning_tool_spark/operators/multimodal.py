"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (extensions layer).

Media travels as an opaque `binary` payload column plus typed metadata —
the layout a 100 TB multimodal corpus uses (payload bytes stay columnar
in parquet; metadata prunes without touching payloads). Decode/resize/
frame-sample are Arrow-batched `mapInPandas` stages: the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested; the
actual codec call is STUBBED — image/audio libraries are not in this
container, so each stage uses a clearly-marked deterministic fake decoder
and raises NotImplementedError if a real codec is explicitly requested
(`require_codec=True`).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Protocol, runtime_checkable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MEDIA_TYPES = ("image", "audio", "video")
_FORMATS = {"image": "png", "audio": "wav", "video": "mp4"}


def synth_assets(spark: SparkSession, n: int = 256, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic asset table (payload = repeated md5 bytes of
    the asset id — stable across runs, no RNG): the stand-in for a real
    `spark.read.format("binaryFile")` load."""
    base = spark.range(0, n, 1, partitions).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("media_type"),
    )
    payload = F.to_binary(
        F.repeat(F.md5(F.col("asset_id").cast("string")), 8), F.lit("hex")
    )
    meta = F.struct(
        (F.col("asset_id") % 1920 + 1).cast("int").alias("width"),
        (F.col("asset_id") % 1080 + 1).cast("int").alias("height"),
        F.when(F.col("media_type") == "audio", F.lit(16000)).cast("int").alias(
            "sample_rate"
        ),
        F.when(F.col("media_type") != "image", (F.col("asset_id") % 60000))
        .cast("int")
        .alias("duration_ms"),
        F.element_at(
            F.array(*[F.lit(_FORMATS[m]) for m in _MEDIA_TYPES]),
            (F.col("asset_id") % 3 + 1).cast("int"),
        ).alias("format"),
    )
    return base.select("asset_id", "media_type", payload.alias("payload"), meta.alias("meta"))


@runtime_checkable
class Codec(Protocol):
    """Pluggable codec seam: the ONLY piece of this module that is
    stubbed. A real media stack (PIL / libav / cv2) drops in by
    implementing these three methods — none of the Spark plumbing
    (schemas, mapInPandas stages, partitioning, batch shapes) changes.
    Implementations must be picklable (they ship inside the Arrow UDF
    closure to executors) and deterministic per payload.

    ``is_real`` distinguishes an actual decoder from the deterministic
    stub; pipeline stages called with ``require_codec=True`` refuse to
    run on a non-real codec instead of silently emitting fake values.
    """

    is_real: bool

    def decode(self, payload: bytes, media_type: str) -> tuple[int, int, float]:
        """payload → (width, height, mean_intensity)."""
        ...

    def resize(
        self, payload: bytes, target_width: int, target_height: int
    ) -> bytes:
        """payload → resized payload bytes for the target dimensions."""
        ...

    def frames(
        self, payload: bytes, duration_ms: int, every_ms: int
    ) -> list[tuple[int, int, bytes]]:
        """video payload → [(frame_idx, frame_ms, frame_payload)]."""
        ...


class StubCodec:
    """Deterministic fake codec (no media libraries in this container):
    pseudo-dimensions and intensity derived from payload bytes, byte
    striding for resize, payload slicing for frame sampling. Stable
    across runs/executors — the multimodal queries are oracle-checked
    against this exact arithmetic."""

    is_real = False

    def decode(self, payload: bytes, media_type: str) -> tuple[int, int, float]:
        del media_type
        digest = hashlib.sha256(payload).digest()
        width = int.from_bytes(digest[0:2], "big") % 2048 + 1
        height = int.from_bytes(digest[2:4], "big") % 2048 + 1
        mean_intensity = float(np.frombuffer(payload, dtype=np.uint8).mean())
        return width, height, mean_intensity

    def resize(
        self, payload: bytes, target_width: int, target_height: int
    ) -> bytes:
        # fake resample: keep every k-th byte so output size tracks the
        # target area the way a real thumbnail would
        target_len = max(
            min(len(payload), (target_width * target_height) // 256), 1
        )
        step = max(len(payload) // target_len, 1)
        return payload[::step]

    def frames(
        self, payload: bytes, duration_ms: int, every_ms: int
    ) -> list[tuple[int, int, bytes]]:
        n_frames = max(int(duration_ms or 0) // every_ms, 1)
        step = max(len(payload) // n_frames, 1)
        return [
            (i, i * every_ms, payload[i * step : (i + 1) * step])
            for i in range(n_frames)
        ]


DEFAULT_CODEC: Codec = StubCodec()


def _check_codec(codec: Codec | None, require_codec: bool) -> Codec:
    codec = codec if codec is not None else DEFAULT_CODEC
    if require_codec and not codec.is_real:
        raise NotImplementedError(
            "real image/audio/video codecs are not available in this "
            "environment; pass a Codec implementation with is_real=True "
            "or run with require_codec=False for the deterministic stub"
        )
    return codec


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("decoded_width", T.IntegerType(), True),
        T.StructField("decoded_height", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("payload_bytes", T.LongType(), False),
    ]
)


def decode_assets(
    assets: DataFrame,
    require_codec: bool = False,
    codec: Codec | None = None,
) -> DataFrame:
    """Arrow-batched decode stage. Batch shape: payloads arrive as a
    pandas Series of bytes per partition chunk — exactly how a real
    PIL/libav decode loop would consume them. The codec is the pluggable
    seam (Codec protocol); everything else is production plumbing."""
    codec = _check_codec(codec, require_codec)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, mt, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                raw = bytes(payload)
                w, h, mi = codec.decode(raw, mt)
                out.append((int(aid), mt, w, h, mi, len(raw)))
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "media_type", "decoded_width",
                    "decoded_height", "mean_intensity", "payload_bytes",
                ],
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        _decode, schema=DECODED_SCHEMA
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def extract_features(assets: DataFrame, dim: int = 64) -> DataFrame:
    """STUB feature extractor producing a deterministic `array<float>`
    embedding per asset (byte-histogram projection) — the output column is
    directly consumable by operators/similarity.py. Real plumbing, fake
    features."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).astype(np.float32))
                ids.append(int(aid))
            yield pd.DataFrame({"asset_id": ids, "feature": feats})

    return assets.select("asset_id", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)


def sample_frames(
    assets: DataFrame,
    every_ms: int = 5000,
    require_codec: bool = False,
    codec: Codec | None = None,
) -> DataFrame:
    """Frame sampler for video assets: one frame per `every_ms` of
    duration via the pluggable codec (stub: payload slice stands in for
    the decoded frame). UDTF shape: one asset row → many frame rows."""
    codec = _check_codec(codec, require_codec)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                raw = bytes(payload)
                for idx, ms, frame in codec.frames(
                    raw, int(dur or 0), every_ms
                ):
                    out.append((int(aid), idx, ms, frame))
            yield pd.DataFrame(
                out,
                columns=["asset_id", "frame_idx", "frame_ms", "frame_payload"],
            )

    return (
        assets.where(F.col("media_type") == "video")
        .select("asset_id", "payload", F.col("meta.duration_ms").alias("duration_ms"))
        .mapInPandas(_sample, schema=FRAME_SCHEMA)
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("target_width", T.IntegerType(), False),
        T.StructField("target_height", T.IntegerType(), False),
        T.StructField("scale_x", T.DoubleType(), True),
        T.StructField("scale_y", T.DoubleType(), True),
        T.StructField("resized_payload", T.BinaryType(), False),
        T.StructField("resized_bytes", T.LongType(), False),
    ]
)


def resize_assets(
    assets: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    require_codec: bool = False,
    codec: Codec | None = None,
) -> DataFrame:
    """Resize stage for image/video assets: emits the target dimensions,
    the scale factors vs the source metadata, and the codec's resized
    payload (stub: byte stride stands in for pixel resampling).
    Arrow-batched mapInPandas, one output row per asset: the real
    plumbing a thumbnailing / model-input-prep pass uses."""
    codec = _check_codec(codec, require_codec)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, mt, payload, w, h in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"],
                pdf["width"], pdf["height"],
            ):
                raw = bytes(payload)
                resized = codec.resize(raw, target_width, target_height)
                sx = float(target_width) / float(w) if w else None
                sy = float(target_height) / float(h) if h else None
                out.append(
                    (int(aid), mt, target_width, target_height, sx, sy,
                     resized, len(resized))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "media_type", "target_width", "target_height",
                    "scale_x", "scale_y", "resized_payload", "resized_bytes",
                ],
            )

    return (
        assets.where(F.col("media_type").isin("image", "video"))
        .select(
            "asset_id", "media_type", "payload",
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
        )
        .mapInPandas(_resize, schema=RESIZED_SCHEMA)
    )
