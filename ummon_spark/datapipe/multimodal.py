"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/feature-extract kernels are STUBS in this environment (no
image/audio libraries in the container): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (md5-seeded dimensions/features) exercises the real Spark
plumbing — schema, partitioning, Arrow batch shape, UDF signature —
end-to-end. Swap `_decode_*_real` with Pillow/av calls on a real
cluster.

Design notes for 100 TB of media:
* media bytes travel as `binary` columns in their own table keyed by
  media_ref (never duplicated per mention) — joins bring metadata, not
  payloads;
* decode runs via `mapInPandas` so each Arrow batch amortizes Python
  overhead and memory stays bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch;
* feature vectors come back as array<float> ready for
  datapipe.similarity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media_table(spark, media_refs: list[tuple[str, str]]) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the
    ref (so tests have real binary columns without external data)."""
    rows = [
        (ref, kind, hashlib.md5(ref.encode()).digest() * 4, {"src": "synthetic"})
        for ref, kind in media_refs
    ]
    return spark.createDataFrame(rows, MEDIA_TABLE_SCHEMA)


def _decode_fake(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: md5(payload)-seeded dims + features."""
    out = []
    for ref, kind, payload in zip(pdf["media_ref"], pdf["kind"], pdf["payload"]):
        h = hashlib.md5(payload if payload is not None else ref.encode()).digest()
        width = 64 + h[0]
        height = 64 + h[1]
        n_frames = 1 if kind == "image" else 1 + h[2]
        feats = [round(b / 255.0, 6) for b in h[:8]]
        out.append((ref, kind, width, height, n_frames, feats))
    return pd.DataFrame(
        out, columns=["media_ref", "kind", "width", "height", "n_frames", "features"]
    )


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched decode/feature-extract over the media table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding needs image/audio libs not present "
                    "in this container; pass fake=True for the deterministic "
                    "stub decoder"
                )
            yield _decode_fake(pdf)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("new_width", T.IntegerType(), True),
        T.StructField("new_height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """(media_ref, width, height, new_width, new_height): target
    dimensions for aspect-ratio-preserving downscale to max_side —
    pure column arithmetic (no kernel needed); images already within
    bounds keep their dims (never upscaled)."""
    w, h = F.col("width"), F.col("height")
    longest = F.greatest(w, h)
    scale = F.when(longest > max_side, F.lit(max_side) / longest).otherwise(
        F.lit(1.0)
    )
    return decoded.filter(F.col("kind") == "image").select(
        "media_ref",
        "width",
        "height",
        F.greatest(F.floor(w * scale), F.lit(1)).cast("int").alias("new_width"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("int").alias("new_height"),
    )


def resize_media(
    media: DataFrame, plan: DataFrame, fake: bool = False
) -> DataFrame:
    """Arrow-batched resample of image payloads to the planned dims.
    The pixel kernel is a STUB (no image libs in this container):
    fake=True produces a deterministic md5-derived payload sized
    new_width*new_height/64 bytes, exercising the real join +
    mapInPandas plumbing; fake=False raises."""
    joined = media.select("media_ref", "payload").join(plan, "media_ref")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media resampling needs image libs not present in "
                    "this container; pass fake=True for the deterministic stub"
                )
            out = []
            for ref, payload, nw, nh in zip(
                pdf["media_ref"], pdf["payload"], pdf["new_width"], pdf["new_height"]
            ):
                seed = hashlib.md5(
                    (payload or b"") + f"|{nw}x{nh}".encode()
                ).digest()
                size = max(int(nw) * int(nh) // 64, 1)
                fake_bytes = (seed * (size // len(seed) + 1))[:size]
                out.append((ref, int(nw), int(nh), fake_bytes))
            yield pd.DataFrame(
                out, columns=["media_ref", "new_width", "new_height", "payload"]
            )

    return joined.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """(media_ref, frame_idx) sampling plan for video rows — pure
    column ops (sequence + filter), the decode of each sampled frame
    would run in a second mapInPandas stage."""
    return (
        decoded.filter(F.col("kind") == "video")
        .select(
            "media_ref",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
