"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side machinery — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual decoders are STUBBED (the
image/audio libraries are not in this container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic content-derived feature vector so the distributed plumbing can
be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),      # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("payload", T.BinaryType(), True),    # opaque bytes
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benches (content = seeded
    bytes; no external data)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4  # 128 B
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, f"application/x-fake-{kind}",
                     64 if kind == "image" else None,
                     64 if kind == "image" else None,
                     1000 * i if kind != "image" else None,
                     bytearray(payload)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decode+embed step."""
    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


def decode_and_featurize(df: DataFrame, fake: bool = False,
                         dim: int = 8) -> DataFrame:
    """mapInPandas decode/feature-extract over binary payloads — the real
    Arrow plumbing (batched bytes in, typed arrays out). The decode itself is
    stubbed: fake=False raises, fake=True uses the deterministic fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries not "
                    "present in this environment; pass fake=True for the "
                    "deterministic test path")
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "feature": pdf["payload"].map(
                    lambda b: _fake_feature(bytes(b), dim) if b is not None else None),
            })
            yield out

    return (df.repartition(F.col("media_id"))
            .mapInPandas(run, schema=FEATURES_SCHEMA))


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media, frame_ts) — the
    explode-side of a frame extractor; the actual frame decode is the stub
    above. Pure expression (sequence + explode), no Python."""
    vids = df.filter(F.col("kind") == "video")
    return (vids.withColumn(
        "frame_ts",
        F.explode(F.sequence(F.lit(0),
                             F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                             F.lit(every_ms))))
        .select("media_id", "frame_ts"))
