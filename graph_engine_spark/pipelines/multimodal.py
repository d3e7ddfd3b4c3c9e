"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``. The decode kernels themselves are STUBBED (the
image/audio libraries are not in this container): `decode_stub=True`
(default) produces deterministic fake features from the payload bytes,
`decode_stub=False` raises NotImplementedError at the decode site. The
Spark-side plumbing — schema, batch iteration, partition sizing — is
real and tested.

Scale notes: binary payloads dominate row size; `mapInPandas` batches
are bounded by spark.sql.execution.arrow.maxRecordsPerBatch, and the
input should be read with spark.read.format('binaryFile') or an Iceberg
table with a blob column, partitioned so a batch of payloads fits
executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", StringType(), False),  # binary hex (sandbox)
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_sha", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("n_frames", IntegerType(), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector from payload bytes — stands in
    for a real decoder; replace with PIL/torchaudio/ffmpeg off-sandbox."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(
    media: DataFrame, decode_stub: bool = True, dim: int = 8
) -> DataFrame:
    """media table → feature table via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload_hex, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                payload = bytes.fromhex(payload_hex)
                if not decode_stub:
                    raise NotImplementedError(
                        "real decode requires image/audio libs not in this container"
                    )
                feat = _fake_decode(payload, dim)
                n_frames = (
                    max(1, int(dur or 0) // 40) if kind == "video" else None
                )
                rows.append(
                    (
                        int(mid),
                        kind,
                        hashlib.sha256(payload).hexdigest(),
                        feat,
                        n_frames,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return media.select(
        "media_id", "kind", "payload", "duration_ms"
    ).mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp — pure JVM-side sequence/explode; the actual frame decode
    happens in extract_features."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("ts_ms"),
    )


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"media:{i}".encode()).digest() * (1 + i % 4)
                rows.append(
                    (
                        i,
                        kind,
                        payload.hex(),
                        64 + i % 512 if kind == "image" else None,
                        64 + (i * 3) % 512 if kind == "image" else None,
                        1000 + (i * 37) % 5000 if kind != "image" else None,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
