"""Multimodal column plumbing — image/audio/video as opaque binary + typed
metadata, processed in Arrow-batched mapInPandas.

The Spark-side machinery (schemas, batching, partition-preserving
transforms, deterministic fake features) is real and tested; the actual
codec calls are stubbed behind ``decode_stub`` because no image/audio
libraries exist in this container — swap ``_decode_payload`` for
PIL/torchaudio/ffmpeg at deployment and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 8


def _decode_payload(payload: bytes, kind: str) -> list[float]:
    """STUB: deterministic fake feature vector derived from content bytes.

    Real deployment: decode (PIL.Image.open / soundfile / pyav), resize or
    frame-sample, run the featurizer. The container has none of these
    libraries, so this produces a stable stand-in with the same shape —
    every byte of the pipeline around it is production-shaped.
    """
    if payload is None:
        raise NotImplementedError("real codec required for NULL-payload media")
    d = hashlib.md5(payload).digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """media → per-item content features, Arrow-batched.

    Partition-preserving (mapInPandas, no shuffle); batches stay bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch regardless of payload
    size skew."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "content_sha": pdf["payload"].map(
                        lambda b: hashlib.sha1(b).hexdigest() if b is not None else None
                    ),
                    "feature": [
                        _decode_payload(b, k) if b is not None else None
                        for b, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(featurize, MEDIA_FEATURES)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32 if kind != "audio" else None,
                64 + i % 16 if kind != "audio" else None,
                1000 * (1 + i % 9) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA)
