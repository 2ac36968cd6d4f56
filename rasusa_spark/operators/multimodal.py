"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image_stub`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it produces a deterministic fake
"feature" so the Spark-side plumbing — schema, batching, partition flow —
is fully real and tested. Swapping in PIL/torchaudio later only changes the
body of ``_decode_one``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synth_media_df(spark: SparkSession, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + (i * 37) % 512)
        rows.append(
            (
                f"m{i:05d}",
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 256 if kind != "audio" else None,
                48 + i % 128 if kind != "audio" else None,
                1000 + i * 10 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_one(payload: bytes, kind: str, deterministic_fake: bool) -> np.ndarray:
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "container; run with deterministic_fake=True for plumbing tests"
        )
    # deterministic fake feature: 8 moments of the byte histogram
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    chunks = np.array_split(arr, 8)
    return np.array([float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(
    df: DataFrame, deterministic_fake: bool = True, batch_hint: int = 512
) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary payloads.
    The per-batch shape (pandas in/out, bounded memory: payloads stream
    through in Arrow record batches) is the production contract."""

    def run(batches):
        for pdf in batches:
            feats = [
                _decode_one(p, k, deterministic_fake).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Typed-metadata aggregation: per kind, count/bytes/avg dims — pure
    column ops over the metadata, payloads pruned from the scan."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload").cast("long")).alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
