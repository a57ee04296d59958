"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct (modality, mime, width/height/duration...). The Spark-side
plumbing — schema, partition-preserving mapInPandas, Arrow batch shape — is
real and tested; the actual codec decode is STUBBED (this container has no
image/audio libraries): `decode_features(deterministic_fake=True)` computes
reproducible pseudo-features from the bytes (hash moments), while
deterministic_fake=False raises NotImplementedError where a real
PIL/torchaudio call would go.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 8
_FEATURES_SCHEMA = (
    "media_id long, modality string, n_bytes long, features array<float>"
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads (the
    driver corpus has no real binaries; the plumbing is identical)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic pseudo-features: md5-seeded byte moments. Stands in for
    a real decode→resize→embed pipeline; stable across engines/runs."""
    h = hashlib.md5(payload).digest()
    base = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    moments = np.array(
        [len(payload) % 997, base[:4].sum(), base[4:8].sum(), base[8:12].sum()],
        dtype=np.float32,
    )
    feats = np.concatenate([moments, base[:FEATURE_DIM - 4]])
    return [float(x) for x in feats[:FEATURE_DIM]]


def decode_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of binary payloads.
    Partitioning is preserved (no shuffle); batch shape = (rows, payload bytes)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/torchaudio — not in container"
                )
            raw = [bytes(b) for b in pdf["payload"]]
            n_bytes = np.fromiter(
                (len(b) for b in raw), dtype=np.int64, count=len(raw)
            )
            # md5 is inherently per-value; everything downstream is one
            # batch-wide matrix op over the stacked digests (parity with the
            # per-row _fake_features spec is pytest-pinned)
            digests = (
                np.frombuffer(
                    b"".join(hashlib.md5(b).digest() for b in raw), dtype=np.uint8
                )
                .reshape(len(raw), 16)
                .astype(np.float32)
            )
            moments = np.column_stack(
                [
                    (n_bytes % 997).astype(np.float32),
                    digests[:, :4].sum(axis=1),
                    digests[:, 4:8].sum(axis=1),
                    digests[:, 8:12].sum(axis=1),
                ]
            )
            feats = np.concatenate(
                [moments, digests[:, : FEATURE_DIM - 4]], axis=1
            )[:, :FEATURE_DIM]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes,
                    "features": list(feats),
                }
            )

    return media.mapInPandas(extract, schema=_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (payload slicing is stubbed to byte ranges — deterministic)."""
    n_frames = F.greatest(
        (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).cast("long").alias("ts_ms"),
    )
