"""Multimodal columns — opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` operators so only the partitions being
processed ever hold decoded data.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are STUBBED with a deterministic fake (hash-derived
pixels) behind ``decode_backend="fake"``; requesting a real backend
raises NotImplementedError. The Spark-side plumbing — schema,
partition-wise batching, UDF signatures, output shapes — is real and
tested, which is the part that matters for the engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int"

FEATURE_SCHEMA = "media_id long, feat array<float>, n_bytes long"


def make_fake_media(spark, n: int, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    payload = F.encode(
        F.concat(F.lit("IMG"), F.col("media_id").cast("string")), "UTF-8"
    )
    return df.select(
        "media_id",
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
    )


def extract_features(
    media: DataFrame, dim: int = 16, decode_backend: str = "fake"
) -> DataFrame:
    """media → (media_id, feat: array<float>, n_bytes) via mapInPandas.

    With a real backend this would decode the payload and run a model;
    the fake backend derives a deterministic feature vector from the
    payload bytes so the distributed plumbing (batch shapes, Arrow
    round-trip, schema) is exercised end-to-end.
    """
    if decode_backend != "fake":
        raise NotImplementedError(
            f"decode backend {decode_backend!r} requires codec libraries "
            "not present in this environment; only 'fake' is available"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            nbytes = []
            for b in pdf["payload"]:
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.float32)
                # deterministic fake "embedding": tiled/folded payload bytes
                reps = int(np.ceil(dim / max(len(arr), 1)))
                v = np.tile(arr, reps)[:dim] / 255.0
                feats.append(v.tolist())
                nbytes.append(len(b))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feat": feats, "n_bytes": nbytes}
            )

    return media.select("media_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video payloads — with the fake backend each
    payload byte is 'a frame'; real backend would use ffmpeg. Returns
    (media_id, frame_idx, frame_byte)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, vals = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                for i in range(0, len(b), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    vals.append(int(b[i]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_byte": vals})

    return media.select("media_id", "payload").mapInPandas(
        batches, "media_id long, frame_idx int, frame_byte int"
    )
