"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, batch iteration, partition sizing) is
real and tested; the actual codec work is stubbed behind
``NotImplementedError`` / a deterministic fake because no image/audio
libraries ship in this container. On a real cluster you'd drop pillow /
torchaudio into the ``decode_*`` bodies — the mapInPandas batch shape
stays identical.

Scale notes: binary payloads dominate partition size — size partitions by
``spark.sql.files.maxPartitionBytes`` and keep metadata in separate columns
so filters prune BEFORE decode (decode only what survives the predicate).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feat array<float>"


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derive ``dim`` floats from
    the payload bytes. Replace with a real decode in production."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload[: dim * 4].ljust(dim * 4, b"\0"), dtype=np.uint8)
    return (arr.reshape(dim, 4).sum(axis=1) / 255.0).astype(np.float32)


def extract_features(df: DataFrame, real_decoder: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary media columns. Arrow
    batches stream through the Python worker; only payload+id columns are
    read (column pruning keeps the scan narrow)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decoder:
                raise NotImplementedError(
                    "real image/audio decode requires pillow/torchaudio — "
                    "not available in this container"
                )
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feat": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_id, frame_ts_ms)
    rows; the decode itself is the stubbed step."""
    from pyspark.sql import functions as F

    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )
