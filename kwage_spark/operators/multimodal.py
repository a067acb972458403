"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (no image/audio libs in this container): pass
``fake=True`` for a deterministic fake decoder that exercises the real
Spark-side plumbing — schema, Arrow batch shape, partitioning — or leave
default to get a clearly-marked NotImplementedError at decode time.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, modality string, payload binary, "
                "mime string, meta map<string,string>")


def make_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media rows (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 8
        rows.append((i, modality, bytearray(payload),
                     {"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[modality],
                     {"source": f"s{i % 4}", "bytes": str(len(payload))}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_and_featurize(df: DataFrame, fake: bool = False,
                         feat_dim: int = 16) -> DataFrame:
    """payload -> (width, height, features array<float>) via mapInPandas.

    Real pipelines drop in a PIL/torchvision decode here; the Spark
    contract (binary in, fixed-width float vector out, Arrow-batched,
    partition-parallel) is what this function locks down.
    """
    schema = ("media_id long, modality string, width int, height int, "
              f"features array<float>")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/librosa/ffmpeg — not in this "
                    "container; pass fake=True for the deterministic stub")
            out = {"media_id": [], "modality": [], "width": [],
                   "height": [], "features": []}
            for rid, mod, payload in zip(pdf["media_id"], pdf["modality"],
                                         pdf["payload"]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                # deterministic fake: dims + features derived from payload
                out["media_id"].append(rid)
                out["modality"].append(mod)
                out["width"].append(int(raw[0]) + 1)
                out["height"].append(int(raw[1]) + 1)
                feats = raw[: feat_dim * 4].reshape(feat_dim, 4).sum(axis=1)
                out["features"].append((feats / 255.0).astype(np.float32).tolist())
            yield pd.DataFrame(out)

    from .util import ensure_parallelism
    return ensure_parallelism(df).mapInPandas(gen, schema=schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 64, fake: bool = False) -> DataFrame:
    """Video 'frame sampling' stub: emit one row per sampled frame offset —
    exercises the 1-to-many mapInPandas shape real frame extraction needs."""
    schema = "media_id long, frame_idx int, frame_bytes binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame extraction requires ffmpeg — pass fake=True")
            rows = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for rid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                for j, off in enumerate(range(0, len(raw), every_n_bytes)):
                    rows["media_id"].append(rid)
                    rows["frame_idx"].append(j)
                    rows["frame_bytes"].append(bytearray(raw[off:off + every_n_bytes]))
            yield pd.DataFrame(rows)

    from .util import ensure_parallelism
    return (ensure_parallelism(df.filter(F.col("modality") == "video"))
            .mapInPandas(gen, schema=schema))
