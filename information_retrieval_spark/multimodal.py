"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side contract is real and tested — schema, partitioning,
Arrow batch shape, UDF signatures — while the actual media decode is
stubbed (no image/audio libraries in this container): pass
``fake=True`` for a deterministic stand-in featureizer, or get a
``NotImplementedError`` from the real path.

Design for 100 TB: media bytes ride as a `binary` column with typed
metadata (media_type, width/height/duration), processed by
`mapInPandas` so each Arrow batch amortizes Python crossing; byte
payloads never enter a shuffle — feature extraction projects them away
before any wide operation.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media_type string, payload binary, "
                "width int, height int, duration_ms int")

FEATURE_DIM = 16
_FEATURES_SCHEMA = f"doc_id long, media_type string, feature array<double>, n_bytes int"


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns the planner can prune/filter on without
    touching payload bytes."""
    return (df
            .withColumn("n_bytes", F.length(F.col(payload_col)))
            .withColumn("payload_sha", F.sha2(F.col(payload_col), 256)))


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode+featureize: a 16-dim histogram
    of the payload's sha256-seeded byte mix. Replace with a real
    decoder (PIL/librosa/av) in production."""
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
    return (arr[:FEATURE_DIM] / 255.0)


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """binary payload -> fixed-dim feature vector via mapInPandas.

    Real decode is NOT implemented in this container (no media libs);
    `fake=True` runs the deterministic stand-in so the distributed
    plumbing (batching, schema, projection) is exercised end-to-end.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present "
                    "in this environment; pass fake=True for the deterministic stub")
            feats = [list(_fake_decode(bytes(p))) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "feature": pd.Series(feats, dtype=object),
                "n_bytes": pdf["payload"].map(len).astype("int32"),
            })

    return df.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand (doc_id, duration_ms) into
    (doc_id, frame_ts) rows WITHOUT touching payload (the decode of each
    frame is the stubbed step). Demonstrates metadata-driven fan-out."""
    return (df.select("doc_id", "duration_ms")
            .withColumn("frame_ts", F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                           F.lit(every_ms)))))
