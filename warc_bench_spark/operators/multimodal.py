"""Multimodal (image/audio/video) column plumbing.

The reference carries media as opaque binary cells — JPEG screenshots in
``WebState.viewport`` (``/root/reference/src/orby/protos/action_data.proto:
21-24``, encode path ``record_utils.py:445-481``) and ``image_url`` refs in
the interleaved ``LLMContent`` (``llm_data.proto:7-17``). Our engine keeps
the same contract: media are ``binary`` (or ``media_ref`` pointer) columns
with typed metadata, and decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages.

The sandbox has no image/audio codecs (no PIL/cv2/ffmpeg), so the *decode
kernels* are stubbed: ``decode_backend='real'`` raises NotImplementedError
at the exact call site a codec would occupy, while the default
``'fake'`` backend produces deterministic sha-derived outputs. Everything
Spark-side — schemas, partition flow, batch iteration, UDF signatures — is
real and tested; swapping in a real codec changes only the marked inner
functions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_type", StringType()),   # image/jpeg, video/mp4, ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_decode(ref: str) -> np.ndarray:
    """Deterministic stand-in for a codec: 8 floats derived from the ref
    hash. A real backend replaces exactly this function."""
    h = hashlib.sha256(ref.encode()).digest()
    return np.frombuffer(h[:32], dtype=np.uint8).reshape(8, 4).mean(axis=1) / 255.0


def decode_media_meta(docs: DataFrame, backend: str = "fake") -> DataFrame:
    """media spans -> typed metadata rows (one per media cell).

    Plumbing is real (explode + mapInPandas over Arrow batches); only the
    byte-level probe is backend-dependent.
    """
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "real":
                raise NotImplementedError(
                    "real media probing needs an image/video codec (PIL/ffmpeg) "
                    "— not available in this environment; plug it in here"
                )
            h = pdf["media_ref"].map(
                lambda r: int(hashlib.sha256(r.encode()).hexdigest()[:8], 16)
            )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": np.where(h % 4 == 0, "video/mp4", "image/jpeg"),
                    "width": (64 + h % 1920).astype("int32"),
                    "height": (64 + (h // 7) % 1080).astype("int32"),
                    "n_frames": np.where(h % 4 == 0, (1 + h % 240), 1).astype("int32"),
                }
            )

    return refs.mapInPandas(probe, MEDIA_META_SCHEMA)


def extract_media_features(docs: DataFrame, backend: str = "fake") -> DataFrame:
    """media cells -> fixed-width float feature vectors (Arrow-batched)."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if backend == "real":
                raise NotImplementedError("plug a real feature extractor in here")
            feats = [
                [float(x) for x in _fake_decode(r)] for r in pdf["media_ref"]
            ]
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "feature": feats})

    return refs.mapInPandas(featurize, FEATURES_SCHEMA)


def sample_frames(meta: DataFrame, every_n: int = 30) -> DataFrame:
    """video rows -> (media_ref, frame_index) sampling plan — pure JVM
    column ops (sequence + explode), no Python."""
    vids = meta.filter(F.col("media_type").startswith("video"))
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_index"),
    )
