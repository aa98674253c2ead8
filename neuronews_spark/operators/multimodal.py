"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct (modality, mime, width/height/duration). The Spark-side
plumbing — schema, partition-friendly batch shape, Arrow-batched
``mapInPandas`` UDF signatures — is real and tested; the actual codec step
is stubbed: decode libraries (PIL/ffmpeg/librosa) are not in this
environment, so ``decode_features`` uses a deterministic hash-based fake
feature extractor unless a real decoder is injected, and raises
``NotImplementedError`` when ``require_real_decoder=True``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = (
    "media_id string, modality string, n_bytes int, feature array<float>"
)


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decode→embed step: features are a
    pure function of the payload bytes (md5-seeded), so tests are hermetic
    and the Spark plumbing (batching, schema, shuffle) is exercised for
    real. Swap for a genuine decoder via ``decoder=`` injection."""
    digest = hashlib.md5(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def decode_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    require_real_decoder: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """media(MEDIA_SCHEMA) → (media_id, modality, n_bytes, feature).

    Runs as ``mapInPandas`` so each Python invocation sees an Arrow batch of
    payloads (the shape a real GPU/codec worker wants). Binary payloads are
    the only heavy column; everything else is pruned before the UDF.
    """
    if require_real_decoder and decoder is None:
        raise NotImplementedError(
            "no real media decoder available in this environment; "
            "inject decoder=... (PIL/ffmpeg-based) to decode for real"
        )
    dec = decoder or _fake_decode

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [dec(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": [f.tolist() for f in feats],
                }
            )

    pruned = media.select("media_id", "modality", "payload")
    return pruned.mapInPandas(_run, schema=_FEATURES_SCHEMA)


_RESIZED_SCHEMA = "media_id string, mime string, width int, height int, payload binary"


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    require_real_resizer: bool = False,
) -> DataFrame:
    """Image resize as an Arrow-batched ``mapInPandas`` stage:
    media(MEDIA_SCHEMA) image rows → (media_id, mime, width, height,
    payload) with payloads re-encoded at (width, height).

    Spark-side plumbing is real — image-row pruning, payload-only
    projection into the UDF, output schema/metadata — while the codec is
    stubbed like :func:`decode_features`: the fake resizer emits a
    deterministic payload of the nominal RGB byte size (width·height·3,
    blake2b-keyed by the source payload) so batching and byte-volume
    behavior are exercised hermetically. Inject ``resizer=`` (PIL-based)
    where the library exists; ``require_real_resizer=True`` refuses to
    fake."""
    if require_real_resizer and resizer is None:
        raise NotImplementedError(
            "no real image codec available in this environment; "
            "inject resizer=... (PIL-based) to resize for real"
        )

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        key = hashlib.blake2b(payload or b"", digest_size=32).digest()
        need = w * h * 3
        return (key * (need // 32 + 1))[:need]

    rz = resizer or _fake_resize

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                    "payload": [
                        rz(p if p is not None else b"", width, height)
                        for p in pdf["payload"]
                    ],
                }
            )

    pruned = media.filter(F.col("modality") == "image").select(
        "media_id", "mime", "payload"
    )
    return pruned.mapInPandas(_run, schema=_RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) —
    the distribution-side half of frame extraction (the codec half is the
    stubbed decoder). Pure Column math via sequence()."""
    n = F.greatest(F.ceil(F.col("duration_s") / F.lit(every_s)), F.lit(1)).cast("int")
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.round(i * F.lit(every_s), 3),
            )
        ).alias("frame_ts"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (i % 7 + 1)
        modality = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                f"m{i:04d}",
                modality,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                bytearray(payload),
                64 if modality == "image" else None,
                64 if modality == "image" else None,
                float(i % 30 + 1) if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
