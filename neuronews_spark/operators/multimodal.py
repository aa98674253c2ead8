"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct (modality, mime, width/height/duration). The Spark-side
plumbing — schema, partition-friendly batch shape, Arrow-batched
``mapInPandas`` UDF signatures — is real and tested.  The codec story is
split by format:

* **24-bit BMP is decoded for real** — a pure-numpy codec
  (``functions/bmp.py``: header parse, row order, padding, BGR↔RGB,
  nearest/bilinear resize) backs the default decoder/resizer when
  ``require_real_decoder=True`` / ``require_real_resizer=True``, so the
  real-codec path is exercised end to end in this environment.
* Other formats (PNG/JPEG/WAV/MP4 — PIL/ffmpeg/librosa absent) still go
  through the deterministic hash-based fakes unless a decoder is
  injected; the require_real paths FAIL on such payloads at decode time
  (ValueError from the BMP parser) rather than faking.
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

    ``require_real_decoder=True`` with no injected decoder uses the
    built-in pure-numpy BMP feature extractor (``functions/bmp.py``) —
    real pixel decode for 24-bit BMP payloads; any other format raises
    ValueError at decode time instead of silently faking.
    """
    if require_real_decoder and decoder is None:
        from neuronews_spark.functions.bmp import bmp_features

        decoder = lambda p: bmp_features(p, dim=FEATURE_DIM)  # noqa: E731
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
    projection into the UDF, output schema/metadata.  The default codec
    is the deterministic blake2b fake (nominal width·height·3 payload,
    keyed by source bytes) so batching/byte-volume behavior is exercised
    hermetically for any mime; ``require_real_resizer=True`` with no
    injected resizer switches to the built-in pure-numpy BMP codec
    (decode → bilinear resize → re-encode), which decodes 24-bit BMP
    payloads for real and raises ValueError on anything else.  Inject
    ``resizer=`` (PIL-based) for other formats where the library
    exists."""
    if require_real_resizer and resizer is None:
        from neuronews_spark.functions.bmp import bmp_resize_payload

        resizer = bmp_resize_payload

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


def synthetic_media(
    spark, n: int = 64, seed: int = 5, image_format: str = "hash"
) -> DataFrame:
    """Deterministic fake media table for plumbing tests.

    ``image_format="bmp"`` gives image rows REAL 24-bit BMP payloads
    (pure-numpy encoder, seeded per-row pixel noise, per-row varying
    dimensions incl. widths that exercise the 4-byte row padding) so the
    real-codec decode/resize paths run end to end; audio/video payloads
    stay opaque hash bytes either way."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (i % 7 + 1)
        width = height = 64 if modality == "image" else None
        mime = {
            "image": "image/png", "audio": "audio/wav", "video": "video/mp4"
        }[modality]
        if modality == "image" and image_format == "bmp":
            import numpy as np

            width = 8 + (i % 9)   # 8..16 — odd widths hit row padding
            height = 6 + (i % 7)  # 6..12
            rng = np.random.default_rng(seed * 100_003 + i)
            from neuronews_spark.functions.bmp import encode_bmp

            payload = encode_bmp(
                rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
            )
            mime = "image/bmp"
        rows.append(
            (
                f"m{i:04d}",
                modality,
                mime,
                bytearray(payload),
                width,
                height,
                float(i % 30 + 1) if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
