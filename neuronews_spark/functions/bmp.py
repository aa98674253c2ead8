"""Pure-numpy 24-bit BMP codec + resize kernels for the multimodal stages.

No PIL/ffmpeg exists in this environment, but uncompressed 24-bit BMP
(BITMAPINFOHEADER, BI_RGB) needs nothing beyond struct parsing and numpy
slicing — so the multimodal decode/resize injection points
(``operators/multimodal.py``) get a REAL codec for this format instead of
a stub: header validation, bottom-up/top-down row order, 4-byte row
padding, BGR↔RGB channel order.

Resize conventions (documented because they are part of the output
contract, not a library default we inherit):

* ``nearest``: source index = floor((i + 0.5) · src/dst) clamped — the
  standard pixel-center mapping.
* ``bilinear``: sample at (i + 0.5) · src/dst − 0.5 with edge clamping
  (half-pixel centers, no corner alignment), separable interpolation in
  float64, final round-half-away-from-zero back to uint8.

Everything is deterministic: same payload + dims → same bytes on every
platform, which is what lets the driver queries pin value oracles.

Reference parity: the reference's ingestion treats media as opaque bytes
plus metadata (SURVEY §2 multimodal row); the codec itself is new
capability required by the training-pipeline mandate, not a port.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array → 24-bit BI_RGB BMP bytes (bottom-up)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {a.shape}")
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    # bottom-up rows, BGR channel order
    bgr = a[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, row_bytes), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
    else:
        rows = bgr.reshape(h, row_bytes)
    pixels = rows.tobytes()
    info = _INFO_HEADER.pack(40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    file_hdr = _FILE_HEADER.pack(b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return file_hdr + info + pixels


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (H, W, 3) uint8 RGB array.

    Accepts bottom-up (positive height) and top-down (negative height)
    rows; rejects anything that is not an uncompressed 24-bit BMP with a
    clear error — callers treat that as 'payload is not decodable'."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    _, _, _, _, offset = _FILE_HEADER.unpack_from(data, 0)
    (
        hdr_size,
        w,
        h_raw,
        planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _clr_used,
        _clr_imp,
    ) = _INFO_HEADER.unpack_from(data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); only 24-bit BI_RGB is supported"
        )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    row_bytes = (w * 3 + 3) & ~3
    need = offset + row_bytes * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} bytes < {need}")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=offset)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR → RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def _nearest_idx(dst: int, src: int) -> np.ndarray:
    return np.minimum(
        ((np.arange(dst) + 0.5) * (src / dst)).astype(np.int64), src - 1
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """(H, W, C) → (height, width, C), pixel-center nearest neighbor."""
    a = np.asarray(arr)
    ys = _nearest_idx(height, a.shape[0])
    xs = _nearest_idx(width, a.shape[1])
    return np.ascontiguousarray(a[np.ix_(ys, xs)])


def _lin_weights(dst: int, src: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    pos = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    lo = np.floor(pos).astype(np.int64)
    frac = pos - lo
    lo_c = np.clip(lo, 0, src - 1)
    hi_c = np.clip(lo + 1, 0, src - 1)
    return lo_c, hi_c, frac


def resize_bilinear(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """(H, W[, C]) uint8 → (height, width[, C]) uint8, half-pixel-center
    separable bilinear with edge clamp; round half away from zero."""
    a = np.asarray(arr, dtype=np.float64)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    ylo, yhi, yf = _lin_weights(height, a.shape[0])
    xlo, xhi, xf = _lin_weights(width, a.shape[1])
    yf = yf[:, None, None]
    rows = a[ylo] * (1.0 - yf) + a[yhi] * yf
    xf = xf[None, :, None]
    out = rows[:, xlo] * (1.0 - xf) + rows[:, xhi] * xf
    out = np.floor(out + 0.5).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def bmp_resize_payload(
    payload: bytes, width: int, height: int, method: str = "bilinear"
) -> bytes:
    """decode → resize → re-encode; the real resizer for BMP payloads."""
    arr = decode_bmp(payload)
    if method == "nearest":
        out = resize_nearest(arr, width, height)
    elif method == "bilinear":
        out = resize_bilinear(arr, width, height)
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return encode_bmp(out)


def bmp_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Real feature extractor for BMP payloads: Rec.601 grayscale →
    bilinear downsample to a √dim × √dim grid → flatten → L2-normalize
    float32.  A deterministic embedding computed from ACTUAL pixels,
    same output shape as the hash-fake path it replaces."""
    side = int(round(dim**0.5))
    if side * side != dim:
        raise ValueError(f"dim must be a square number, got {dim}")
    arr = decode_bmp(payload).astype(np.float64)
    gray = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    pooled = resize_bilinear(gray.astype(np.uint8), side, side).astype(np.float64)
    v = pooled.reshape(-1)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)
