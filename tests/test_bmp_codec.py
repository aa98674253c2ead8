"""Pure-numpy BMP codec differentials: hand-built byte layouts and
hand-computed resize values (no Spark in the kernel half)."""

import struct

import numpy as np
import pytest

from neuronews_spark.functions.bmp import (
    bmp_features,
    bmp_resize_payload,
    decode_bmp,
    encode_bmp,
    resize_bilinear,
    resize_nearest,
)


def _hand_bmp_2x2(top_down: bool = False) -> tuple[bytes, np.ndarray]:
    """2×2 24-bit BMP constructed byte-by-byte, independently of
    encode_bmp.  Pixels (RGB): [[red, green], [blue, white]]."""
    red, green, blue, white = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)
    img = np.array([[red, green], [blue, white]], dtype=np.uint8)
    # rows: 2 px × 3 B = 6 B → padded to 8 B; BGR order
    def row(px):
        return bytes(b for p in px for b in (p[2], p[1], p[0])) + b"\x00\x00"

    rows = [row([blue, white]), row([red, green])]  # bottom-up
    if top_down:
        rows = [row([red, green]), row([blue, white])]
    pixels = b"".join(rows)
    h = -2 if top_down else 2
    info = struct.pack("<IiiHHIIiiII", 40, 2, h, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return hdr + info + pixels, img


def test_decode_hand_built_bottom_up_and_top_down():
    for td in (False, True):
        data, img = _hand_bmp_2x2(top_down=td)
        np.testing.assert_array_equal(decode_bmp(data), img)


def test_roundtrip_various_dims_including_padding():
    rng = np.random.default_rng(0)
    for w, h in [(1, 1), (2, 2), (3, 5), (7, 4), (16, 12), (13, 9)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(out, img)
        # encoded row stride padded to 4 bytes
        assert (len(encode_bmp(img)) - 54) == ((w * 3 + 3) & ~3) * h


def test_decode_rejects_non_bmp_and_variants():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"\x89PNG" + b"\x00" * 64)
    data, _ = _hand_bmp_2x2()
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(data[:-4])
    # flip bpp to 8 → unsupported variant
    bad = bytearray(data)
    struct.pack_into("<H", bad, 14 + 14, 8)
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        decode_bmp(bytes(bad))


def test_resize_nearest_2x2_to_4x4_blocks():
    img = np.array([[[10], [20]], [[30], [40]]], dtype=np.uint8)
    out = resize_nearest(img, 4, 4)[:, :, 0]
    expect = np.array(
        [[10, 10, 20, 20], [10, 10, 20, 20], [30, 30, 40, 40], [30, 30, 40, 40]]
    )
    np.testing.assert_array_equal(out, expect)


def test_resize_bilinear_hand_computed():
    # constant stays constant
    const = np.full((3, 3, 3), 77, dtype=np.uint8)
    assert (resize_bilinear(const, 7, 5) == 77).all()
    # 1×2 [0, 100] → 1×4: half-pixel centers give [0, 25, 75, 100]
    line = np.array([[[0], [100]]], dtype=np.uint8)
    out = resize_bilinear(line, 4, 1)[0, :, 0]
    np.testing.assert_array_equal(out, [0, 25, 75, 100])


def test_bmp_resize_payload_roundtrip_dims():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    resized = decode_bmp(bmp_resize_payload(encode_bmp(img), 5, 4, "nearest"))
    assert resized.shape == (4, 5, 3)
    np.testing.assert_array_equal(resized, resize_nearest(img, 5, 4))


def test_bmp_features_uniform_image():
    img = np.full((8, 8, 3), 200, dtype=np.uint8)
    v = bmp_features(encode_bmp(img), dim=16)
    assert v.shape == (16,)
    np.testing.assert_allclose(v, 0.25, rtol=1e-6)  # uniform → 1/√16 each
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-6
