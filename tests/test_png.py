"""PNG codec roundtrip + determinism (SURVEY.md §2.1 S3/S4 seam)."""

import numpy as np
import pytest

from mcp_ocr_server_spark.imaging import png
from mcp_ocr_server_spark.imaging.font import render_text


def test_gray_roundtrip():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (37, 53), dtype=np.uint8)
    assert (png.decode_png(png.encode_png(img)) == img).all()


def test_rgb_roundtrip():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (21, 33, 3), dtype=np.uint8)
    out = png.decode_png(png.encode_png(img))
    assert out.shape == (21, 33, 3)
    assert (out == img).all()


def test_encode_deterministic():
    """Byte-identical encode for identical pixels — the content-hash
    memoization key (cache.go:188-198) depends on this."""
    img = render_text("DETERMINISM", scale=2)
    assert png.encode_png(img) == png.encode_png(img.copy())


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        png.decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        png.decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_decode_rejects_unsupported_depth():
    # valid signature+IHDR but 16-bit depth
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        png.decode_png(data)
