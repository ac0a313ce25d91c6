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
    # valid signature+IHDR but an illegal depth (3)
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 3, 0, 0, 0, 0)

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


# --- extended decode matrix (palette / low depths / alpha / Adam7) -----------


def _chunk(tag, payload):
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _build(w, h, depth, ctype, idat_raw, plte=None, interlace=0,
           trns=None):
    import struct
    import zlib

    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                             interlace)
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(idat_raw))
    return out + _chunk(b"IEND", b"")


def test_palette_png():
    plte = bytes([255, 0, 0, 0, 255, 0, 10, 10, 10])  # red green gray
    # 3x2, depth 8 indices, filter 0 rows
    raw = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 2, 0])
    out = png.decode_png(_build(3, 2, 8, 3, raw, plte=plte))
    want = np.array(
        [[[255, 0, 0], [0, 255, 0], [10, 10, 10]],
         [[10, 10, 10], [10, 10, 10], [255, 0, 0]]], np.uint8)
    assert (out == want).all()


def test_palette_png_2bit_packed():
    plte = bytes([0, 0, 0, 85, 85, 85, 170, 170, 170, 255, 255, 255])
    # 5 px of 2-bit indices [3,0,1,2,3] -> bytes 0b11000110, 0b11000000
    raw = b"\x00" + bytes([0b11000110, 0b11000000])
    out = png.decode_png(_build(5, 1, 2, 3, raw, plte=plte))
    # all-gray palette folds to HxW
    assert out.shape == (1, 5)
    assert list(out[0]) == [255, 0, 85, 170, 255]


def test_gray_1bit_scaled():
    # 10 px row of 1-bit gray: 1->255, 0->0; MSB-first with pad bits
    raw = b"\x00" + bytes([0b10110000, 0b01000000])
    out = png.decode_png(_build(10, 1, 1, 0, raw))
    assert list(out[0]) == [255, 0, 255, 255, 0, 0, 0, 0, 0, 255]


def test_rgba_opaque_and_refusal():
    # 2x1 RGBA, opaque -> RGB; alpha 128 -> loud refusal
    raw = b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 255])
    out = png.decode_png(_build(2, 1, 8, 6, raw))
    assert (out == np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8)).all()
    raw2 = b"\x00" + bytes([1, 2, 3, 128, 4, 5, 6, 255])
    with pytest.raises(ValueError, match="alpha"):
        png.decode_png(_build(2, 1, 8, 6, raw2))


def test_gray_alpha():
    raw = b"\x00" + bytes([7, 255, 200, 255])
    out = png.decode_png(_build(2, 1, 8, 4, raw))
    assert out.shape == (1, 2) and list(out[0]) == [7, 200]


def test_adam7_interlaced_roundtrip_semantics():
    # Build an interlaced stream for a known 5x5 gray image by packing
    # the seven passes ourselves (filter 0 everywhere), then check the
    # decoder reassembles the original raster.
    img = (np.arange(25, dtype=np.uint8) * 9).reshape(5, 5)
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    out = png.decode_png(_build(5, 5, 8, 0, bytes(raw), interlace=1))
    assert (out == img).all()


def test_transparent_palette_refused():
    plte = bytes([1, 2, 3, 4, 5, 6])
    raw = b"\x00" + bytes([0, 1])
    with pytest.raises(ValueError, match="transparent"):
        png.decode_png(
            _build(2, 1, 8, 3, raw, plte=plte, trns=bytes([255, 7]))
        )


def test_16bit_high_byte_fold():
    """16-bit samples fold to their high byte — the convert-down
    OpenCV's imdecode applies, so the reference seam sees identical
    pixels.  Gray, RGB, and opaque RGBA; non-opaque still refuses."""
    import struct
    import zlib

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    def build(w, h, depth, ctype, raw):
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR",
                        struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    out = png.decode_png(
        build(2, 1, 16, 0, b"\x00" + bytes([0x12, 0x34, 0xFF, 0x00]))
    )
    assert list(out[0]) == [0x12, 0xFF]
    vals = (np.array([[10, 20, 30], [40, 50, 60]], np.uint16) << 8)
    out = png.decode_png(build(2, 1, 16, 2, b"\x00" + vals.astype(">u2").tobytes()))
    assert (out == np.array([[[10, 20, 30], [40, 50, 60]]])).all()
    rgba = np.array([[7, 8, 9, 0xFF]], np.uint16) << 8
    rgba[0, 3] = 0xFFFF
    out = png.decode_png(build(1, 1, 16, 6, b"\x00" + rgba.astype(">u2").tobytes()))
    assert (out == np.array([[[7, 8, 9]]])).all()
    rgba[0, 3] = 0x80FF
    with pytest.raises(ValueError, match="alpha"):
        png.decode_png(build(1, 1, 16, 6, b"\x00" + rgba.astype(">u2").tobytes()))


def test_empty_idat_refuses_loudly():
    # zlib errors must surface as ValueError, never zlib.error
    import struct
    import zlib

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="corrupt PNG"):
        png.decode_png(data)


def test_exif_chunk_orientation():
    """PNG 1.5 eXIf: the same advisory orientation JPEG carries —
    stored-rotated pixels right themselves; garbage eXIf payloads
    degrade to identity."""
    import struct

    from mcp_ocr_server_spark.imaging.codecs import (
        apply_exif_orientation)
    from mcp_ocr_server_spark.imaging.png import _chunk

    img = (np.arange(24).reshape(4, 6) * 10).astype(np.uint8)
    stored = np.ascontiguousarray(apply_exif_orientation(img, 8))
    blob = png.encode_png(stored)
    tiff = (b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", 1)
            + struct.pack("<HHIHH", 0x0112, 3, 1, 6, 0)
            + struct.pack("<I", 0))
    spliced = blob[:33] + _chunk(b"eXIf", tiff) + blob[33:]
    assert np.array_equal(png.decode_png(spliced), img)
    junk = blob[:33] + _chunk(b"eXIf", b"garbage!") + blob[33:]
    assert np.array_equal(png.decode_png(junk), stored)
