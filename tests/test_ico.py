"""ICO codec (imaging/ico.py): PNG and classic BMP-DIB dialects,
best-entry selection, AND-mask transparency, and the refuse-loudly
contract."""

import struct

import numpy as np
import pytest

from mcp_ocr_server_spark.imaging.ico import (
    decode_ico,
    decode_ico_all,
    encode_ico,
    encode_ico_bmp,
)

RNG = np.random.default_rng(20260819)
GRAY = RNG.integers(0, 256, (32, 32), dtype=np.int64).astype(np.uint8)
RGB = RNG.integers(0, 256, (48, 64, 3), dtype=np.int64).astype(np.uint8)


def test_png_dialect_roundtrip():
    assert (decode_ico(encode_ico(GRAY)) == GRAY).all()
    assert (decode_ico(encode_ico(RGB)) == RGB).all()


def test_bmp_dib_dialect_roundtrip():
    assert (decode_ico(encode_ico_bmp(GRAY)) == GRAY).all()
    assert (decode_ico(encode_ico_bmp(RGB)) == RGB).all()


def test_best_entry_selection_and_all():
    blob = encode_ico([GRAY, RGB])  # RGB is larger
    assert decode_ico(blob).shape == RGB.shape
    every = decode_ico_all(blob)
    assert len(every) == 2
    assert (every[0] == GRAY).all() and (every[1] == RGB).all()


def test_256px_encodes_as_zero():
    big = RNG.integers(0, 256, (256, 256), dtype=np.int64).astype(np.uint8)
    blob = encode_ico(big)
    assert blob[6] == 0 and blob[7] == 0  # width/height bytes wrap
    assert (decode_ico(blob) == big).all()


def test_and_mask_transparency_goes_white():
    blob = bytearray(encode_ico_bmp(GRAY))
    and_stride = (32 + 31) // 32 * 4
    # the mask trails the payload, bottom-up: first mask row = bottom
    blob[-and_stride * 32] = 0xFF
    out = decode_ico(bytes(blob))
    assert (out[-1, :8] == 255).all()
    assert (out[:-1] == GRAY[:-1]).all()


def test_refusals():
    with pytest.raises(ValueError, match="truncated header"):
        decode_ico(b"\x00\x00\x01\x00")
    with pytest.raises(ValueError, match="bad header"):
        decode_ico(b"\x01\x00\x01\x00\x01\x00" + b"\x00" * 16)
    with pytest.raises(ValueError, match="zero images"):
        decode_ico(struct.pack("<HHH", 0, 1, 0))
    with pytest.raises(ValueError, match="out of bounds"):
        decode_ico(encode_ico(GRAY)[:30])
    with pytest.raises(ValueError, match="exceeds 256"):
        encode_ico(np.zeros((300, 10), np.uint8))
    # truncated DIB pixel data
    blob = encode_ico_bmp(GRAY)
    cut = bytearray(blob[:-40])
    struct.pack_into("<I", cut, 6 + 8, len(cut) - 22)  # fix entry size
    with pytest.raises(ValueError, match="truncated DIB pixel data"):
        decode_ico(bytes(cut))
