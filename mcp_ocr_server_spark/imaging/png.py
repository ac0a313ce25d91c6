"""Minimal deterministic PNG encoder/decoder (numpy + zlib, stdlib only).

Plays the role of the reference's `gocv.IMDecode` / `IMEncode(".png")`
seam (preprocessor.go:64-72, 114-121 — SURVEY.md §2.1 S3/S4): media
bytes travel through Spark as an encoded-image BinaryType column and
are decoded to uint8 arrays only inside pandas UDF batches.

Supports 8-bit grayscale (color type 0) and 8-bit RGB (color type 2),
all five standard scanline filters on decode, filter 0 on encode.
Pure function of the pixel array → byte-identical output for identical
input, which the content-hash memoization tests rely on
(cache.go:188-198 key determinism, cache_test.go:64-77).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 HxW (grayscale) or HxWx3 (RGB) → PNG bytes."""
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8 array, got {img.dtype}")
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"expected HxW or HxWx3, got shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = img.reshape(h, w * channels)
    # filter byte 0 (None) prepended to each scanline
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raw], axis=1
    ).tobytes()
    idat = zlib.compress(scanlines, level=6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 HxW or HxWx3 array.

    Raises ValueError on anything that is not an 8-bit gray/RGB
    non-interlaced PNG — callers map that to PREPROCESSING_FAILED /
    UNSUPPORTED_FORMAT error rows (fail-soft, handler.go:271-275).
    """
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bit_depth != 8 or color_type not in (0, 2) or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={bit_depth} color={color_type} interlace={interlace}"
        )
    channels = 1 if color_type == 0 else 3
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: bad decompressed length")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        line = raw[y, 1:].astype(np.uint8).copy()
        f = filters[y]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif f == 2:  # Up
            out[y] = (line.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                out[y, x] = (
                    int(line[x])
                    + int(
                        _paeth(
                            np.uint8(left), np.uint8(int(prev[x])), np.uint8(ul)
                        )
                    )
                ) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: filter {f}")
    if channels == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, channels)
