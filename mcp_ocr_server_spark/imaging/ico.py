"""Windows ICO (favicon) decoder/encoder — pure stdlib + numpy.

The favicon is the one image a web crawl fetches for EVERY site, so a
crawl-scale media inventory has to classify and decode ICO payloads
(and imdecode-family byte sniffers treat it as part of the web input
matrix).  An ICO is a directory of images in two payload dialects:

  * PNG payloads (modern favicons) — delegated to imaging/png.py;
  * BMP DIBs (classic): a BITMAPINFOHEADER whose biHeight covers the
    XOR (color) image AND the 1-bit AND (transparency) mask stacked
    bottom-up.  The XOR rows re-use the BMP row logic by synthesizing
    a file header around the DIB with the height patched to the real
    image height; the AND mask is applied here (masked pixels go
    white — the compositing a document/OCR pipeline wants).

decode_ico returns the BEST image in the directory (largest area,
then highest bit depth) under the repo-wide convention: uint8 HxW
when gray, HxWx3 otherwise.  decode_ico_all returns every entry.
Refused LOUDLY: bad reserved/type fields, zero entries, truncated
directories/payloads, unsupported DIB depths — the refuse-loudly
contract every parser in this repo carries.

encode_ico emits deterministic PNG-payload entries (the modern
dialect), dimensions up to 256 (stored as 0 per the format).
"""

from __future__ import annotations

import struct

import numpy as np

from .bmp import decode_bmp, encode_bmp
from .png import decode_png, encode_png

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _parse_entries(data: bytes) -> list[dict]:
    if len(data) < 6:
        raise ValueError("ico: truncated header")
    reserved, ico_type, count = struct.unpack_from("<HHH", data, 0)
    if reserved != 0 or ico_type not in (1, 2):
        raise ValueError(
            f"ico: bad header (reserved {reserved}, type {ico_type})"
        )
    if count == 0:
        raise ValueError("ico: zero images")
    if 6 + 16 * count > len(data):
        raise ValueError("ico: truncated directory")
    entries = []
    for i in range(count):
        w, h, _colors, _res, planes, bpp, size, off = struct.unpack_from(
            "<BBBBHHII", data, 6 + 16 * i
        )
        if off + size > len(data):
            raise ValueError(f"ico: entry {i} payload out of bounds")
        entries.append(dict(
            w=w or 256, h=h or 256, bpp=bpp, planes=planes,
            payload=data[off:off + size],
        ))
    return entries


def _decode_dib(payload: bytes) -> np.ndarray:
    """Classic ICO DIB: header with doubled height, XOR image rows,
    then the 1-bit AND mask (rows padded to 32 bits, bottom-up)."""
    if len(payload) < 40:
        raise ValueError("ico: truncated DIB")
    hdr_size = struct.unpack_from("<I", payload, 0)[0]
    if hdr_size != 40:
        raise ValueError(f"ico: DIB header size {hdr_size} unsupported")
    w, h2 = struct.unpack_from("<ii", payload, 4)
    bpp = struct.unpack_from("<H", payload, 14)[0]
    compression = struct.unpack_from("<I", payload, 16)[0]
    n_colors = struct.unpack_from("<I", payload, 32)[0]
    if compression != 0:
        raise ValueError(f"ico: compressed DIB ({compression}) unsupported")
    if h2 % 2 != 0:
        raise ValueError("ico: DIB height not doubled")
    h = h2 // 2
    if w <= 0 or h <= 0:
        raise ValueError(f"ico: bad DIB dimensions {w}x{h2}")
    if bpp not in (1, 8, 24, 32):
        raise ValueError(f"ico: {bpp}-bit DIB unsupported")

    # synthesize a BMP file around the XOR half: patch the height and
    # point the pixel offset past the (unchanged) palette
    pal_n = (n_colors or (1 << bpp)) if bpp in (1, 8) else 0
    pix_off = 14 + 40 + 4 * pal_n
    hdr = bytearray(payload[:40])
    struct.pack_into("<i", hdr, 8, h)
    xor_stride = (w * bpp + 31) // 32 * 4
    and_stride = (w + 31) // 32 * 4
    need = 40 + 4 * pal_n + xor_stride * h + and_stride * h
    if len(payload) < need:
        raise ValueError("ico: truncated DIB pixel data")
    bmp_blob = (
        b"BM" + struct.pack("<IHHI", 14 + need, 0, 0, pix_off)
        + bytes(hdr) + payload[40:40 + 4 * pal_n + xor_stride * h]
    )
    img = decode_bmp(bmp_blob)

    # AND mask: set bits = transparent -> white background
    mask_off = 40 + 4 * pal_n + xor_stride * h
    rows = np.frombuffer(
        payload, np.uint8, count=and_stride * h, offset=mask_off
    ).reshape(h, and_stride)
    bits = np.unpackbits(rows, axis=1)[:, :w][::-1]  # bottom-up
    if bits.any():
        if img.ndim == 2:
            img = img.copy()
            img[bits == 1] = 255
        else:
            img = img.copy()
            img[bits == 1] = (255, 255, 255)
    return img


def _decode_entry(payload: bytes) -> np.ndarray:
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    return _decode_dib(payload)


def decode_ico_all(data: bytes) -> list[np.ndarray]:
    """Every directory entry, decoded, in directory order."""
    return [_decode_entry(e["payload"]) for e in _parse_entries(bytes(data))]


def decode_ico(data: bytes) -> np.ndarray:
    """The best entry: largest area, then highest declared depth."""
    entries = _parse_entries(bytes(data))
    best = max(entries, key=lambda e: (e["w"] * e["h"], e["bpp"]))
    return _decode_entry(best["payload"])


def encode_ico(images: "np.ndarray | list[np.ndarray]") -> bytes:
    """uint8 HxW / HxWx3 image(s) -> ICO with PNG payloads.  Any
    dimension over 256 refuses (the directory stores sizes in one
    byte) — favicons are small by definition."""
    if isinstance(images, np.ndarray):
        images = [images]
    if not images:
        raise ValueError("ico encode: no images")
    payloads = []
    for img in images:
        h, w = img.shape[:2]
        if w > 256 or h > 256:
            raise ValueError(f"ico encode: {w}x{h} exceeds 256")
        payloads.append((w, h, encode_png(img)))
    out = bytearray(struct.pack("<HHH", 0, 1, len(payloads)))
    off = 6 + 16 * len(payloads)
    for w, h, blob in payloads:
        out += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(blob), off
        )
        off += len(blob)
    for _, _, blob in payloads:
        out += blob
    return bytes(out)


def encode_ico_bmp(img: np.ndarray) -> bytes:
    """One classic BMP-DIB entry (all-opaque AND mask) — exercises the
    decoder's DIB dialect; real old favicons have this exact shape."""
    h, w = img.shape[:2]
    if w > 256 or h > 256:
        raise ValueError(f"ico encode: {w}x{h} exceeds 256")
    bmp = encode_bmp(img)
    pix_off = struct.unpack_from("<I", bmp, 10)[0]
    dib = bytearray(bmp[14:])
    struct.pack_into("<i", dib, 8, 2 * h)  # doubled height
    and_stride = (w + 31) // 32 * 4
    payload = (bytes(dib[:pix_off - 14]) + bmp[pix_off:]
               + b"\x00" * (and_stride * h))
    out = bytearray(struct.pack("<HHH", 0, 1, 1))
    bpp = struct.unpack_from("<H", bmp, 28)[0]
    out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, bpp,
                       len(payload), 22)
    out += payload
    return bytes(out)
