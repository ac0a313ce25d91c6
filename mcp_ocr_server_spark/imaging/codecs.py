"""Format-sniffing pixel decode over the in-repo image codecs.

The reference hands incoming bytes to OpenCV's imdecode, which sniffs
the container from magic bytes (tesseract.go's image load path); this
is that dispatch for the codecs this repo implements from scratch —
the OCR-relevant members of imdecode's built-in matrix plus the two
web-crawl staples:
PNG (imaging/png.py), baseline+progressive JPEG (imaging/jpeg.py),
BMP (imaging/bmp.py), Netpbm P1-P7 (imaging/pnm.py), TIFF
(imaging/tiff.py — first page here; multi-page scans go through
decode_image_pages), lossless WebP (imaging/webp.py), GIF
(imaging/gif.py — first composited frame here, animations through
decode_image_pages), and ICO favicons (imaging/ico.py — best
directory entry).  All return uint8 HxW (gray) or HxWx3 (RGB);
callers that need gray fold RGB with the same BT.601 integer luma
everywhere else in the repo uses.
"""

from __future__ import annotations

import numpy as np

from .bmp import decode_bmp
from .gif import decode_gif, decode_gif_frames
from .ico import decode_ico
from .jpeg import decode_jpeg
from .png import decode_png
from .pnm import decode_pnm
from .tiff import decode_tiff, decode_tiff_pages
from .webp import decode_webp

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNM_MAGICS = {b"P%d" % i for i in range(1, 8)}  # P7 = PAM


def sniff_image_format(data: bytes) -> str:
    """Container name from magic bytes, or ValueError — the same
    dispatch decode_image uses, exposed for inventory queries."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in _PNM_MAGICS:
        return "pnm"
    if data[:2] in (b"II", b"MM"):
        return "tiff"  # decode_tiff validates the 42 magic loudly
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"  # decode_webp refuses lossy/VP8X loudly
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"\x00\x00\x01\x00":
        return "ico"
    raise ValueError(
        f"unsupported image payload (magic {data[:4]!r}):"
        " not PNG/JPEG/BMP/PNM/TIFF/WebP/GIF/ICO"
    )


def apply_exif_orientation(img: np.ndarray, o: int) -> np.ndarray:
    """The eight EXIF orientations as numpy views (PIL
    exif_transpose semantics): 2 mirror, 3 rot180, 4 flip, 5
    transpose, 6 rotate 90 CW, 7 transverse, 8 rotate 90 CCW."""
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1]
    if o == 5:
        return img.swapaxes(0, 1)
    if o == 6:
        return np.rot90(img, -1)
    if o == 7:
        return img[::-1, ::-1].swapaxes(0, 1)
    if o == 8:
        return np.rot90(img, 1)
    return img


def _decode_jpeg_oriented(data: bytes) -> np.ndarray:
    """JPEG decode honoring the EXIF orientation tag — the
    phone-camera sideways capture is a 90° rotation, which sits far
    OUTSIDE the deskew stage's ±45° estimator range, so applying the
    tag here is what makes those images OCR-able at all.  (PDF
    /DCTDecode XObjects keep the raw decode: page orientation there
    is /Rotate's job.)"""
    from .jpeg import exif_orientation

    img = decode_jpeg(data)
    o = exif_orientation(data)
    if o == 1:
        return img
    return np.ascontiguousarray(apply_exif_orientation(img, o))


_DECODERS = {
    "png": decode_png,
    "jpeg": _decode_jpeg_oriented,
    "bmp": decode_bmp,
    "pnm": decode_pnm,
    "tiff": decode_tiff,
    "webp": decode_webp,
    "gif": decode_gif,
    "ico": decode_ico,
}


def decode_image(data: bytes) -> np.ndarray:
    """uint8 HxW or HxWx3 pixels from PNG / JPEG / BMP / Netpbm /
    TIFF / lossless-WebP / GIF / ICO bytes.

    Raises ValueError for any other payload (callers map it to
    PREPROCESSING_FAILED / per-row error strings, fail-soft)."""
    return _DECODERS[sniff_image_format(data)](data)


def decode_image_pages(data: bytes) -> list[np.ndarray]:
    """Every page/frame of a payload: TIFF yields one page per IFD
    (the fax/flatbed multi-page shape), GIF one composited frame per
    image block (animations), everything else a single page — the one
    dispatch the scan inventory/OCR row functions share."""
    fmt = sniff_image_format(data)
    if fmt == "tiff":
        return decode_tiff_pages(data)
    if fmt == "gif":
        return decode_gif_frames(data)
    return [_DECODERS[fmt](data)]


def to_gray(img: np.ndarray) -> np.ndarray:
    """BT.601 integer luma fold for HxWx3, identity for HxW — the one
    gray conversion used across the repo (pdf XObjects, jpeg views)."""
    if img.ndim == 2:
        return img
    rgb = img.astype(np.uint32)
    return (
        (77 * rgb[..., 0] + 150 * rgb[..., 1] + 29 * rgb[..., 2] + 128)
        >> 8
    ).astype(np.uint8)
