"""Format-sniffing pixel decode over the two in-repo image codecs.

The reference hands incoming bytes to OpenCV's imdecode, which sniffs
the container from magic bytes (tesseract.go's image load path); this
is that dispatch for the codecs this repo implements from scratch:
PNG (imaging/png.py) and baseline JPEG (imaging/jpeg.py).  Both return
uint8 HxW (gray) or HxWx3 (RGB); callers that need gray fold RGB with
the same BT.601 integer luma everywhere else in the repo uses.
"""

from __future__ import annotations

import numpy as np

from .jpeg import decode_jpeg
from .png import decode_png

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image(data: bytes) -> np.ndarray:
    """uint8 HxW or HxWx3 pixels from PNG or baseline-JPEG bytes.

    Raises ValueError for any other payload (callers map it to
    PREPROCESSING_FAILED / per-row error strings, fail-soft)."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    raise ValueError(
        "unsupported image payload: not PNG or baseline JPEG"
    )


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
