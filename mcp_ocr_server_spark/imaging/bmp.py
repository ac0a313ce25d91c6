"""Windows BMP decoder/encoder — pure stdlib + numpy.

Part of the input-format matrix the reference inherits from OpenCV's
`gocv.IMDecode` (preprocessor.go:64 — imdecode sniffs BMP/DIB among
its built-ins): a user of the reference can hand BMP scans to the OCR
path, so this engine must too.

Supported on decode: BITMAPINFOHEADER (40) / V4 (108) / V5 (124)
headers, uncompressed (BI_RGB) at 1/8/24/32 bits per pixel, BI_RLE8
run-length decoding (encoded + absolute runs, EOL/EOB/delta escapes),
bottom-up AND top-down row order, palettes for the indexed depths.
32-bit rows drop the (almost always unused) alpha/reserved byte.
Refused LOUDLY: RLE4/bitfields compression, 4/16-bit depths, the
ancient BITMAPCORE header — the refuse-loudly contract every parser
in this repo carries.

Encode emits an 8-bit grayscale-palette BMP (HxW input) or a 24-bit
BGR BMP (HxWx3 RGB input), bottom-up, rows padded to 4 bytes —
deterministic byte-identical output for identical input.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> uint8 HxW (gray/palette-gray) or HxWx3 (RGB).

    A palette whose entries are all gray (R==G==B) decodes to HxW; a
    colored palette expands to HxWx3.  Raises ValueError on anything
    outside the supported matrix — callers map it to
    PREPROCESSING_FAILED error rows, fail-soft."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("bmp: bad signature")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size not in (40, 108, 124):
        raise ValueError(f"bmp: unsupported header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    n_colors = struct.unpack_from("<I", data, 46)[0]
    if planes != 1:
        raise ValueError(f"bmp: planes {planes}")
    if compression not in (0, 1):
        raise ValueError(
            f"bmp: compression {compression} unsupported (BI_RGB/BI_RLE8)"
        )
    if compression == 1 and bpp != 8:
        raise ValueError(f"bmp: BI_RLE8 requires 8-bit, got {bpp}")
    if bpp not in (1, 8, 24, 32):
        raise ValueError(f"bmp: {bpp}-bit unsupported")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0:
        raise ValueError(f"bmp: bad dimensions {w}x{h_raw}")

    palette = None
    if bpp in (1, 8):
        n = n_colors or (1 << bpp)
        pal_off = 14 + hdr_size
        if pal_off + 4 * n > len(data):
            raise ValueError("bmp: truncated palette")
        pal = np.frombuffer(data, np.uint8, count=4 * n, offset=pal_off)
        palette = pal.reshape(n, 4)[:, :3][:, ::-1].copy()  # BGRA -> RGB

    if compression == 1:
        # BI_RLE8 (always bottom-up): (count, value) runs, escapes
        # 00 00 = end of line, 00 01 = end of bitmap, 00 02 dx dy =
        # delta (skipped pixels are index 0), 00 n>=3 = absolute run
        # padded to word
        if top_down:
            raise ValueError("bmp: top-down RLE8 is illegal")
        grid = np.zeros((h, w), dtype=np.uint8)
        pos, x, y = pix_off, 0, 0
        while pos + 1 < len(data):
            n, v = data[pos], data[pos + 1]
            pos += 2
            if n:  # encoded run
                end = min(x + n, w)
                grid[y, x:end] = v
                x = end
                continue
            if v == 0:  # end of line
                x, y = 0, y + 1
                if y >= h:
                    break
            elif v == 1:  # end of bitmap
                break
            elif v == 2:  # delta
                if pos + 1 >= len(data):
                    raise ValueError("bmp: truncated RLE8 delta")
                x = min(x + data[pos], w)
                y += data[pos + 1]
                pos += 2
                if y >= h:
                    break
            else:  # absolute run of v pixels, word-aligned
                if pos + v > len(data):
                    raise ValueError("bmp: truncated RLE8 absolute run")
                end = min(x + v, w)
                grid[y, x:end] = np.frombuffer(
                    data, np.uint8, count=v, offset=pos
                )[: end - x]
                x = end
                pos += v + (v & 1)
        else:
            raise ValueError("bmp: unterminated RLE8 stream")
        if int(grid.max(initial=0)) >= len(palette):
            raise ValueError("bmp: palette index out of range")
        # RLE8 coordinates are bottom-up: stream row y = image row
        # h-1-y
        rgb = palette[grid][::-1]
        if (rgb[:, :, 0] == rgb[:, :, 1]).all() and (
            rgb[:, :, 1] == rgb[:, :, 2]
        ).all():
            return rgb[:, :, 0].copy()
        return rgb.copy()

    stride = ((w * bpp + 31) // 32) * 4
    need = stride * h
    if pix_off + need > len(data):
        raise ValueError("bmp: truncated pixel array")
    rows = np.frombuffer(data, np.uint8, count=need, offset=pix_off)
    rows = rows.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp == 1:
        idx = np.unpackbits(rows, axis=1)[:, :w]
    elif bpp == 8:
        idx = rows[:, :w]
    elif bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        return px[:, :, ::-1].copy()  # BGR -> RGB
    else:  # 32
        px = rows[:, : w * 4].reshape(h, w, 4)
        return px[:, :, :3][:, :, ::-1].copy()  # BGRX -> RGB
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("bmp: palette index out of range")
    rgb = palette[idx]
    if (rgb[:, :, 0] == rgb[:, :, 1]).all() and (
        rgb[:, :, 1] == rgb[:, :, 2]
    ).all():
        return rgb[:, :, 0].copy()
    return rgb


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 HxW -> 8-bit gray-palette BMP; uint8 HxWx3 (RGB) -> 24-bit
    BMP.  Bottom-up, BITMAPINFOHEADER, deterministic."""
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8 array, got {img.dtype}")
    if img.ndim == 2:
        h, w = img.shape
        bpp, pal_n = 8, 256
        ramp = np.arange(256, dtype=np.uint8)
        palette = np.stack([ramp, ramp, ramp, np.zeros(256, np.uint8)], 1)
        pal_bytes = palette.tobytes()
        row_px = img
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        bpp, pal_n, pal_bytes = 24, 0, b""
        row_px = img[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    else:
        raise ValueError(f"expected HxW or HxWx3, got shape {img.shape}")
    stride = ((w * bpp + 31) // 32) * 4
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : row_px.shape[1]] = row_px
    pix = padded[::-1].tobytes()  # bottom-up
    pix_off = 14 + 40 + len(pal_bytes)
    file_size = pix_off + len(pix)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pix_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pix), 2835, 2835, pal_n, 0
    )
    return file_hdr + info_hdr + pal_bytes + pix
