"""GIF decoder/encoder — pure stdlib + numpy.

Part of the web-crawl media matrix: GIF is the one legacy raster
format a crawl actually delivers in volume (and OpenCV's imdecode —
the reference's byte entry point, preprocessor.go:64 — added GIF to
its built-in matrix in recent releases).  Still GIFs route through the
same decode -> preprocess -> OCR chain as every other scan format;
animated GIFs are the page-per-frame shape, grained exactly like
multi-page TIFF.

Supported on decode: GIF87a + GIF89a, global and local color tables,
interlaced images (the 8/8/4/2 four-pass row order), LZW with
variable code width and mid-stream dictionary resets, Graphic Control
Extensions (transparency index, per-frame delay, disposal methods
0-3 incl. restore-to-background and restore-to-previous), multiple
frames composited onto the logical screen, application / comment /
plain-text extensions skipped structurally.  Refused LOUDLY: bad
signature, truncated streams, out-of-range LZW codes, frames placed
outside the logical screen — the refuse-loudly contract every parser
in this repo carries.

GIF's LZW is NOT TIFF's: codes pack LSB-first (TIFF: MSB-first) and
the code width grows when the table FILLS 1<<width (TIFF grows one
code EARLY) — a separate 40-line implementation instead of a flag on
the TIFF one, so each stays a readable transcription of its spec.

Encode emits deterministic GIF89a: 256-entry gray global palette for
HxW input, or an exact palette built from the unique colors of HxWx3
input (> 256 unique colors refuses — this is a codec seam, not a
quantizer), real LZW compression with dictionary reset at 4096,
optional interlace, optional multi-frame animation (NETSCAPE2.0 loop
block + per-frame Graphic Control Extensions).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first, width grows when the table fills)


def _lzw_decode(data: bytes, mcs: int, n_expected: int) -> bytes:
    """GIF LZW codestream -> index bytes (exactly n_expected of them)."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"gif: bad LZW min code size {mcs}")
    clear = 1 << mcs
    end = clear + 1
    singles = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    table = list(singles)
    width = mcs + 1
    prev: bytes | None = None

    # incremental LSB-first bit reader (a whole-stream bigint would be
    # O(n^2) in shifts on large frames)
    acc = 0
    accbits = 0
    i = 0
    n = len(data)
    while True:
        while accbits < width and i < n:
            acc |= data[i] << accbits
            accbits += 8
            i += 1
        if accbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        accbits -= width
        if code == clear:
            table = list(singles)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
            if not entry:
                raise ValueError("gif: reserved LZW code in stream")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError(
            f"gif: LZW stream ended at {len(out)}/{n_expected} pixels"
        )
    return bytes(out[:n_expected])


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """Index bytes -> GIF LZW codestream (clear-code prefixed,
    dictionary reset at 4096, end-of-information terminated)."""
    clear = 1 << mcs
    end = clear + 1

    codes: list[tuple[int, int]] = []  # (code, width)
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = end + 1
    codes.append((clear, width))

    prev = b""
    for b in indices:
        cand = prev + bytes([b])
        if cand in table:
            prev = cand
            continue
        codes.append((table[prev], width))
        table[cand] = nxt
        nxt += 1
        # the decoder reconstructs our slot-k entry one code LATER
        # than we assign it (while processing code k+1), so it bumps
        # width one code position after our counter reaches 1<<width —
        # GIF has no TIFF-style early change; mirror the lag exactly
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt == 4096:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            nxt = end + 1
            width = mcs + 1
        prev = bytes([b])
    if prev:
        codes.append((table[prev], width))
    codes.append((end, width))

    acc = 0
    accbits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << accbits
        accbits += w
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container walk


def _read_color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    if pos + 3 * n > len(data):
        raise ValueError("gif: truncated color table")
    pal = np.frombuffer(data, np.uint8, count=3 * n, offset=pos)
    return pal.reshape(n, 3).copy(), pos + 3 * n


def _skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n
        if pos > len(data):
            raise ValueError("gif: truncated sub-block body")


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("gif: truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(data):
            raise ValueError("gif: truncated sub-block body")
        parts.append(data[pos:pos + n])
        pos += n


class _Frame:
    __slots__ = ("left", "top", "indices", "palette", "transparent",
                 "delay_cs", "disposal")

    def __init__(self, left, top, indices, palette, transparent,
                 delay_cs, disposal):
        self.left = left
        self.top = top
        self.indices = indices  # HxW uint8 index array
        self.palette = palette  # Nx3 uint8
        self.transparent = transparent
        self.delay_cs = delay_cs
        self.disposal = disposal


def _parse(data: bytes):
    """-> (width, height, bg_rgb, frames: list[_Frame])."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"gif: bad signature {data[:6]!r}")
    if len(data) < 13:
        raise ValueError("gif: truncated header")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if sw == 0 or sh == 0:
        raise ValueError("gif: zero logical screen size")
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (packed & 0x07))
    bg_rgb = (
        tuple(int(v) for v in gct[bg_idx]) if gct is not None
        and bg_idx < len(gct) else (255, 255, 255)
    )

    frames: list[_Frame] = []
    transparent = None
    delay_cs = 0
    disposal = 0
    while True:
        if pos >= len(data):
            raise ValueError("gif: missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("gif: truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                body, pos = _read_subblocks(data, pos)
                if len(body) < 4:
                    raise ValueError("gif: short GCE")
                gp, delay_cs, tidx = struct.unpack_from("<BHB", body, 0)
                disposal = (gp >> 2) & 0x7
                transparent = tidx if gp & 0x01 else None
            else:  # application / comment / plain text: structural skip
                pos = _skip_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("gif: truncated image descriptor")
        left, top, w, h, ip = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError(
                f"gif: frame {w}x{h}@{left},{top} outside {sw}x{sh} screen"
            )
        pal = gct
        if ip & 0x80:
            pal, pos = _read_color_table(data, pos, 2 << (ip & 0x07))
        if pal is None:
            raise ValueError("gif: frame with no color table")
        if pos >= len(data):
            raise ValueError("gif: truncated image data")
        mcs = data[pos]
        pos += 1
        stream, pos = _read_subblocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(stream, mcs, w * h), np.uint8
        ).reshape(h, w)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("gif: pixel index outside color table")
        if ip & 0x40:  # interlaced: reassemble the four passes
            de = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, h, step)
                for r in rows:
                    de[r] = idx[src]
                    src += 1
            idx = de
        frames.append(_Frame(left, top, idx.copy(), pal, transparent,
                             delay_cs, disposal))
        transparent = None  # GCE applies to ONE following image
        delay_cs = 0
        disposal = 0
    if not frames:
        raise ValueError("gif: no image data")
    return sw, sh, bg_rgb, frames


def _maybe_gray(rgb: np.ndarray) -> np.ndarray:
    """HxWx3 -> HxW when all channels agree (same convention as the
    BMP/PNG palette paths), else unchanged."""
    if (rgb[..., 0] == rgb[..., 1]).all() and (
            rgb[..., 1] == rgb[..., 2]).all():
        return rgb[..., 0].copy()
    return rgb


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> composited frames on the logical screen (each
    uint8 HxW gray or HxWx3 RGB).  Transparent pixels show whatever
    the disposal rules left on the canvas; the initial canvas is the
    background color (white when there is no usable background
    entry)."""
    sw, sh, bg_rgb, frames = _parse(bytes(data))
    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:] = bg_rgb
    out: list[np.ndarray] = []
    for fr in frames:
        before = canvas.copy() if fr.disposal == 3 else None
        region = canvas[fr.top:fr.top + fr.indices.shape[0],
                        fr.left:fr.left + fr.indices.shape[1]]
        rgb = fr.palette[fr.indices]
        if fr.transparent is not None:
            opaque = fr.indices != fr.transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        out.append(_maybe_gray(canvas.copy()))
        if fr.disposal == 2:
            region[:] = bg_rgb
        elif fr.disposal == 3:
            canvas[:] = before
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame — the still-image view decode_image
    dispatches to."""
    return decode_gif_frames(data)[0]


# ---------------------------------------------------------------------------
# encode


def _palette_for(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (palette Nx3, indices HxW) for gray or RGB input."""
    if img.ndim == 2:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        return pal, img
    flat = img.reshape(-1, 3)
    pal, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(
            f"gif encode: {len(pal)} unique colors > 256 (no quantizer"
            " by design — this is a codec seam)"
        )
    return pal.astype(np.uint8), inverse.astype(np.uint8).reshape(
        img.shape[:2])


def _sub_blocks(stream: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    pages: "np.ndarray | list[np.ndarray]",
    interlace: bool = False,
    delay_cs: int = 10,
    loop: int = 0,
) -> bytes:
    """uint8 HxW gray or HxWx3 RGB page(s) -> GIF89a bytes.  A list of
    pages emits an animation (NETSCAPE2.0 loop block, one GCE per
    frame, disposal=1).  Deterministic byte-identical output for
    identical input."""
    if isinstance(pages, np.ndarray):
        pages = [pages]
    if not pages:
        raise ValueError("gif encode: no pages")
    h, w = pages[0].shape[:2]
    for p in pages:
        if p.dtype != np.uint8 or p.shape[:2] != (h, w):
            raise ValueError("gif encode: pages must be uint8, same size")

    pal0, _ = _palette_for(pages[0])
    # one global table sized for the union when every page shares the
    # gray ramp; otherwise per-frame local tables keep it exact
    gray_input = all(p.ndim == 2 for p in pages)

    out = bytearray(b"GIF89a")
    if gray_input:
        gct_bits = 7  # 256-entry gray ramp
        out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | gct_bits, 255, 0)
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        out += pal.tobytes()
    else:
        out += struct.pack("<HHBBB", w, h, 0x00, 0, 0)

    animated = len(pages) > 1
    if animated:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop) + b"\x00"

    for page in pages:
        pal, idx = _palette_for(page)
        if animated:
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", 0x04, delay_cs, 0) + b"\x00"  # disposal=1
        use_local = not (gray_input and page.ndim == 2)
        ip = 0x40 if interlace else 0x00
        if use_local:
            n = max(2, 1 << int(np.ceil(np.log2(max(len(pal), 2)))))
            ip |= 0x80 | (int(np.log2(n)) - 1)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ip)
        if use_local:
            padded = np.zeros((n, 3), np.uint8)
            padded[:len(pal)] = pal
            out += padded.tobytes()
        if interlace:
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, h, step))
            idx = idx[rows]
        mcs = max(2, int(np.ceil(np.log2(max(len(pal), 4)))))
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(idx.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)
