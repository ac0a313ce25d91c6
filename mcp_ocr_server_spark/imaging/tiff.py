"""Baseline TIFF decoder/encoder (TIFF 6.0 re-derivation) — pure
stdlib + numpy.

Part of the input-format matrix the reference inherits from OpenCV's
`gocv.IMDecode` (preprocessor.go:64 — imdecode sniffs TIFF among its
built-ins).  TIFF is THE classic scanned-document container — fax and
flatbed scanners emit multi-page bilevel/gray TIFFs — so for an OCR
engine it is the most load-bearing of the secondary formats: one file
is a whole document, one page per IFD.

Supported on decode (per TIFF 6.0, independently re-derived):
  - both byte orders (II little / MM big), classic 32-bit offsets
  - multi-page via the IFD next-offset chain (decode_tiff_pages)
  - strip organization (any RowsPerStrip) AND tiled organization
    (TileWidth/TileLength multiples of 16, edge tiles padded to full
    size, predictor per tile row), PlanarConfiguration 1
  - Compression 1 (none), 5 (LZW, MSB-first codes with the spec's
    "early change" width bump), 8/32946 (Deflate/zlib),
    32773 (PackBits)
  - Predictor 2 (horizontal differencing) for LZW/Deflate
  - PhotometricInterpretation 0/1 at 1 and 8 bits (bilevel rows
    padded to whole bytes, MSB-first), 2 (8-bit RGB), 3 (palette,
    16-bit ColorMap entries folded to 8), 6 (YCbCr, JPEG segments)
  - new-style JPEG-in-TIFF (compression 7): each strip/tile is a
    complete JPEG stream through the in-repo T.81 codec, with shared
    tables via the JPEGTables tag spliced after each segment's SOI
16-bit samples fold to their high byte (OpenCV imdecode's
convert-down — the reference's seam behavior).  Refused LOUDLY
(ValueError, the repo-wide contract): old-style JPEG (compression 6),
planar config 2, BigTIFF, predictor on 16-bit — silent misdecodes
would corrupt OCR pixel math downstream.

The encoder emits little-endian classic TIFF, gray8 / RGB8 / bilevel,
one IFD per page, multi-strip (RowsPerStrip=16 to exercise the strip
path) or 32x32-tiled (tiled=True), any supported compression,
optional predictor — deterministic byte-identical output for
identical input (memoization contract).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# IFD entry field types we emit/read: 1 BYTE, 3 SHORT, 4 LONG,
# 7 UNDEFINED (raw bytes — JPEGTables)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}

_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_ORIENTATION = 274
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
_T_JPEG_TABLES = 347


# --- PackBits (TIFF 6.0 §9) -------------------------------------------------

def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("packbits: truncated repeat")
            out += data[pos : pos + 1] * (257 - n)
            pos += 1
        # n == 128: no-op per spec
    if len(out) < expected:
        raise ValueError("packbits: short output")
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    """Greedy spec-shaped encoder: repeat runs >= 3 become repeat
    packets, everything else literal packets (max 128)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal: extend until a >=3 run starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += data[i:k]
        i = k
    return bytes(out)


# --- LZW, TIFF variant (TIFF 6.0 §13): MSB-first code packing, codes
# 256 = Clear, 257 = EOI, first table entry 258, and the "early
# change" quirk — the code width bumps one code EARLIER than plain
# LZW (at table sizes 510/1022/2046 after Clear).

_CLEAR, _EOI = 256, 257


def exif_blob_orientation(tiff: bytes) -> int:
    """Orientation (1-8) from a bare EXIF TIFF structure (the payload
    after JPEG's APP1 'Exif\\0\\0' header or inside PNG's eXIf
    chunk), 1 when absent or unparseable — orientation is advisory
    display metadata, so malformed blobs degrade rather than error."""
    try:
        if tiff[:2] == b"II":
            e = "<"
        elif tiff[:2] == b"MM":
            e = ">"
        else:
            return 1
        (magic,) = struct.unpack_from(e + "H", tiff, 2)
        (ifd0,) = struct.unpack_from(e + "I", tiff, 4)
        if magic != 42:
            return 1
        entries, _nxt = _read_ifd(tiff, e, ifd0)
        o = entries.get(0x0112, [1])[0]
        return o if 1 <= o <= 8 else 1
    except Exception:
        return 1


def lzw_decode(data: bytes, expected: int | None = None,
               cap: int = 1 << 26) -> bytes:
    """TIFF-variant LZW (MSB-first, early change).  `expected` is the
    exact output length when the caller knows it (TIFF strips/tiles do
    — short output raises); `expected=None` decodes until the EOI code
    or end of data (the PDF /LZWDecode contract, ISO 32000-1 §7.4.4 —
    same bitstream dialect), bounded by `cap` so a hostile stream
    cannot balloon memory."""
    return _lzw_decode_core(data, expected, cap)[0]


def lzw_decode_span(data: bytes, cap: int = 1 << 26) -> tuple[bytes, int]:
    """(decoded bytes, consumed input length) — decodes until the EOI
    code and reports where the stream ended, the contract inline
    images need to find their EI delimiter without searching the
    pixel bytes."""
    out, consumed, saw_eoi = _lzw_decode_core(
        data, None, cap, want_consumed=True
    )
    if not saw_eoi:
        raise ValueError("lzw: stream ended without EOI")
    return out, consumed


def _lzw_decode_core(
    data: bytes, expected: int | None, cap: int,
    want_consumed: bool = False,
):
    out = bytearray()
    bitbuf = bitcnt = 0
    pos = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal bitbuf, bitcnt, pos
        while bitcnt < width:
            if pos >= len(data):
                return -1  # data exhausted without EOI
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        bitcnt -= width
        code = (bitbuf >> bitcnt) & ((1 << width) - 1)
        return code

    saw_eoi = False
    while expected is None or len(out) < expected:
        code = read_code()
        if code == _EOI:
            saw_eoi = True
            break
        if code == -1:
            break  # tolerate missing EOI at exact end
        if len(out) > cap:
            raise ValueError("lzw: output exceeds cap")
        if code == _CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("lzw: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"lzw: code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by ONE entry (the encoder adds on every emit, the
        # decoder on every read except the first after Clear), so it
        # widens at size 2^w - 2 — one code earlier than plain LZW's
        # 2^w - 1, two earlier than a late-change decoder
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    if want_consumed:
        return bytes(out), pos, saw_eoi
    if expected is None:
        return (bytes(out),)
    if len(out) < expected:
        raise ValueError("lzw: short output")
    return (bytes(out[:expected]),)


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = bitcnt = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_CLEAR)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # early change: the DECODER widens when its table (ours minus
        # the in-flight entry) reaches 2^width - 1, so the encoder must
        # widen in lockstep before emitting the next code
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        if next_code > 4093:  # table full: reset (cur's code already out)
            emit(_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
            cur = bytes([b])
            continue
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(_EOI)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


# --- decode -----------------------------------------------------------------


def _read_ifd(data: bytes, e: str, off: int) -> tuple[dict[int, list[int]], int]:
    if off + 2 > len(data):
        raise ValueError("tiff: truncated IFD")
    (n,) = struct.unpack_from(e + "H", data, off)
    entries: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(data):
            raise ValueError("tiff: truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown field type: skip per spec
        total = size * cnt
        if total <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(e + "I", data, base + 8)
            if voff + total > len(data):
                raise ValueError(f"tiff: tag {tag} value out of range")
        if typ == 3:
            vals = list(struct.unpack_from(e + f"{cnt}H", data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(e + f"{cnt}I", data, voff))
        elif typ in (1, 7):
            vals = list(data[voff : voff + cnt])
        else:  # RATIONAL/ASCII: keep numerators only; none are load-bearing here
            vals = [0] * cnt
        entries[tag] = vals
    next_at = off + 2 + 12 * n
    if next_at + 4 > len(data):
        raise ValueError("tiff: truncated next-IFD offset")
    (nxt,) = struct.unpack_from(e + "I", data, next_at)
    return entries, nxt


def _decompress_segment(raw: bytes, comp: int, expected: int) -> bytes:
    if comp == 1:
        if len(raw) < expected:
            raise ValueError("tiff: short uncompressed segment")
        return raw[:expected]
    if comp == 5:
        return lzw_decode(raw, expected)
    if comp in (8, 32946):
        try:
            out = zlib.decompress(raw)
        except zlib.error as exc:
            raise ValueError(f"tiff: bad deflate segment ({exc})") from exc
        if len(out) < expected:
            raise ValueError("tiff: short deflate segment")
        return out[:expected]
    return packbits_decode(raw, expected)


def _undo_predictor(seg: np.ndarray, cols: int, spp: int) -> np.ndarray:
    """Horizontal differencing, per row per sample (resets every row —
    so per-segment application is exact)."""
    px = seg.reshape(seg.shape[0], cols, spp).astype(np.uint32)
    px = np.cumsum(px, axis=1, dtype=np.uint32) & 0xFF
    return px.astype(np.uint8).reshape(seg.shape[0], cols * spp)




def _decode_jpeg_page(data: bytes, ifd: dict, w: int, h: int,
                      spp: int, photo: int) -> np.ndarray:
    """New-style JPEG-in-TIFF (compression 7): each strip/tile is a
    complete JPEG bitstream; shared quant/Huffman tables may live in
    the JPEGTables tag (an abbreviated SOI..EOI stream spliced after
    each segment's SOI, per TIFF/EP).  Decoded through the in-repo
    T.81 codec — baseline AND progressive segments both work."""
    from .jpeg import decode_jpeg

    if photo not in (0, 1, 2, 6):  # 6 = YCbCr, the usual color case
        raise ValueError(f"tiff: photometric {photo} with JPEG")
    if ifd.get(_T_PREDICTOR, [1])[0] != 1:
        raise ValueError("tiff: predictor with JPEG compression")
    prefix = b""
    tables = ifd.get(_T_JPEG_TABLES)
    if tables:
        tb = bytes(tables)
        if len(tb) < 4 or tb[:2] != b"\xff\xd8" or tb[-2:] != b"\xff\xd9":
            raise ValueError("tiff: malformed JPEGTables")
        prefix = tb[2:-2]

    def seg(raw: bytes) -> np.ndarray:
        if raw[:2] != b"\xff\xd8":
            raise ValueError("tiff: JPEG segment missing SOI")
        px = decode_jpeg(b"\xff\xd8" + prefix + raw[2:])
        if (px.ndim == 3) != (spp == 3):
            raise ValueError("tiff: JPEG channel count != SamplesPerPixel")
        return px

    out = np.zeros((h, w, 3) if spp == 3 else (h, w), dtype=np.uint8)
    if _T_TILE_WIDTH in ifd or _T_TILE_LENGTH in ifd:
        tw = ifd.get(_T_TILE_WIDTH, [0])[0]
        th = ifd.get(_T_TILE_LENGTH, [0])[0]
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise ValueError(f"tiff: bad tile geometry {tw}x{th}")
        offsets = ifd.get(_T_TILE_OFFSETS)
        counts = ifd.get(_T_TILE_COUNTS)
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if (not offsets or not counts or len(offsets) != len(counts)
                or len(offsets) != across * down):
            raise ValueError("tiff: missing/short tile tables")
        for ti, (so, sc) in enumerate(zip(offsets, counts)):
            if so + sc > len(data):
                raise ValueError("tiff: tile out of range")
            px = seg(data[so : so + sc])
            if px.shape[0] < th or px.shape[1] < tw:
                raise ValueError("tiff: JPEG tile smaller than tile grid")
            ty, tx = divmod(ti, across)
            y0, x0 = ty * th, tx * tw
            ny, nx = min(th, h - y0), min(tw, w - x0)
            out[y0 : y0 + ny, x0 : x0 + nx] = px[:ny, :nx]
    else:
        offsets = ifd.get(_T_STRIP_OFFSETS)
        counts = ifd.get(_T_STRIP_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("tiff: missing strip tables")
        rps = ifd.get(_T_ROWS_PER_STRIP, [h])[0] or h
        for si, (so, sc) in enumerate(zip(offsets, counts)):
            if so + sc > len(data):
                raise ValueError("tiff: strip out of range")
            n_rows = min(rps, h - si * rps)
            if n_rows <= 0:
                raise ValueError("tiff: surplus strip")
            px = seg(data[so : so + sc])
            if px.shape[0] < n_rows or px.shape[1] < w:
                raise ValueError("tiff: JPEG strip smaller than strip grid")
            out[si * rps : si * rps + n_rows] = px[:n_rows, :w]
    if photo == 0:
        out = (255 - out.astype(np.int16)).astype(np.uint8)
    return out


def _decode_page(data: bytes, e: str, ifd: dict[int, list[int]]) -> np.ndarray:
    w = ifd.get(_T_WIDTH, [0])[0]
    h = ifd.get(_T_LENGTH, [0])[0]
    if w <= 0 or h <= 0:
        raise ValueError(f"tiff: bad dimensions {w}x{h}")
    spp = ifd.get(_T_SAMPLES, [1])[0]
    bits = ifd.get(_T_BITS, [1] * spp)
    comp = ifd.get(_T_COMPRESSION, [1])[0]
    photo = ifd.get(_T_PHOTOMETRIC, [1])[0]
    planar = ifd.get(_T_PLANAR, [1])[0]
    predictor = ifd.get(_T_PREDICTOR, [1])[0]
    if planar != 1:
        raise ValueError(f"tiff: planar configuration {planar} unsupported")
    if comp == 6:
        raise ValueError("tiff: old-style JPEG (compression 6) unsupported")
    if comp == 7:
        return _decode_jpeg_page(data, ifd, w, h, spp, photo)
    if comp not in (1, 5, 8, 32946, 32773):
        raise ValueError(f"tiff: compression {comp} unsupported")
    if any(b not in (1, 8, 16) for b in bits) or len(set(bits)) != 1:
        raise ValueError(f"tiff: bits per sample {bits} unsupported")
    bps = bits[0]
    if bps == 1 and (spp != 1 or photo not in (0, 1)):
        raise ValueError("tiff: bilevel must be 1-sample gray")
    if photo == 2 and spp != 3:
        raise ValueError(f"tiff: RGB with {spp} samples unsupported")
    if photo == 3 and (spp != 1 or bps != 8):
        raise ValueError("tiff: palette must be 8-bit single-sample")
    if photo > 3:
        raise ValueError(f"tiff: photometric {photo} unsupported")

    if predictor == 2 and bps != 8:
        raise ValueError("tiff: predictor on non-8-bit samples")
    if predictor not in (1, 2):
        raise ValueError(f"tiff: predictor {predictor} unsupported")

    def fold16(seg: np.ndarray) -> np.ndarray:
        """16-bit samples -> high byte (OpenCV's convert-down); sample
        byte order follows the FILE byte order per TIFF 6.0."""
        pairs = seg.reshape(seg.shape[0], -1, 2)
        return pairs[:, :, 0 if e == ">" else 1].copy()

    tiled = _T_TILE_WIDTH in ifd or _T_TILE_LENGTH in ifd
    if tiled:
        tw = ifd.get(_T_TILE_WIDTH, [0])[0]
        th = ifd.get(_T_TILE_LENGTH, [0])[0]
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise ValueError(f"tiff: bad tile geometry {tw}x{th}")
        offsets = ifd.get(_T_TILE_OFFSETS)
        counts = ifd.get(_T_TILE_COUNTS)
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if (not offsets or not counts or len(offsets) != len(counts)
                or len(offsets) != across * down):
            raise ValueError("tiff: missing/short tile tables")
        # tiles are FULL tw x th (edge tiles padded); paste clipped
        unit = 2 if bps == 16 else 1
        t_row_bytes = (tw + 7) // 8 if bps == 1 else tw * spp * unit
        row_bytes = (w + 7) // 8 if bps == 1 else w * spp
        flat = np.zeros((h, row_bytes), dtype=np.uint8)
        for ti, (so, sc) in enumerate(zip(offsets, counts)):
            if so + sc > len(data):
                raise ValueError("tiff: tile out of range")
            raw = _decompress_segment(
                data[so : so + sc], comp, t_row_bytes * th
            )
            seg = np.frombuffer(raw, np.uint8).reshape(th, t_row_bytes)
            if bps == 16:
                seg = fold16(seg)
            if predictor == 2:
                seg = _undo_predictor(seg, tw, spp)
            ty, tx = divmod(ti, across)
            y0 = ty * th
            ny = min(th, h - y0)
            if bps == 1:
                # paste at the bit level (tile widths are multiples of
                # 16, so x-origins land inside a byte only via w%8 at
                # the RIGHT edge — unpack, paste, repack at the end)
                bits_full = np.unpackbits(seg, axis=1)[:ny, :tw]
                x0 = tx * tw
                nx = min(tw, w - x0)
                fb = np.unpackbits(flat[y0 : y0 + ny], axis=1)
                fb[:, x0 : x0 + nx] = bits_full[:, :nx]
                flat[y0 : y0 + ny] = np.packbits(fb, axis=1)[:, :row_bytes]
            else:
                x0 = tx * tw * spp
                nx = min(tw, w - tx * tw) * spp
                flat[y0 : y0 + ny, x0 : x0 + nx] = seg[:ny, :nx]
    else:
        offsets = ifd.get(_T_STRIP_OFFSETS)
        counts = ifd.get(_T_STRIP_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("tiff: missing strip tables")
        rps = ifd.get(_T_ROWS_PER_STRIP, [h])[0] or h

        unit = 2 if bps == 16 else 1
        if bps == 1:
            wire_row_bytes = (w + 7) // 8
        else:
            wire_row_bytes = w * spp * unit

        rows = []
        for si, (so, sc) in enumerate(zip(offsets, counts)):
            if so + sc > len(data):
                raise ValueError("tiff: strip out of range")
            n_rows = min(rps, h - si * rps)
            if n_rows <= 0:
                raise ValueError("tiff: surplus strip")
            raw = _decompress_segment(
                data[so : so + sc], comp, wire_row_bytes * n_rows
            )
            strip = np.frombuffer(raw, np.uint8).reshape(
                n_rows, wire_row_bytes
            )
            if bps == 16:
                strip = fold16(strip)
            if predictor == 2:
                strip = _undo_predictor(strip, w, spp)
            rows.append(strip)
        flat = np.concatenate(rows, axis=0)

    if bps == 1:
        px = np.unpackbits(flat, axis=1)[:, :w]
        if photo == 0:  # WhiteIsZero: 0 = white, 1 = black
            return ((1 - px) * 255).astype(np.uint8)
        return (px * 255).astype(np.uint8)
    if photo == 3:
        cmap = ifd.get(_T_COLORMAP)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("tiff: missing/short ColorMap")
        pal16 = np.asarray(cmap[: 3 * 256], np.uint32).reshape(3, 256).T
        pal = (pal16 >> 8).astype(np.uint8)  # 16-bit entries -> 8
        rgb = pal[flat.reshape(h, w)]
        if (rgb[:, :, 0] == rgb[:, :, 1]).all() and (
            rgb[:, :, 1] == rgb[:, :, 2]
        ).all():
            return rgb[:, :, 0].copy()
        return rgb
    img = flat.reshape(h, w, spp) if spp > 1 else flat.reshape(h, w)
    if photo == 0:  # WhiteIsZero gray: invert
        img = (255 - img.astype(np.int16)).astype(np.uint8)
    return img.copy()


def decode_tiff_pages(data: bytes) -> list[np.ndarray]:
    """TIFF bytes -> one uint8 HxW / HxWx3 array per IFD (page)."""
    if len(data) < 8:
        raise ValueError("tiff: truncated header")
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError(f"tiff: bad byte-order mark {data[:2]!r}")
    (magic,) = struct.unpack_from(e + "H", data, 2)
    if magic == 43:
        raise ValueError("tiff: BigTIFF unsupported")
    if magic != 42:
        raise ValueError(f"tiff: bad magic {magic}")
    (off,) = struct.unpack_from(e + "I", data, 4)
    pages = []
    seen = set()
    while off:
        if off in seen:
            raise ValueError("tiff: IFD cycle")
        seen.add(off)
        ifd, off = _read_ifd(data, e, off)
        page = _decode_page(data, e, ifd)
        o = ifd.get(_T_ORIENTATION, [1])[0]
        if o != 1 and 1 <= o <= 8:
            # TIFF 6.0 Orientation (tag 274) shares EXIF's eight
            # values — right the page with the same transform table
            from .codecs import apply_exif_orientation

            page = np.ascontiguousarray(
                apply_exif_orientation(page, o))
        pages.append(page)
        if len(pages) > 10000:
            raise ValueError("tiff: too many pages")
    if not pages:
        raise ValueError("tiff: no IFDs")
    return pages


def decode_tiff(data: bytes) -> np.ndarray:
    """First page only — the imdecode-equivalent single-image view."""
    return decode_tiff_pages(data)[0]


# --- encode -----------------------------------------------------------------

_ROWS_PER_STRIP = 16


def _compress(raw: bytes, compression: str) -> tuple[bytes, int]:
    if compression == "none":
        return raw, 1
    if compression == "lzw":
        return lzw_encode(raw), 5
    if compression == "deflate":
        return zlib.compress(raw, 6), 8
    if compression == "packbits":
        return packbits_encode(raw), 32773
    raise ValueError(f"tiff: unknown compression {compression!r}")


def encode_tiff(
    pages: "list[np.ndarray]",
    compression: str = "none",
    *,
    predictor: bool = False,
    bilevel: bool = False,
    tiled: bool = False,
    orientation: int = 1,
) -> bytes:
    """uint8 HxW / HxWx3 pages -> little-endian classic TIFF, one IFD
    per page; RowsPerStrip=16 multi-strip, or 32x32 tiles with
    tiled=True (edge tiles zero-padded to full size per spec).
    bilevel=True thresholds gray pages at 128 into 1-bit WhiteIsZero
    rows (the fax-scan shape).  predictor=True applies horizontal
    differencing (only meaningful for lzw/deflate; per tile row when
    tiled)."""
    if not pages:
        raise ValueError("tiff: no pages")
    if predictor and compression not in ("lzw", "deflate"):
        raise ValueError("tiff: predictor is for lzw/deflate")
    if compression == "jpeg" and bilevel:
        raise ValueError("tiff: jpeg compression is 8-bit only")
    out = bytearray(b"II*\x00\x00\x00\x00\x00")  # IFD0 offset patched below
    ifd_patch_at = 4

    for img in pages:
        if img.dtype != np.uint8:
            raise ValueError(f"expected uint8 array, got {img.dtype}")
        if img.ndim == 2:
            h, w = img.shape
            spp = 1
        elif img.ndim == 3 and img.shape[2] == 3:
            if bilevel:
                raise ValueError("tiff: bilevel encoding is grayscale-only")
            h, w = img.shape[:2]
            spp = 3
        else:
            raise ValueError(f"expected HxW or HxWx3, got shape {img.shape}")

        photo, bps = ((0, 1) if bilevel
                      else (1, 8) if spp == 1 else (2, 8))

        def _diff(samples: np.ndarray) -> np.ndarray:
            px = samples.astype(np.int16)
            d = px.copy()
            d[:, 1:, :] = px[:, 1:, :] - px[:, :-1, :]
            return (d & 0xFF).astype(np.uint8)

        strips: list[bytes] = []
        if compression == "jpeg":
            # new-style JPEG-in-TIFF: every segment is a complete JPEG
            # stream from the in-repo T.81 encoder (lossy; standalone
            # segments, no shared JPEGTables)
            from .jpeg import encode_jpeg

            comp_id = 7
            if tiled:
                _TS = 32
                samp = img.reshape(h, w, spp)
                samp = np.pad(
                    samp, ((0, (-h) % _TS), (0, (-w) % _TS), (0, 0)),
                    mode="edge",
                )
                for y0 in range(0, h, _TS):
                    for x0 in range(0, w, _TS):
                        tile = samp[y0 : y0 + _TS, x0 : x0 + _TS]
                        if spp == 1:
                            tile = tile.reshape(_TS, _TS)
                        strips.append(encode_jpeg(tile, quality=95))
            else:
                for y0 in range(0, h, _ROWS_PER_STRIP):
                    seg = img[y0 : y0 + _ROWS_PER_STRIP]
                    strips.append(encode_jpeg(seg, quality=95))
        elif tiled:
            _TS = 32  # tile side (spec: multiples of 16)
            if bilevel:
                samp = (img < 128).astype(np.uint8).reshape(h, w, 1)
            else:
                samp = img.reshape(h, w, spp)
            ph = (-h) % _TS
            pw = (-w) % _TS
            samp = np.pad(samp, ((0, ph), (0, pw), (0, 0)))
            for y0 in range(0, h, _TS):
                for x0 in range(0, w, _TS):
                    tile = samp[y0 : y0 + _TS, x0 : x0 + _TS]
                    if predictor:
                        tile = _diff(tile)
                    if bilevel:
                        raw = np.packbits(
                            tile.reshape(_TS, _TS), axis=1
                        ).tobytes()
                    else:
                        raw = tile.tobytes()
                    strips.append(_compress(raw, compression)[0])
        else:
            if bilevel:
                bits = (img < 128).astype(np.uint8)  # WhiteIsZero
                flat = np.packbits(bits, axis=1)
            else:
                src = img
                if predictor:
                    src = _diff(img.reshape(h, w, spp))
                flat = src.reshape(h, -1)
            for y0 in range(0, h, _ROWS_PER_STRIP):
                raw = flat[y0 : y0 + _ROWS_PER_STRIP].tobytes()
                strips.append(_compress(raw, compression)[0])
        if compression != "jpeg":
            comp_id = _compress(b"", compression)[1]
        if compression == "jpeg":
            photo = 6 if spp == 3 else 1  # YCbCr for color JPEG

        strip_offsets = []
        for s in strips:
            strip_offsets.append(len(out))
            out += s
            if len(out) % 2:
                out += b"\x00"  # word-align per spec

        n_strips = len(strips)

        def _aux(values: list[int], fmt: str) -> int:
            off = len(out)
            out.extend(struct.pack(f"<{len(values)}{fmt}", *values))
            if len(out) % 2:
                out.extend(b"\x00")
            return off

        entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value

        def add(tag: int, typ: int, values: list[int]) -> None:
            size = _TYPE_SIZE[typ] * len(values)
            fmt = {3: "H", 4: "I"}[typ]
            if size <= 4:
                packed = struct.pack(f"<{len(values)}{fmt}", *values)
                packed += b"\x00" * (4 - size)
                (val,) = struct.unpack("<I", packed)
            else:
                val = _aux(values, fmt)
            entries.append((tag, typ, len(values), val))

        add(_T_WIDTH, 4, [w])
        add(_T_LENGTH, 4, [h])
        add(_T_BITS, 3, [bps] * spp)
        add(_T_COMPRESSION, 3, [comp_id])
        add(_T_PHOTOMETRIC, 3, [photo])
        add(_T_SAMPLES, 3, [spp])
        if tiled:
            add(_T_TILE_WIDTH, 3, [32])
            add(_T_TILE_LENGTH, 3, [32])
            add(_T_TILE_OFFSETS, 4, strip_offsets)
            add(_T_TILE_COUNTS, 4, [len(s) for s in strips])
        else:
            add(_T_STRIP_OFFSETS, 4, strip_offsets)
            add(_T_ROWS_PER_STRIP, 3, [_ROWS_PER_STRIP])
            add(_T_STRIP_COUNTS, 4, [len(s) for s in strips])
        if predictor:
            add(_T_PLANAR, 3, [1])
            add(_T_PREDICTOR, 3, [2])
        if orientation != 1:
            # tag 274: stored pixels need this display transform —
            # the decoder rights them with the shared EXIF table
            add(_T_ORIENTATION, 3, [orientation])

        entries.sort()  # spec: ascending tag order
        ifd_off = len(out)
        out += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            out += struct.pack("<HHII", tag, typ, cnt, val)
        next_patch = len(out)
        out += b"\x00\x00\x00\x00"
        struct.pack_into("<I", out, ifd_patch_at, ifd_off)
        ifd_patch_at = next_patch
    return bytes(out)
