"""VP8L (WebP lossless) codec — imaging/webp.py.

The encoder only emits the minimal stream shape, so every decoder
feature it does NOT emit (transforms, color cache, meta-prefix,
distance-map/plain LZ77) is exercised here with hand-BUILT bitstreams
whose expected pixels are hand-COMPUTED from the spec's transform
math — the bit plumbing reuses the module's BitWriter/_Encoder
primitives, the expectations do not."""

import struct

import numpy as np
import pytest

from mcp_ocr_server_spark.imaging.webp import (
    _DIST_MAP,
    BitWriter,
    _Encoder,
    _kraft_fix,
    _prefix_encode,
    _write_code_lengths,
    decode_webp,
    encode_webp,
)

RNG = np.random.default_rng(20260819)


# --- helpers to hand-build VP8L streams --------------------------------------


def _wrap(bw: BitWriter) -> bytes:
    payload = b"\x2f" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw: BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _simple_single(bw: BitWriter, sym: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    bw.write(1, 1)  # 8-bit
    bw.write(sym, 8)


def _simple_pair(bw: BitWriter, s0: int, s1: int):
    """2-symbol simple code; returns an emit(bw, sym) function.
    Canonical: the SMALLER symbol gets bit 0."""
    bw.write(1, 1)
    bw.write(1, 1)
    bw.write(1, 1)
    bw.write(s0, 8)
    bw.write(s1, 8)
    lo, hi = min(s0, s1), max(s0, s1)

    def emit(bw2: BitWriter, sym: int) -> None:
        bw2.write(0 if sym == lo else 1, 1)

    return emit


def _full_code(bw: BitWriter, alphabet: int, syms: "list[int]"):
    """Code-length-form prefix code over the given symbols (needed
    when a symbol is >= 256, beyond the simple form's 8-bit reach).
    Returns an emitter."""
    freq = [0] * alphabet
    for s in syms:
        freq[s] += 1
    if len(set(syms)) == 1:
        # give it a dummy sibling so the code stays complete
        freq[syms[0] ^ 1] += 1
    lengths = [0] * alphabet
    uniq = sorted(set(s for s, f in enumerate(freq) if f))
    # fixed-depth complete code over 2^k >= len(uniq) leaves
    k = max(1, (len(uniq) - 1).bit_length())
    for i, s in enumerate(uniq):
        lengths[s] = k
    # pad to completeness with dummy symbols
    pad = (1 << k) - len(uniq)
    for s in range(alphabet):
        if pad == 0:
            break
        if lengths[s] == 0:
            lengths[s] = k
            pad -= 1
    _write_code_lengths(bw, lengths)
    enc = _Encoder(lengths)
    return lambda bw2, sym: enc.write(bw2, sym)


def _no_cache_no_meta(bw: BitWriter) -> None:
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no entropy image


def _single_pixel_stream(bw: BitWriter, a: int, r: int, g: int, b: int,
                         sub: bool = True) -> None:
    """An entropy-coded image whose every pixel is (a,r,g,b) — all
    five codes single-symbol, so pixels cost 0 bits each."""
    bw.write(0, 1)  # no cache
    if not sub:
        bw.write(0, 1)  # no meta (level-0 only)
    _simple_single(bw, g)
    _simple_single(bw, r)
    _simple_single(bw, b)
    _simple_single(bw, a)
    _simple_single(bw, 0)  # distance (unused)


# --- distance map -------------------------------------------------------------


def test_dist_map_matches_published_table_head():
    # opening rows of the spec's 120-entry table, verbatim
    spec = [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
            (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
            (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
            (-3, 2), (0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1),
            (3, 3), (-3, 3), (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5),
            (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
    assert _DIST_MAP[: len(spec)] == spec
    assert len(_DIST_MAP) == 120
    assert len(set(_DIST_MAP)) == 120


# --- roundtrips ----------------------------------------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (37, 53), (21, 33, 3)])
def test_roundtrip_random(shape):
    img = RNG.integers(0, 256, shape, dtype=np.int64).astype(np.uint8)
    out = decode_webp(encode_webp(img))
    assert out.shape == img.shape
    assert (out == img).all()


def test_roundtrip_runs_exercise_lz77():
    img = np.full((40, 60), 200, np.uint8)
    blob = encode_webp(img)
    assert (decode_webp(blob) == img).all()
    assert len(blob) < 100  # runs actually compressed


def test_roundtrip_rendered_text():
    from mcp_ocr_server_spark.imaging.font import render_text

    img = render_text("WEBP LOSSLESS", scale=3)
    blob = encode_webp(img)
    assert (decode_webp(blob) == img).all()
    assert len(blob) < img.size // 3


# --- hand-built feature streams -------------------------------------------------


def test_subtract_green_transform():
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    _no_cache_no_meta(bw)
    g_emit = _simple_pair(bw, 10, 200)
    r_emit = _simple_pair(bw, 5, 100)
    b_emit = _simple_pair(bw, 250, 60)
    _simple_single(bw, 255)  # alpha
    _simple_single(bw, 0)    # distance
    for g, r, b in [(10, 5, 250), (200, 100, 60)]:
        g_emit(bw, g)
        r_emit(bw, r)
        b_emit(bw, b)
    out = decode_webp(_wrap(bw))
    # r = (r' + g) & 255, b = (b' + g) & 255
    want = np.array([[[15, 10, 4], [44, 200, 4]]], dtype=np.uint8)
    assert (out == want).all(), out


def test_predictor_transform_mode_T_and_borders():
    # 2x2 gray pixels through predictor mode 2 (Top): p(0,0) is
    # predicted by opaque black, row 0 by L, column 0 by T, and (1,1)
    # by T.  Stored residuals are hand-derived from actual - pred.
    actual = [10, 30, 40, 90]  # raster order, gray values
    res = [
        (0, 10),            # (0,0): pred 0xff000000 -> a_res 0, rgb 10
        (0, 20),            # (0,1): pred = L = 10 -> res 20
        (0, 30),            # (1,0): pred = T = 10 -> res 30
        (0, 60),            # (1,1): pred = T = 30 -> res 90-30 = 60
    ]
    bw = BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(0, 2)       # PREDICTOR
    bw.write(0, 3)       # size_bits = 2 -> 4x4 tiles -> one tile
    _single_pixel_stream(bw, 0, 0, 2, 0)  # tile: mode 2 in green
    bw.write(0, 1)       # no more transforms
    _no_cache_no_meta(bw)
    vals = sorted({v for _a, v in res})
    g_emit = _full_code(bw, 256 + 24, vals)
    r_emit = _full_code(bw, 256, vals)
    b_emit = _full_code(bw, 256, vals)
    _simple_single(bw, 0)  # alpha residual after (0,0)... all zero
    _simple_single(bw, 0)  # distance
    # NOTE alpha residual for (0,0) is 255-255=0 too (pred alpha 0xff)
    for _a, v in res:
        g_emit(bw, v)
        r_emit(bw, v)
        b_emit(bw, v)
    out = decode_webp(_wrap(bw))
    want = np.array(actual, dtype=np.uint8).reshape(2, 2)
    assert (out == want).all(), (out, want)


def test_color_transform():
    # one tile, g2r=2, g2b=0xFF(-1), r2b=0; green=64:
    #   delta(g2r, 64) = (2*64)>>5 = 4        -> r = 10 + 4 = 14
    #   delta(g2b, 64) = (-1*64)>>5 = -2
    #   delta(r2b, 14) = 0                    -> b = 50 - 2 = 48
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)
    bw.write(1, 2)       # COLOR transform
    bw.write(0, 3)       # size_bits = 2
    # tile pixel: b=g2r=2, g=g2b=0xFF, r=r2b=0
    _single_pixel_stream(bw, 0, 0, 0xFF, 2)
    bw.write(0, 1)
    _no_cache_no_meta(bw)
    _simple_single(bw, 64)    # green
    _simple_single(bw, 10)    # red residual
    _simple_single(bw, 50)    # blue residual
    _simple_single(bw, 255)   # alpha
    _simple_single(bw, 0)
    out = decode_webp(_wrap(bw))
    assert (out == np.array([[[14, 64, 48]]], dtype=np.uint8)).all(), out


def test_color_indexing_with_bundling():
    # palette of 3 colors -> width_bits=2 (four 2-bit indices per green
    # byte, LSB-first); image 3x1 with indices [2, 0, 1] packs into the
    # single green byte 2 | 0<<2 | 1<<4 = 0x12, so the coded image is
    # 1x1
    pal = [(255, 9, 8, 7), (255, 20, 30, 40), (255, 200, 150, 100)]
    bw = BitWriter()
    _header(bw, 3, 1)
    bw.write(1, 1)
    bw.write(3, 2)       # COLOR_INDEXING
    bw.write(3 - 1, 8)   # palette size - 1
    # palette sub-image (3x1): entries are per-channel DELTAS
    deltas = []
    prev = (0, 0, 0, 0)
    for a, r, g, b in pal:
        deltas.append(tuple((c - p) & 0xFF for c, p in zip((a, r, g, b), prev)))
        prev = (a, r, g, b)
    bw.write(0, 1)  # sub-image: no cache
    uniq = lambda i: sorted({d[i] for d in deltas})
    a_syms, r_syms, g_syms, b_syms = (uniq(0), uniq(1), uniq(2), uniq(3))
    g_emit = _full_code(bw, 256 + 24, g_syms)
    r_emit = _full_code(bw, 256, r_syms)
    b_emit = _full_code(bw, 256, b_syms)
    a_emit = _full_code(bw, 256, a_syms)
    _simple_single(bw, 0)
    for a, r, g, b in deltas:
        g_emit(bw, g)
        r_emit(bw, r)
        b_emit(bw, b)
        a_emit(bw, a)
    bw.write(0, 1)  # no more transforms
    # main (packed 1x1): single green byte 0x12
    _no_cache_no_meta(bw)
    _simple_single(bw, 0x12)  # green
    _simple_single(bw, 0)
    _simple_single(bw, 0)
    _simple_single(bw, 255)
    _simple_single(bw, 0)
    out = decode_webp(_wrap(bw))
    want = np.array([[pal[2][1:], pal[0][1:], pal[1][1:]]], dtype=np.uint8)
    assert (out == want).all(), (out, want)


def test_color_cache():
    # literal (a=255,r=1,g=2,b=3), then a cache hit for the same pixel
    px = 0xFF010203
    cache_bits = 4
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)             # no transforms
    bw.write(1, 1)             # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)             # no entropy image
    g_emit = _full_code(bw, 256 + 24 + 16, [2, 280 + idx])
    _simple_single(bw, 1)      # red
    _simple_single(bw, 3)      # blue
    _simple_single(bw, 255)    # alpha
    _simple_single(bw, 0)
    g_emit(bw, 2)              # literal
    g_emit(bw, 280 + idx)      # cache hit
    out = decode_webp(_wrap(bw))
    want = np.array([[[1, 2, 3], [1, 2, 3]]], dtype=np.uint8)
    assert (out == want).all(), out


def test_meta_prefix_two_groups():
    # 8x1, meta tile bits 2 -> tiles of 4 px: group 0 emits gray 7,
    # group 1 emits gray 9
    bw = BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)   # no transforms
    bw.write(0, 1)   # no cache
    bw.write(1, 1)   # entropy image present
    bw.write(0, 3)   # prefix bits = 2 -> 2x1 meta image
    # meta sub-image: pixels with meta index in (r<<8)|g
    bw.write(0, 1)   # sub-image: no cache
    g_emit = _simple_pair(bw, 0, 1)   # meta green = index low byte
    _simple_single(bw, 0)             # red (index high byte)
    _simple_single(bw, 0)
    _simple_single(bw, 0)
    _simple_single(bw, 0)
    g_emit(bw, 0)
    g_emit(bw, 1)
    # two groups, 5 codes each
    for gray in (7, 9):
        _simple_single(bw, gray)   # green
        _simple_single(bw, gray)   # red
        _simple_single(bw, gray)   # blue
        _simple_single(bw, 255)    # alpha
        _simple_single(bw, 0)      # distance
    out = decode_webp(_wrap(bw))
    want = np.array([[7] * 4 + [9] * 4], dtype=np.uint8)
    assert (out == want).all(), out


def test_lz77_row_copy_via_2d_map_and_plain_distance():
    # 4x2: four literals, then a length-4 backref copying the whole
    # first row — once via 2D-map code 1 = (0,1) = distance xsize,
    # once via the plain code 124 -> distance 124-120 = 4 = xsize
    for dist_code_value in (1, 124):
        bw = BitWriter()
        _header(bw, 4, 2)
        bw.write(0, 1)  # no transforms
        _no_cache_no_meta(bw)
        lcode, lextra, lnbits = _prefix_encode(4)       # length 4
        dcode, dextra, dnbits = _prefix_encode(dist_code_value)
        g_emit = _full_code(bw, 256 + 24, [5, 6, 7, 8, 256 + lcode])
        r_emit = _simple_pair(bw, 0, 1)
        b_emit = _simple_pair(bw, 0, 1)
        _simple_single(bw, 255)
        d_emit = _full_code(bw, 40, [dcode])
        for v in (5, 6, 7, 8):
            g_emit(bw, v)
            r_emit(bw, v & 1)
            b_emit(bw, (v >> 1) & 1)
        g_emit(bw, 256 + lcode)
        bw.write(lextra, lnbits)
        d_emit(bw, dcode)
        bw.write(dextra, dnbits)
        out = decode_webp(_wrap(bw))
        assert out.shape == (2, 4, 3)
        assert (out[0] == out[1]).all()
        assert list(out[0, :, 1]) == [5, 6, 7, 8], out


# --- refusals -------------------------------------------------------------------


def test_refusals():
    img = RNG.integers(0, 256, (4, 4), dtype=np.int64).astype(np.uint8)
    blob = bytearray(encode_webp(img))
    with pytest.raises(ValueError, match="lossy VP8"):
        decode_webp(bytes(blob[:12]) + b"VP8 " + bytes(blob[16:]))
    with pytest.raises(ValueError, match="VP8X"):
        decode_webp(bytes(blob[:12]) + b"VP8X" + bytes(blob[16:]))
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"JUNK" + bytes(blob[4:]))
    with pytest.raises(ValueError, match="signature"):
        decode_webp(bytes(blob[:20]) + b"\x00" + bytes(blob[21:]))
    with pytest.raises(ValueError):
        decode_webp(bytes(blob[: len(blob) // 2]))  # truncated


def test_non_opaque_alpha_refused():
    bw = BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)
    _no_cache_no_meta(bw)
    _simple_single(bw, 1)
    _simple_single(bw, 2)
    _simple_single(bw, 3)
    _simple_single(bw, 128)  # alpha != 255
    _simple_single(bw, 0)
    with pytest.raises(ValueError, match="alpha"):
        decode_webp(_wrap(bw))


def test_kraft_helpers():
    assert _kraft_fix([1, 1]) == [1, 1]
    fixed = _kraft_fix([1, 1, 1])  # oversubscribed
    nz = [l for l in fixed if l]
    assert sum(1 << (max(nz) - l) for l in nz) == 1 << max(nz)
