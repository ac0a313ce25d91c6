"""GIF codec (imaging/gif.py): LZW round trips through width bumps and
dictionary resets, interlace, animation compositing (disposal +
transparency), decoder features the in-repo encoder does not emit
(driven by hand-built bitstreams), and the refuse-loudly contract."""

import struct

import numpy as np
import pytest

from mcp_ocr_server_spark.imaging.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)

RNG = np.random.default_rng(20260819)
GRAY = RNG.integers(0, 256, (37, 53), dtype=np.int64).astype(np.uint8)


# --- LZW ---------------------------------------------------------------------


def test_lzw_roundtrip_widths_and_resets():
    # noise at full byte alphabet forces width 9->12 and 4096 resets
    for n in (10, 300, 5_000, 60_000):
        data = RNG.integers(0, 256, n, dtype=np.int64).astype(
            np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data, 8), 8, n) == data
    # tiny alphabet at the minimum code size the format allows
    data = RNG.integers(0, 4, 2_000, dtype=np.int64).astype(
        np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data, 2), 2, 2_000) == data


def test_lzw_kwkwk_pattern():
    # the code == len(table) special case (cScSc): decoder must build
    # the entry from prev + prev[0]
    data = b"ababababababab"
    assert _lzw_decode(_lzw_encode(data, 8), 8, len(data)) == data


def test_lzw_refusals():
    with pytest.raises(ValueError):
        _lzw_decode(b"\xff\xff\xff", 8, 10_000)  # truncated stream
    with pytest.raises(ValueError):
        _lzw_decode(b"", 1, 4)  # bad min code size


# --- stills ------------------------------------------------------------------


def test_gray_and_interlace_roundtrip():
    assert (decode_gif(encode_gif(GRAY)) == GRAY).all()
    assert (decode_gif(encode_gif(GRAY, interlace=True)) == GRAY).all()


def test_rgb_exact_palette_roundtrip():
    rgb = np.zeros((24, 31, 3), np.uint8)
    rgb[..., 0] = RNG.integers(0, 5, (24, 31)) * 60
    rgb[..., 2] = RNG.integers(0, 3, (24, 31)) * 100
    out = decode_gif(encode_gif(rgb))
    assert out.ndim == 3 and (out == rgb).all()


def test_too_many_colors_refused():
    rgb = np.arange(3 * 300, dtype=np.uint8).reshape(10, 30, 3)
    rgb[..., 0] = np.arange(300, dtype=np.uint16).reshape(10, 30) % 256
    rgb[..., 1] = (np.arange(300).reshape(10, 30) // 256).astype(np.uint8)
    with pytest.raises(ValueError, match="unique colors"):
        encode_gif(rgb)


# --- animation ---------------------------------------------------------------


def test_animation_frames_roundtrip():
    frames = [RNG.integers(0, 256, (20, 28), dtype=np.int64).astype(np.uint8)
              for _ in range(3)]
    outs = decode_gif_frames(encode_gif(frames, delay_cs=7))
    assert len(outs) == 3
    for got, want in zip(outs, frames):
        assert (got == want).all()


def _hand_gif(frames_spec, sw=4, sh=4, gct=None, bg=0):
    """Minimal hand-assembled GIF: frames_spec is a list of
    (left, top, w, h, indices, gce_bytes_or_None)."""
    out = bytearray(b"GIF89a")
    packed = 0x80 | 0x01 if gct is not None else 0  # 4-entry GCT
    out += struct.pack("<HHBBB", sw, sh, packed, bg, 0)
    if gct is not None:
        out += gct
    for left, top, w, h, idx, gce in frames_spec:
        if gce is not None:
            out += b"\x21\xf9\x04" + gce + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        stream = _lzw_encode(bytes(idx), 2)
        out.append(2)
        out += bytes([len(stream)]) + stream + b"\x00"
    out += b"\x3b"
    return bytes(out)


GCT4 = bytes([0, 0, 0, 255, 255, 255, 200, 0, 0, 0, 0, 200])


def test_transparency_composites_over_previous_frame():
    # frame 1 fills with color 2; frame 2 overwrites one pixel with
    # color 3, everything else transparent (index 1)
    f1 = (0, 0, 4, 4, [2] * 16, None)
    gce = struct.pack("<BHB", 0x01, 0, 1)  # transparent idx 1, keep
    f2 = (0, 0, 4, 4, [3] + [1] * 15, gce)
    frames = decode_gif_frames(_hand_gif([f1, f2], gct=GCT4))
    assert (frames[0] == (200, 0, 0)).all()
    assert tuple(frames[1][0, 0]) == (0, 0, 200)
    assert (frames[1][1:] == (200, 0, 0)).all()


def test_disposal_restore_background():
    # frame 1 paints a 2x2 patch with disposal=2 (restore bg after);
    # frame 2 paints one other pixel transparent-free: the patch must
    # be back to background in frame 2
    gce1 = struct.pack("<BHB", 2 << 2, 0, 0)  # disposal 2, no transp
    f1 = (1, 1, 2, 2, [2] * 4, gce1)
    gce2 = struct.pack("<BHB", 0x01, 0, 1)
    f2 = (0, 0, 1, 1, [3], gce2)
    frames = decode_gif_frames(_hand_gif([f1, f2], gct=GCT4, bg=1))
    assert (frames[0][1:3, 1:3] == (200, 0, 0)).all()
    assert (frames[1][1:3, 1:3] == (255, 255, 255)).all()  # bg white
    assert tuple(frames[1][0, 0]) == (0, 0, 200)


def test_subrect_frame_placement():
    # a frame smaller than the screen lands at (left, top); the rest
    # of the canvas stays background
    f1 = (2, 1, 2, 2, [2, 2, 3, 3], None)
    frames = decode_gif_frames(_hand_gif([f1], gct=GCT4, bg=1))
    assert tuple(frames[0][1, 2]) == (200, 0, 0)
    assert tuple(frames[0][2, 3]) == (0, 0, 200)
    assert (frames[0][0] == (255, 255, 255)).all()


def test_gif87a_and_extension_skip():
    # GIF87a signature + comment extension before the image
    blob = bytearray(_hand_gif([(0, 0, 4, 4, [2] * 16, None)], gct=GCT4))
    blob[:6] = b"GIF87a"
    i = 6 + 7 + len(GCT4)
    with_comment = bytes(blob[:i]) + b"\x21\xfe\x05hello\x00" + bytes(blob[i:])
    assert (decode_gif(with_comment) == (200, 0, 0)).all()


def test_refusals():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"GIF88a" + b"\x00" * 20)
    with pytest.raises(ValueError, match="truncated|trailer"):
        decode_gif(encode_gif(GRAY)[:-10])
    # frame outside the logical screen
    bad = _hand_gif([(3, 3, 4, 4, [2] * 16, None)], gct=GCT4)
    with pytest.raises(ValueError, match="outside"):
        decode_gif(bad)
    # pixel index beyond the color table
    bad = _hand_gif([(0, 0, 4, 4, [3] * 16, None)],
                    gct=GCT4[:9], )  # only 3 colors... table size still 4
    # index 3 with a 4-entry table is legal; craft index > table via
    # a 2-entry GCT instead
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)  # 2-entry GCT
    out += bytes(6)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    stream = _lzw_encode(bytes([3, 3, 3, 3]), 2)
    out += bytes([2, len(stream)]) + stream + b"\x00\x3b"
    with pytest.raises(ValueError, match="outside color table"):
        decode_gif(bytes(out))


def test_no_image_data_refused():
    blob = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x3b"
    with pytest.raises(ValueError, match="no image data"):
        decode_gif(blob)
