"""Baseline JPEG codec (imaging/jpeg.py) — pure stdlib+numpy, ITU-T
T.81 re-derivation.  Pins: DCT basis orthonormality, encoder/decoder
round-trip error bounds per mode, exactness on DC-only images, the
restart-interval path (bit-different stream, pixel-identical output),
marker/structure refusals, and determinism.
"""

import numpy as np
import pytest

from mcp_ocr_server_spark.imaging.font import render_text
from mcp_ocr_server_spark.imaging.jpeg import (
    _C,
    decode_jpeg,
    decode_jpeg_gray,
    encode_jpeg,
)


def _grad(h, w):
    # smooth (non-wrapping) gradient: wrap discontinuities would add
    # legitimate ringing and turn the bound into a test of content,
    # not of the codec
    y, x = np.mgrid[0:h, 0:w]
    g = x * 2 + y * 2
    return np.clip(g, 0, 255).astype(np.uint8)


def test_dct_basis_orthonormal():
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)


def test_solid_image_exact():
    # a constant block is pure DC: quantization cannot touch it beyond
    # the rounding the level shift already absorbed
    for v in (0, 128, 200, 255):
        img = np.full((24, 40), v, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=50))
        assert int(np.abs(out.astype(int) - v).max()) <= 1, v


@pytest.mark.parametrize("quality,bound", [(50, 3), (75, 3), (95, 2)])
def test_gray_roundtrip_error_bound(quality, bound):
    img = _grad(40, 52)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= bound


@pytest.mark.parametrize("subsample", [False, True])
def test_color_roundtrip(subsample):
    y, x = np.mgrid[0:45, 0:61]
    rgb = np.stack(
        [(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quality=90, subsample=subsample))
    assert out.shape == rgb.shape
    err = np.abs(out.astype(int) - rgb.astype(int))
    # 4:2:0 averages chroma 2x2, so its bound is looser
    assert err.max() <= (8 if subsample else 4)


def test_gray_view_of_color_stream():
    g = _grad(33, 47)
    rgb = np.repeat(g[..., None], 3, axis=2)
    out = decode_jpeg_gray(encode_jpeg(rgb, quality=95))
    assert out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).mean() < 1.0


@pytest.mark.parametrize("shape", [(1, 1), (7, 9), (8, 8), (17, 23)])
def test_odd_sizes(shape):
    img = _grad(*shape)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == shape


def test_restart_interval_pixel_identical():
    img = _grad(40, 64)
    base = decode_jpeg(encode_jpeg(img, 90))
    for dri in (1, 3, 40):
        data = encode_jpeg(img, 90, restart_interval=dri)
        assert b"\xff\xdd" in data  # DRI segment present
        assert np.array_equal(decode_jpeg(data), base)


def test_restart_color_refused_at_encode():
    rgb = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="grayscale-only"):
        encode_jpeg(rgb, restart_interval=2)


def test_text_image_ocr_margin():
    img = render_text("QUICK BROWN FOX", scale=3)
    out = decode_jpeg_gray(encode_jpeg(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 1.0  # far inside the binarization margin


def test_determinism():
    img = _grad(30, 30)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: b"\x89PNG" + d[4:], "missing SOI"),
        # a baseline stream relabeled SOF2 is NOT a valid progressive
        # stream: its single scan has Ss=0/Se=63, illegal for a DC scan
        (lambda d: d.replace(b"\xff\xc0", b"\xff\xc2", 1),
         "DC scan with Se"),
        (lambda d: d.replace(b"\xff\xc0", b"\xff\xc9", 1), "arithmetic"),
        (lambda d: d[: len(d) // 2], "truncated"),
    ],
    ids=["not-jpeg", "sof2-relabel", "sof9", "truncated"],
)
def test_refusals(mutate, msg):
    data = encode_jpeg(_grad(24, 24), 90)
    with pytest.raises(ValueError, match=msg):
        decode_jpeg(mutate(data))


def test_refuses_12bit_precision():
    data = bytearray(encode_jpeg(_grad(24, 24), 90))
    i = data.find(b"\xff\xc0")
    data[i + 4] = 12  # precision byte inside SOF0
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg(bytes(data))


def test_decode_image_sniffs_both_codecs():
    from mcp_ocr_server_spark.imaging.codecs import decode_image, to_gray
    from mcp_ocr_server_spark.imaging.png import encode_png

    img = _grad(20, 28)
    assert np.array_equal(decode_image(encode_png(img)), img)
    out = decode_image(encode_jpeg(img, 95))
    assert out.shape == img.shape
    rgb = np.repeat(img[..., None], 3, axis=2)
    assert np.array_equal(to_gray(rgb), img)
    # JPEG-2000 signature: a real format OUTSIDE this repo's matrix
    # (GIF moved in-matrix, so it no longer serves as the foreign case)
    with pytest.raises(ValueError, match="not PNG/JPEG/BMP/PNM/TIFF"):
        decode_image(b"\x00\x00\x00\x0cjP  \r\n\x87\n_not_supported")


def test_mjpeg_avi_chain_is_real():
    # true MJPEG: container demux (functions/avi.py) + per-frame
    # baseline-JPEG decode + analyzer metrics, no error rows
    from mcp_ocr_server_spark.functions.multimodal import (
        video_feature_rows,
    )
    from mcp_ocr_server_spark.sources import synthetic as S

    seen = 0
    for j in range(S.N_VIDEO_CLIPS):
        ref, data, kind = S.video_item(S.INTERLEAVED_CORPUS, j)
        if kind != "avi_mjpeg":
            continue
        seen += 1
        rows = video_feature_rows(ref, data, 2)
        assert rows and all(r["error"] is None for r in rows)
        assert all(r["sharpness"] is not None for r in rows)
    assert seen >= 1


# --- progressive (SOF2) ------------------------------------------------------


def _rand(h, w, ch=None, seed=9):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.integers(0, 256, shape, dtype=np.int64).astype(np.uint8)


@pytest.mark.parametrize("quality", [90, 60])
@pytest.mark.parametrize(
    "img",
    [_grad(24, 40), _grad(17, 23), _rand(32, 48), _rand(16, 16, 3)],
    ids=["grad", "odd-dims", "noise", "color"],
)
def test_progressive_decodes_identical_to_baseline(img, quality):
    """Successive approximation is a lossless re-coding of the SAME
    quantized coefficients, so after all refinement scans the
    progressive decode must be pixel-identical to the baseline decode
    at the same quality."""
    from mcp_ocr_server_spark.imaging.jpeg import encode_jpeg_progressive

    base = decode_jpeg(encode_jpeg(img, quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality))
    assert prog.shape == base.shape
    assert (prog == base).all()


def test_progressive_determinism():
    from mcp_ocr_server_spark.imaging.jpeg import encode_jpeg_progressive

    img = _grad(30, 30)
    assert encode_jpeg_progressive(img, 85) == encode_jpeg_progressive(
        img, 85
    )


def test_progressive_eobrun_across_blocks():
    """Hand-built SOF2 stream exercising the EOBn path (run > 0) the
    in-repo encoder never emits: a 16x8 gray frame (two blocks), DC
    scan, then an AC scan that covers BOTH blocks with one EOBRUN-2
    symbol from a custom one-symbol Huffman table."""
    import struct as _s

    from mcp_ocr_server_spark.imaging.jpeg import _ZIGZAG, _C

    out = bytearray(b"\xff\xd8")
    # DQT 0: all-16 table (zigzag order on the wire)
    out += b"\xff\xdb" + _s.pack(">HB", 67, 0) + bytes([16] * 64)
    # SOF2: 8 rows, 16 cols, 1 component
    out += b"\xff\xc2" + _s.pack(">HBHHB", 11, 8, 8, 16, 1)
    out += bytes([1, 0x11, 0])
    # DHT DC 0: two symbols {2, 3} at length 1 (codes 0, 1)
    bits = [2] + [0] * 15
    out += b"\xff\xc4" + _s.pack(">HB", 19 + 2, 0x00) + bytes(bits) \
        + bytes([2, 3])
    # DHT AC 0: single symbol 0x10 (EOBRUN with r=1) at length 1
    bits = [1] + [0] * 15
    out += b"\xff\xc4" + _s.pack(">HB", 19 + 1, 0x10) + bytes(bits) \
        + bytes([0x10])
    # DC first scan (Ss=Se=0, Ah=Al=0): block DCs = +2 then diff -3
    out += b"\xff\xda" + _s.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0])
    # bits: sym2(code 0,len 1) + "10" (value 2) ; sym3? diff -3 ->
    # magnitude 2, code 0b00 (v + 2^2 - 1 = 0) -> wait: -3 size 2
    # receive bits for -3: -3 + (1<<2) - 1 = 0 -> two 0 bits
    # stream: [0][10] [0][00]  -> 010000xx pad 1s -> 0b01000011 = 0x43
    out += bytes([0b01000011])
    # AC first scan 1..63: one symbol 0x10 (code 0, 1 bit) + 1 extra
    # bit (0) -> EOBRUN = (1<<1)-1 + 0 = 1: ends block 0, skips block 1
    out += b"\xff\xda" + _s.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0])
    out += bytes([0b00111111])  # bits: [0][0] + 1-pad
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert img.shape == (8, 16)
    # expected: DC-only blocks: dc=2 -> 16*2/8 + 128 = 132; dc=-1 -> 126
    want = np.concatenate(
        [np.full((8, 8), 132, np.uint8), np.full((8, 8), 126, np.uint8)],
        axis=1,
    )
    assert (img == want).all(), img[0]


@pytest.mark.parametrize(
    "shape", [(45, 61, 3), (31, 34, 3), (17, 23, 3)],
    ids=["even-ish", "odd", "sub-mcu"],
)
def test_progressive_420_identical_to_baseline(shape):
    """4:2:0 progressive (the real-world shape): interleaved DC walks
    the 2x2-Y MCU order while AC scans walk each component's own
    image-covering grid, skipping the MCU padding blocks — odd
    dimensions pin that geometry."""
    from mcp_ocr_server_spark.imaging.jpeg import encode_jpeg_progressive

    img = _rand(*shape[:2], 3, seed=shape[0])
    for q in (90, 60):
        base = decode_jpeg(encode_jpeg(img, q, subsample=True))
        prog = decode_jpeg(encode_jpeg_progressive(img, q, subsample=True))
        assert (prog == base).all()


def test_422_subsampling_roundtrip():
    # 4:2:2 (2x1 chroma) — the broadcast-video shape; decoder upsamples
    # horizontally only
    y, x = np.mgrid[0:45, 0:61]
    rgb = np.stack(
        [(x * 4) % 256, (y * 4) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, 90, subsample="422"))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 6
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(rgb, 90, subsample="411")


def test_progressive_restart_intervals():
    """Hand-built SOF2 stream with DRI=1: the decoder must consume the
    RSTn markers and reset the DC predictor (DC scan) and the EOB run
    (AC scan) at every interval — pred carrying over would make block
    1 decode as DC 4, eobrun carrying over would starve block 1's
    symbol read."""
    import struct as _s

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _s.pack(">HB", 67, 0) + bytes([16] * 64)
    out += b"\xff\xc2" + _s.pack(">HBHHB", 11, 8, 8, 16, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xdd" + _s.pack(">HH", 4, 1)  # DRI = 1
    # DHT DC 0: single symbol {2} at length 1 (code 0)
    out += b"\xff\xc4" + _s.pack(">HB", 20, 0x00) \
        + bytes([1] + [0] * 15) + bytes([2])
    # DHT AC 0: single symbol {0x10} (EOBn, r=1) at length 1
    out += b"\xff\xc4" + _s.pack(">HB", 20, 0x10) \
        + bytes([1] + [0] * 15) + bytes([0x10])
    # DC first scan: block0 diff=+2, RST0, block1 diff=+2 (pred reset)
    out += b"\xff\xda" + _s.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0])
    out += bytes([0b01011111]) + b"\xff\xd0" + bytes([0b01011111])
    # AC scan 1..63: block0 EOBn r=1 extra=1 (run would cover 2 more
    # blocks), RST0 resets it, block1 EOBn r=1 extra=0
    out += b"\xff\xda" + _s.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0])
    out += bytes([0b01111111]) + b"\xff\xd0" + bytes([0b00111111])
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    # both blocks: DC=2 -> 16*2/8 + 128 = 132 everywhere
    assert img.shape == (8, 16)
    assert (img == 132).all(), np.unique(img)


def test_exif_orientation_read_write_and_transforms():
    """All 8 orientation tags round-trip through the APP1 writer;
    apply(o) after apply(inverse(o)) is the identity on an
    asymmetric array; unparseable EXIF degrades to 1."""
    import numpy as np

    from mcp_ocr_server_spark.imaging.codecs import (
        apply_exif_orientation, decode_image)
    from mcp_ocr_server_spark.imaging.jpeg import (
        add_exif_orientation, encode_jpeg, exif_orientation)

    img = (np.arange(48).reshape(6, 8) * 5).astype(np.uint8)
    j = encode_jpeg(img, quality=95)
    assert exif_orientation(j) == 1  # no APP1: identity
    for o in range(1, 9):
        assert exif_orientation(add_exif_orientation(j, o)) == o
    inv = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    a = np.arange(24).reshape(4, 6).astype(np.uint8)
    for o in range(1, 9):
        back = apply_exif_orientation(
            apply_exif_orientation(a, inv[o]), o)
        assert np.array_equal(back, a), o
    # decode_image rights the pixels: store rotated 90° CCW, tag 6
    stored = np.ascontiguousarray(apply_exif_orientation(img, 8))
    tagged = add_exif_orientation(encode_jpeg(stored, quality=95), 6)
    out = decode_image(tagged)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3
    # garbage EXIF payload: tolerant identity, never an exception
    junk = j[:2] + b"\xff\xe1\x00\x10Exif\x00\x00XXYYZZQQ" + j[2:]
    assert exif_orientation(junk) == 1
