"""Matroska/WebM EBML metadata (functions/mkv.py) — parser + writer
roundtrips, unknown-size segments, refusals, fuzz."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mcp_ocr_server_spark.functions.mkv import encode_mkv, mkv_metadata


def test_roundtrip_video():
    m = mkv_metadata(encode_mkv())
    assert m == dict(container="webm", codec="V_VP9", width=640,
                     height=360, duration_s=4.0, sample_rate=None,
                     channels=None)


def test_roundtrip_matroska_with_audio_and_scale():
    m = mkv_metadata(encode_mkv(
        doctype="matroska", codec="V_MPEG4/ISO/AVC", width=1920,
        height=1080, duration_s=12.5, timestamp_scale=500_000,
        audio=("A_OPUS", 48000.0, 2), cluster=b"\x00" * 64,
    ))
    assert m["container"] == "matroska"
    assert m["codec"] == "V_MPEG4/ISO/AVC"
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["duration_s"] == 12.5  # scale-aware: ticks * scale / 1e9
    assert (m["sample_rate"], m["channels"]) == (48000.0, 2)


def test_audio_only_falls_back_to_audio_codec():
    m = mkv_metadata(encode_mkv(codec="", duration_s=None,
                                audio=("A_VORBIS", 44100.0, 1)))
    assert m["codec"] == "A_VORBIS" and m["duration_s"] is None


def test_unknown_size_segment():
    # the streaming idiom: Segment size vint all-ones runs to EOF
    blob = bytearray(encode_mkv())
    at = blob.find(b"\x18\x53\x80\x67") + 4
    first = blob[at]
    ln, mask = 1, 0x80
    while not (first & mask):
        mask >>= 1
        ln += 1
    patched = bytes(blob[:at]) + b"\xff" + bytes(blob[at + ln:])
    m = mkv_metadata(patched)
    assert m["width"] == 640 and m["duration_s"] == 4.0


def test_refusals():
    with pytest.raises(ValueError, match="EBML magic"):
        mkv_metadata(b"RIFF" + bytes(32))
    with pytest.raises(ValueError, match="DocType"):
        mkv_metadata(encode_mkv(doctype="ebml-test"))
    with pytest.raises(ValueError):
        mkv_metadata(encode_mkv()[:10])  # truncated


def test_video_inventory_routes_mkv():
    from mcp_ocr_server_spark.functions.multimodal import (
        video_inventory_row,
    )

    row = video_inventory_row("v", encode_mkv(width=320, height=180))
    assert row["error"] is None
    assert row["container"] == "webm" and row["codec"] == "V_VP9"
    assert (row["width"], row["height"]) == (320, 180)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_exception_contract_fuzz(data):
    for payload in (data, b"\x1aE\xdf\xa3" + data):
        try:
            m = mkv_metadata(payload)
        except ValueError:
            continue
        assert m["container"] in ("webm", "matroska")


@settings(max_examples=80, deadline=None)
@given(st.integers(min_value=0, max_value=500))
def test_truncation_fuzz(cut):
    blob = encode_mkv(audio=("A_OPUS", 48000.0, 2), cluster=b"x" * 32)
    try:
        mkv_metadata(blob[: min(cut, len(blob) - 1)])
    except ValueError:
        pass


# --- block layer (SimpleBlock / BlockGroup demux) ---------------------------

def _blocks_api():
    from mcp_ocr_server_spark.functions.mkv import (
        encode_simpleblock, first_video_track, parse_mkv_blocks,
        parse_mkv_frames)
    return (encode_simpleblock, first_video_track, parse_mkv_blocks,
            parse_mkv_frames)


def test_simpleblock_roundtrip_timestamps_and_keyframes():
    _, fvt, blocks_of, frames_of = _blocks_api()
    frames = [(40 * k, k == 0, b"payload-%d" % k) for k in range(4)]
    data = encode_mkv(frames=frames, timestamp_scale=1_000_000)
    assert fvt(data) == 1
    blocks = blocks_of(data)
    assert [b["track"] for b in blocks] == [1] * 4
    assert [round(b["time_s"], 3) for b in blocks] == [
        0.0, 0.04, 0.08, 0.12]
    assert [b["keyframe"] for b in blocks] == [True, False, False,
                                               False]
    assert frames_of(data) == [b"payload-%d" % k for k in range(4)]


def test_blockgroup_keyframe_iff_no_referenceblock():
    from mcp_ocr_server_spark.functions.mkv import (
        _el, _enc_size)
    import struct as _s
    _, _, blocks_of, _ = _blocks_api()

    def group(payload, with_ref):
        body = _el(0xA1, _enc_size(1) + _s.pack(">h", 0) + b"\x00"
                   + payload)
        if with_ref:
            body += _el(0xFB, b"\x7f")
        return _el(0xA0, body)

    cluster = (_el(0xE7, b"\x00") + group(b"key", False)
               + group(b"delta", True))
    data = encode_mkv(cluster=cluster)
    blocks = blocks_of(data)
    assert [(b["payload"], b["keyframe"]) for b in blocks] == [
        (b"key", True), (b"delta", False)]


def test_laced_blocks_refuse_by_name():
    from mcp_ocr_server_spark.functions.mkv import (
        _el, encode_simpleblock)
    _, _, blocks_of, _ = _blocks_api()
    sb = encode_simpleblock(1, 0, b"x" * 8, lacing_flags=0x02)
    data = encode_mkv(cluster=_el(0xE7, b"\x00") + sb)
    with pytest.raises(ValueError, match="laced"):
        blocks_of(data)


def test_garbage_cluster_refuses_structurally():
    _, _, blocks_of, _ = _blocks_api()
    data = encode_mkv(cluster=b"\x00" * 40)
    with pytest.raises(ValueError):
        blocks_of(data)


def test_frames_of_audio_only_file_refuses():
    _, _, _, frames_of = _blocks_api()
    data = encode_mkv(codec="", audio=("A_OPUS", 48000.0, 2))
    with pytest.raises(ValueError, match="no video track"):
        frames_of(data)


def test_mkv_mjpeg_full_chain_via_video_features():
    """Matroska V_MJPEG: EBML demux + JPEG decode + analyzer — the
    third container through the complete real chain."""
    from mcp_ocr_server_spark.functions.multimodal import (
        _decode_video_frames)
    from mcp_ocr_server_spark.imaging.codecs import decode_image
    from mcp_ocr_server_spark.imaging.jpeg import encode_jpeg
    imgs = [np.full((8, 12), 60 * k + 20, np.uint8) for k in range(3)]
    data = encode_mkv(
        doctype="matroska", codec="V_MJPEG", width=12, height=8,
        frames=[(33 * k, k == 0, encode_jpeg(im, quality=95))
                for k, im in enumerate(imgs)],
    )
    out = _decode_video_frames(data, every_n=1)
    assert len(out) == 3
    for (idx, payload), src in zip(out, imgs):
        dec = decode_image(payload)
        assert abs(float(dec.mean()) - float(src.mean())) < 6
