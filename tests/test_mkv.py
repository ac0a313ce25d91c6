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
