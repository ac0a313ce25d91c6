"""functions/mp4.py — ISO-BMFF box-walk round-trips against the
independent writer, the refuse-loudly error contract, a fuzz sweep
(the container parsers' shared exception discipline), and the
video_inventory row contract over the deterministic corpus."""

import numpy as np
import pytest

from mcp_ocr_server_spark.functions.mp4 import (
    encode_mp4,
    mp4_metadata,
    walk_boxes,
)
from mcp_ocr_server_spark.functions.multimodal import video_inventory_row


def test_roundtrip_metadata():
    d = encode_mp4(12.5, codec=b"hev1", width=1920, height=1080,
                   n_frames=300)
    assert mp4_metadata(d) == {
        "n_tracks": 1, "brand": "isom", "duration_s": 12.5,
        "codec": "hev1", "width": 1920, "height": 1080,
        "n_frames": 300, "rotation": 0,
    }


def test_tkhd_rotation_roundtrip():
    """The tkhd display matrix carries the phone-camera rotation; all
    four quarter-turns round-trip, and a sheared (non-90°) matrix
    reports None rather than a wrong snap."""
    for rot in (0, 90, 180, 270):
        m = mp4_metadata(encode_mp4(1.0, rotation=rot))
        assert m["rotation"] == rot, rot
    import struct as _s

    d = encode_mp4(1.0)
    # overwrite the TKHD matrix (the SECOND unity matrix — mvhd
    # carries the first) with a 45° rotation: not a multiple of 90
    # -> rotation must surface as None
    k = int(round(0.7071 * 65536))
    unity = _s.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                    0x40000000)
    second = d.find(unity, d.find(unity) + 1)
    assert second != -1
    sheared = (d[:second]
               + _s.pack(">9i", k, k, 0, -k, k, 0, 0, 0, 0x40000000)
               + d[second + len(unity):])
    assert mp4_metadata(sheared)["rotation"] is None


def test_roundtrip_varied():
    for dur, codec, w, h, n in [(0.25, b"avc1", 320, 180, 6),
                                (3600.0, b"mp4v", 4096, 2160, 86400)]:
        m = mp4_metadata(encode_mp4(dur, codec=codec, width=w,
                                    height=h, n_frames=n))
        assert (m["duration_s"], m["codec"], m["width"], m["height"],
                m["n_frames"]) == (dur, codec.decode(), w, h, n)


def test_walk_boxes_siblings():
    d = encode_mp4(1.0)
    types = [t for t, _, _ in walk_boxes(d, 0, len(d))]
    assert types == [b"ftyp", b"moov", b"mdat"]


def test_error_contract():
    good = encode_mp4(3.0)
    with pytest.raises(ValueError, match="EBML"):
        mp4_metadata(b"\x1a\x45\xdf\xa3" + good[4:])
    with pytest.raises(ValueError, match="no ftyp"):
        mp4_metadata(b"XXXXxxxxYYYY")
    with pytest.raises(ValueError, match="overruns|truncated"):
        mp4_metadata(good[:40])
    b = bytearray(good)
    assert b[32:36] == b"moov"
    b[28:32] = b"\xff\xff\xff\xff"   # moov size field -> overrun
    with pytest.raises(ValueError, match="overruns"):
        mp4_metadata(bytes(b))
    with pytest.raises(ValueError, match="no moov"):
        mp4_metadata(good[:28] + good[-72:])   # ftyp + mdat only


def test_fuzz_exception_discipline():
    # every corruption either parses or raises ValueError — never a
    # foreign exception, never a hang (the avi/audio_meta contract)
    good = encode_mp4(2.0)
    rng = np.random.default_rng(42)
    for _ in range(300):
        b = bytearray(good)
        for _ in range(rng.integers(1, 4)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        try:
            mp4_metadata(bytes(b))
        except ValueError:
            pass
    for cut in range(0, len(good), 7):
        try:
            mp4_metadata(good[:cut])
        except ValueError:
            pass


def test_video_inventory_rows_over_corpus():
    from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
    from mcp_ocr_server_spark.sources.synthetic import (
        N_VIDEO_SNIFF_CLIPS,
        video_sniff_item,
    )

    kinds = {}
    for j in range(N_VIDEO_SNIFF_CLIPS):
        ref, data, kind = video_sniff_item(FLAGSHIP_CORPUS, j)
        row = video_inventory_row(ref, data)
        kinds[kind] = kinds.get(kind, 0) + 1
        if kind == "avi":
            assert row["error"] is None and row["container"] == "avi"
            assert row["codec"] in ("MJPG", "PNG ") and row["duration_s"] > 0
        elif kind in ("mp4_avc1", "mp4_hev1"):
            assert row["error"] is None and row["container"] == "mp4"
            assert row["codec"] == kind[4:]
            assert row["width"] > 0 and row["n_frames"] > 0
        elif kind in ("webm", "matroska"):
            # real EBML walk (functions/mkv.py): metadata, not an
            # error row
            assert row["error"] is None, row
            assert row["container"] == kind
            assert row["codec"] and row["width"] > 0
            assert row["duration_s"] > 0
        else:
            assert row["error"], (kind, row)
    assert set(kinds) == {"avi", "mp4_avc1", "mp4_hev1",
                          "mp4_truncated", "webm", "matroska",
                          "garbage"}
