"""AVI container codec (functions/avi.py) + the real video
frame-features chain (functions/multimodal.video_frame_features)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mcp_ocr_server_spark.functions.avi import (
    avi_metadata,
    encode_avi,
    parse_avi_frames,
)
from mcp_ocr_server_spark.functions.multimodal import (
    _decode_video_frames,
    video_feature_rows,
)
from mcp_ocr_server_spark.imaging.png import encode_png
from mcp_ocr_server_spark.sources import synthetic as S


def test_avi_roundtrip_including_empty_and_odd_frames():
    frames = [b"frame-one", b"x" * 7, b"", b"odd", b"\x00" * 4096]
    data = encode_avi(frames, 32, 24, fps=5)
    assert parse_avi_frames(data) == frames
    meta = avi_metadata(data)
    assert meta == dict(
        n_frames=5, width=32, height=24, codec="MJPG", fps=5.0
    )


def test_avi_rec_groups_parse():
    """Interleaved AVIs wrap frames in LIST('rec ') groups; the walker
    must recurse into them.  Built by hand since encode_avi writes the
    flat layout."""
    f1, f2 = b"alpha", b"beta-x"  # odd + even payloads

    def chunk(cc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return cc + struct.pack("<I", len(payload)) + payload + pad

    rec = chunk(b"LIST", b"rec " + chunk(b"00dc", f1))
    movi = chunk(b"LIST", b"movi" + rec + chunk(b"00db", f2))
    base = encode_avi([], 8, 8)  # header skeleton
    # splice: header's empty movi replaced by ours
    hdr_end = base.index(b"LIST", 12)
    hdrl_size = struct.unpack_from("<I", base, hdr_end + 4)[0]
    hdrl = base[hdr_end : hdr_end + 8 + hdrl_size]
    body = b"AVI " + hdrl + movi
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_avi_frames(data) == [f1, f2]


def test_avi_refuses_truncated_and_foreign():
    data = encode_avi([b"f" * 100], 8, 8)
    with pytest.raises(ValueError, match="claims"):
        parse_avi_frames(data[: len(data) // 2])
    with pytest.raises(ValueError, match="not 'AVI '"):
        parse_avi_frames(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError, match="not a RIFF"):
        parse_avi_frames(b"\x00\x00\x00\x20ftypisom" + b"\x00" * 32)
    with pytest.raises(ValueError, match="movi"):
        # valid envelope, no movi list
        hdr_only = encode_avi([], 8, 8)
        i = hdr_only.index(b"LIST", 12)
        sz = struct.unpack_from("<I", hdr_only, i + 4)[0]
        body = b"AVI " + hdr_only[i : i + 8 + sz]
        parse_avi_frames(b"RIFF" + struct.pack("<I", len(body)) + body)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=200), min_size=0, max_size=12),
    st.integers(min_value=1, max_value=60),
)
def test_avi_roundtrip_fuzz(frames, fps):
    """Property: mux -> demux is the identity on any frame list."""
    data = encode_avi(frames, 16, 16, fps=fps)
    assert parse_avi_frames(data) == frames
    assert avi_metadata(data)["n_frames"] == len(frames)


def test_decode_video_frames_samples_every_n():
    frames = [bytes([i]) * 10 for i in range(9)]
    data = encode_avi(frames, 8, 8)
    sampled = _decode_video_frames(data, 3)
    assert sampled == [(0, frames[0]), (3, frames[3]), (6, frames[6])]


def test_video_feature_rows_real_chain():
    """A PNG-frame AVI yields REAL pixel metrics per sampled frame —
    brightness must track the synthetic gradient's per-frame offset."""
    imgs = [
        np.full((12, 16), 40 + 30 * k, dtype=np.uint8) for k in range(4)
    ]
    data = encode_avi([encode_png(im) for im in imgs], 16, 12)
    rows = video_feature_rows("v", data, every_n=2)
    assert [r["frame_idx"] for r in rows] == [0, 2]
    for r, k in zip(rows, (0, 2)):
        assert r["error"] is None
        assert (r["width"], r["height"]) == (16, 12)
        assert abs(r["brightness"] - (40 + 30 * k)) < 1.0


def test_video_feature_rows_error_classes():
    """Opaque-codec frames -> per-frame errors with the frame count
    intact; truncated container -> one per-clip error row."""
    opaque = encode_avi([b"\x01\x02" * 64] * 3, 8, 8, fourcc=b"H264")
    rows = video_feature_rows("o", opaque, every_n=1)
    assert len(rows) == 3
    assert all(r["error"] is not None and r["frame_idx"] == i
               for i, r in enumerate(rows))

    good = encode_avi([b"ok" * 50] * 2, 8, 8)
    rows = video_feature_rows("t", good[: len(good) // 3], every_n=1)
    assert len(rows) == 1 and rows[0]["frame_idx"] is None
    assert "claims" in rows[0]["error"]


def test_video_stage_over_synthetic_corpus(spark):
    """The Spark stage end-to-end: every kind class lands in its
    documented contract branch, and the stage output equals the
    committed golden row-for-row (the oracle the registry query
    checks against DuckDB is the same file)."""
    from mcp_ocr_server_spark.functions.multimodal import (
        video_frame_features,
    )

    cfg = S.CorpusConfig(n_docs=1)
    clips = S.video_df(spark, cfg)
    out = video_frame_features(clips).collect()
    kinds = {S.video_ref(j): S.video_item(cfg, j)[2]
             for j in range(S.N_VIDEO_CLIPS)}
    by_ref: dict = {}
    for r in out:
        by_ref.setdefault(r.media_ref, []).append(r)
    assert set(by_ref) == set(kinds)
    for ref, rows in by_ref.items():
        kind = kinds[ref]
        if kind == "avi":
            assert all(r.error is None for r in rows), (ref, rows)
            assert all(r.frame_idx % 2 == 0 for r in rows)
        elif kind == "avi_opaque":
            assert all(r.error is not None and r.frame_idx is not None
                       for r in rows)
        elif kind == "avi_truncated":
            assert len(rows) == 1 and rows[0].frame_idx is None
        elif kind == "mp4":
            # REAL ISO-BMFF sample-table demux + PNG pixel decode —
            # the same full chain as the avi class, other container
            assert all(r.error is None for r in rows), (ref, rows)
            assert all(r.frame_idx % 2 == 0 for r in rows)
        elif kind == "mkv_mjpeg":
            # EBML SimpleBlock demux + JPEG decode: the third
            # container through the full real chain
            assert all(r.error is None for r in rows), (ref, rows)
            assert all(r.frame_idx % 2 == 0 for r in rows)
        elif kind == "webm":
            # EBML magic with a garbage body: the block walk refuses
            # structurally — one per-clip error row
            assert len(rows) == 1 and rows[0].frame_idx is None
            assert rows[0].error.startswith("mkv:")


def test_avi_idx1_offsets_point_at_frame_ckids():
    """idx1 entries must point at each frame's ckid measured from the
    'movi' fourcc position (frame 0 -> offset 4) — the convention
    index-seeking demuxers expect."""
    frames = [b"aaa", b"bb" * 10, b"c"]
    data = encode_avi(frames, 8, 8)
    movi_pos = data.index(b"movi")
    idx_pos = data.index(b"idx1")
    (idx_size,) = struct.unpack_from("<I", data, idx_pos + 4)
    assert idx_size == 16 * len(frames)
    for k in range(len(frames)):
        ckid, flags, off, size = struct.unpack_from(
            "<4sIII", data, idx_pos + 8 + 16 * k
        )
        assert ckid == b"00dc" and flags == 0x10
        assert data[movi_pos + off:movi_pos + off + 4] == b"00dc"
        (chunk_size,) = struct.unpack_from("<I", data, movi_pos + off + 4)
        assert chunk_size == size == len(frames[k])


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_avi_parser_exception_contract_fuzz(data):
    """For arbitrary bytes — raw, RIFF-prefixed, and spliced into a
    valid container's movi region — the parser either returns frames
    or raises ValueError; no IndexError/struct.error leaks."""
    valid = encode_avi([b"x" * 10], 8, 8)
    for payload in (
        data,
        b"RIFF" + data,
        b"RIFF" + struct.pack("<I", len(data) + 4) + b"AVI " + data,
        valid[: len(valid) // 2] + data,
    ):
        for fn in (parse_avi_frames, avi_metadata):
            try:
                fn(payload)
            except ValueError:
                pass


def test_video_stage_invariants_at_larger_corpus(spark):
    """Size-dependent regression guard (the 500-doc extract pattern):
    run the video stage at ~8x the golden corpus size and machine-check
    the structural invariants a fixed golden cannot — per-clip sampled
    row count derived from the container's own header frame count, no
    duplicate (clip, frame) pairs, and error classes landing per the
    kind contract."""
    n = 200
    cfg = S.CorpusConfig(n_docs=1)
    from mcp_ocr_server_spark.functions.multimodal import (
        video_frame_features,
    )

    out = video_frame_features(S.video_df(spark, cfg, n=n)).collect()
    by_ref: dict = {}
    for r in out:
        by_ref.setdefault(r.media_ref, []).append(r)
    assert len(by_ref) == n
    seen_pairs = set()
    for j in range(n):
        ref, data, kind = S.video_item(cfg, j)
        rows = by_ref[ref]
        for r in rows:
            key = (r.media_ref, r.frame_idx)
            assert key not in seen_pairs  # no duplicated frame rows
            seen_pairs.add(key)
        if kind in ("avi", "avi_opaque"):
            n_frames = avi_metadata(data)["n_frames"]
            expect = len(range(0, n_frames, 2))  # every_n = 2 default
            assert len(rows) == expect, (ref, kind, n_frames, len(rows))
            assert sorted(r.frame_idx for r in rows) == list(
                range(0, n_frames, 2))
        elif kind == "avi_truncated":
            assert len(rows) == 1 and rows[0].frame_idx is None
