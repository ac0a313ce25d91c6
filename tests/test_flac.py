"""functions/flac.py — bit-exact round-trips, spec-edge decode paths
the writer doesn't emit (wasted bits, 5-bit rice method), and the
refuse-loudly error contract (CRC-8 / CRC-16 / MD5 / truncation /
sync loss), all pure-Python — no Spark session needed.  The Spark-side
integration rides the existing media_audio_features oracle parity
(the golden is produced by the same audio_feature_row over the corpus
that now carries real FLAC clips)."""

import numpy as np
import pytest

from mcp_ocr_server_spark.functions.flac import (
    _BitW,
    _crc8,
    _crc16,
    _utf8_code,
    decode_flac,
    decode_flac_pcm,
    encode_flac,
)


def _sig(n=3000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    s = 8000 * np.sin(2 * np.pi * 220 * t / 8000) + rng.normal(0, 50, n)
    return np.clip(np.round(s), -32768, 32767).astype(np.int64)


# --- CRC implementations pinned to published check values -----------------

def test_crc_check_values():
    # CRC-8 poly 0x07 init 0 ("CRC-8/SMBUS") and CRC-16 poly 0x8005
    # init 0 ("CRC-16/UMTS"), the two FLAC uses — standard test vector
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


# --- round-trips ------------------------------------------------------------

@pytest.mark.parametrize(
    "mode",
    ["verbatim", "fixed1", "fixed2", "fixed_escape", "lpc"],
)
def test_roundtrip_modes_bit_exact(mode):
    s = _sig()
    pcm, rate, bps = decode_flac_pcm(
        encode_flac(s, 8000, bits=16, block_size=1024, mode=mode)
    )
    assert (rate, bps) == (8000, 16)
    assert np.array_equal(pcm[:, 0], s)


def test_roundtrip_constant():
    s = np.full(900, -12345, dtype=np.int64)
    pcm, _, _ = decode_flac_pcm(
        encode_flac(s, 8000, mode="constant", block_size=256)
    )
    assert np.array_equal(pcm[:, 0], s)


@pytest.mark.parametrize(
    "stereo", ["independent", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_stereo_decorrelation(stereo):
    s = _sig(2500)
    st = np.stack([s, (s * 0.6).astype(np.int64)], axis=1)
    pcm, _, _ = decode_flac_pcm(
        encode_flac(st, 8000, block_size=512, mode="fixed2",
                    stereo=stereo)
    )
    assert np.array_equal(pcm, st)


@pytest.mark.parametrize("bits", [8, 24])
def test_roundtrip_bit_depths(bits):
    s = _sig()
    s = np.clip(s >> (16 - bits) if bits < 16 else s << (bits - 16),
                -(1 << (bits - 1)), (1 << (bits - 1)) - 1)
    pcm, _, bps = decode_flac_pcm(
        encode_flac(s, 44100, bits=bits, block_size=777, mode="fixed1")
    )
    assert bps == bits
    assert np.array_equal(pcm[:, 0], s)


def test_partial_last_block_and_multibyte_frame_numbers():
    # 188 frames at block_size 16 exercises the 2-byte coded frame
    # number AND a short final block (3000 % 16 == 8)
    s = _sig(3000, seed=3)
    pcm, _, _ = decode_flac_pcm(
        encode_flac(s, 8000, block_size=16, mode="fixed1")
    )
    assert np.array_equal(pcm[:, 0], s)


def test_empty_stream():
    pcm, rate, _ = decode_flac_pcm(
        encode_flac(np.zeros((0,), dtype=np.int64), 8000)
    )
    assert pcm.shape == (0, 1) and rate == 8000


def test_float_mono_wrapper_matches_wav_semantics():
    s = _sig(1200)
    st = np.stack([s, s // 2], axis=1)
    f, rate = decode_flac(encode_flac(st, 8000, stereo="mid_side"))
    expect = (st[:, 0] + st[:, 1]) / 2.0 / 32768.0
    assert rate == 8000
    np.testing.assert_allclose(f, expect.astype(np.float32), atol=1e-6)


# --- decode paths the writer does not emit ---------------------------------

def _hand_frame(streaminfo_pcm, body_bits, rate=8000, bits=16,
                blocksize=4, channels=1):
    """Assemble a 1-frame stream whose subframe bits are hand-written
    (for wasted-bits / rice-method-1 coverage)."""
    import hashlib

    si = _BitW()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(channels - 1, 3); si.write(bits - 1, 5)
    si.write(len(streaminfo_pcm), 36)
    md5 = hashlib.md5(
        np.asarray(streaminfo_pcm, dtype="<i2").tobytes()
    ).digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si.out) + md5

    w = _BitW()
    w.write(0x7FFC, 15); w.write(0, 1)
    w.write(7, 4); w.write(13, 4)
    w.write(channels - 1, 4); w.write(4, 3); w.write(0, 1)
    for b in _utf8_code(0):
        w.write(b, 8)
    w.write(blocksize - 1, 16)
    w.write(rate, 16)
    w.write(_crc8(bytes(w.out)), 8)
    for val, n in body_bits:
        w.write(val, n)
    w.pad()
    w.write(_crc16(bytes(w.out)), 16)
    return bytes(out + w.out)


def test_decode_wasted_bits():
    # CONSTANT subframe, wasted=1: header flag 1 + unary 0-run of
    # length 0 (a single 1-bit) => wasted = 1; stored value 100 at
    # eff=15 bits reconstructs as 200
    data = _hand_frame(
        [200, 200, 200, 200],
        [(0, 1), (0, 6), (1, 1), (1, 1), (100, 15)],
    )
    pcm, _, _ = decode_flac_pcm(data)
    assert pcm[:, 0].tolist() == [200, 200, 200, 200]


def test_decode_rice_method_1():
    # FIXED order 1, residual method 1 (5-bit params): warmup 10,
    # residuals [+1, -1, +2] => samples [10, 11, 10, 12]
    res_bits = []
    for r in (1, -1, 2):
        u = (abs(r) << 1) - (1 if r < 0 else 0)
        res_bits += [(0, u >> 1), (1, 1), (u & 1, 1)]
    data = _hand_frame(
        [10, 11, 10, 12],
        [(0, 1), (9, 6), (0, 1), (10, 16),   # subframe hdr + warmup
         (1, 2), (0, 4), (1, 5),             # method 1, porder 0, p=1
         *[(v, n) for v, n in res_bits if n]],
    )
    pcm, _, _ = decode_flac_pcm(data)
    assert pcm[:, 0].tolist() == [10, 11, 10, 12]


# --- refuse-loudly contract -------------------------------------------------

def _expect_value_error(data, needle):
    with pytest.raises(ValueError, match=needle):
        decode_flac_pcm(data)


def test_error_contract():
    s = _sig(2000, seed=11)
    good = bytearray(encode_flac(s, 8000, block_size=512, mode="fixed2"))

    b = bytearray(good); b[-40] ^= 0xFF
    _expect_value_error(bytes(b), "CRC-16")
    b = bytearray(good); b[len(b) // 2] ^= 0x55
    _expect_value_error(bytes(b), "CRC")        # header CRC-8 or CRC-16
    b = bytearray(good); b[30] ^= 1              # inside STREAMINFO md5
    _expect_value_error(bytes(b), "MD5 mismatch")
    _expect_value_error(bytes(good[: len(good) // 2 + 3]), "truncated")
    _expect_value_error(bytes(good) + b"\x12\x34\x56", "lost frame sync")
    _expect_value_error(b"fLaX" + bytes(good[4:]), "bad magic")
    _expect_value_error(b"fLaC", "truncated metadata")


def test_total_samples_cross_check():
    # STREAMINFO total disagreeing with the decoded frame count refuses
    s = _sig(1000, seed=5)
    data = bytearray(encode_flac(s, 8000, block_size=512))
    # STREAMINFO starts at file byte 8; rate|ch|bits|total pack into
    # its bytes 10-17, so the file's byte 25 holds total's low byte
    # (1000 = 0x3E8)
    assert data[25] == 0xE8
    data[25] ^= 0xFF
    _expect_value_error(bytes(data), "STREAMINFO says")


def test_corpus_flac_clips_decode_and_corrupt_refuses():
    # the synthetic audio corpus's flac classes go through the REAL
    # decoder inside audio_feature_row
    from mcp_ocr_server_spark.functions.multimodal import (
        audio_feature_row,
    )
    from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
    from mcp_ocr_server_spark.sources.synthetic import (
        N_AUDIO_CLIPS,
        audio_item,
    )

    kinds = {}
    for j in range(N_AUDIO_CLIPS):
        ref, data, kind = audio_item(FLAGSHIP_CORPUS, j)
        row = audio_feature_row(ref, data)
        kinds.setdefault(kind, 0)
        kinds[kind] += 1
        if kind == "flac":
            assert row["error"] is None and row["n_samples"] > 0, (j, row)
            assert 0.0 < row["rms"] < row["peak"] <= 1.0, (j, row)
        if kind == "flac_corrupt":
            assert row["error"] and "CRC" in row["error"], (j, row)
    assert kinds.get("flac", 0) >= 5 and kinds.get("flac_corrupt") == 1


# --- Ogg encapsulation (RFC 5334 FLAC-to-Ogg mapping) -----------------------


def test_ogg_flac_roundtrip_cross_page():
    from mcp_ocr_server_spark.functions.flac import (
        decode_ogg_flac_pcm,
        encode_ogg_flac,
        ogg_packets,
    )

    pcm = _sig(4000)
    # 510-byte pages force the audio packet across MANY pages: the
    # reassembly path (lacing 255 continuation) is what's under test
    data = encode_ogg_flac(pcm, 8000, tags={"title": "X"}, max_body=510)
    assert data.count(b"OggS") >= 5
    out, rate, bps = decode_ogg_flac_pcm(data)
    assert rate == 8000 and bps == 16
    assert (out.reshape(-1) == pcm).all()
    # packet layer: ident + comment + one audio packet
    pkts = ogg_packets(data)
    assert len(pkts) == 3 and pkts[0][:5] == b"\x7fFLAC"


def test_ogg_flac_page_crc_refuses():
    from mcp_ocr_server_spark.functions.flac import (
        decode_ogg_flac,
        encode_ogg_flac,
    )

    data = bytearray(encode_ogg_flac(_sig(1000), 8000))
    data[-3] ^= 0x01  # payload bit flip -> page CRC catches it
    with pytest.raises(ValueError, match="CRC"):
        decode_ogg_flac(bytes(data))


def test_ogg_flac_unknown_header_count_skips_to_frame_sync():
    from mcp_ocr_server_spark.functions.flac import (
        decode_ogg_flac_pcm,
        encode_ogg_flac,
        ogg_packets,
    )

    pcm = _sig(800)
    data = bytearray(encode_ogg_flac(pcm, 8000))
    # zero the ident packet's header-count field (offset: first page
    # body starts at 27 + n_segs; count is bytes 7-8 of the packet)
    n_segs = data[26]
    at = 27 + n_segs + 7
    assert data[at:at + 2] == b"\x00\x01"
    data[at:at + 2] = b"\x00\x00"
    # CRC of page 0 must be rewritten for the tamper to parse
    import struct

    from mcp_ocr_server_spark.functions.flac import _ogg_crc

    body_len = sum(data[27:27 + n_segs])
    page = bytearray(data[: 27 + n_segs + body_len])
    page[22:26] = b"\x00\x00\x00\x00"
    data[22:26] = struct.pack("<I", _ogg_crc(bytes(page)))
    out, rate, _bps = decode_ogg_flac_pcm(bytes(data))
    assert (out.reshape(-1) == pcm).all()
    assert len(ogg_packets(bytes(data))) == 3


def test_ogg_flac_truncated_stream_refuses():
    from mcp_ocr_server_spark.functions.flac import (
        decode_ogg_flac,
        encode_ogg_flac,
    )

    data = encode_ogg_flac(_sig(3000), 8000, max_body=510)
    with pytest.raises(ValueError):
        decode_ogg_flac(data[: len(data) - 40])


def test_ogg_flac_sniff_and_tags():
    from mcp_ocr_server_spark.functions.audio_meta import (
        audio_tags,
        sniff_audio,
    )
    from mcp_ocr_server_spark.functions.flac import encode_ogg_flac

    pcm = _sig(2400)
    data = encode_ogg_flac(
        pcm, 8000, tags={"title": "T", "artist": "A"}, max_body=510
    )
    info = sniff_audio(data)
    assert info["format"] == "ogg" and info["codec"] == "flac_16bit"
    assert info["sample_rate"] == 8000 and info["channels"] == 1
    assert abs(info["duration_s"] - 2400 / 8000) < 1e-9
    assert info["pcm_md5"]  # STREAMINFO md5 rides through the mapping
    t = audio_tags(data)
    assert t["format"] == "ogg" and t["n_tags"] == 2
    assert t["title"] == "T" and t["artist"] == "A"


def test_corpus_ogg_flac_clips_decode_for_real():
    from mcp_ocr_server_spark.functions.multimodal import (
        audio_feature_row,
    )
    from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
    from mcp_ocr_server_spark.sources.synthetic import (
        N_AUDIO_CLIPS,
        audio_item,
    )

    seen = 0
    for j in range(N_AUDIO_CLIPS):
        ref, data, kind = audio_item(FLAGSHIP_CORPUS, j)
        if kind != "ogg_flac":
            continue
        seen += 1
        row = audio_feature_row(ref, data)
        assert row["error"] is None and row["n_samples"] > 0, (j, row)
        assert 0.0 < row["rms"] < row["peak"] <= 1.0, (j, row)
    assert seen >= 4
