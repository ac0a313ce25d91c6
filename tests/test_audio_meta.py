"""Audio container sniffer (functions/audio_meta.py) + the
audio_inventory stage over the deterministic multi-format corpus."""

import io
import struct
import wave

import pytest

from mcp_ocr_server_spark.functions.audio_meta import sniff_audio
from mcp_ocr_server_spark.sources import synthetic as S


def _wav(rate=8000, channels=2, n_frames=1600, width=2):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(b"\x00" * (n_frames * channels * width))
    return buf.getvalue()


def test_sniff_wav_exact():
    m = sniff_audio(_wav())
    assert m == dict(format="wav", codec="pcm_s16le", sample_rate=8000,
                     channels=2, duration_s=0.2, pcm_md5=None)


def test_sniff_flac_streaminfo_bitfields():
    """The 20/3/5/36-bit packed STREAMINFO fields and the embedded
    decoded-PCM md5 must come out exactly."""
    md5 = bytes(range(16))
    data = S._flac_bytes(96000, 2, 24, 96000 * 7, md5)
    m = sniff_audio(data)
    assert m == dict(format="flac", codec="flac_24bit",
                     sample_rate=96000, channels=2, duration_s=7.0,
                     pcm_md5=md5.hex())


def test_sniff_ogg_vorbis_and_opus_durations():
    """Vorbis duration = last granule / input rate; opus granule is
    ALWAYS 48 kHz units (RFC 7845) regardless of the input rate."""
    body = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
            + struct.pack("<I", 44100) + b"\x00" * 9)
    vorb = S._ogg_page(0, body, 0) + S._ogg_page(88200, b"\x00" * 9, 1)
    m = sniff_audio(vorb)
    assert (m["codec"], m["sample_rate"], m["duration_s"]) == (
        "vorbis", 44100, 2.0)

    body = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
            + struct.pack("<I", 16000) + b"\x00" * 3)
    opus = S._ogg_page(0, body, 0) + S._ogg_page(96000, b"\x00" * 9, 1)
    m = sniff_audio(opus)
    # granule is 48 kHz units regardless of the 16 kHz input rate, and
    # RFC 7845 subtracts the OpusHead pre-skip from the PCM duration
    assert (m["codec"], m["sample_rate"]) == ("opus", 16000)
    assert m["duration_s"] == (96000 - 312) / 48000


def test_sniff_mp3_header_tables_and_id3_skip():
    data = S._mp3_bytes(38)  # 38 frames x 1152 samples @ 44100
    m = sniff_audio(data)
    assert (m["codec"], m["sample_rate"], m["channels"]) == (
        "mp3v1", 44100, 2)
    # exact duration from the frame walk, not a byte-rate estimate
    assert m["duration_s"] == 38 * 1152 / 44100
    # ID3v2-tagged: 100-byte syncsafe tag, then the same frames
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100
    assert sniff_audio(tag + data)["duration_s"] == 38 * 1152 / 44100


def test_sniff_mp3_duration_sources():
    # Xing VBR header wins over the walk (same answer on this stream)
    xing = S._mp3_bytes(25, xing=True)
    assert sniff_audio(xing)["duration_s"] == 25 * 1152 / 44100
    # unwalkable stream (sync + garbage body) falls back to the CBR
    # byte-rate estimate — never an error, never silent zero
    broken = b"\xff\xfb\x90\x00" + b"\x01" * 5000
    est = sniff_audio(broken)["duration_s"]
    assert abs(est - 5004 * 8 / 128000) < 1e-9


def test_audio_tags_per_format():
    from mcp_ocr_server_spark.functions.audio_meta import audio_tags

    tags = dict(title="T1", artist="A1", album="B1")
    flac = S._flac_bytes(44100, 2, 16, 44100, bytes(16), tags=tags)
    got = audio_tags(flac)
    assert (got["title"], got["artist"], got["album"]) == ("T1", "A1", "B1")
    assert got["n_tags"] == 3 and got["vendor"]
    # untagged flac: absence is data, not an error
    bare = audio_tags(S._flac_bytes(44100, 2, 16, 44100, bytes(16)))
    assert bare["n_tags"] == 0 and bare["title"] is None
    mp3 = S._mp3_bytes(10, tags=dict(title="M", artist="N"))
    got = audio_tags(mp3)
    assert (got["title"], got["artist"], got["n_tags"]) == ("M", "N", 2)
    import numpy as np

    wav = S._wav_bytes(np.zeros(50, "<i2"), 8000, tags=dict(album="W"))
    assert audio_tags(wav)["album"] == "W"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown container"):
        audio_tags(b"\x00\x01garbage bytes")


def test_sniff_adts_frame_walk():
    """ADTS AAC: exact block-counted duration through both header
    layouts (plain 7-byte and CRC 9-byte), raw-data-block
    multiplicity, profile names, and the layer-bit split from mp3;
    mid-stream parameter changes and truncation refuse."""
    m = sniff_audio(S._adts_bytes(20, rate_idx=8, channels=1))
    assert (m["format"], m["codec"]) == ("adts", "aac_lc")
    assert m["sample_rate"] == 16000 and m["channels"] == 1
    assert m["duration_s"] == 20 * 1024 / 16000
    # CRC header layout (9 bytes) walks to the same duration
    c = sniff_audio(S._adts_bytes(20, rate_idx=8, channels=1, crc=True))
    assert c["duration_s"] == m["duration_s"]
    # two raw data blocks per frame double the duration
    d = sniff_audio(S._adts_bytes(20, rate_idx=8, channels=1, rdb=1))
    assert d["duration_s"] == 2 * m["duration_s"]
    # Main profile, 44.1 kHz stereo
    p = sniff_audio(S._adts_bytes(3, rate_idx=4, channels=2, profile=0))
    assert (p["codec"], p["sample_rate"], p["channels"]) == (
        "aac_main", 44100, 2)
    # mp3 sync (layer bits non-zero) does NOT hit the adts branch
    mp3 = sniff_audio(S._mp3_bytes(5))
    assert mp3["format"] == "mp3"
    # an ID3v2 block fronting ADTS re-dispatches past the tag
    tagged = S._mp3_bytes(3, tags={"title": "T"})
    id3 = tagged[: tagged.find(b"\xff\xfb")]
    t = sniff_audio(id3 + S._adts_bytes(5))
    assert t["format"] == "adts" and t["duration_s"] == 5 * 1024 / 16000
    # refusals: truncated tail frame, mid-stream rate change,
    # reserved rate index, PCE channel config
    blob = S._adts_bytes(3)
    with pytest.raises(ValueError, match="truncated"):
        sniff_audio(blob[:-10])
    mixed = blob + S._adts_bytes(1, rate_idx=4)
    with pytest.raises(ValueError, match="change mid-file"):
        sniff_audio(mixed)
    with pytest.raises(ValueError, match="reserved"):
        sniff_audio(S._adts_bytes(1, rate_idx=13))
    with pytest.raises(ValueError, match="PCE"):
        sniff_audio(S._adts_bytes(1, channels=0))


def test_sniff_m4a_box_tables():
    """ISO-BMFF .m4a: rate/channels from the AudioSampleEntry, exact
    mdhd duration; a video-only mp4 refuses with 'no audio track'."""
    from mcp_ocr_server_spark.functions.mp4 import encode_m4a, encode_mp4

    m = sniff_audio(encode_m4a(2.5, rate=22050, channels=1))
    assert (m["format"], m["codec"]) == ("m4a", "mp4a")
    assert m["sample_rate"] == 22050 and m["channels"] == 1
    assert m["duration_s"] == 2.5
    with pytest.raises(ValueError, match="no audio"):
        sniff_audio(encode_mp4(1.0))
    # a truncated moov refuses loudly, never silent zeros
    full = encode_m4a(1.0)
    with pytest.raises(ValueError):
        sniff_audio(full[:60])


def test_m4a_ilst_tags_and_adts_tag_labels():
    """iTunes-style ilst atoms resolve through moov/udta/meta (the
    FULL-box offset); untagged m4a is n_tags=0 data; ADTS payloads —
    bare or ID3-fronted — label as adts, not mp3."""
    from mcp_ocr_server_spark.functions.audio_meta import audio_tags
    from mcp_ocr_server_spark.functions.mp4 import encode_m4a

    t = audio_tags(encode_m4a(
        1.0, tags={"title": "My Song", "artist": "Band", "album": "LP"}
    ))
    assert (t["format"], t["title"], t["artist"], t["album"],
            t["n_tags"]) == ("m4a", "My Song", "Band", "LP", 3)
    bare = audio_tags(encode_m4a(1.0))
    assert bare["format"] == "m4a" and bare["n_tags"] == 0
    assert audio_tags(S._adts_bytes(3))["format"] == "adts"
    tagged = S._mp3_bytes(3, tags={"title": "T"})
    id3 = tagged[: tagged.find(b"\xff\xfb")]
    r = audio_tags(id3 + S._adts_bytes(3))
    assert r["format"] == "adts" and r["title"] == "T"
    assert audio_tags(tagged)["format"] == "mp3"


def test_sniff_refuses_unknown_and_truncated():
    with pytest.raises(ValueError, match="unknown audio container"):
        sniff_audio(b"\x00\x01\x02\x03garbage")
    with pytest.raises(ValueError, match="truncated"):
        sniff_audio(S._flac_bytes(44100, 2, 16, 44100, bytes(16))[:20])
    with pytest.raises(ValueError, match="unknown codec"):
        sniff_audio(S._ogg_page(0, b"\x00notacodec\x00\x00\x00\x00", 0))
    with pytest.raises(ValueError, match="no frame sync"):
        sniff_audio(b"ID3\x04\x00\x00" + bytes([0, 0, 0, 4])
                    + b"\x00" * 20)
    # the contract is ValueError for EVERY malformed input — including
    # the paths where the stdlib/struct layer raises something else
    with pytest.raises(ValueError, match="wav"):
        sniff_audio(_wav()[:30])  # RIFF/WAVE magic, chopped chunks
    with pytest.raises(ValueError, match="truncated OpusHead"):
        sniff_audio(S._ogg_page(0, b"OpusHead" + bytes([1, 1]) + b"\x00"
                                * 3, 0))  # 13-byte body, rate cut off


def test_sniff_ogg_bounds_id_packet_to_first_page_body():
    """The id packet slice must be bounded by the first page's summed
    lacing values: a malformed first page whose body is under 16 bytes
    followed by another page must refuse loudly, not silently read the
    NEXT page's header bytes as channels/sample_rate (ADVICE r4)."""
    # 12-byte body: valid '\x01vorbis' prefix but the rate field is cut
    short = b"\x01vorbis" + struct.pack("<I", 0)
    data = S._ogg_page(0, short, 0) + S._ogg_page(88200, b"\x00" * 9, 1)
    with pytest.raises(ValueError, match="truncated vorbis id header"):
        sniff_audio(data)
    # same shape, non-codec prefix: unknown, never next-page garbage
    data = S._ogg_page(0, b"\x00nothere", 0) + S._ogg_page(
        88200, b"\x00" * 9, 1)
    with pytest.raises(ValueError, match="unknown codec"):
        sniff_audio(data)


def test_sniff_ogg_granule_ignores_capture_pattern_in_payload():
    """Ogg does NOT escape 'OggS' inside packet bodies; the duration
    walk must follow page lengths forward, not scan backwards for the
    magic — a payload containing 'OggS' + garbage after the true last
    page header must not corrupt the granule."""
    body = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
            + struct.pack("<I", 44100) + b"\x00" * 9)
    # second (last) page's PAYLOAD embeds a fake capture pattern
    # followed by a huge little-endian 'granule'
    trap = b"OggS" + struct.pack("<q", 10**15) + b"\x00" * 10
    data = S._ogg_page(0, body, 0) + S._ogg_page(88200, trap, 1)
    m = sniff_audio(data)
    assert m["duration_s"] == 2.0  # 88200 / 44100, not 10^15 / 44100


def test_audio_inventory_stage_matches_golden(spark):
    """The Spark stage over the deterministic corpus equals the
    committed golden row-for-row (same file the registry oracle
    checks); error classes land on exactly the truncated/garbage
    clips."""
    import pandas as pd

    from mcp_ocr_server_spark.functions.multimodal import audio_inventory

    out = {r.media_ref: r for r in audio_inventory(
        S.sniff_df(spark, S.CorpusConfig(n_docs=1))).collect()}
    golden = pd.read_parquet("fixtures/audio_inventory.parquet")
    assert len(out) == len(golden) == S.N_SNIFF_CLIPS
    for _, g in golden.iterrows():
        r = out[g["media_ref"]]
        assert (r.format, r.codec) == (
            None if pd.isna(g["format"]) else g["format"],
            None if pd.isna(g["codec"]) else g["codec"],
        )
        if g["kind"] in ("flac_truncated", "garbage"):
            assert r.error is not None
        else:
            assert r.error is None and r.sample_rate == g["sample_rate"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_sniff_exception_contract_fuzz(data):
    """Property: for ARBITRARY bytes, sniff_audio either returns a
    well-formed dict or raises ValueError — never struct.error,
    wave.Error, EOFError, IndexError (the exception-contract leak
    class the round-4 review caught on hand-built inputs)."""
    try:
        m = sniff_audio(data)
    except ValueError:
        return
    assert set(m) == {"format", "codec", "sample_rate", "channels",
                      "duration_s", "pcm_md5"}
    assert m["sample_rate"] > 0 and m["channels"] >= 1


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_sniff_exception_contract_fuzz_magic_prefixed(data):
    """Same property, but force each container's magic so the fuzz
    actually reaches the per-format parsers instead of dying at the
    magic dispatch."""
    for magic in (b"RIFF" + data[:4] + b"WAVE", b"fLaC", b"OggS",
                  b"ID3", b"\xff\xfb", b"\xff\xf1", b"\xff\xf0"):
        payload = magic + data
        try:
            m = sniff_audio(payload)
        except ValueError:
            continue
        # success must mean WELL-FORMED metadata — no silent zeros
        # (the rate-0 WAV hole a review caught sailed through when
        # this branch asserted nothing)
        assert m["sample_rate"] > 0 and m["channels"] >= 1, m
        assert m["format"] in ("wav", "flac", "ogg", "mp3", "adts")
