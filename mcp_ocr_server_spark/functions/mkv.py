"""Matroska / WebM container metadata — pure stdlib EBML walk.

The video-side twin of the mp4 box walk (functions/mp4.py): WebM is
the other container a crawl's video payloads actually arrive in, and
its metadata layer is pure integer/float structure — no codec needed.
Re-derived from the public EBML (RFC 8794) and Matroska specs.

Supported: EBML header DocType sniff (webm / matroska), Segment >
Info (TimestampScale + Duration -> seconds) and Segment > Tracks >
TrackEntry (first video track's CodecID + PixelWidth/PixelHeight;
falls back to the first audio track's CodecID for audio-only files),
unknown-size Segments (the streaming shape — size all-ones runs to
end of input), and the BLOCK layer: Segment > Cluster > Timestamp +
SimpleBlock / BlockGroup{Block, ReferenceBlock} demux
(parse_mkv_blocks / parse_mkv_frames) — track vint, signed 16-bit
relative timestamp, keyframe flag (SimpleBlock bit 0x80; a
BlockGroup's Block is a keyframe iff no ReferenceBlock sibling).
Laced blocks (Xiph/fixed/EBML lacing, flag bits 0x06) refuse by
name.  Decoding the frame PAYLOADS themselves (VP8/VP9) remains a
float codec backend; payloads whose codec the repo carries (Matroska
V_MJPEG → imaging/jpeg.py) decode for real downstream, exactly like
MJPEG-in-AVI/mp4.

The writer emits a deterministic minimal-but-conformant file (EBML
header, Segment{Info, Tracks}, optional Cluster of SimpleBlocks) so
every parser path is pinned by in-repo streams.
"""

from __future__ import annotations

import struct

EBML_MAGIC = b"\x1aE\xdf\xa3"

# element IDs (marker bit kept, as they appear on the wire)
_ID_EBML = 0x1A45DFA3
_ID_DOCTYPE = 0x4282
_ID_SEGMENT = 0x18538067
_ID_INFO = 0x1549A966
_ID_TIMESTAMP_SCALE = 0x2AD7B1
_ID_DURATION = 0x4489
_ID_TRACKS = 0x1654AE6B
_ID_TRACK_ENTRY = 0xAE
_ID_TRACK_TYPE = 0x83
_ID_CODEC_ID = 0x86
_ID_VIDEO = 0xE0
_ID_PIXEL_WIDTH = 0xB0
_ID_PIXEL_HEIGHT = 0xBA
_ID_AUDIO = 0xE1
_ID_SAMPLING_FREQ = 0xB5
_ID_CHANNELS = 0x9F
_ID_TRACK_NUMBER = 0xD7
_ID_CLUSTER = 0x1F43B675
_ID_CLUSTER_TS = 0xE7
_ID_SIMPLEBLOCK = 0xA3
_ID_BLOCKGROUP = 0xA0
_ID_BLOCK = 0xA1
_ID_REFERENCEBLOCK = 0xFB


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int, int]:
    """(value, new_pos, length).  EBML variable-size integer: the
    first byte's leading-zero count selects the length; element IDs
    keep the marker bit, sizes clear it."""
    if pos >= len(data):
        raise ValueError("mkv: truncated vint")
    first = data[pos]
    if first == 0:
        raise ValueError("mkv: vint longer than 8 bytes")
    length = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        length += 1
    if pos + length > len(data):
        raise ValueError("mkv: truncated vint")
    out = first if keep_marker else (first & (mask - 1))
    for i in range(1, length):
        out = (out << 8) | data[pos + i]
    return out, pos + length, length


def _walk(data: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end) over one level.
    Unknown-size elements (size vint all ones) run to the level's
    end — the streaming idiom Matroska allows for Segment/Cluster."""
    while pos < end:
        eid, pos, _ = _read_vint(data, pos, keep_marker=True)
        size, pos, slen = _read_vint(data, pos, keep_marker=False)
        if size == (1 << (7 * slen)) - 1:  # unknown size
            pend = end
        else:
            pend = pos + size
            if pend > end:
                raise ValueError("mkv: element overruns parent")
        yield eid, pos, pend
        pos = pend


def _uint(data: bytes, start: int, end: int) -> int:
    if end - start > 8:
        raise ValueError("mkv: oversized uint element")
    return int.from_bytes(data[start:end], "big")


def _float(data: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", data[start:end])[0]
    if n == 8:
        return struct.unpack(">d", data[start:end])[0]
    raise ValueError(f"mkv: float element of {n} bytes")


def mkv_metadata(data: bytes) -> dict:
    """EBML bytes -> dict(container, codec, width, height, duration_s,
    sample_rate, channels).  container comes from DocType; refusals
    (bad magic, non-webm/matroska DocType, truncation) raise
    ValueError naming what was seen."""
    if data[:4] != EBML_MAGIC:
        raise ValueError(f"mkv: bad EBML magic {data[:4]!r}")
    doctype = None
    out = dict(container=None, codec=None, width=None, height=None,
               duration_s=None, sample_rate=None, channels=None)
    scale = 1_000_000  # TimestampScale default: 1 ms in ns
    duration_ticks = None
    video_codec = audio_codec = None
    for eid, ps, pe in _walk(data, 0, len(data)):
        if eid == _ID_EBML:
            for cid, cs, ce in _walk(data, ps, pe):
                if cid == _ID_DOCTYPE:
                    doctype = data[cs:ce].split(b"\x00")[0].decode(
                        "ascii", "replace"
                    )
        elif eid == _ID_SEGMENT:
            for cid, cs, ce in _walk(data, ps, pe):
                if cid == _ID_INFO:
                    for gid, gs, ge in _walk(data, cs, ce):
                        if gid == _ID_TIMESTAMP_SCALE:
                            scale = _uint(data, gs, ge)
                        elif gid == _ID_DURATION:
                            duration_ticks = _float(data, gs, ge)
                elif cid == _ID_TRACKS:
                    for tid, ts, te in _walk(data, cs, ce):
                        if tid != _ID_TRACK_ENTRY:
                            continue
                        ttype = codec = None
                        for gid, gs, ge in _walk(data, ts, te):
                            if gid == _ID_TRACK_TYPE:
                                ttype = _uint(data, gs, ge)
                            elif gid == _ID_CODEC_ID:
                                codec = data[gs:ge].decode(
                                    "ascii", "replace"
                                )
                            elif gid == _ID_VIDEO:
                                for vid, vs, ve in _walk(data, gs, ge):
                                    if vid == _ID_PIXEL_WIDTH:
                                        out["width"] = _uint(data, vs, ve)
                                    elif vid == _ID_PIXEL_HEIGHT:
                                        out["height"] = _uint(data, vs, ve)
                            elif gid == _ID_AUDIO:
                                for aid, as_, ae in _walk(data, gs, ge):
                                    if aid == _ID_SAMPLING_FREQ:
                                        out["sample_rate"] = _float(
                                            data, as_, ae
                                        )
                                    elif aid == _ID_CHANNELS:
                                        out["channels"] = _uint(
                                            data, as_, ae
                                        )
                        if ttype == 1 and video_codec is None:
                            video_codec = codec
                        elif ttype == 2 and audio_codec is None:
                            audio_codec = codec
    if doctype not in ("webm", "matroska"):
        raise ValueError(f"mkv: DocType {doctype!r} is not webm/matroska")
    out["container"] = doctype
    out["codec"] = video_codec or audio_codec
    if duration_ticks is not None:
        if scale <= 0:
            raise ValueError("mkv: TimestampScale is 0")
        out["duration_s"] = duration_ticks * scale / 1e9
    return out


def _parse_block(
    data: bytes, ps: int, pe: int, cluster_ts: int,
    keyframe: bool | None,
) -> dict:
    """One SimpleBlock/Block payload -> block dict.  keyframe=None
    means 'from the flags byte' (SimpleBlock); a bool means the
    BlockGroup already decided (ReferenceBlock presence)."""
    track, pos, _ = _read_vint(data, ps, keep_marker=False)
    if pos + 3 > pe:
        raise ValueError("mkv: truncated block header")
    rel = struct.unpack(">h", data[pos:pos + 2])[0]
    flags = data[pos + 2]
    if flags & 0x06:
        raise ValueError("mkv: laced blocks unsupported")
    return dict(
        track=track,
        ticks=cluster_ts + rel,
        keyframe=bool(flags & 0x80) if keyframe is None else keyframe,
        payload=data[pos + 3:pe],
    )


def parse_mkv_blocks(data: bytes) -> list[dict]:
    """Every data block of a Matroska/WebM file, demux order —
    dict(track, time_s, keyframe, payload).  Raises ValueError for
    non-EBML bytes, foreign DocTypes, laced blocks, and structural
    truncation — the same refuse-loudly contract as mkv_metadata."""
    if data[:4] != EBML_MAGIC:
        raise ValueError(f"mkv: bad EBML magic {data[:4]!r}")
    doctype = None
    scale = 1_000_000
    blocks: list[dict] = []
    for eid, ps, pe in _walk(data, 0, len(data)):
        if eid == _ID_EBML:
            for cid, cs, ce in _walk(data, ps, pe):
                if cid == _ID_DOCTYPE:
                    doctype = data[cs:ce].split(b"\x00")[0].decode(
                        "ascii", "replace"
                    )
        elif eid == _ID_SEGMENT:
            for cid, cs, ce in _walk(data, ps, pe):
                if cid == _ID_INFO:
                    for gid, gs, ge in _walk(data, cs, ce):
                        if gid == _ID_TIMESTAMP_SCALE:
                            scale = _uint(data, gs, ge)
                elif cid == _ID_CLUSTER:
                    cts = 0
                    for gid, gs, ge in _walk(data, cs, ce):
                        if gid == _ID_CLUSTER_TS:
                            cts = _uint(data, gs, ge)
                        elif gid == _ID_SIMPLEBLOCK:
                            blocks.append(_parse_block(
                                data, gs, ge, cts, None
                            ))
                        elif gid == _ID_BLOCKGROUP:
                            blk = None
                            has_ref = False
                            for bid, bs, be in _walk(data, gs, ge):
                                if bid == _ID_BLOCK:
                                    blk = (bs, be)
                                elif bid == _ID_REFERENCEBLOCK:
                                    has_ref = True
                            if blk is not None:
                                blocks.append(_parse_block(
                                    data, blk[0], blk[1], cts,
                                    not has_ref,
                                ))
    if doctype not in ("webm", "matroska"):
        raise ValueError(
            f"mkv: DocType {doctype!r} is not webm/matroska"
        )
    if scale <= 0:
        raise ValueError("mkv: TimestampScale is 0")
    for b in blocks:
        b["time_s"] = b.pop("ticks") * scale / 1e9
    return blocks


def first_video_track(data: bytes) -> int | None:
    """TrackNumber of the first video TrackEntry, None if absent."""
    for eid, ps, pe in _walk(data, 0, len(data)):
        if eid != _ID_SEGMENT:
            continue
        for cid, cs, ce in _walk(data, ps, pe):
            if cid != _ID_TRACKS:
                continue
            for tid, ts, te in _walk(data, cs, ce):
                if tid != _ID_TRACK_ENTRY:
                    continue
                ttype = num = None
                for gid, gs, ge in _walk(data, ts, te):
                    if gid == _ID_TRACK_TYPE:
                        ttype = _uint(data, gs, ge)
                    elif gid == _ID_TRACK_NUMBER:
                        num = _uint(data, gs, ge)
                if ttype == 1:
                    return num
    return None


def parse_mkv_frames(data: bytes) -> list[bytes]:
    """Frame payloads of the first VIDEO track, demux order — the
    Matroska twin of parse_mp4_frames/parse_avi_frames.  A file with
    a video track but no clusters yields []; a file with clusters
    whose blocks all belong to other tracks yields [] too."""
    vtrack = first_video_track(data)
    blocks = parse_mkv_blocks(data)
    if vtrack is None:
        raise ValueError("mkv: no video track")
    return [b["payload"] for b in blocks if b["track"] == vtrack]


# ---------------------------------------------------------------------------
# deterministic writer


def _enc_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            b = n | (1 << (7 * length))
            return b.to_bytes(length, "big")
    raise ValueError("mkv: size too large")


def _el(eid: int, payload: bytes) -> bytes:
    nid = max(1, (eid.bit_length() + 7) // 8)
    return eid.to_bytes(nid, "big") + _enc_size(len(payload)) + payload


def _uint_el(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def encode_simpleblock(
    track: int, rel_ts: int, payload: bytes, keyframe: bool = True,
    lacing_flags: int = 0,
) -> bytes:
    """One SimpleBlock element (track vint, int16 relative timestamp,
    flags, payload).  lacing_flags is test plumbing for the refusal
    path."""
    flags = (0x80 if keyframe else 0) | (lacing_flags & 0x06)
    body = (
        _enc_size(track) + struct.pack(">h", rel_ts)
        + bytes([flags]) + payload
    )
    return _el(_ID_SIMPLEBLOCK, body)


def encode_mkv(
    doctype: str = "webm",
    codec: str = "V_VP9",
    width: int = 640,
    height: int = 360,
    duration_s: float | None = 4.0,
    timestamp_scale: int = 1_000_000,
    cluster: bytes = b"",
    audio: "tuple[str, float, int] | None" = None,
    frames: "list[tuple[int, bool, bytes]] | None" = None,
) -> bytes:
    """Minimal conformant Matroska/WebM: EBML header, Segment{Info,
    Tracks[, Cluster]}.  audio = (codec_id, sampling_hz, channels)
    adds an audio track.  frames = [(rel_ts_ticks, keyframe, payload)]
    builds a Cluster of SimpleBlocks on the video track (track 1);
    `cluster` passes raw cluster bytes instead (refusal-path tests).
    Deterministic byte-identical output."""
    ebml = _el(_ID_EBML, _el(_ID_DOCTYPE, doctype.encode()))
    info = _uint_el(_ID_TIMESTAMP_SCALE, timestamp_scale)
    if duration_s is not None:
        ticks = duration_s * 1e9 / timestamp_scale
        info += _el(_ID_DURATION, struct.pack(">d", ticks))
    tracks = b""
    if codec:
        tracks += _el(
            _ID_TRACK_ENTRY,
            _uint_el(_ID_TRACK_NUMBER, 1)
            + _uint_el(_ID_TRACK_TYPE, 1)
            + _el(_ID_CODEC_ID, codec.encode())
            + _el(
                _ID_VIDEO,
                _uint_el(_ID_PIXEL_WIDTH, width)
                + _uint_el(_ID_PIXEL_HEIGHT, height),
            ),
        )
    if audio is not None:
        acodec, hz, ch = audio
        tracks += _el(
            _ID_TRACK_ENTRY,
            _uint_el(_ID_TRACK_NUMBER, 2)
            + _uint_el(_ID_TRACK_TYPE, 2)
            + _el(_ID_CODEC_ID, acodec.encode())
            + _el(
                _ID_AUDIO,
                _el(_ID_SAMPLING_FREQ, struct.pack(">f", hz))
                + _uint_el(_ID_CHANNELS, ch),
            ),
        )
    seg_payload = _el(_ID_INFO, info) + _el(_ID_TRACKS, tracks)
    if frames:
        body = _uint_el(_ID_CLUSTER_TS, 0)
        for rel_ts, key, payload in frames:
            body += encode_simpleblock(1, rel_ts, payload, key)
        seg_payload += _el(_ID_CLUSTER, body)
    if cluster:
        seg_payload += _el(_ID_CLUSTER, cluster)
    return ebml + _el(_ID_SEGMENT, seg_payload)
