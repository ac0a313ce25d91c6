"""Pure-stdlib AVI (RIFF) container codec — the video analogue of
functions/pdf.py: no external codec, real container-level work.

What is REAL here: RIFF chunk walking, 'movi' frame extraction
(including 'rec ' grouping), header metadata (dims / fps / frame
count), even-byte padding, and loud refusal on truncated or non-AVI
input.  What is NOT attempted: decompressing codec bitstreams
(H.264/VP9/MJPEG entropy decode) — frames come back as the container
stored them.  When the frames are PNG payloads (the synthetic corpus;
also a real archival pattern for lossless screen capture) the existing
imaging/png.py codec decodes their PIXELS for real too, making the
frame-sample -> decode -> feature chain fully real in this sandbox.

Reference parity note: the reference server has no video path at all
(mcp-ocr-server handles single images); this module exists for the
mandated training-data-pipeline multimodal surface (brief: "implement
decode / feature-extract / frame-sample ... make the Spark-side
plumbing real and tested").

Layout written/accepted (the classic AVI 1.0 shape every muxer emits):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        avih <MainAVIHeader, 56 bytes>
        LIST 'strl'
          strh <AVIStreamHeader, 56 bytes, fccType='vids'>
          strf <BITMAPINFOHEADER, 40 bytes>
      LIST 'movi'
        00dc <frame bytes> [pad to even]  (or 00db / 'rec ' groups)
        ...
      idx1 <16 bytes per frame>
"""

from __future__ import annotations

import struct

_AVIH_FMT = "<IIIIIIIIII4I"  # MainAVIHeader (56 bytes)
_STRH_FMT = "<4s4sIHHIIIIIIIi4H"  # AVIStreamHeader (56 bytes, +rcFrame)
_BMIH_FMT = "<IiiHH4sIiiII"  # BITMAPINFOHEADER (40 bytes)


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: id + size + payload + pad byte if odd (the pad
    is NOT counted in size — the rule half-broken muxers get wrong)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def encode_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    fourcc: bytes = b"MJPG",
) -> bytes:
    """Mux opaque frame payloads into a spec-shaped AVI.  Frame bytes
    are stored verbatim ('00dc' chunks) — the muxer does not know or
    care about the codec, exactly like a real container."""
    if fps < 1:
        raise ValueError("fps must be >= 1")
    avih = struct.pack(
        _AVIH_FMT,
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec (advisory)
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        _STRH_FMT,
        b"vids", fourcc,
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        1, fps,  # dwScale / dwRate => fps frames per second
        0, len(frames),  # dwStart, dwLength (in frames)
        0, 0,  # dwSuggestedBufferSize, dwQuality
        0,  # dwSampleSize
        0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
    )
    strf = struct.pack(
        _BMIH_FMT,
        40, width, height, 1, 24, fourcc, 0, 0, 0, 0, 0,
    )
    strl = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh)
                  + _chunk(b"strf", strf))
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    idx_entries = []
    for f in frames:
        # idx1 offsets point at the frame's ckid, measured from the
        # 'movi' fourcc position — so the FIRST frame's offset is 4
        # (fourcc itself is bytes 0-3), the convention index-seeking
        # demuxers (ffmpeg's odml path) expect
        idx_entries.append((len(movi_body), len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, size)
            for off, size in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    [start, end); raise ValueError on truncation (a chunk that claims
    more bytes than remain) instead of silently yielding less."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("avi: truncated chunk header")
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError(
                f"avi: chunk {fourcc!r} claims {size} bytes,"
                f" {end - payload} remain"
            )
        yield fourcc, payload, size
        pos = payload + size + (size % 2)  # pad to even


def _require_avi(data: bytes) -> int:
    """Validate the RIFF/'AVI ' envelope; return the payload end."""
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("avi: not a RIFF container")
    if data[8:12] != b"AVI ":
        raise ValueError(
            f"avi: RIFF form is {data[8:12]!r}, not 'AVI '"
        )
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    if 8 + riff_size > len(data):
        raise ValueError(
            f"avi: RIFF claims {riff_size} bytes, file has {len(data) - 8}"
        )
    return end


def _movi_frames(data: bytes, start: int, end: int, out: list) -> None:
    """Collect frame chunks inside a movi/rec list body (recursing into
    'rec ' groups, which interleaved AVIs use for cache alignment)."""
    for fourcc, payload, size in _walk(data, start, end):
        if fourcc == b"LIST" and data[payload:payload + 4] == b"rec ":
            _movi_frames(data, payload + 4, payload + size, out)
        elif fourcc[2:4] in (b"dc", b"db"):  # compressed / raw video
            out.append(bytes(data[payload:payload + size]))


def parse_avi_frames(data: bytes) -> list[bytes]:
    """All video frame payloads, in stream order.  Loud ValueError on
    truncated/foreign input (the refuse-loudly principle pdf.py set)."""
    end = _require_avi(data)
    frames: list[bytes] = []
    seen_movi = False
    for fourcc, payload, size in _walk(data, 12, end):
        if fourcc == b"LIST" and data[payload:payload + 4] == b"movi":
            seen_movi = True
            _movi_frames(data, payload + 4, payload + size, frames)
    if not seen_movi:
        raise ValueError("avi: no 'movi' list (header-only file?)")
    return frames


def avi_metadata(data: bytes) -> dict:
    """Header metadata: dict(width, height, fps, n_frames, codec).
    fps comes from strh dwRate/dwScale (the authoritative pair);
    n_frames from the main header."""
    end = _require_avi(data)
    meta: dict = {}
    for fourcc, payload, size in _walk(data, 12, end):
        if fourcc != b"LIST" or data[payload:payload + 4] != b"hdrl":
            continue
        for f2, p2, s2 in _walk(data, payload + 4, payload + size):
            if f2 == b"avih" and s2 >= 56:
                vals = struct.unpack_from(_AVIH_FMT, data, p2)
                meta.update(
                    n_frames=vals[4], width=vals[8], height=vals[9]
                )
            elif f2 == b"LIST" and data[p2:p2 + 4] == b"strl":
                for f3, p3, s3 in _walk(data, p2 + 4, p2 + s2):
                    if f3 == b"strh" and s3 >= 56:
                        sv = struct.unpack_from(_STRH_FMT, data, p3)
                        if sv[0] == b"vids":
                            meta["codec"] = sv[1].decode(
                                "ascii", "replace"
                            )
                            if sv[6]:  # dwScale
                                meta["fps"] = sv[7] / sv[6]
    if not meta:
        raise ValueError("avi: no 'hdrl' header list")
    return meta
