"""Netpbm (PBM/PGM/PPM, P1-P6) decoder/encoder — pure stdlib + numpy.

Part of the input-format matrix the reference inherits from OpenCV's
`gocv.IMDecode` (preprocessor.go:64 — imdecode sniffs PBM/PGM/PPM/PNM
among its built-ins): a user of the reference can hand any Netpbm
payload to the OCR path, so this engine must too.

Spec: the classic Netpbm formats — a two-byte magic (P1..P7), ASCII
header tokens separated by whitespace with '#' comments running to
end-of-line, then either ASCII sample text (P1-P3) or big-endian raw
samples (P4-P6).  Supported here: bitmap (P1/P4, 1 = black per spec,
mapped to 0/255 gray with black=0), graymap (P2/P5), pixmap (P3/P6),
and PAM (P7 — depth 1-4 with opaque alpha).  16-bit maxval (>255)
samples are big-endian pairs, folded to the 8-bit chain by
round(v * 255 / maxval) — the same convert-down OpenCV's imdecode
applies under IMREAD_* (the reference's seam), so a 16-bit scanner
PNM behaves identically in both engines.

Decode returns uint8 HxW (PBM/PGM) or HxWx3 (PPM); encoders emit the
raw variants (P4/P5/P6) deterministically — byte-identical output for
identical input, the property the content-hash memoization relies on.
"""

from __future__ import annotations

import numpy as np

_RAW_MAGICS = {b"P4": "pbm", b"P5": "pgm", b"P6": "ppm"}
_ASCII_MAGICS = {b"P1": "pbm", b"P2": "pgm", b"P3": "ppm"}


def _tokens(data: bytes, pos: int, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ASCII integer tokens starting at
    pos, honoring '#' comments (to end-of-line).  Returns (values,
    position one byte PAST the single whitespace that terminates the
    last token) — that one byte is the header/raster separator for the
    raw formats."""
    vals: list[int] = []
    cur = b""
    while len(vals) < n:
        if pos >= len(data):
            raise ValueError("pnm: truncated header")
        c = data[pos : pos + 1]
        pos += 1
        if c == b"#":
            while pos < len(data) and data[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        if c.isspace():
            if cur:
                vals.append(int(cur))
                cur = b""
            continue
        if not c.isdigit():
            raise ValueError(f"pnm: bad header byte {c!r}")
        cur += c
    return vals, pos


def _decode_pam(data: bytes) -> np.ndarray:
    """PAM (P7): token-per-line header (WIDTH/HEIGHT/DEPTH/MAXVAL/
    TUPLTYPE/ENDHDR) then raw samples.  Depth 1 (gray) and 3 (RGB)
    decode directly; the _ALPHA variants are accepted only when the
    alpha plane is uniformly opaque (the repo-wide no-compositing
    rule); 16-bit maxval refuses loudly."""
    end = data.find(b"ENDHDR\n")
    if end < 0:
        raise ValueError("pam: missing ENDHDR")
    fields: dict[bytes, int] = {}
    for line in data[3:end].splitlines():
        line = line.split(b"#", 1)[0].strip()
        if not line or line.startswith(b"TUPLTYPE"):
            continue
        parts = line.split()
        if len(parts) != 2 or not parts[1].isdigit():
            raise ValueError(f"pam: bad header line {line!r}")
        fields[parts[0]] = int(parts[1])
    try:
        w, h, depth, maxval = (fields[k] for k in
                               (b"WIDTH", b"HEIGHT", b"DEPTH", b"MAXVAL"))
    except KeyError as exc:
        raise ValueError(f"pam: missing header field {exc}") from exc
    if w <= 0 or h <= 0:
        raise ValueError(f"pam: bad dimensions {w}x{h}")
    if maxval <= 0 or maxval > 65535:
        raise ValueError(f"pam: bad maxval {maxval}")
    if depth not in (1, 2, 3, 4):
        raise ValueError(f"pam: depth {depth} unsupported")
    pos = end + 7
    wide = maxval > 255  # 16-bit samples: big-endian pairs
    need = w * h * depth * (2 if wide else 1)
    if len(data) - pos < need:
        raise ValueError("pam: truncated raster")
    raw = np.frombuffer(data, np.uint8, count=need, offset=pos)
    if wide:
        px = raw.reshape(h, w, depth, 2).astype(np.uint32)
        px = (px[:, :, :, 0] << 8) | px[:, :, :, 1]
    else:
        px = raw.reshape(h, w, depth).copy()
    if depth in (2, 4):  # *_ALPHA tuple types
        if not (px[:, :, -1] == maxval).all():
            raise ValueError("pam: non-opaque alpha unsupported")
        px = px[:, :, :-1]
        depth -= 1
    if maxval != 255:
        px = np.round(px.astype(np.float64) * (255.0 / maxval))
    px = px.astype(np.uint8)
    return px.reshape(h, w) if depth == 1 else px


def decode_pnm(data: bytes) -> np.ndarray:
    """Netpbm bytes -> uint8 HxW (PBM/PGM) or HxWx3 (PPM); PAM (P7)
    at depths 1-4 (alpha must be opaque).

    Raises ValueError on truncation, non-Netpbm payloads, and
    maxval > 255 (16-bit) — callers map it to PREPROCESSING_FAILED /
    per-row error strings, fail-soft."""
    magic = data[:2]
    if magic == b"P7":
        return _decode_pam(data)
    if magic in _RAW_MAGICS:
        kind, raw = _RAW_MAGICS[magic], True
    elif magic in _ASCII_MAGICS:
        kind, raw = _ASCII_MAGICS[magic], False
    else:
        raise ValueError(f"pnm: bad magic {magic!r}")
    n_hdr = 2 if kind == "pbm" else 3  # bitmap has no maxval token
    hdr, pos = _tokens(data, 2, n_hdr)
    w, h = hdr[0], hdr[1]
    if w <= 0 or h <= 0:
        raise ValueError(f"pnm: bad dimensions {w}x{h}")
    if kind != "pbm":
        maxval = hdr[2]
        if maxval <= 0 or maxval > 65535:
            raise ValueError(f"pnm: bad maxval {maxval}")
    channels = 3 if kind == "ppm" else 1
    wide = kind != "pbm" and maxval > 255  # 16-bit: big-endian pairs

    if not raw:
        n = w * h * channels
        vals, _ = _tokens(data, pos, n)
        arr = np.asarray(vals, dtype=np.int64)
        if kind == "pbm":
            if arr.max(initial=0) > 1:
                raise ValueError("pnm: P1 sample out of range")
            arr = (1 - arr) * 255  # 1 = black per spec
        elif arr.max(initial=0) > maxval:
            raise ValueError("pnm: sample exceeds maxval")
        if kind != "pbm" and maxval != 255:
            arr = np.round(arr.astype(np.float64) * (255.0 / maxval))
        out = arr.astype(np.uint8).reshape(h, w * channels)
    elif kind == "pbm":
        # P4: rows padded to whole bytes, MSB-first, 1 = black
        stride = (w + 7) // 8
        need = h * stride
        if len(data) - pos < need:
            raise ValueError("pnm: truncated P4 raster")
        bits = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
            .reshape(h, stride),
            axis=1,
        )[:, :w]
        out = ((1 - bits) * 255).astype(np.uint8)
        return out
    else:
        need = h * w * channels * (2 if wide else 1)
        if len(data) - pos < need:
            raise ValueError("pnm: truncated raster")
        raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
        if wide:
            out = raw.reshape(h, w * channels, 2).astype(np.uint32)
            out = (out[:, :, 0] << 8) | out[:, :, 1]  # big-endian
        else:
            out = raw.reshape(h, w * channels).copy()
        if maxval != 255:
            # spec: samples are proportional; rescale to full 8-bit
            out = np.round(out.astype(np.float64) * (255.0 / maxval))
        out = out.astype(np.uint8)
    if channels == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, channels)


def encode_pnm(img: np.ndarray, *, bitmap: bool = False) -> bytes:
    """uint8 HxW -> P5 (or P4 when bitmap=True, thresholded at 128);
    uint8 HxWx3 -> P6.  Deterministic: fixed header layout, no
    comments."""
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8 array, got {img.dtype}")
    if img.ndim == 2:
        h, w = img.shape
        if bitmap:
            bits = (img < 128).astype(np.uint8)  # 1 = black
            stride = (w + 7) // 8
            packed = np.packbits(bits, axis=1)
            if packed.shape[1] != stride:  # numpy pads to byte already
                packed = packed[:, :stride]
            return b"P4\n%d %d\n" % (w, h) + packed.tobytes()
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    if img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        if bitmap:
            raise ValueError("bitmap encoding is grayscale-only")
        return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    raise ValueError(f"expected HxW or HxWx3, got shape {img.shape}")
