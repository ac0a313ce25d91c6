"""REAL FLAC PCM decode — pure stdlib + numpy, no codec library
(RFC 9639 / the classic xiph spec), the lossless-audio analogue of
imaging/png.py and functions/pdf.py.

FLAC is the one compressed audio format in the corpus that needs no
external backend: every stage is deterministic integer math — bit
unpacking, rice/golomb residual decode, fixed or LPC integer
prediction, stereo decorrelation — so the decoder is exact by
construction and SELF-VERIFYING: the stream's own CRC-8 (frame
header), CRC-16 (whole frame) and STREAMINFO MD5 (whole-stream
unencoded PCM) are all checked, and any mismatch refuses loudly
(ValueError), never returns garbage (the module contract shared with
functions/audio_meta.py).  mp3 and ogg-vorbis remain behind the
documented deterministic-fake seam in multimodal._decode_audio: their
bitstreams need float DCT/MDCT synthesis, which is a genuine codec
backend; FLAC's bitstream does not.

Decoder scope (refuse-loudly on everything outside it):
  - FLAC native container ("fLaC" magic + metadata blocks; all
    non-STREAMINFO blocks skipped structurally).  Ogg-encapsulated
    FLAC is sniffed by audio_meta but not decoded here.
  - subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (1-32);
    wasted-bits; rice methods 0 and 1 incl. the escape (raw-binary)
    partition encoding; partition orders 0-15.
  - channel assignments: 1-8 independent channels, left/side,
    right/side, mid/side (side channel at bps+1, per spec).
  - bit depths 4-32; MD5 verification runs when bps is a whole number
    of bytes (the only layouts the test writer emits — for other
    depths the frame CRC-16s still gate every sample).

The encoder half (`encode_flac`) is the deterministic test/corpus
writer — the audio twin of sources.synthetic.make_pdf15_bytes: it
emits real spec-conformant streams (verbatim / constant / fixed+rice /
LPC subframes, independent or decorrelated stereo, correct CRCs and
STREAMINFO MD5) so round-trips never depend on external fixtures and
the synthetic media corpus can carry genuinely-decodable FLAC clips.

Scale shape: decode is per-clip work inside an Arrow-batched
mapInPandas stage (multimodal.audio_features) — parallelism is at
clip granularity, so a pure-Python rice loop is fine for the
corpus's second-scale clips; a vectorized unary scan would be the
optimization if minute-scale clips ever dominate a partition.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["decode_flac", "decode_flac_pcm", "encode_flac"]


# --- CRCs (RFC 9639 §9.2/§9.3: CRC-8 poly 0x07, CRC-16 poly 0x8005,
# both init 0, MSB-first) ---------------------------------------------------

def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, dtype=np.uint32)
    for byte in range(256):
        reg = byte << (width - 8)
        for _ in range(8):
            reg = ((reg << 1) ^ poly) if reg & top else (reg << 1)
        tbl[byte] = reg & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = int(_CRC8_TBL[reg ^ b])
    return reg


def _crc16(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = int(_CRC16_TBL[((reg >> 8) ^ b) & 0xFF]) ^ ((reg << 8) & 0xFFFF)
    return reg


# --- bit reader ------------------------------------------------------------

class _Bits:
    """MSB-first bit reader with byte-position access (frame CRCs are
    computed over whole bytes, so the reader tracks byte offsets)."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos   # next byte to load
        self.buf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("flac: truncated stream inside a frame")
            self.buf = (self.buf << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        out = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return out

    def read_signed(self, n: int) -> int:
        u = self.read(n)
        return u - (1 << n) if u >= (1 << (n - 1)) else u

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("flac: unary run exceeds sanity bound")
        return q

    def align(self) -> None:
        self.nbits = 0
        self.buf = 0

    def byte_pos(self) -> int:
        return self.pos - (self.nbits // 8)


# --- header tables ---------------------------------------------------------

_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's extended UTF-8-style coded number (frame/sample index) —
    parsed for real because it participates in both frame CRCs."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError("flac: malformed coded frame number")
    val = b0 & (mask - 1)
    for _ in range(n_cont):
        bc = bits.read(8)
        if bc & 0xC0 != 0x80:
            raise ValueError("flac: malformed coded frame number")
        val = (val << 6) | (bc & 0x3F)
    return val


# --- residual + prediction -------------------------------------------------

def _read_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    porder = bits.read(4)
    if blocksize % (1 << porder):
        raise ValueError("flac: partition order does not divide blocksize")
    per_part = blocksize >> porder
    if per_part <= order and porder > 0 or per_part < order:
        raise ValueError("flac: predictor order exceeds first partition")
    out: list[int] = []
    for p in range(1 << porder):
        n = per_part - (order if p == 0 else 0)
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(bits.read_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = bits.read_unary()
                u = (q << param) | bits.read(param)
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _predict_fixed(warm: list[int], res: list[int], order: int) -> list[int]:
    s = list(warm)
    coefs = _FIXED_COEFS[order]
    for r in res:
        s.append(r + sum(c * s[-1 - j] for j, c in enumerate(coefs)))
    return s


def _predict_lpc(warm: list[int], res: list[int], coefs: list[int],
                 shift: int) -> list[int]:
    s = list(warm)
    for r in res:
        acc = sum(c * s[-1 - j] for j, c in enumerate(coefs))
        s.append(r + (acc >> shift))
    return s


def _read_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("flac: subframe header reserved bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if stype == 0:           # CONSTANT
        samples = [bits.read_signed(eff)] * blocksize
    elif stype == 1:         # VERBATIM
        samples = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:   # FIXED, order = stype - 8
        order = stype - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        res = _read_residual(bits, blocksize, order)
        samples = _predict_fixed(warm, res, order)
    elif stype >= 32:        # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("flac: invalid LPC precision code")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _read_residual(bits, blocksize, order)
        samples = _predict_lpc(warm, res, coefs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


# --- frame + stream --------------------------------------------------------

def _read_frame(bits: _Bits, info: dict) -> np.ndarray:
    """One frame -> int32 array (blocksize, n_channels)."""
    start = bits.byte_pos()
    sync = bits.read(15)
    if sync != 0x7FFC:
        raise ValueError("flac: lost frame sync")
    bits.read(1)  # blocking strategy (parsed; CRC covers it)
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    if bits.read(1):
        raise ValueError("flac: frame header reserved bit set")
    _read_utf8_number(bits)
    if bs_code == 0:
        raise ValueError("flac: reserved blocksize code")
    elif bs_code == 1:
        blocksize = 192
    elif bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)
    if sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    elif sr_code == 15:
        raise ValueError("flac: invalid sample-rate code")
    elif sr_code and sr_code not in _RATES:
        raise ValueError("flac: reserved sample-rate code")
    if ss_code == 0:
        bps = info["bits"]
    elif ss_code in _BPS:
        bps = _BPS[ss_code]
    else:
        raise ValueError("flac: reserved sample-size code")
    hdr_end = bits.byte_pos()
    if _crc8(bits.data[start:hdr_end]) != bits.read(8):
        raise ValueError("flac: frame header CRC-8 mismatch")

    if ch_code <= 7:
        chans = [_read_subframe(bits, blocksize, bps)
                 for _ in range(ch_code + 1)]
        cols = chans
    elif ch_code in (8, 9, 10):
        # decorrelated stereo: the side channel carries one extra bit
        left_extra = 1 if ch_code == 9 else 0
        right_extra = 1 if ch_code in (8, 10) else 0
        c0 = _read_subframe(bits, blocksize, bps + left_extra)
        c1 = _read_subframe(bits, blocksize, bps + right_extra)
        if ch_code == 8:     # left/side: R = L - side
            cols = [c0, [a - b for a, b in zip(c0, c1)]]
        elif ch_code == 9:   # right/side: L = side + R
            cols = [[a + b for a, b in zip(c0, c1)], c1]
        else:                # mid/side
            left, right = [], []
            for m, s in zip(c0, c1):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            cols = [left, right]
    else:
        raise ValueError(f"flac: reserved channel assignment {ch_code}")
    if len(cols) != info["channels"]:
        raise ValueError("flac: frame channel count != STREAMINFO")

    bits.align()
    frame_end = bits.byte_pos()
    if _crc16(bits.data[start:frame_end]) != bits.read(16):
        raise ValueError("flac: frame CRC-16 mismatch")
    return np.array(cols, dtype=np.int64).T.astype(np.int32)


def _parse_streaminfo(data: bytes) -> tuple[dict, int]:
    if data[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    pos, info = 4, None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata block header")
        last, btype = data[pos] >> 7, data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        pos += 4
        if pos + blen > len(data):
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("flac: STREAMINFO is not 34 bytes")
            si = data[pos:pos + 34]
            raw = int.from_bytes(si[10:18], "big")
            info = dict(
                sample_rate=raw >> 44,
                channels=((raw >> 41) & 0x7) + 1,
                bits=((raw >> 36) & 0x1F) + 1,
                total=raw & ((1 << 36) - 1),
                md5=si[18:34],
            )
        pos += blen
        if last:
            break
    if info is None:
        raise ValueError("flac: no STREAMINFO block")
    if info["sample_rate"] == 0:
        raise ValueError("flac: STREAMINFO sample rate is 0")
    return info, pos


def decode_flac_pcm(data: bytes) -> tuple[np.ndarray, int, int]:
    """Exact decode: (int32 array shape (n_samples, n_channels),
    sample_rate, bits_per_sample).  Verifies frame CRC-8/CRC-16 per
    frame, the decoded total against STREAMINFO, and the STREAMINFO
    MD5 over the reconstructed byte-exact PCM (when nonzero and bps is
    byte-aligned); raises ValueError on any mismatch."""
    info, pos = _parse_streaminfo(bytes(data))
    bits = _Bits(bytes(data), pos)
    frames = []
    while bits.pos < len(bits.data):
        frames.append(_read_frame(bits, info))
    pcm = (np.concatenate(frames, axis=0) if frames
           else np.zeros((0, info["channels"]), dtype=np.int32))
    if info["total"] and len(pcm) != info["total"]:
        raise ValueError(
            f"flac: decoded {len(pcm)} samples, STREAMINFO says "
            f"{info['total']}")
    bps = info["bits"]
    if info["md5"] != b"\x00" * 16 and bps % 8 == 0:
        width = bps // 8
        flat = pcm.astype(f"<i{max(width, 1) if width != 3 else 4}")
        if width == 3:  # 24-bit: low 3 of each little-endian int32
            b = flat.tobytes()
            raw = b"".join(b[i:i + 3] for i in range(0, len(b), 4))
        else:
            raw = flat.tobytes()
        if hashlib.md5(raw).digest() != info["md5"]:
            raise ValueError("flac: STREAMINFO MD5 mismatch")
    return pcm, info["sample_rate"], bps


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """decode_wav-shaped wrapper: (float32 mono PCM in [-1, 1],
    sample_rate); multi-channel input is averaged to mono."""
    pcm, rate, bps = decode_flac_pcm(data)
    f = pcm.astype(np.float32) / float(1 << (bps - 1))
    return (f.mean(axis=1) if f.ndim == 2 and f.shape[1] > 1
            else f.reshape(-1)), rate


# --- encoder (deterministic test/corpus writer) ----------------------------

class _BitW:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        self.buf = (self.buf << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.buf >> self.nbits) & 0xFF)
        self.buf &= (1 << self.nbits) - 1

    def pad(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_code(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for count in range(1, 7):
        if n < (1 << (5 * count + 6)):
            break
    head = (0xFF << (7 - count)) & 0xFF | (n >> (6 * count))
    body = [0x80 | ((n >> (6 * (count - 1 - i))) & 0x3F)
            for i in range(count)]
    return bytes([head, *body])


def _rice_param(res: list[int]) -> int:
    mean = (sum(abs(r) for r in res) / max(len(res), 1)) or 0.5
    p = max(0, int(np.ceil(np.log2(mean + 1))))
    return min(p, 14)


def _write_residual(w: _BitW, res: list[int], param: int | None,
                    escape_raw: int | None) -> None:
    w.write(0, 2)   # rice method 0 (4-bit params)
    w.write(0, 4)   # partition order 0
    if escape_raw is not None:
        w.write(15, 4)
        w.write(escape_raw, 5)
        for r in res:
            w.write(r, escape_raw)
        return
    p = _rice_param(res) if param is None else param
    w.write(p, 4)
    for r in res:
        u = (abs(r) << 1) - (1 if r < 0 else 0)  # zigzag
        w.write(0, u >> p)  # unary quotient: (q zeros)
        w.write(1, 1)
        w.write(u & ((1 << p) - 1), p)


def _write_subframe(w: _BitW, s: list[int], bps: int, mode: str) -> None:
    if mode == "constant":
        w.write(0, 1); w.write(0, 6); w.write(0, 1)
        w.write(s[0], bps)
    elif mode == "verbatim":
        w.write(0, 1); w.write(1, 6); w.write(0, 1)
        for v in s:
            w.write(v, bps)
    elif mode in ("fixed1", "fixed2", "fixed_escape"):
        order = 2 if mode == "fixed2" else 1
        w.write(0, 1); w.write(8 + order, 6); w.write(0, 1)
        for v in s[:order]:
            w.write(v, bps)
        coefs = _FIXED_COEFS[order]
        res = [s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
               for i in range(order, len(s))]
        if mode == "fixed_escape":
            raw = max((abs(r).bit_length() + 1 for r in res), default=1)
            _write_residual(w, res, None, min(raw, 31))
        else:
            _write_residual(w, res, None, None)
    elif mode == "lpc":
        order, shift, coefs = 2, 1, [3, -1]   # s ~ (3*s1 - s2) >> 1
        w.write(0, 1); w.write(32 + order - 1, 6); w.write(0, 1)
        for v in s[:order]:
            w.write(v, bps)
        w.write(4 - 1, 4)      # precision 4 bits
        w.write(shift, 5)
        for c in coefs:
            w.write(c, 4)
        res = [s[i] - (sum(c * s[i - 1 - j]
                           for j, c in enumerate(coefs)) >> shift)
               for i in range(order, len(s))]
        _write_residual(w, res, None, None)
    else:
        raise ValueError(f"unknown subframe mode: {mode}")


_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def encode_flac(pcm: np.ndarray, rate: int, bits: int = 16,
                block_size: int = 1024, mode: str = "verbatim",
                stereo: str = "independent") -> bytes:
    """Deterministic spec-conformant FLAC writer (see module
    docstring).  pcm: int array, shape (n,) or (n, channels), values
    already within the signed `bits` range.  mode selects the subframe
    coding (verbatim / constant / fixed1 / fixed2 / fixed_escape /
    lpc); stereo selects the channel assignment for 2-channel input
    (independent / left_side / right_side / mid_side)."""
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    if bits % 8:
        raise ValueError("writer emits byte-aligned bit depths only")
    width = bits // 8
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if pcm.size and (pcm.min() < lo or pcm.max() > hi):
        raise ValueError("pcm exceeds the requested bit depth")

    md5 = hashlib.md5()
    flat = pcm.reshape(-1)
    if width == 3:
        b = flat.astype("<i4").tobytes()
        md5.update(b"".join(b[i:i + 3] for i in range(0, len(b), 4)))
    else:
        md5.update(flat.astype(f"<i{width}").tobytes())

    si = _BitW()
    si.write(block_size, 16); si.write(block_size, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(ch - 1, 3); si.write(bits - 1, 5)
    si.write(n, 36)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big")
    out += bytes(si.out) + md5.digest()

    ch_code = ch - 1
    extra0 = extra1 = 0
    if ch == 2 and stereo != "independent":
        ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo]
        extra0 = 1 if stereo == "right_side" else 0
        extra1 = 1 if stereo in ("left_side", "mid_side") else 0

    for fi, off in enumerate(range(0, max(n, 1), block_size)):
        blk = pcm[off:off + block_size]
        if not len(blk):
            break
        bs = len(blk)
        w = _BitW()
        w.write(0x7FFC, 15); w.write(0, 1)
        w.write(7, 4)                       # 16-bit blocksize-1 at end
        w.write(13 if rate < 65536 else 0, 4)
        w.write(ch_code, 4)
        w.write(_SS_CODE[bits], 3); w.write(0, 1)
        for b in _utf8_code(fi):
            w.write(b, 8)
        w.write(bs - 1, 16)
        if rate < 65536:
            w.write(rate, 16)
        w.pad()
        hdr = bytes(w.out)
        w.write(_crc8(hdr), 8)
        if ch_code <= 7:
            for c in range(ch):
                _write_subframe(w, blk[:, c].tolist(), bits, mode)
        else:
            left, right = blk[:, 0].tolist(), blk[:, 1].tolist()
            side = [a - b for a, b in zip(left, right)]
            if ch_code == 8:
                sub = [left, side]
            elif ch_code == 9:
                sub = [side, right]
            else:
                sub = [[(a + b) >> 1 for a, b in zip(left, right)], side]
            _write_subframe(w, sub[0], bits + extra0, mode)
            _write_subframe(w, sub[1], bits + extra1, mode)
        w.pad()
        frame = bytes(w.out)
        w.write(_crc16(frame), 16)
        out += bytes(w.out)
    return bytes(out)


# --- Ogg encapsulation (RFC 5334 + the xiph FLAC-to-Ogg mapping) -----------
# The page/packet layer is pure structure — capture pattern, lacing
# values, CRC-32 — so Ogg-FLAC decodes for REAL end to end: this layer
# reassembles the logical packets and the native decoder above does the
# bitstream.  What stays behind multimodal's documented fake seam is
# only the MDCT codecs (vorbis/opus) INSIDE other Ogg streams.

import struct as _struct

_OGG_CRC_TBL = _crc_table(0x04C11DB7, 32)


def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC-32: forward (non-reflected), init 0, no final
    xor — NOT zlib.crc32 (which reflects)."""
    reg = 0
    for b in data:
        reg = (int(_OGG_CRC_TBL[((reg >> 24) ^ b) & 0xFF])
               ^ ((reg << 8) & 0xFFFFFFFF))
    return reg


def ogg_packets(data: bytes) -> list[bytes]:
    """Reassemble a single-stream Ogg file's logical packets: forward
    page walk by encoded lengths (never a backwards 'OggS' scan — the
    capture pattern is not escaped inside bodies), per-page CRC-32
    verified over the page with a zeroed checksum field, lacing values
    joined across page boundaries (255 = packet continues, <255 ends
    it).  Refuses loudly (ValueError) on bad magic/version/CRC, a
    truncated page, or a packet left open at end of stream."""
    packets: list[bytes] = []
    cur = bytearray()
    pos = 0
    while pos < len(data):
        if pos + 27 > len(data) or data[pos:pos + 4] != b"OggS":
            raise ValueError(f"ogg: bad page capture at byte {pos}")
        if data[pos + 4] != 0:
            raise ValueError("ogg: unknown page version")
        n_segs = data[pos + 26]
        table_end = pos + 27 + n_segs
        if table_end > len(data):
            raise ValueError("ogg: truncated segment table")
        lacing = data[pos + 27:table_end]
        body_len = sum(lacing)
        page_end = table_end + body_len
        if page_end > len(data):
            raise ValueError("ogg: truncated page body")
        page = bytearray(data[pos:page_end])
        (want,) = _struct.unpack_from("<I", page, 22)
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != want:
            raise ValueError(f"ogg: page CRC mismatch at byte {pos}")
        bpos = table_end
        for lac in lacing:
            cur += data[bpos:bpos + lac]
            bpos += lac
            if lac < 255:
                packets.append(bytes(cur))
                cur = bytearray()
        pos = page_end
    if cur:
        raise ValueError("ogg: stream ends mid-packet")
    return packets


_OGG_FLAC_IDENT = b"\x7fFLAC"


def decode_ogg_flac_pcm(data: bytes) -> tuple[np.ndarray, int, int]:
    """Exact Ogg-FLAC decode, decode_flac_pcm-shaped.  The ident
    packet (mapping magic, version, header count, embedded native
    'fLaC' + STREAMINFO) and subsequent header packets are split off,
    a native stream is rebuilt (STREAMINFO's last-metadata flag
    forced — header packets carry the remaining blocks), and the
    native decoder runs with all its CRC-8/CRC-16/MD5 verification."""
    pkts = ogg_packets(bytes(data))
    if not pkts or pkts[0][:5] != _OGG_FLAC_IDENT:
        raise ValueError("ogg: not a FLAC-mapped stream")
    ident = pkts[0]
    if len(ident) < 13 + 4 + 34:
        raise ValueError("ogg/flac: truncated ident packet")
    if ident[5] != 1:
        raise ValueError(
            f"ogg/flac: unsupported mapping version {ident[5]}")
    (n_hdr,) = _struct.unpack_from(">H", ident, 7)
    if ident[9:13] != b"fLaC":
        raise ValueError("ogg/flac: ident packet lacks native magic")
    si = bytearray(ident[13:13 + 4 + 34])
    if (si[0] & 0x7F) != 0:
        raise ValueError("ogg/flac: first block is not STREAMINFO")
    si[0] |= 0x80  # native rebuild skips the other header packets
    rest = pkts[1:]
    if n_hdr:
        if len(rest) < n_hdr:
            raise ValueError("ogg/flac: missing header packets")
        rest = rest[n_hdr:]
    else:  # count 0 = unknown: audio packets start at the frame sync
        while rest and not (
            len(rest[0]) >= 2
            and rest[0][0] == 0xFF and (rest[0][1] & 0xFC) == 0xF8
        ):
            rest = rest[1:]
    return decode_flac_pcm(b"fLaC" + bytes(si) + b"".join(rest))


def decode_ogg_flac(data: bytes) -> tuple[np.ndarray, int]:
    """decode_wav-shaped wrapper: (float32 mono PCM in [-1, 1],
    sample_rate)."""
    pcm, rate, bps = decode_ogg_flac_pcm(data)
    f = pcm.astype(np.float32) / float(1 << (bps - 1))
    return (f.mean(axis=1) if f.ndim == 2 and f.shape[1] > 1
            else f.reshape(-1)), rate


def _ogg_pages(serial: int, seq0: int, packet: bytes, *, bos: bool,
               eos: bool, granule: int, max_body: int = 4080) -> bytes:
    """Pages carrying ONE packet, split at max_body bytes (multiple of
    255 so non-final pages end on a 255 lacing value = packet
    continues).  Continuation flag on every page after the first;
    granule -1 on pages that finish no packet; CRC-32 written for
    real (the reader verifies it)."""
    assert max_body % 255 == 0
    chunks = ([packet[i:i + max_body]
               for i in range(0, len(packet), max_body)] or [b""])
    out = bytearray()
    for ci, chunk in enumerate(chunks):
        last = ci == len(chunks) - 1
        htype = (0x01 if ci else 0) | (0x02 if bos and not ci else 0) \
            | (0x04 if eos and last else 0)
        if last:
            lacing = [255] * (len(chunk) // 255) + [len(chunk) % 255]
            if len(chunk) and len(chunk) % 255 == 0:
                lacing = [255] * (len(chunk) // 255) + [0]
        else:
            lacing = [255] * (len(chunk) // 255)
        if len(lacing) > 255:
            raise ValueError("ogg writer: lacing overflow")
        page = bytearray(b"OggS\x00")
        page += bytes([htype])
        page += _struct.pack("<q", granule if last else -1)
        page += _struct.pack("<I", serial)
        page += _struct.pack("<I", seq0 + ci)
        page += b"\x00\x00\x00\x00"
        page += bytes([len(lacing)]) + bytes(lacing) + chunk
        page[22:26] = _struct.pack("<I", _ogg_crc(bytes(page)))
        out += page
    return bytes(out)


def encode_ogg_flac(pcm: np.ndarray, rate: int, bits: int = 16,
                    tags: dict | None = None, mode: str = "fixed2",
                    serial: int = 0x5147, max_body: int = 4080) -> bytes:
    """Deterministic Ogg-FLAC writer (test/corpus half): encode_flac's
    native stream re-packetized per the mapping — BOS page with the
    ident packet (magic, version 1.0, header count, embedded fLaC +
    STREAMINFO), one VORBIS_COMMENT header packet (mandatory in the
    mapping), then the audio region as one packet split across pages
    of max_body bytes (exercising cross-page reassembly), EOS page
    granule = total samples.  The audio region is encoded as a single
    FLAC frame (block_size >= n) so one-frame-per-packet holds."""
    pcm = np.asarray(pcm, dtype=np.int64)
    n = pcm.shape[0]
    block = max(16, min(65535, n))
    native = encode_flac(pcm, rate, bits=bits, block_size=block,
                         mode=mode)
    si = bytearray(native[4:4 + 4 + 34])
    frames = native[4 + 4 + 34:]
    si[0] &= 0x7F  # a comment header packet follows
    ident = (_OGG_FLAC_IDENT + bytes([1, 0]) + _struct.pack(">H", 1)
             + b"fLaC" + bytes(si))
    vendor = b"spark-graft ogg-flac writer"
    vc = _struct.pack("<I", len(vendor)) + vendor
    items = [f"{k.upper()}={v}".encode() for k, v in (tags or {}).items()]
    vc += _struct.pack("<I", len(items))
    for kv in items:
        vc += _struct.pack("<I", len(kv)) + kv
    comment = bytes([0x84]) + len(vc).to_bytes(3, "big") + vc
    def n_pages(packet: bytes) -> int:
        return max(1, -(-len(packet) // max_body))

    out = bytearray()
    out += _ogg_pages(serial, 0, ident, bos=True, eos=False, granule=0,
                      max_body=max_body)
    seq = n_pages(ident)
    out += _ogg_pages(serial, seq, comment, bos=False, eos=False,
                      granule=0, max_body=max_body)
    seq += n_pages(comment)
    out += _ogg_pages(serial, seq, frames, bos=False, eos=True,
                      granule=n, max_body=max_body)
    return bytes(out)
