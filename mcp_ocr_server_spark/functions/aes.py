"""AES-128/256 (FIPS-197 re-derivation) in pure stdlib + numpy — the
cipher backend for the PDF standard security handler's AESV2/AESV3
crypt filters (functions/pdfcrypt.py).

Design notes, because this runs inside executors:

  - **Decrypt is the hot path** (every stream of every AES-encrypted
    document) and CBC *decryption* is embarrassingly parallel
    (P_i = D(C_i) XOR C_{i-1}), so block decryption is VECTORIZED in
    numpy across all blocks of a payload at once — the state is an
    (n_blocks, 4, 4) uint8 array and each round is four table-gathers
    plus XORs.  A 1 MiB stream decrypts in one shot instead of 65k
    Python-loop iterations.
  - **Encrypt is writer/KDF-side only** (corpus generation, /Perms,
    and the R6 hash's CBC chain, which is sequential by construction),
    so it is a scalar T-table implementation: four 256-entry uint32
    tables folding SubBytes+ShiftRows+MixColumns per FIPS-197 §5.1 /
    the classic Rijndael reference layout — ~4 table lookups + XORs
    per column per round on plain Python ints.
  - All tables are DERIVED at import (GF(2^8) exp/log over generator
    0x03, the §5.1.1 affine map) rather than pasted as literals —
    self-checking against the FIPS-197 Appendix C vectors in
    tests/test_aes.py.

Scope: ECB single-block, CBC with explicit IV, PKCS#7 pad/unpad.
Key sizes 16/24/32 bytes (AES-128/192/256).  No streaming modes —
PDF uses CBC only.
"""

from __future__ import annotations

import numpy as np

# --- GF(2^8) and the S-box, derived -----------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x11B) & 0xFF if a & 0x100 else a


_EXP = [0] * 256  # exp table over generator 3 (g^i for i in 0..254)
_LOG = [0] * 256
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x ^= _xtime(_x)  # multiply by 0x03


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[(_LOG[a] + _LOG[b]) % 255]


def _rotl8(a: int, n: int) -> int:
    return ((a << n) | (a >> (8 - n))) & 0xFF


SBOX = [0] * 256
for _a in range(256):
    # (255 - log) mod 255: a == 1 has log 0 and is its own inverse —
    # without the mod it would read the unset _EXP[255]
    _inv = 0 if _a == 0 else _EXP[(255 - _LOG[_a]) % 255]
    SBOX[_a] = (
        _inv ^ _rotl8(_inv, 1) ^ _rotl8(_inv, 2)
        ^ _rotl8(_inv, 3) ^ _rotl8(_inv, 4) ^ 0x63
    )
INV_SBOX = [0] * 256
for _a in range(256):
    INV_SBOX[SBOX[_a]] = _a

# encrypt T-tables: Te0[x] = (2s, s, s, 3s) big-endian packed, the
# other three are byte rotations (s = SBOX[x])
_TE0 = [0] * 256
for _a in range(256):
    _s = SBOX[_a]
    _TE0[_a] = (
        (_gmul(_s, 2) << 24) | (_s << 16) | (_s << 8) | _gmul(_s, 3)
    )
_TE1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _TE0]
_TE2 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _TE1]
_TE3 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _TE2]

# decrypt byte tables for the vectorized InvMixColumns
_SBOX_NP = np.array(SBOX, dtype=np.uint8)
_ISBOX_NP = np.array(INV_SBOX, dtype=np.uint8)
_M9 = np.array([_gmul(a, 9) for a in range(256)], dtype=np.uint8)
_M11 = np.array([_gmul(a, 11) for a in range(256)], dtype=np.uint8)
_M13 = np.array([_gmul(a, 13) for a in range(256)], dtype=np.uint8)
_M14 = np.array([_gmul(a, 14) for a in range(256)], dtype=np.uint8)


# --- key schedule (§5.2) -----------------------------------------------------


def _expand_key(key: bytes) -> list[int]:
    """Round-key WORDS w[0..4*(Nr+1)) as big-endian uint32."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    nr = nk + 6
    w = [int.from_bytes(key[4 * i:4 * i + 4], "big") for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (SBOX[(t >> 24) & 0xFF] << 24)
                | (SBOX[(t >> 16) & 0xFF] << 16)
                | (SBOX[(t >> 8) & 0xFF] << 8)
                | SBOX[t & 0xFF]
            )
            t ^= rcon << 24
            rcon = _xtime(rcon)
        elif nk == 8 and i % nk == 4:
            t = (
                (SBOX[(t >> 24) & 0xFF] << 24)
                | (SBOX[(t >> 16) & 0xFF] << 16)
                | (SBOX[(t >> 8) & 0xFF] << 8)
                | SBOX[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    return w


# --- scalar block encrypt (T-tables) -----------------------------------------


def encrypt_block(key: bytes, block: bytes) -> bytes:
    """One 16-byte block, ECB."""
    return _encrypt_block_w(_expand_key(key), block)


def _encrypt_block_w(w: list[int], block: bytes) -> bytes:
    nr = len(w) // 4 - 1
    s0 = int.from_bytes(block[0:4], "big") ^ w[0]
    s1 = int.from_bytes(block[4:8], "big") ^ w[1]
    s2 = int.from_bytes(block[8:12], "big") ^ w[2]
    s3 = int.from_bytes(block[12:16], "big") ^ w[3]
    for r in range(1, nr):
        k = 4 * r
        t0 = (
            _TE0[(s0 >> 24) & 0xFF] ^ _TE1[(s1 >> 16) & 0xFF]
            ^ _TE2[(s2 >> 8) & 0xFF] ^ _TE3[s3 & 0xFF] ^ w[k]
        )
        t1 = (
            _TE0[(s1 >> 24) & 0xFF] ^ _TE1[(s2 >> 16) & 0xFF]
            ^ _TE2[(s3 >> 8) & 0xFF] ^ _TE3[s0 & 0xFF] ^ w[k + 1]
        )
        t2 = (
            _TE0[(s2 >> 24) & 0xFF] ^ _TE1[(s3 >> 16) & 0xFF]
            ^ _TE2[(s0 >> 8) & 0xFF] ^ _TE3[s1 & 0xFF] ^ w[k + 2]
        )
        t3 = (
            _TE0[(s3 >> 24) & 0xFF] ^ _TE1[(s0 >> 16) & 0xFF]
            ^ _TE2[(s1 >> 8) & 0xFF] ^ _TE3[s2 & 0xFF] ^ w[k + 3]
        )
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = 4 * nr
    out = bytearray(16)
    for i, (a, b, c, d, rk) in enumerate((
        (s0, s1, s2, s3, w[k]),
        (s1, s2, s3, s0, w[k + 1]),
        (s2, s3, s0, s1, w[k + 2]),
        (s3, s0, s1, s2, w[k + 3]),
    )):
        v = (
            (SBOX[(a >> 24) & 0xFF] << 24) | (SBOX[(b >> 16) & 0xFF] << 16)
            | (SBOX[(c >> 8) & 0xFF] << 8) | SBOX[d & 0xFF]
        ) ^ rk
        out[4 * i:4 * i + 4] = v.to_bytes(4, "big")
    return bytes(out)


# --- vectorized block decrypt ------------------------------------------------


def _round_keys_np(key: bytes) -> np.ndarray:
    """(Nr+1, 4, 4) uint8 round keys, column-major state layout
    (state[row, col] — FIPS-197 §3.4)."""
    w = _expand_key(key)
    nr = len(w) // 4 - 1
    rk = np.zeros((nr + 1, 4, 4), dtype=np.uint8)
    for r in range(nr + 1):
        for c in range(4):
            word = w[4 * r + c]
            for row in range(4):
                rk[r, row, c] = (word >> (24 - 8 * row)) & 0xFF
    return rk


_INV_SHIFT_COLS = np.array(
    [[(c - r) % 4 for c in range(4)] for r in range(4)]
)
_ROWS4 = np.arange(4)[:, None]


def decrypt_blocks(key: bytes, data: bytes) -> bytes:
    """ECB-decrypt all 16-byte blocks of `data` at once (vectorized)."""
    if len(data) % 16:
        raise ValueError("AES ciphertext length not a multiple of 16")
    n = len(data) // 16
    if n == 0:
        return b""
    rk = _round_keys_np(key)
    nr = rk.shape[0] - 1
    # (n, 4, 4) with state[i, row, col] = byte[4*col + row]
    st = np.frombuffer(data, dtype=np.uint8).reshape(n, 4, 4)
    st = st.transpose(0, 2, 1).copy()
    st ^= rk[nr]
    for r in range(nr - 1, 0, -1):
        st = st[:, _ROWS4, _INV_SHIFT_COLS]      # InvShiftRows
        st = _ISBOX_NP[st]                        # InvSubBytes
        st ^= rk[r]                               # AddRoundKey
        a0, a1, a2, a3 = st[:, 0], st[:, 1], st[:, 2], st[:, 3]
        st = np.stack(
            [
                _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3],
                _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3],
                _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3],
                _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3],
            ],
            axis=1,
        )                                          # InvMixColumns
    st = st[:, _ROWS4, _INV_SHIFT_COLS]
    st = _ISBOX_NP[st]
    st ^= rk[0]
    return st.transpose(0, 2, 1).tobytes()


def decrypt_block(key: bytes, block: bytes) -> bytes:
    return decrypt_blocks(key, block)


# --- CBC + PKCS#7 ------------------------------------------------------------


def cbc_encrypt(key: bytes, iv: bytes, data: bytes,
                pad: bool = True) -> bytes:
    """CBC encrypt; PKCS#7-pads unless pad=False (then the length must
    already be block-aligned — the KDF / key-blob case)."""
    if pad:
        p = 16 - len(data) % 16
        data = data + bytes([p]) * p
    elif len(data) % 16:
        raise ValueError("unpadded CBC input must be block-aligned")
    w = _expand_key(key)  # one schedule for the whole chain
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = _encrypt_block_w(
            w, bytes(x ^ y for x, y in zip(data[i:i + 16], prev))
        )
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes,
                unpad: bool = True) -> bytes:
    """CBC decrypt (vectorized: P_i = D(C_i) XOR C_{i-1}); strips and
    VALIDATES PKCS#7 padding unless unpad=False."""
    if unpad and not data:
        raise ValueError("AES-CBC: empty ciphertext cannot carry padding")
    plain = decrypt_blocks(key, data)
    if not plain:
        return b""
    chain = iv + data[:-16]
    out = (
        np.frombuffer(plain, dtype=np.uint8)
        ^ np.frombuffer(chain, dtype=np.uint8)
    ).tobytes()
    if not unpad:
        return out
    p = out[-1]
    if not 1 <= p <= 16 or out[-p:] != bytes([p]) * p:
        raise ValueError("AES-CBC: invalid PKCS#7 padding")
    return out[:-p]
