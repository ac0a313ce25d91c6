"""Standard security handler decryption for RC4 PDFs (ISO 32000-1
§7.6.2-7.6.4, revisions 2-3 / V 1-2) — pure stdlib (hashlib.md5 plus a
15-line RC4).

Most "encrypted" PDFs in a crawl are OWNER-locked: the user password is
EMPTY (the document opens in any viewer; only print/copy permission
bits are asserted) and the content is RC4-encrypted with a key derived
from the padded empty password.  Those documents are fully readable
without any secret, and refusing them throws away perfectly
extractable text.  This module derives the key (Algorithm 2), verifies
the empty user password against /U (Algorithms 4/5), and decrypts
per-object stream payloads (Algorithm 1) so the text/layout/raster
extractors run unchanged.

Documented scope (refusals name the feature):
  - /Filter /Standard, /V 1-2 (RC4 40-128 bit), /R 2-3.  V4/V5
    crypt-filter layouts (AESV2/AESV3) refuse — no AES in scope.
  - EMPTY user password only.  A real password is a secret this
    engine cannot know; verification failure refuses with "password
    required".
  - classic-xref layout (the writer scope of the pdf corpus); the
    1.5+ XRef-stream encrypted layout keeps its refusal in
    _validated_objects.
  - only STREAM payloads are decrypted: page content, CMaps, image
    XObjects — everything the extractors read.  Top-level literal
    strings (document info) stay encrypted; no extractor reads them.

The writer half (encrypt_pdf_bytes) RC4-encrypts an existing
classic-xref file and appends the /Encrypt dict + /ID, deriving /O
and /U with the same key schedule — corpus classes and the decryptor
are pinned against each other, not against copied constants.
"""

from __future__ import annotations

import hashlib
import re
import struct

# Algorithm 2's 32-byte padding string (ISO 32000-1 Table _the_ pad;
# public constant reproduced in every PDF implementation)
PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def derive_key(
    o_entry: bytes, p: int, id0: bytes, r: int, n_bytes: int,
    user_pw: bytes = b"",
) -> bytes:
    """Algorithm 2: the file encryption key from the (padded) user
    password, /O, /P (as a 32-bit signed LE dword), and /ID[0]."""
    h = hashlib.md5()
    h.update(_pad_password(user_pw))
    h.update(o_entry[:32])
    # /P is a 32-bit signed dword; files write it signed or unsigned —
    # low 32 bits little-endian either way
    h.update(struct.pack("<q", p)[:4])
    h.update(id0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n_bytes]).digest()
    return key[:n_bytes]


def compute_o(owner_pw: bytes, user_pw: bytes, r: int,
              n_bytes: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n_bytes]
    out = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in key), out)
    return out


def compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (r2) / 5 (r3): the /U entry."""
    if r == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    out = rc4(key, h)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in key), out)
    return out + b"\x00" * 16


def object_key(key: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1: per-object RC4 key (md5 of key + 3 LE bytes of the
    object number + 2 LE bytes of the generation)."""
    h = hashlib.md5()
    h.update(key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    return h.digest()[: min(len(key) + 5, 16)]


class StandardDecryptor:
    """Verified empty-user-password decryptor for one document."""

    def __init__(self, key: bytes) -> None:
        self.key = key

    def decrypt_stream(self, num: int, payload: bytes) -> bytes:
        return rc4(object_key(self.key, num), payload)


def _one_string(body: bytes, key: bytes) -> bytes | None:
    """The string value of /key in a dict body — literal or hex."""
    m = re.search(rb"/" + key + rb"\s*(\(|<(?!<))", body)
    if m is None:
        return None
    # reuse the tokenizer/string decoding from the pdf module (late
    # import: pdf.py imports this module for the decrypt hook)
    from .pdf import _string_bytes, _tokens

    for tok in _tokens(body[m.start(1):]):
        return _string_bytes(tok)
    return None


def _int_of(body: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+([-+]?\d+)", body)
    return int(m.group(1)) if m else None


def build_decryptor(enc_body: bytes, id0: bytes) -> StandardDecryptor:
    """Parse an /Encrypt dict body and verify the EMPTY user password.
    Raises ValueError naming the refusal (unsupported handler/version,
    or a real password)."""
    if not re.search(rb"/Filter\s*/Standard\b", enc_body):
        raise ValueError(
            "encrypted PDF: non-Standard security handler unsupported"
        )
    v = _int_of(enc_body, b"V") or 0
    r = _int_of(enc_body, b"R") or 0
    if v not in (1, 2) or r not in (2, 3):
        raise ValueError(
            f"encrypted PDF: V={v}/R={r} (AES crypt filters)"
            " unsupported — only RC4 V1-2/R2-3"
        )
    p = _int_of(enc_body, b"P")
    o_entry = _one_string(enc_body, b"O")
    u_entry = _one_string(enc_body, b"U")
    if p is None or not o_entry or not u_entry:
        raise ValueError("encrypted PDF: /Encrypt dict missing O/U/P")
    length = _int_of(enc_body, b"Length") or 40
    n_bytes = max(5, min(16, length // 8))
    key = derive_key(o_entry, p, id0, r, n_bytes)
    expect = compute_u(key, id0, r)
    ok = (expect[:16] == u_entry[:16]) if r >= 3 else (
        expect == u_entry[:32]
    )
    if not ok:
        raise ValueError(
            "encrypted PDF: password required (empty user password"
            " does not verify)"
        )
    return StandardDecryptor(key)


def trailer_id0(data: bytes) -> bytes:
    """First /ID element from the trailer (hex string), b'' if absent
    — Algorithm 2 hashes whatever is there; an absent ID only breaks
    verification if the writer used one."""
    for tm in re.finditer(rb"trailer(.*?)startxref", data, re.S):
        m = re.search(
            rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", tm.group(1)
        )
        if m:
            h = m.group(1).decode("ascii")
            if len(h) % 2:
                h += "0"
            return bytes.fromhex(h)
    return b""


def encrypt_pdf_bytes(
    data: bytes,
    user_pw: bytes = b"",
    owner_pw: bytes = b"",
    r: int = 2,
    length: int = 40,
    file_id: bytes = b"\x01" * 16,
) -> bytes:
    """RC4-encrypt a classic-xref PDF produced by the in-repo writers:
    every stream payload is RC4'd under its per-object key, an
    /Encrypt dict is appended, and the trailer gains /Encrypt + /ID.
    Deterministic; the corpus/test half of the decryptor above."""
    from .pdf import _objects

    n_bytes = max(5, min(16, length // 8))
    p = -44  # print allowed, modify/copy denied — a typical owner lock
    o_entry = compute_o(owner_pw, user_pw, r, n_bytes)
    key = derive_key(o_entry, p, file_id, r, n_bytes, user_pw=user_pw)
    u_entry = compute_u(key, file_id, r)
    objs = _objects(data)
    bodies: list[tuple[int, bytes]] = []
    for num in sorted(objs):
        o = objs[num]
        if o.stream is None:
            bodies.append((num, o.body))
        else:
            enc = rc4(object_key(key, num), o.stream)
            body = re.sub(
                rb"/Length\s+\d+(?!\d)",
                b"/Length " + str(len(enc)).encode(),
                o.body, count=1,
            )
            bodies.append(
                (num, body + b"\nstream\n" + enc + b"\nendstream")
            )
    enc_num = max(objs) + 1
    v = 1 if length == 40 else 2
    enc_dict = (
        b"<< /Filter /Standard /V " + str(v).encode()
        + b" /R " + str(r).encode()
        + b" /Length " + str(length).encode()
        + b" /P " + str(p).encode()
        + b" /O <" + o_entry.hex().encode() + b">"
        + b" /U <" + u_entry.hex().encode() + b"> >>"
    )
    bodies.append((enc_num, enc_dict))
    root = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", data)
    root_ref = root.group(0) if root else b"/Root 1 0 R"
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num, body in bodies:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    top = max(offsets)
    out += f"xref\n0 {top + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, top + 1):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(top + 1).encode()
        + b" " + root_ref
        + b" /Encrypt " + str(enc_num).encode() + b" 0 R"
        + b" /ID [<" + file_id.hex().encode() + b"> <"
        + file_id.hex().encode() + b">] >>\nstartxref\n"
        + str(xref_at).encode() + b"\n%%EOF\n"
    )
    return bytes(out)
