"""Charset sniffing for crawled HTML payloads — pure stdlib.

A real crawl is far from all-UTF-8: pages arrive as windows-1252
mislabeled as ISO-8859-1, UTF-16 with BOMs, meta-declared legacy code
pages, and outright lies in the Content-Type header.  Decoding
everything as utf-8/replace silently destroys every non-ASCII byte of
the legacy web, so the WARC -> main-content path routes through this
resolver instead.

The precedence order is the WHATWG encoding-standard shape (the rules
every browser implements, re-derived here — no reference code exists
for this, the reference is an OCR server):

  1. BOM — UTF-8 / UTF-16LE / UTF-16BE byte-order marks override any
     declaration (the document self-identifies at byte level);
  2. `charset=` parameter of the HTTP Content-Type header;
  3. `<meta charset=...>` or `<meta http-equiv="content-type"
     content="...charset=...">` within the first 1024 bytes — the
     prescan window the standard specifies;
  4. strict-UTF-8 validation of the payload (an undeclared page that
     IS valid UTF-8 almost certainly is UTF-8 — ASCII is a subset);
  5. windows-1252 fallback — the standard's default for the legacy
     web, and a total decode (every byte sequence maps somewhere).

Label normalization follows the standard's most consequential alias
rule: ISO-8859-1 / latin-1 / US-ASCII labels MEAN windows-1252 on the
web (servers say 8859-1, authors use cp1252 smart quotes and the
euro).  Unknown labels are ignored and resolution falls through to
the next source.

Decoding is TOTAL (errors="replace"): a crawl pipeline must never die
on a lying header — mojibake surfaces as U+FFFD in the text while the
row keeps flowing, and the (charset, source) pair is reported per
document so a curation gate can filter or re-weight by decode
provenance.  Scale shape: pure per-payload function, runs inside the
same row-local Arrow-batched WARC fan-out, zero shuffle.
"""

from __future__ import annotations

import codecs
import re

# WHATWG-style label -> python codec.  The ISO-8859-1 family maps to
# windows-1252 deliberately (see module docstring).
_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "latin-1": "windows-1252", "latin1": "windows-1252",
    "l1": "windows-1252", "ascii": "windows-1252",
    "us-ascii": "windows-1252", "windows-1252": "windows-1252",
    "cp1252": "windows-1252", "x-cp1252": "windows-1252",
    "iso-8859-15": "iso-8859-15", "latin-9": "iso-8859-15",
    "iso-8859-2": "iso-8859-2", "latin2": "iso-8859-2",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "koi8-r": "koi8-r", "koi8-u": "koi8-u",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "euc-jp": "euc-jp",
    "gbk": "gbk", "gb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5", "euc-kr": "euc-kr",
    "utf-16": "utf-16-le", "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9._\-]+)""",
    re.IGNORECASE,
)
_CT_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([a-zA-Z0-9._\-]+)",
                            re.IGNORECASE)

PRESCAN_BYTES = 1024


def _normalize(label: str) -> str | None:
    """WHATWG-ish label -> python codec name, or None when the label
    is unknown (resolution then falls through to the next source)."""
    name = _ALIASES.get(label.strip().strip('"').strip("'").lower())
    if name is None:
        return None
    try:
        codecs.lookup(name)
    except LookupError:  # codec absent from this runtime
        return None
    return name


def sniff_charset(content_type: str | None,
                  payload: bytes) -> tuple[str, str]:
    """-> (python codec name, source) with source one of
    bom | http | meta | utf8-valid | fallback."""
    payload = bytes(payload)
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le", "bom"
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be", "bom"
    if content_type:
        m = _CT_CHARSET_RE.search(content_type)
        if m:
            codec = _normalize(m.group(1))
            if codec:
                return codec, "http"
    m = _META_CHARSET_RE.search(payload[:PRESCAN_BYTES])
    if m:
        codec = _normalize(m.group(1).decode("ascii", "replace"))
        if codec:
            return codec, "meta"
    try:
        payload.decode("utf-8", "strict")
        return "utf-8", "utf8-valid"
    except UnicodeDecodeError:
        return "windows-1252", "fallback"


def decode_html(content_type: str | None,
                payload: bytes) -> tuple[str, str, str]:
    """TOTAL decode of a crawled text payload.

    -> (text, charset, source).  Never raises on content: a lying
    declaration yields U+FFFD replacement characters, not an error —
    the (charset, source) provenance lets curation react.  A BOM is
    stripped from the text (utf-8-sig does it in-codec; the utf-16
    codecs we name explicitly by endianness keep it, so drop the
    leading U+FEFF here)."""
    charset, source = sniff_charset(content_type, bytes(payload))
    text = bytes(payload).decode(charset, "replace")
    if source == "bom" and text[:1] == "\ufeff":
        text = text[1:]
    return text, charset, source
