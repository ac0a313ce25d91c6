"""Sitemap ingestion (sitemaps.org XML protocol) — the crawl
frontier's OTHER source next to WARC archives and robots.txt.

A crawler discovers URLs from two places: links inside fetched pages
(functions/warc.py + html_links) and the site-published sitemap
(linked from robots.txt `Sitemap:` lines).  This module parses both
document shapes of the protocol:

  <urlset>        — leaf sitemaps: one <url> per page with <loc> and
                    the optional <lastmod>/<changefreq>/<priority>
                    scheduling hints a recrawl policy consumes.
  <sitemapindex>  — index sitemaps: one <sitemap> per CHILD sitemap.
                    Rows carry the child loc + lastmod; fetching the
                    children is cross-file work (a join against the
                    fetch store at production scale), deliberately NOT
                    recursed here — row functions stay row-local.

Wire reality handled: gzipped payloads (sitemap.xml.gz, sniffed by
magic), default-namespaced or namespace-free tags (matching is by
LOCALNAME — real generators emit both), and the refuse-loudly error
contract: non-XML bytes, truncated markup, or an XML root that is not
a sitemap raise ValueError naming the defect (caught per document as
an error row — the warc/pdf discipline).

Limits per the protocol are ENFORCED, not assumed: >50,000 entries or
>50 MB uncompressed refuse loudly (a hostile sitemap cannot balloon a
task); <loc> values are returned verbatim (canonicalization is the
url_dedup family's job, shared with every other URL source).

Scale shape: one sitemap file per row, parsed in a zero-shuffle
row-local mapInPandas fan-out — identical to warc_records.  The
downstream frontier composition (canonicalize -> robots gate ->
first-seen admission) reuses the url family's broadcast-equi-join +
row-local-fold machinery unchanged.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zlib

MAX_ENTRIES = 50_000          # sitemaps.org hard limit per file
MAX_BYTES = 50 * 1024 * 1024  # uncompressed size limit

SITEMAP_SCHEMA = (
    "media_ref string, entry_idx int, kind string, loc string,"
    " lastmod string, changefreq string, priority double, error string"
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _gunzip_if_needed(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        out = zlib.decompressobj(16 + zlib.MAX_WBITS).decompress(
            data, MAX_BYTES + 1
        )
        if len(out) > MAX_BYTES:
            raise ValueError("sitemap: uncompressed size over 50 MB")
        return out
    return data


def parse_sitemap(data: bytes) -> tuple[str, list[dict]]:
    """(kind, entries) for one sitemap document.  kind is 'urlset' or
    'sitemapindex'; each entry carries loc/lastmod/changefreq/priority
    (None where the element is absent).  Raises ValueError for
    non-XML bytes, a non-sitemap root, protocol-limit violations, or
    a malformed <priority>."""
    data = _gunzip_if_needed(bytes(data))
    if len(data) > MAX_BYTES:
        raise ValueError("sitemap: uncompressed size over 50 MB")
    try:
        root = ET.fromstring(data)
    except ET.ParseError as exc:
        raise ValueError(f"sitemap: XML parse failed ({exc})") from None
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(
            f"sitemap: root element <{kind}> is not urlset/sitemapindex"
        )
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries: list[dict] = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue  # foreign elements are ignorable per the protocol
        if len(entries) >= MAX_ENTRIES:
            raise ValueError("sitemap: over 50,000 entries")
        entry = dict(loc=None, lastmod=None, changefreq=None,
                     priority=None)
        for f in el:
            name = _local(f.tag)
            text = (f.text or "").strip()
            if name == "loc":
                entry["loc"] = text or None
            elif name == "lastmod":
                entry["lastmod"] = text or None
            elif name == "changefreq":
                entry["changefreq"] = text or None
            elif name == "priority":
                try:
                    entry["priority"] = float(text)
                except ValueError:
                    raise ValueError(
                        f"sitemap: non-numeric priority {text[:20]!r}"
                    ) from None
        if entry["loc"] is None:
            raise ValueError("sitemap: entry missing <loc>")
        entries.append(entry)
    return kind, entries


def sitemap_rows(ref: str, data: bytes) -> list[dict]:
    """One sitemap file's entry rows — shared VERBATIM by the Spark
    stage (queries.q_sitemap_urls) and the golden-fixture generator.
    Document-level failures yield ONE error row with entry_idx null."""
    base = dict(media_ref=ref, entry_idx=None, kind=None, loc=None,
                lastmod=None, changefreq=None, priority=None,
                error=None)
    try:
        kind, entries = parse_sitemap(bytes(data))
    except Exception as exc:
        return [dict(base, error=str(exc))]
    return [
        dict(base, entry_idx=i, kind=kind, **e)
        for i, e in enumerate(entries)
    ]


# --- writer (deterministic corpus/test writer) ------------------------------

def encode_sitemap(
    entries: list[dict],
    kind: str = "urlset",
    gzipped: bool = False,
    namespaced: bool = True,
) -> bytes:
    """Deterministic sitemap writer (the encode_warc pattern): one
    <url>/<sitemap> per entry dict (loc required; lastmod/changefreq/
    priority optional), default-namespaced or bare tags, optionally
    gzipped."""
    child = "url" if kind == "urlset" else "sitemap"
    ns = (' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
          if namespaced else "")
    parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n<{kind}{ns}>']
    for e in entries:
        parts.append(f"  <{child}>")
        parts.append(f"    <loc>{e['loc']}</loc>")
        for f in ("lastmod", "changefreq", "priority"):
            if e.get(f) is not None:
                parts.append(f"    <{f}>{e[f]}</{f}>")
        parts.append(f"  </{child}>")
    parts.append(f"</{kind}>\n")
    out = "\n".join(parts).encode("utf-8")
    if gzipped:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        out = co.compress(out) + co.flush()
    return out
