"""Feed ingestion (RSS 2.0 + Atom, RFC 4287) — the push-shaped URL
discovery source next to sitemaps, redirects, and in-page links.

Sites announce NEW content through feeds long before a sitemap
regenerates, so a recrawl pipeline reads both: the sitemap for
coverage, the feed for freshness.  This module parses the two wire
formats every generator emits:

  RSS 2.0:  <rss><channel><item>  with <title>/<link>/<pubDate>/<guid>
  Atom:     <feed><entry>         with <title>/<link href=>/<updated>
                                  (or <published>)/<id>

Matching is by LOCALNAME (Atom is default-namespaced, RSS usually
bare; both appear with and without prefixes in the wild), payloads may
arrive gzipped (sniffed by magic), and the refuse-loudly contract
matches functions/sitemap.py: non-XML bytes, truncated markup, or a
root that is neither rss nor feed raise ValueError naming the defect;
entries without any link are themselves data (link null — a
crawl-health signal), never silently dropped.  A 5 MB uncompressed
bound caps hostile payloads (feeds are small by design; sitemaps own
the bulk-listing job).

Scale shape: one feed per row, zero-shuffle row-local mapInPandas
fan-out — identical to sitemap_urls; downstream admission reuses the
same canonicalize -> robots gate -> first-seen machinery as every
other URL source.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zlib

MAX_FEED_BYTES = 5 * 1024 * 1024
MAX_FEED_ENTRIES = 10_000

FEED_SCHEMA = (
    "media_ref string, entry_idx int, kind string, title string,"
    " link string, published string, guid string, error string"
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _gunzip_if_needed(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        out = zlib.decompressobj(16 + zlib.MAX_WBITS).decompress(
            data, MAX_FEED_BYTES + 1
        )
        if len(out) > MAX_FEED_BYTES:
            raise ValueError("feed: uncompressed size over 5 MB")
        return out
    return data


def _text(el) -> str | None:
    t = (el.text or "").strip()
    return t or None


def _rss_entry(item) -> dict:
    e = dict(title=None, link=None, published=None, guid=None)
    for f in item:
        name = _local(f.tag)
        if name == "title":
            e["title"] = _text(f)
        elif name == "link":
            # first TEXT-carrying link wins: real-world RSS items also
            # carry text-less <atom:link rel="self" href=…/> elements
            # (same localname under namespace-tolerant matching) which
            # must never clobber the already-parsed page URL
            if e["link"] is None:
                e["link"] = _text(f)
        elif name == "pubdate":
            e["published"] = _text(f)
        elif name == "guid":
            e["guid"] = _text(f)
    return e


def _atom_entry(entry) -> dict:
    e = dict(title=None, link=None, published=None, guid=None)
    updated = None
    for f in entry:
        name = _local(f.tag)
        if name == "title":
            e["title"] = _text(f)
        elif name == "link":
            # rel="alternate" (or no rel) is the page link; other rels
            # (self, edit, enclosure) are not content URLs
            rel = f.get("rel", "alternate")
            if rel == "alternate" and e["link"] is None:
                e["link"] = f.get("href") or None
        elif name == "published":
            e["published"] = _text(f)
        elif name == "updated":
            updated = _text(f)
        elif name == "id":
            e["guid"] = _text(f)
    if e["published"] is None:
        e["published"] = updated  # Atom mandates updated; published opt
    return e


def parse_feed(data: bytes) -> tuple[str, list[dict]]:
    """(kind, entries) for one feed document.  kind is 'rss' or
    'atom'; each entry carries title/link/published/guid (None where
    absent — a link-less entry is data, not an error).  Raises
    ValueError for non-XML bytes, a non-feed root, or size/entry-count
    bounds."""
    data = _gunzip_if_needed(bytes(data))
    if len(data) > MAX_FEED_BYTES:
        raise ValueError("feed: uncompressed size over 5 MB")
    try:
        root = ET.fromstring(data)
    except ET.ParseError as exc:
        raise ValueError(f"feed: XML parse failed ({exc})") from None
    rk = _local(root.tag)
    if rk == "rss":
        channel = next(
            (c for c in root if _local(c.tag) == "channel"), None
        )
        if channel is None:
            raise ValueError("feed: rss without a <channel>")
        items = [c for c in channel if _local(c.tag) == "item"]
        entries = [_rss_entry(i) for i in items]
        kind = "rss"
    elif rk == "feed":
        items = [c for c in root if _local(c.tag) == "entry"]
        entries = [_atom_entry(i) for i in items]
        kind = "atom"
    else:
        raise ValueError(
            f"feed: root element <{rk}> is neither rss nor feed"
        )
    if len(entries) > MAX_FEED_ENTRIES:
        raise ValueError("feed: over 10,000 entries")
    return kind, entries


def feed_rows(ref: str, data: bytes) -> list[dict]:
    """One feed file's entry rows — shared VERBATIM by the Spark stage
    (queries.q_feed_entries) and the golden generator.  Document-level
    failures yield ONE error row with entry_idx null."""
    base = dict(media_ref=ref, entry_idx=None, kind=None, title=None,
                link=None, published=None, guid=None, error=None)
    try:
        kind, entries = parse_feed(bytes(data))
    except Exception as exc:
        return [dict(base, error=str(exc))]
    return [
        dict(base, entry_idx=i, kind=kind, **e)
        for i, e in enumerate(entries)
    ]


# --- writer (deterministic corpus/test writer) ------------------------------

def encode_rss(entries: list[dict], gzipped: bool = False) -> bytes:
    parts = ['<?xml version="1.0"?>\n<rss version="2.0">\n<channel>',
             "<title>feed</title>"]
    for e in entries:
        parts.append("<item>")
        if e.get("title") is not None:
            parts.append(f"<title>{e['title']}</title>")
        if e.get("link") is not None:
            parts.append(f"<link>{e['link']}</link>")
        if e.get("published") is not None:
            parts.append(f"<pubDate>{e['published']}</pubDate>")
        if e.get("guid") is not None:
            parts.append(f"<guid>{e['guid']}</guid>")
        parts.append("</item>")
    parts.append("</channel>\n</rss>\n")
    out = "\n".join(parts).encode()
    return _gz(out) if gzipped else out


def encode_atom(entries: list[dict], gzipped: bool = False) -> bytes:
    parts = ['<?xml version="1.0"?>',
             '<feed xmlns="http://www.w3.org/2005/Atom">',
             "<title>feed</title>"]
    for e in entries:
        parts.append("<entry>")
        if e.get("title") is not None:
            parts.append(f"<title>{e['title']}</title>")
        if e.get("link") is not None:
            parts.append('<link rel="self" href="https://x/self"/>')
            parts.append(f'<link href="{e["link"]}"/>')
        if e.get("published") is not None:
            parts.append(f"<updated>{e['published']}</updated>")
        if e.get("guid") is not None:
            parts.append(f"<id>{e['guid']}</id>")
        parts.append("</entry>")
    parts.append("</feed>\n")
    out = "\n".join(parts).encode()
    return _gz(out) if gzipped else out


def _gz(out: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(out) + co.flush()
