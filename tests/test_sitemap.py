"""functions/sitemap.py — sitemaps.org ingestion: writer/parser
round-trips across both document kinds and both wire axes (gzip,
namespacing), protocol limits enforced, the refuse-loudly error
contract, a fuzz sweep, and corpus-class coverage."""

import numpy as np
import pytest

from mcp_ocr_server_spark.functions.sitemap import (
    MAX_ENTRIES,
    encode_sitemap,
    parse_sitemap,
    sitemap_rows,
)
from mcp_ocr_server_spark.sources import synthetic as S

ENTRIES = [
    dict(loc="https://site0.example.com/docs/1",
         lastmod="2026-01-02", changefreq="daily", priority=0.8),
    dict(loc="https://site0.example.com/docs/2"),
    dict(loc="https://site0.example.com/docs/3", priority=0.1),
]


@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("ns", [False, True])
def test_urlset_roundtrip(gz, ns):
    data = encode_sitemap(ENTRIES, gzipped=gz, namespaced=ns)
    kind, out = parse_sitemap(data)
    assert kind == "urlset"
    assert [e["loc"] for e in out] == [e["loc"] for e in ENTRIES]
    assert out[0] == dict(loc=ENTRIES[0]["loc"], lastmod="2026-01-02",
                          changefreq="daily", priority=0.8)
    assert out[1] == dict(loc=ENTRIES[1]["loc"], lastmod=None,
                          changefreq=None, priority=None)


def test_sitemapindex_roundtrip():
    kids = [dict(loc=f"https://h.example.com/sitemap-{k}.xml.gz",
                 lastmod=f"2026-01-0{k + 1}") for k in range(3)]
    kind, out = parse_sitemap(encode_sitemap(kids, kind="sitemapindex"))
    assert kind == "sitemapindex"
    assert [e["loc"] for e in out] == [k["loc"] for k in kids]


def test_foreign_elements_ignored_per_protocol():
    data = encode_sitemap(ENTRIES).replace(
        b"  <url>",
        b"  <extension>x</extension>\n  <url>", 1)
    _kind, out = parse_sitemap(data)
    assert len(out) == len(ENTRIES)


@pytest.mark.parametrize(
    "mangle, msg",
    [
        (lambda d: d[: len(d) // 2], "XML parse failed"),
        (lambda d: b"\x00nope", "XML parse failed"),
        (lambda d: d.replace(b"<urlset", b"<rss").replace(
            b"</urlset>", b"</rss>"), "not urlset/sitemapindex"),
        (lambda d: d.replace(b"<priority>0.8</priority>",
                             b"<priority>high</priority>"),
         "non-numeric priority"),
        (lambda d: d.replace(
            b"<loc>https://site0.example.com/docs/2</loc>", b""),
         "missing <loc>"),
    ],
    ids=["truncated", "not-xml", "wrong-root", "bad-priority",
         "missing-loc"],
)
def test_refusals(mangle, msg):
    with pytest.raises(ValueError, match=msg):
        parse_sitemap(mangle(encode_sitemap(ENTRIES)))


def test_entry_limit_enforced():
    many = [dict(loc=f"https://h.example.com/{i}")
            for i in range(MAX_ENTRIES + 1)]
    with pytest.raises(ValueError, match="50,000 entries"):
        parse_sitemap(encode_sitemap(many))


def test_error_rows_isolate_per_document():
    rows = sitemap_rows("s0", b"\xff not xml")
    assert len(rows) == 1 and rows[0]["error"] and \
        rows[0]["entry_idx"] is None
    rows = sitemap_rows("s1", encode_sitemap(ENTRIES))
    assert [r["entry_idx"] for r in rows] == [0, 1, 2]
    assert all(r["error"] is None for r in rows)


def test_fuzz_exception_contract():
    rng = np.random.default_rng(16)
    good = encode_sitemap(ENTRIES)
    cases = [bytes(rng.integers(0, 256, 80, dtype=np.uint8).tolist())
             for _ in range(30)]
    cases += [good[:k] for k in range(0, len(good), 23)]
    cases += [b"\x1f\x8b" + bytes(rng.integers(0, 256, 40,
                                               dtype=np.uint8).tolist())
              for _ in range(10)]
    for data in cases:
        assert sitemap_rows("f", data)  # error row or entry rows


def test_corpus_classes():
    from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
    kinds = {}
    for j in range(S.N_SITEMAPS):
        ref, data, kind = S.sitemap_item(FLAGSHIP_CORPUS, j)
        rows = sitemap_rows(ref, data)
        kinds[kind] = kinds.get(kind, 0) + 1
        if kind in ("garbage", "malformed", "badpriority"):
            assert len(rows) == 1 and rows[0]["error"]
        elif kind == "index":
            # children are resolvable refs of THIS store (the expand
            # join's key), not dangling URLs
            assert all(r["kind"] == "sitemapindex" and
                       "/crawl/sitemaps/" in r["loc"] for r in rows)
        else:
            assert all(r["kind"] == "urlset" and "/docs/" in r["loc"]
                       for r in rows)
            if kind == "sparse":
                assert all(r["lastmod"] is None and r["priority"] is None
                           for r in rows)
    assert set(kinds) == {"urlset", "urlset_gz", "sparse", "index",
                          "malformed", "badpriority", "garbage"}
    # determinism
    assert S.sitemap_item(FLAGSHIP_CORPUS, 1) == \
        S.sitemap_item(FLAGSHIP_CORPUS, 1)
