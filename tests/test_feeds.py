"""functions/feeds.py — RSS 2.0 + Atom ingestion: writer/parser
round-trips, Atom link-rel handling, the updated/published fallback,
refusals, fuzz, and corpus classes."""

import numpy as np
import pytest

from mcp_ocr_server_spark.functions.feeds import (
    encode_atom,
    encode_rss,
    feed_rows,
    parse_feed,
)
from mcp_ocr_server_spark.sources import synthetic as S

ENTRIES = [
    dict(title="first post", link="https://h.example.com/docs/1",
         published="2026-01-02", guid="urn:1"),
    dict(title="second", link="https://h.example.com/docs/2"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_rss_roundtrip(gz):
    kind, out = parse_feed(encode_rss(ENTRIES, gzipped=gz))
    assert kind == "rss"
    assert out[0] == ENTRIES[0]
    assert out[1] == dict(title="second",
                          link="https://h.example.com/docs/2",
                          published=None, guid=None)


def test_atom_roundtrip_and_rel_handling():
    kind, out = parse_feed(encode_atom(ENTRIES))
    assert kind == "atom"
    # the writer emits a rel="self" link BEFORE the alternate; the
    # parser must pick the alternate
    assert out[0]["link"] == ENTRIES[0]["link"]
    assert out[0]["published"] == "2026-01-02"  # via <updated>
    assert out[0]["guid"] == "urn:1"


def test_atom_published_beats_updated():
    data = encode_atom([ENTRIES[0]]).replace(
        b"<updated>2026-01-02</updated>",
        b"<updated>2026-01-02</updated>"
        b"<published>2025-12-31</published>")
    _k, out = parse_feed(data)
    assert out[0]["published"] == "2025-12-31"


def test_linkless_entries_are_data():
    _k, out = parse_feed(encode_rss([dict(title="no link here")]))
    assert out == [dict(title="no link here", link=None,
                        published=None, guid=None)]


@pytest.mark.parametrize(
    "data, msg",
    [
        (b"<html><body/></html>", "neither rss nor feed"),
        (b"\x00\x01", "XML parse failed"),
        (b"<rss version='2.0'><item/></rss>", "without a <channel>"),
    ],
    ids=["wrong-root", "not-xml", "no-channel"],
)
def test_refusals(data, msg):
    with pytest.raises(ValueError, match=msg):
        parse_feed(data)


def test_fuzz_exception_contract():
    rng = np.random.default_rng(18)
    good = encode_rss(ENTRIES)
    cases = [bytes(rng.integers(0, 256, 70, dtype=np.uint8).tolist())
             for _ in range(30)]
    cases += [good[:k] for k in range(0, len(good), 19)]
    for data in cases:
        assert feed_rows("f", data)  # rows or one error row, no leaks


def test_corpus_classes():
    from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
    kinds = {}
    for j in range(S.N_FEEDS):
        ref, data, kind = S.feed_item(FLAGSHIP_CORPUS, j)
        rows = feed_rows(ref, data)
        kinds[kind] = kinds.get(kind, 0) + 1
        if kind in ("garbage", "malformed", "wrongroot"):
            assert len(rows) == 1 and rows[0]["error"]
        elif kind == "sparse":
            assert all(r["link"] is None and r["error"] is None
                       for r in rows)
        else:
            assert all(r["link"] and r["error"] is None for r in rows)
    assert set(kinds) == {"rss", "rss_gz", "atom", "sparse",
                          "malformed", "wrongroot", "garbage"}
    assert S.feed_item(FLAGSHIP_CORPUS, 2) == \
        S.feed_item(FLAGSHIP_CORPUS, 2)


def test_textless_atom_self_link_never_clobbers_rss_link():
    data = (b'<?xml version="1.0"?>\n<rss version="2.0"><channel>'
            b"<title>t</title><item><title>a</title>"
            b"<link>https://x/page</link>"
            b'<atom:link xmlns:atom="http://www.w3.org/2005/Atom"'
            b' rel="self" href="https://x/feed"/>'
            b"</item></channel></rss>")
    _k, out = parse_feed(data)
    assert out[0]["link"] == "https://x/page"
    # and in the reversed order too
    data2 = data.replace(
        b"<link>https://x/page</link>", b"").replace(
        b"</item>", b"<link>https://x/page</link></item>")
    _k, out2 = parse_feed(data2)
    assert out2[0]["link"] == "https://x/page"
