"""functions/warc.py — WARC/1.0 round-trips (plain + per-record-gzip),
the HTTP response split, the refuse-loudly error contract, a fuzz
sweep, and the fused warc->main-content composition against the html
generator's known prose."""

import numpy as np
import pytest

from mcp_ocr_server_spark.functions.warc import (
    encode_warc,
    gunzip_members,
    iter_warc_records,
    split_http_response,
    warc_main_rows,
    warc_record_rows,
)

RECS = [
    dict(type="warcinfo", payload=b"software: t\r\n"),
    dict(type="request", url="http://ex.com/a",
         payload=b"GET /a HTTP/1.1\r\n\r\n"),
    dict(type="response", url="http://ex.com/a", http_status=200,
         mime="text/html",
         payload=b"<html><body><p>hello prose</p></body></html>"),
    dict(type="response", url="http://ex.com/miss", http_status=404,
         mime="text/html", payload=b"nope"),
    dict(type="response", url="http://ex.com/i", http_status=200,
         mime="image/png", payload=b"\x89PNG fake"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_record_mix(gz):
    data = encode_warc(RECS, gzip_members=gz)
    rows = warc_record_rows("w0", data)
    assert [r["warc_type"] for r in rows] == [
        "warcinfo", "request", "response", "response", "response"]
    assert all(r["error"] is None for r in rows)
    assert rows[2]["http_status"] == 200
    assert rows[2]["mime"] == "text/html"
    assert rows[3]["http_status"] == 404
    assert rows[4]["mime"] == "image/png"
    assert rows[2]["payload_len"] == len(RECS[2]["payload"])
    # payloads cross as md5, never bytes
    assert all(len(r["payload_md5"]) == 32 for r in rows)


def test_gzip_members_multi_member():
    # gzip.decompress would stop after member one; the multi-member
    # loop must recover every record
    data = encode_warc(RECS, gzip_members=True)
    assert data.count(b"\x1f\x8b\x08") >= len(RECS)
    plain = gunzip_members(data)
    assert len(list(iter_warc_records(plain))) == len(RECS)


def test_split_http_response():
    block = (b"HTTP/1.1 301 Moved Permanently\r\n"
             b"Content-Type: text/html; charset=utf-8\r\n"
             b"Location: /new\r\n\r\nbody")
    status, mime, ctype, payload = split_http_response(block)
    assert (status, mime, payload) == (301, "text/html", b"body")
    assert ctype == "text/html; charset=utf-8"  # param feeds the sniffer
    with pytest.raises(ValueError, match="status line"):
        split_http_response(b"NOTHTTP\r\n\r\n")
    with pytest.raises(ValueError, match="terminator"):
        split_http_response(b"HTTP/1.1 200 OK\r\n")


def test_error_contract_one_loud_row():
    for data, needle in [
        (b"NOTWARC/1.0\r\n\r\n", "bad record magic"),
        (encode_warc(RECS)[:60], "truncated"),
        (b"\x1f\x8b" + b"j" * 40, "gzip"),
        (b"WARC/1.0\r\nWARC-Type: x\r\n\r\n", "Content-Length"),
    ]:
        rows = warc_record_rows("w", data)
        assert len(rows) >= 1 and rows[-1]["error"], (needle, rows)
        assert needle in rows[-1]["error"]


def test_fuzz_exception_discipline():
    good = encode_warc(RECS)
    rng = np.random.default_rng(11)
    for _ in range(200):
        b = bytearray(good)
        for _ in range(rng.integers(1, 4)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        rows = warc_record_rows("w", bytes(b))   # never raises
        assert rows
    gz = encode_warc(RECS, gzip_members=True)
    for cut in range(1, len(gz), 13):
        assert warc_record_rows("w", gz[:cut])
    # zero bytes = an empty archive: zero records, zero errors
    assert warc_record_rows("w", b"") == []


def test_main_content_composition_strips_boilerplate():
    from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
    from mcp_ocr_server_spark.sources.synthetic import (
        N_WARC_FILES,
        warc_item,
    )

    kinds = {}
    for j in range(N_WARC_FILES):
        ref, data, kind = warc_item(FLAGSHIP_CORPUS, j)
        kinds[kind] = kinds.get(kind, 0) + 1
        rows = warc_main_rows(ref, data)
        if kind in ("warc", "warc_gz"):
            # only the 200 text/html responses survive the route —
            # never the png / 404 / 301 / request / warcinfo records;
            # the brotli wire page is the ONE per-record error row
            # (its codec is refused, isolation keeps the archive)
            err = [r for r in rows if r["error"]]
            assert len(err) == 1 and "'br' unsupported" in err[0]["error"]
            ok = [r for r in rows if not r["error"]]
            assert len(ok) == len(
                [r for r in warc_record_rows(ref, data)
                 if r["http_status"] == 200 and r["mime"] == "text/html"]
            )
            for r in ok:
                assert r["n_chars"] > 50
                # boilerplate stripped: nav/footer markers never leak
                assert "copyright" not in r["main_text"]
                assert "sponsored" not in r["main_text"]
        else:
            assert len(rows) == 1 and rows[0]["error"]
    assert set(kinds) == {"warc", "warc_gz", "warc_truncated",
                          "garbage"}


def test_chunked_transfer_reassembly():
    body = b"A" * 700 + b"B" * 300  # spans multiple 512-byte chunks
    data = encode_warc([dict(type="response", url="http://x/c",
                             http_status=200, mime="text/html",
                             payload=body, transfer_chunked=True)])
    (hdrs, block), = iter_warc_records(data)
    assert b"Transfer-Encoding: chunked" in block
    status, mime, _ct, payload = split_http_response(block)
    assert payload == body


def test_chunk_extensions_ignored():
    block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
             b"Transfer-Encoding: chunked\r\n\r\n"
             b"5;name=val\r\nhello\r\n0\r\n\r\n")
    assert split_http_response(block)[3] == b"hello"


@pytest.mark.parametrize(
    "tail, msg",
    [
        (b"zz\r\nhello\r\n0\r\n\r\n", "bad chunk size"),
        (b"10\r\nhello", "truncated"),
        (b"5\r\nhelloXX0\r\n\r\n", "CRLF terminator"),
        (b"5\r\nhello\r\n", "missing size line"),
    ],
    ids=["bad-size", "short-data", "no-crlf", "no-terminator"],
)
def test_chunked_malformed_refuses(tail, msg):
    block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
             b"Transfer-Encoding: chunked\r\n\r\n" + tail)
    with pytest.raises(ValueError, match=msg):
        split_http_response(block)


@pytest.mark.parametrize("enc", ["gzip", "deflate", "deflate-raw"])
def test_content_encoding_decodes(enc):
    body = b"<html><p>compressed page body</p></html>" * 20
    data = encode_warc([dict(type="response", url="http://x/e",
                             http_status=200, mime="text/html",
                             payload=body, content_encoding=enc)])
    (_h, block), = iter_warc_records(data)
    assert split_http_response(block)[3] == body


def test_gzip_inside_chunked_decodes_in_order():
    # transfer coding wraps the CONTENT coding on the wire: dechunk
    # first, then gunzip
    body = b"<html><p>layered</p></html>" * 40
    data = encode_warc([dict(type="response", url="http://x/gc",
                             http_status=200, mime="text/html",
                             payload=body, content_encoding="gzip",
                             transfer_chunked=True)])
    (_h, block), = iter_warc_records(data)
    assert split_http_response(block)[3] == body


def test_brotli_refuses_and_isolates():
    recs = [
        dict(type="response", url="http://x/br", http_status=200,
             mime="text/html", payload=b"\x1b\x2c\x03",
             content_encoding="br"),
        dict(type="response", url="http://x/ok", http_status=200,
             mime="text/html", payload=b"<html><p>fine</p></html>"),
    ]
    rows = warc_record_rows("w", encode_warc(recs))
    assert len(rows) == 2
    assert "'br' unsupported" in rows[0]["error"]
    assert rows[1]["error"] is None and rows[1]["payload_len"] > 0


def test_redirect_edges_head_only():
    from mcp_ocr_server_spark.functions.warc import warc_redirect_rows
    recs = [
        dict(type="response", url="http://x/old", http_status=301,
             mime="text/html", payload=b"", location="https://x/new"),
        dict(type="response", url="http://x/302", http_status=302,
             mime="text/html", payload=b""),  # 3xx without Location
        # a refused content coding on a NON-3xx page must not error
        # the redirect query: only the head is parsed
        dict(type="response", url="http://x/br", http_status=200,
             mime="text/html", payload=b"\x1b", content_encoding="br"),
        dict(type="response", url="http://x/ok", http_status=200,
             mime="text/html", payload=b"<p>x</p>"),
    ]
    rows = warc_redirect_rows("w", encode_warc(recs))
    assert [(r["url"], r["http_status"], r["location"], r["error"])
            for r in rows] == [
        ("http://x/old", 301, "https://x/new", None),
        ("http://x/302", 302, None, None),
    ]
    # structural failure: one loud rec_idx-null row
    rows = warc_redirect_rows("w", b"NOTWARC")
    assert len(rows) == 1 and rows[0]["error"]


def test_truncated_gzip_body_refuses_not_partial():
    """A gzip Content-Encoding body cut mid-stream must surface as an
    error row, never flow onward as a silently partial page."""
    body = b"<html><p>full page body</p></html>" * 30
    data = encode_warc([dict(type="response", url="http://x/t",
                             http_status=200, mime="text/html",
                             payload=body, content_encoding="gzip")])
    # cut the LAST bytes of the record's gzip payload, keeping WARC
    # framing valid: rebuild the record with a truncated body
    import zlib as _z
    co = _z.compressobj(6, _z.DEFLATED, 31)
    gz = co.compress(body) + co.flush()
    cut = gz[:-8]
    block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
             b"Content-Encoding: gzip\r\n\r\n" + cut)
    with pytest.raises(ValueError, match="truncated mid-stream"):
        split_http_response(block)
    rows = warc_record_rows("w", encode_warc([dict(
        type="response", url="http://x/t", http_status=200,
        mime="text/html", payload=b"ok")]))
    assert rows[0]["error"] is None  # intact records unaffected


def test_multi_member_gzip_body_decodes_fully():
    import zlib as _z

    def gz(b):
        co = _z.compressobj(6, _z.DEFLATED, 31)
        return co.compress(b) + co.flush()

    block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
             b"Content-Encoding: gzip\r\n\r\n"
             + gz(b"part1 ") + gz(b"part2"))
    assert split_http_response(block)[3] == b"part1 part2"
