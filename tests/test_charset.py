"""Charset resolver (functions/charset.py) — WHATWG-style precedence
(BOM > HTTP param > meta prescan > strict-utf8 > cp1252 fallback), the
ISO-8859-1 -> windows-1252 alias rule, total decode on lying headers,
and the WARC integration (per-page provenance columns)."""

import pytest

from mcp_ocr_server_spark.functions.charset import (
    PRESCAN_BYTES,
    decode_html,
    sniff_charset,
)


def test_precedence_bom_beats_everything():
    # BOM wins even against a contradicting HTTP header
    assert sniff_charset("text/html; charset=shift_jis",
                         b"\xef\xbb\xbfhi") == ("utf-8-sig", "bom")
    assert sniff_charset(None, b"\xff\xfex\x00") == ("utf-16-le", "bom")
    assert sniff_charset(None, b"\xfe\xff\x00x") == ("utf-16-be", "bom")


def test_precedence_http_beats_meta():
    body = b'<meta charset="koi8-r">\xcf\xd2'
    assert sniff_charset("text/html; charset=windows-1251",
                         body) == ("windows-1251", "http")
    # without the header the meta wins
    assert sniff_charset("text/html", body) == ("koi8-r", "meta")


def test_meta_variants():
    for body in (
        b'<meta charset="windows-1251">',
        b"<meta charset='windows-1251'>",
        b"<META CHARSET=WINDOWS-1251>",
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=windows-1251">',
    ):
        assert sniff_charset(None, body + b"\xff") == (
            "windows-1251", "meta"), body


def test_meta_prescan_window():
    # a meta declaration past the 1024-byte prescan is NOT honored
    # (the WHATWG prescan bound); the invalid byte forces fallback
    late = b" " * PRESCAN_BYTES + b'<meta charset="koi8-r">\xff'
    assert sniff_charset(None, late) == ("windows-1252", "fallback")


def test_latin1_label_means_cp1252():
    # the consequential alias: the euro byte 0x80 is unmapped in real
    # ISO-8859-1 but every browser renders it via cp1252
    text, charset, source = decode_html(
        "text/html; charset=iso-8859-1", b"price \x80 42")
    assert text == "price € 42"
    assert (charset, source) == ("windows-1252", "http")
    for label in ("latin-1", "US-ASCII", "ISO8859-1", "l1"):
        assert sniff_charset(f"text/html; charset={label}",
                             b"\xff")[0] == "windows-1252"


def test_undeclared_utf8_validates():
    assert sniff_charset(None, "naïve café".encode()) == (
        "utf-8", "utf8-valid")
    assert sniff_charset("text/html", b"plain ascii") == (
        "utf-8", "utf8-valid")


def test_fallback_is_total():
    # invalid utf-8, nothing declared: cp1252 decodes EVERY byte
    text, charset, source = decode_html(None, bytes(range(256)))
    assert (charset, source) == ("windows-1252", "fallback")
    assert len(text) == 256


def test_unknown_label_falls_through():
    assert sniff_charset("text/html; charset=bogus-enc",
                         b"ok") == ("utf-8", "utf8-valid")
    assert sniff_charset("text/html; charset=bogus-enc",
                         b"\xff") == ("windows-1252", "fallback")


def test_lying_header_yields_replacement_not_error():
    text, charset, source = decode_html(
        "text/html; charset=utf-8", "café".encode("latin-1"))
    assert (charset, source) == ("utf-8", "http")
    assert "�" in text  # mojibake surfaces, row still flows


def test_bom_stripped_from_text():
    for payload in (b"\xef\xbb\xbfhi",
                    b"\xff\xfe" + "hi".encode("utf-16-le"),
                    b"\xfe\xff" + "hi".encode("utf-16-be")):
        text, _, source = decode_html(None, payload)
        assert source == "bom" and text == "hi", payload


def test_warc_main_rows_carry_provenance():
    from collections import Counter

    from mcp_ocr_server_spark.functions.warc import warc_main_rows
    from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
    from mcp_ocr_server_spark.sources.synthetic import (
        N_WARC_FILES,
        warc_item,
    )

    sources = Counter()
    mojibake = 0
    for j in range(N_WARC_FILES):
        ref, data, kind = warc_item(FLAGSHIP_CORPUS, j)
        for r in warc_main_rows(ref, data):
            if r["error"]:
                continue
            sources[r["charset_source"]] += 1
            if "�" in r["main_text"]:
                mojibake += 1
                # the lie is http-declared utf-8 over latin-1 bytes
                assert (r["charset"], r["charset_source"]) == (
                    "utf-8", "http")
            assert r["main_text"], r  # every page still extracts
    # every resolution source appears in the corpus
    assert set(sources) == {"bom", "http", "meta", "utf8-valid",
                            "fallback"}
    assert mojibake > 0
