"""SRT / WebVTT subtitle extraction (functions/subtitles.py):
writer-independent round-trips per corpus class, markup stripping,
the refuse-loudly contract, and a totality fuzz."""

import pytest
from hypothesis import given, settings, strategies as st

from mcp_ocr_server_spark.functions.subtitles import (
    parse_srt,
    parse_subtitles,
    parse_vtt,
    subtitle_rows,
)
from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
from mcp_ocr_server_spark.sources import synthetic as S


def test_corpus_round_trips_every_class():
    seen = set()
    for j in range(S.N_SUBTITLE_FILES):
        ref, data, kind, cues = S.subtitle_item(FLAGSHIP_CORPUS, j)
        seen.add(kind)
        rows = subtitle_rows(ref, data)
        if kind in ("bad_ts", "garbage"):
            assert len(rows) == 1 and rows[0]["error"] is not None
            continue
        assert all(r["error"] is None for r in rows)
        if not cues:  # vtt_empty: one null-cue data row
            assert len(rows) == 1 and rows[0]["cue_idx"] is None
            assert rows[0]["format"] == "vtt"
            continue
        got = [(r["start_s"], r["end_s"], r["text"]) for r in rows]
        assert got == cues, (j, kind)
        assert [r["cue_idx"] for r in rows] == list(range(len(cues)))
    assert seen == set(S._SUB_CLASSES)


def test_srt_details():
    # optional index line, comma AND dot milliseconds, CRLF
    srt = (b"00:00:01,250 --> 00:00:02.750\r\nno index line\r\n\r\n"
           b"7\r\n01:02:03,004 --> 01:02:04,000\r\nsecond\r\n")
    cues = parse_srt(srt.decode())
    assert cues[0]["start_s"] == 1.25 and cues[0]["end_s"] == 2.75
    assert cues[1]["start_s"] == 3723.004
    assert cues[1]["text"] == "second"
    with pytest.raises(ValueError, match="bad timestamp"):
        parse_srt("1\n00:00:01 -> 00:00:02\nx")
    with pytest.raises(ValueError, match="end before start"):
        parse_srt("1\n00:00:05,000 --> 00:00:01,000\nx")


def test_vtt_details():
    vtt = ("WEBVTT - with a title\n\n"
           "NOTE skipped\n\n"
           "STYLE\n::cue { color: red }\n\n"
           "id-1\n00:59.900 --> 01:01.000 position:50%\n"
           "<c.loud>Styled</c> and <00:01:00.000>timed\n\n"
           "00:00:02.000 --> 00:00:03.000\nplain\n")
    cues = parse_vtt(vtt)
    assert len(cues) == 2
    assert cues[0]["start_s"] == 59.9 and cues[0]["end_s"] == 61.0
    assert cues[0]["text"] == "Styled and timed"
    with pytest.raises(ValueError, match="WEBVTT header"):
        parse_vtt("not a vtt")


def test_bom_and_latin1_fallback():
    bom = b"\xef\xbb\xbfWEBVTT\n\n00:01.000 --> 00:02.000\nok\n"
    fmt, cues = parse_subtitles(bom)
    assert fmt == "vtt" and cues[0]["text"] == "ok"
    # latin-1 bytes that are not valid utf-8 still decode totally
    srt = ("1\n00:00:01,000 --> 00:00:02,000\ncaf\xe9\n"
           ).encode("latin-1")
    fmt, cues = parse_subtitles(srt)
    assert fmt == "srt" and cues[0]["text"] == "café"


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=300))
def test_parse_exception_contract_fuzz(data):
    """Arbitrary bytes either parse or raise ValueError — never an
    IndexError/AttributeError leak; subtitle_rows is always total."""
    try:
        fmt, cues = parse_subtitles(data)
    except ValueError:
        pass
    else:
        assert fmt in ("srt", "vtt")
        for c in cues:
            assert c["end_s"] >= c["start_s"]
    rows = subtitle_rows("r", data)
    assert rows and all("media_ref" in r for r in rows)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=200))
def test_parse_magic_prefixed_fuzz(data):
    for magic in (b"WEBVTT\n", b"1\n00:00:01,000 --> 00:00:02,000\n"):
        try:
            parse_subtitles(magic + data)
        except ValueError:
            pass


def test_ttml_details():
    from mcp_ocr_server_spark.functions.subtitles import parse_ttml

    t = ('<?xml version="1.0"?>\n<tt xmlns="http://www.w3.org/ns/ttml">'
         '<body><div>'
         '<p begin="00:00:01.5" end="00:00:03.000">A &amp; B<br/>two</p>'
         '<p begin="90s" end="1.6m">offset times</p>'
         '<p region="r1">no timing: layout paragraph, skipped</p>'
         '</div></body></tt>')
    cues = parse_ttml(t)
    assert len(cues) == 2
    assert cues[0]["start_s"] == 1.5 and cues[0]["end_s"] == 3.0
    assert cues[0]["text"] == "A & B\ntwo"
    assert cues[1]["start_s"] == 90.0 and cues[1]["end_s"] == 96.0
    with pytest.raises(ValueError, match="bad time"):
        parse_ttml('<tt><p begin="soon" end="later">x</p></tt>')
    # dispatcher: XML prolog routes to ttml; a <tt>-less XML refuses
    fmt, _ = parse_subtitles(t.encode())
    assert fmt == "ttml"
    with pytest.raises(ValueError, match="<tt> root"):
        parse_subtitles(b'<?xml version="1.0"?><other/>')
