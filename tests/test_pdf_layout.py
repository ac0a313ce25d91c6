"""Position-aware PDF layout extraction (functions/pdf.extract_pdf_layout)
— the ISO 32000-1 §9.4 text-matrix interpreter that recovers READING
order when the content stream's emission order lies.
"""

import numpy as np
import pytest

from mcp_ocr_server_spark.functions.pdf import (
    extract_pdf_layout,
    extract_pdf_text,
    pdf_layout_rows,
)
from mcp_ocr_server_spark.sources import synthetic as S

CORPUS = S.INTERLEAVED_CORPUS


def test_shuffled_emission_recovers_reading_order():
    runs = [(72.0, 720.0, "first line"), (72.0, 706.0, "second line"),
            (72.0, 692.0, "third line")]
    shuffled = [runs[2], runs[0], runs[1]]
    data = S.make_positioned_pdf_bytes([shuffled])
    rows = extract_pdf_layout(data)
    assert [r["text"] for r in rows] == [
        "first line", "second line", "third line"
    ]
    assert [r["line_idx"] for r in rows] == [0, 1, 2]
    assert [r["y"] for r in rows] == [720.0, 706.0, 692.0]
    # the emission-order interpreter reads the stream as written —
    # scrambled — which is exactly why the geometry pass exists
    assert extract_pdf_text(data)[0].splitlines() == [
        "third line", "first line", "second line"
    ]


def test_split_runs_sort_by_x_within_line():
    data = S.make_positioned_pdf_bytes([
        [(200.0, 700.0, "tail"), (72.0, 700.0, "head")]
    ])
    rows = extract_pdf_layout(data)
    assert len(rows) == 1
    assert rows[0]["text"] == "head tail"
    assert rows[0]["x"] == 72.0


def test_relative_positioning_matches_naive_interpreter():
    # Td/TL/T* pages position monotonically: both interpreters agree
    pages = [["alpha beta", "gamma delta", "epsilon"]]
    data = S.make_pdf_bytes(pages, compress=True)
    rows = extract_pdf_layout(data)
    assert [r["text"] for r in rows] == pages[0]
    assert extract_pdf_text(data)[0].splitlines() == pages[0]


def test_multi_page_indices():
    data = S.make_positioned_pdf_bytes([
        [(72.0, 700.0, "p0")],
        [(72.0, 700.0, "p1a"), (72.0, 650.0, "p1b")],
    ])
    rows = extract_pdf_layout(data)
    assert [(r["page_idx"], r["line_idx"], r["text"]) for r in rows] == [
        (0, 0, "p0"), (1, 0, "p1a"), (1, 1, "p1b"),
    ]


def test_corpus_classes_and_row_contract():
    kinds = set()
    for j in range(S.N_LAYOUT_PDFS):
        ref, data, kind = S.layout_pdf_item(CORPUS, j)
        kinds.add(kind)
        rows = pdf_layout_rows(ref, data)
        if kind in ("garbage", "encrypted"):
            assert len(rows) == 1 and rows[0]["error"]
            assert rows[0]["page_idx"] is None
            continue
        assert all(r["error"] is None for r in rows)
        # reading order invariant: y strictly decreasing within a page
        for p in {r["page_idx"] for r in rows}:
            ys = [r["y"] for r in rows if r["page_idx"] == p]
            assert ys == sorted(ys, reverse=True)
    assert kinds == {"ok_shuffled", "ok_relative", "garbage", "encrypted"}


def test_shuffle_actually_scrambles_some_streams():
    # the corpus must keep exercising the stream-order-lies case: on at
    # least one document the naive text differs from the layout text
    differed = 0
    for j in range(S.N_LAYOUT_PDFS):
        _ref, data, kind = S.layout_pdf_item(CORPUS, j)
        if kind != "ok_shuffled":
            continue
        naive = extract_pdf_text(data)
        layout = extract_pdf_layout(data)
        lay_pages: dict[int, list[str]] = {}
        for r in layout:
            lay_pages.setdefault(r["page_idx"], []).append(r["text"])
        joined = [
            "\n".join(lay_pages[p]) for p in sorted(lay_pages)
        ]
        if joined != naive:
            differed += 1
    assert differed >= 3


def test_determinism():
    a = S.layout_pdf_item(CORPUS, 1)
    b = S.layout_pdf_item(CORPUS, 1)
    assert a == b
    assert np is not None


def test_tm_with_scale_still_anchors_origin():
    # Tm carries a scale; the origin (e, f) is still the anchor
    content_pdf = S.make_positioned_pdf_bytes([[(10.0, 500.0, "x")]])
    data = content_pdf.replace(b"1 0 0 1 10 500 Tm", b"2 0 0 2 10 500 Tm")
    rows = extract_pdf_layout(data)
    assert rows[0]["x"] == 10.0 and rows[0]["y"] == 500.0


def test_refusals():
    with pytest.raises(ValueError, match="missing %PDF-"):
        extract_pdf_layout(b"nope")
