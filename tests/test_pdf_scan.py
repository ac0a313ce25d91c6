"""Scanned-PDF raster extraction (functions/pdf.extract_pdf_page_rasters)
— the REAL implementation behind multimodal.parse_pdf_pages.

A scanned page's raster IS its embedded image XObject, so extraction is
object parsing + the sample filter, no renderer.  These tests pin the
writer/extractor round-trip bit-exactly per sample class, the refusal
contract, and end-to-end OCR text recovery through the shared row code.
"""

import numpy as np
import pytest

from mcp_ocr_server_spark.config import DEFAULT_CONFIG, FIXTURE_JOB
from mcp_ocr_server_spark.functions.multimodal import parse_pdf_pages
from mcp_ocr_server_spark.functions.pdf import extract_pdf_page_rasters
from mcp_ocr_server_spark.imaging.font import render_text
from mcp_ocr_server_spark.operators.media_ocr import scan_pdf_rows
from mcp_ocr_server_spark.sources import synthetic as S

CORPUS = S.INTERLEAVED_CORPUS
IMG = render_text("HELLO WORLD\nSECOND LINE", scale=3)


@pytest.mark.parametrize(
    "kwargs",
    [dict(), dict(flate=False), dict(color="rgb")],
    ids=["gray8-flate", "gray8-raw", "rgb8"],
)
def test_roundtrip_bit_exact(kwargs):
    data = S.make_scanned_pdf_bytes([IMG], **kwargs)
    (out,) = extract_pdf_page_rasters(data)
    assert out.dtype == np.uint8
    # rgb mode writes R=G=B, so the BT.601 integer luma folds back
    # to the input exactly — the writer/extractor pair is lossless
    assert np.array_equal(out, IMG)


def test_roundtrip_1bit_threshold():
    data = S.make_scanned_pdf_bytes([IMG], bits=1)
    (out,) = extract_pdf_page_rasters(data)
    expected = (IMG >= 128).astype(np.uint8) * 255  # 1 = white
    assert np.array_equal(out, expected)


def test_1bit_row_padding():
    # width not divisible by 8 exercises the per-row byte padding
    img = IMG[:, : IMG.shape[1] - 5].copy()
    assert img.shape[1] % 8 != 0
    data = S.make_scanned_pdf_bytes([img], bits=1)
    (out,) = extract_pdf_page_rasters(data)
    assert out.shape == img.shape


def test_dct_roundtrip_near_lossless():
    # /DCTDecode payload is a real baseline JPEG; q95 is lossy but the
    # per-pixel error stays far inside the binarization margin
    data = S.make_scanned_pdf_bytes([IMG], dct=True)
    assert b"/DCTDecode" in data
    (out,) = extract_pdf_page_rasters(data)
    assert out.shape == IMG.shape
    err = np.abs(out.astype(int) - IMG.astype(int))
    assert err.mean() < 1.0 and err.max() < 48


def test_multi_page_order():
    small = IMG[::2, ::2].copy()
    data = S.make_scanned_pdf_bytes([IMG, small])
    pages = extract_pdf_page_rasters(data)
    assert [p.shape for p in pages] == [IMG.shape, small.shape]


def test_parse_pdf_pages_is_real():
    # the former stub seam now delegates to the real extractor
    data = S.make_scanned_pdf_bytes([IMG])
    (out,) = parse_pdf_pages(data)
    assert np.array_equal(out, IMG)


@pytest.mark.parametrize(
    "data,msg",
    [
        (b"\x00not a pdf", "missing %PDF-"),
        (S.make_pdf_bytes([["born digital"]]), "no image XObject"),
    ],
    ids=["garbage", "born-digital"],
)
def test_refusals(data, msg):
    with pytest.raises(ValueError, match=msg):
        extract_pdf_page_rasters(data)


def test_decode_array_inverts():
    """/Decode [1 0] is a real component remap now (§8.9.5.2): the
    raster comes back exactly inverted, not a refusal."""
    data = S.make_scanned_pdf_bytes([IMG])
    data = data.replace(
        b"/BitsPerComponent 8", b"/Decode [1 0] /BitsPerComponent 8"
    )
    out = extract_pdf_page_rasters(data)[0]
    assert np.array_equal(out, 255 - IMG)


def test_refuses_unsupported_filter():
    data = S.make_scanned_pdf_bytes([IMG])
    data = data.replace(b"/Filter /FlateDecode", b"/Filter /CCITTFaxDecode")
    with pytest.raises(ValueError, match="unsupported stream filter"):
        extract_pdf_page_rasters(data)


def test_truncated_samples_refuse():
    # decompressed sample data shorter than /Width * /Height
    import zlib

    from mcp_ocr_server_spark.functions.pdf import (
        _decode_image_xobject, _Obj,
    )

    h, w = IMG.shape
    head = (
        b"<< /Subtype /Image /Width " + str(w).encode()
        + b" /Height " + str(h).encode()
        + b" /ColorSpace /DeviceGray /BitsPerComponent 8"
        b" /Filter /FlateDecode >>"
    )
    short = zlib.compress(IMG.tobytes()[: h * w // 2])
    with pytest.raises(ValueError, match="truncated"):
        _decode_image_xobject(_Obj(head, short))


def test_corpus_classes_and_ocr_recovery():
    """Every non-error corpus item OCRs back to its rendered text via
    the shared row code; error classes yield page_idx-null error rows."""
    kinds = set()
    for j in range(S.N_SCAN_PDFS):
        ref, data, kind, true_text = S.scan_pdf_item(CORPUS, j)
        kinds.add(kind)
        rows = scan_pdf_rows(ref, data, FIXTURE_JOB)
        if kind in ("garbage", "noimage"):
            assert len(rows) == 1
            assert rows[0]["page_idx"] is None
            assert rows[0]["error"]
            continue
        assert [r["error"] for r in rows] == [None]
        assert rows[0]["text"].strip() == true_text
        assert rows[0]["confidence"] > 0
    # the corpus must keep exercising every sample-class branch
    assert kinds == {
        "gray8", "raw", "gray1", "rgb", "dct", "indexed", "smask",
        "invert", "rle", "pred", "noimage", "garbage",
    }


def test_determinism():
    a = S.scan_pdf_item(CORPUS, 0)
    b = S.scan_pdf_item(CORPUS, 0)
    assert a == b
    assert DEFAULT_CONFIG is not None


def test_pdf_text_row_ocr_fallback():
    """The pipeline's pdf branch routes text-less documents through the
    raster->OCR chain: pdf_text_row with ocr_cfg recovers the rendered
    text with the engine's confidence (0-100 scale), while born-digital
    documents keep the exact-parse 100.0."""
    from mcp_ocr_server_spark.functions.pdf import pdf_text_row

    img = render_text("SCAN FALLBACK TEST", scale=3)
    scanned = S.make_scanned_pdf_bytes([img])
    row = pdf_text_row("r", scanned, ocr_cfg=FIXTURE_JOB)
    assert row["error"] is None
    assert row["text"].strip() == "SCAN FALLBACK TEST"
    assert 0 < row["confidence"] <= 100.0
    # without ocr_cfg: the text interpreter honestly reports no text
    bare = pdf_text_row("r", scanned)
    assert bare["text"].strip() == "" and bare["confidence"] == 100.0
    # born-digital: exact parse, scale-consistent 100.0
    born = pdf_text_row(
        "r", S.make_pdf_bytes([["hello world"]]), ocr_cfg=FIXTURE_JOB
    )
    assert born["text"].splitlines() == ["hello world"]
    assert born["confidence"] == 100.0


def test_pdf_corpus_scan_class_recovers_text():
    from mcp_ocr_server_spark.functions.pdf import pdf_text_row

    seen = 0
    for j in range(S.N_PDF_DOCS):
        ref, data, kind = S.pdf_item(S.CorpusConfig(n_docs=120), j)
        if kind != "scan":
            continue
        seen += 1
        row = pdf_text_row(ref, data, ocr_cfg=FIXTURE_JOB)
        assert row["error"] is None
        assert row["text"].strip()  # OCR recovered page text
        assert row["confidence"] < 100.0 or row["confidence"] == 100.0
    assert seen >= 2


def test_parse_pdf_pages_compositing_fallback():
    """Multi-image pages fall through to the content-stream renderer
    instead of refusing (same chain as pdf_text_row's OCR path); the
    noimage/born-digital refusal is unchanged."""
    from mcp_ocr_server_spark.sources.synthetic import (
        make_composite_pdf_bytes)
    top = render_text("TOP", scale=2)
    bot = render_text("BOT", scale=2)
    comp = make_composite_pdf_bytes([[
        ("image", top, 72, 640), ("image", bot, 72, 520)]])
    (page,) = parse_pdf_pages(comp)
    assert page.shape == (792, 612)
    h, w = top.shape
    assert np.array_equal(page[792 - 640 - h:792 - 640, 72:72 + w], top)
    with pytest.raises(ValueError, match="no image XObject"):
        parse_pdf_pages(S.make_pdf_bytes([["born digital"]]))


def test_scanned_rotate_corrects_sideways_scan():
    """/Rotate 90 on a scanned page: the extracted raster is the
    display-corrected (clockwise-rotated) image, so a sideways scan
    OCRs correctly."""
    import numpy as np

    from mcp_ocr_server_spark.functions.pdf import (
        extract_pdf_page_rasters)

    img = render_text("SIDEWAYS SCAN", scale=2)
    # author stores the scan rotated counterclockwise and marks the
    # page /Rotate 90 (the scanner idiom)
    stored = np.ascontiguousarray(np.rot90(img, k=1))
    data = S.make_scanned_pdf_bytes([stored])
    data = data.replace(b"/Type /Page ", b"/Type /Page /Rotate 90 ")
    (out,) = extract_pdf_page_rasters(data)
    assert np.array_equal(out, img)
