"""Scan-format corpus + queries (scan_inventory / scan_ocr): the
BMP/PNM/TIFF half of the imdecode input matrix driven end-to-end —
ground-truth OCR recovery per format, the refuse-loudly error
contract, and the zero-shuffle plan property."""

import numpy as np
import pytest

from mcp_ocr_server_spark.operators.media_ocr import (
    scan_image_ocr_rows,
    scan_inventory_row,
)
from mcp_ocr_server_spark.queries import FIXTURE_JOB, FLAGSHIP_CORPUS
from mcp_ocr_server_spark.sources.synthetic import (
    N_SCAN_IMAGES,
    _SCAN_CLASSES,
    scan_format_item,
)

SF = "/root/testdata/sf0.001"


def _corpus():
    return [scan_format_item(FLAGSHIP_CORPUS, j) for j in range(N_SCAN_IMAGES)]


def test_every_class_present():
    kinds = {k for _, _, k, _ in _corpus()}
    assert kinds == set(_SCAN_CLASSES)


def test_ocr_recovers_rendered_truth_every_format():
    """100% text recovery on every decodable format, page by page —
    the ground-truth bar the PNG branch already meets
    (test_ground_truth.py), now across BMP/PNM/TIFF."""
    for ref, data, kind, truths in _corpus():
        rows = scan_image_ocr_rows(ref, data, FIXTURE_JOB)
        if kind.startswith("err_"):
            assert len(rows) == 1 and rows[0]["error"]
            assert rows[0]["page_idx"] is None
            continue
        assert len(rows) == len(truths), kind
        for r, want in zip(rows, truths):
            assert r["error"] is None, (kind, r)
            assert r["text"] == want, (kind, r["text"], want)


def test_multipage_tiff_page_grain():
    pages_seen = set()
    for ref, data, kind, truths in _corpus():
        if kind != "tiff_multipage":
            continue
        inv = scan_inventory_row(ref, data)
        assert inv["n_pages"] == len(truths) >= 2
        pages_seen.add(inv["n_pages"])
    assert len(pages_seen) >= 2, "page counts should vary across files"


def test_animated_gif_frame_grain():
    """Animated GIF frames are pages, exactly like TIFF IFDs — every
    frame OCRs back to its own rendered truth."""
    frames_seen = set()
    for ref, data, kind, truths in _corpus():
        if kind != "gif_animated":
            continue
        inv = scan_inventory_row(ref, data)
        assert inv["n_pages"] == len(truths) >= 2
        frames_seen.add(inv["n_pages"])
    assert len(frames_seen) >= 2, "frame counts should vary across files"


def test_inventory_formats_and_refusals():
    by_kind = {}
    for ref, data, kind, _ in _corpus():
        by_kind.setdefault(kind, scan_inventory_row(ref, data))
    assert by_kind["bmp_gray"]["format"] == "bmp"
    assert by_kind["bmp_gray"]["channels"] == 1
    assert by_kind["bmp_rgb"]["channels"] == 3
    assert by_kind["pgm"]["format"] == "pnm"
    assert by_kind["tiff_lzw"]["format"] == "tiff"
    assert by_kind["tiff_packbits_bilevel"]["channels"] == 1
    assert by_kind["webp"]["format"] == "webp"
    assert by_kind["pnm_16bit"]["format"] == "pnm"
    assert by_kind["pnm_16bit"]["error"] is None  # folds, not refuses
    assert by_kind["gif"]["format"] == "gif"
    assert by_kind["gif"]["channels"] == 1  # gray ramp folds to HxW
    assert by_kind["gif_interlaced"]["n_pages"] == 1
    assert by_kind["ico_png"]["format"] == "ico"
    assert by_kind["ico_bmp"]["format"] == "ico"
    assert "lossy VP8" in by_kind["err_webp_lossy"]["error"]
    assert "not PNG/JPEG/BMP/PNM/TIFF" in by_kind["err_foreign"]["error"]
    for kind, row in by_kind.items():
        if not kind.startswith("err_"):
            assert row["error"] is None, (kind, row)


def test_scan_queries_zero_shuffle_plan(spark):
    """Both scan queries are row-local mapInPandas: no Exchange in
    either physical plan (the audio/video-inventory contract)."""
    from mcp_ocr_server_spark import queries as Q

    for name in ("scan_inventory", "scan_ocr"):
        plan = Q.QUERIES[name][0](spark, SF)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan, (name, plan)
