"""Deterministic OCR engine tests (Engine seam parity, engine.go:9-66)."""

import numpy as np

from mcp_ocr_server_spark.config import SUPPORTED_LANGUAGES, PreprocessingConfig
from mcp_ocr_server_spark.imaging import analyzer, kernels
from mcp_ocr_server_spark.imaging.font import render_text
from mcp_ocr_server_spark.ocr.engine import TemplateMatchEngine, get_engine

ENG = TemplateMatchEngine()
CFG = PreprocessingConfig()


def test_clean_recognition_exact():
    for txt in ("HELLO WORLD", "PYSPARK 2026", "A1B2C3", "X"):
        img = render_text(txt, scale=3)
        r = ENG.recognize(img)
        assert r.text == txt
        assert r.confidence > 95
        assert r.language == ENG.cfg.language


def test_multiline_and_spacing():
    img = render_text("TWO WORDS HERE\nSECOND LINE 99", scale=3)
    assert ENG.recognize(img).text == "TWO WORDS HERE\nSECOND LINE 99"


def test_blank_page_zero_confidence():
    """MeanConfidence()==0 on no recognition (tesseract.go:195-203)."""
    blank = np.full((40, 60), 255, dtype=np.uint8)
    r = ENG.recognize(blank)
    assert r.text == "" and r.confidence == 0.0


def test_determinism():
    """Same bytes+params => identical output (cache_test.go:64-77 analogue)."""
    img = render_text("IDEMPOTENT", scale=3)
    r1, r2 = ENG.recognize(img), ENG.recognize(img.copy())
    assert (r1.text, r1.confidence) == (r2.text, r2.confidence)


def test_recognition_after_full_preprocess_on_degradations():
    txt = "PACK MY BOX WITH FIVE DOZEN"
    base = np.pad(render_text(txt, scale=3), 50, constant_values=255)
    exact_cases = [
        base,
        (base * 0.18).astype(np.uint8),
        np.clip(base * 0.1 + 225, 0, 255).astype(np.uint8),
        np.clip(base * 0.08 + 125, 0, 255).astype(np.uint8),
        kernels.rotate(base, 3.0),
    ]
    for img in exact_cases:
        proc, _, _ = analyzer.preprocess(img, CFG)
        assert ENG.recognize(proc).text == txt
    # 8 deg: deskew applies but double-resample blur may flip a serif
    # glyph (I<->T); goldens are the pinned engine's own deterministic
    # output (FIXTURES.md §3), so assert the looser secondary bound here.
    proc, _, _ = analyzer.preprocess(kernels.rotate(base, 8.0), CFG)
    got = ENG.recognize(proc).text
    assert len(got) == len(txt)
    acc = sum(a == b for a, b in zip(got, txt)) / len(txt)
    assert acc >= 0.9, (got, acc)


def test_word_boxes():
    img = render_text("AB CD", scale=3)
    r, boxes = ENG.recognize_with_details(img)
    assert r.text == "AB CD"
    assert [b.text for b in boxes] == ["AB", "CD"]
    assert all(b.width > 0 and b.height > 0 for b in boxes)
    assert boxes[0].x < boxes[1].x


def test_supported_languages():
    assert ENG.supported_languages() == list(SUPPORTED_LANGUAGES)


def test_engine_singleton():
    assert get_engine() is get_engine()
