"""Guard-path unit tests: TIMEOUT (P4), decode failure (F4), fail-soft
(F5), and hypothesis property tests for codec + cache-key determinism."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from mcp_ocr_server_spark.config import (
    OCR_ENGINE_FAILED,
    PREPROCESSING_FAILED,
    TIMEOUT,
    JobConfig,
    OCRConfig,
)
from mcp_ocr_server_spark.imaging.font import render_text
from mcp_ocr_server_spark.imaging.png import decode_png, encode_png
from mcp_ocr_server_spark.operators.media_ocr import make_ocr_map


def _run_stage(cfg: JobConfig, items: list[tuple[str, bytes]]) -> list[dict]:
    pdf = pd.DataFrame(
        {"content_hash": [h for h, _ in items], "bytes": [b for _, b in items]}
    )
    out = list(make_ocr_map(cfg)(iter([pdf])))
    return pd.concat(out).to_dict("records")


def test_timeout_guard_produces_timeout_rows():
    # timeout of 0 seconds: every image trips the cooperative guard
    cfg = JobConfig(ocr=OCRConfig(timeout_seconds=0))
    png = encode_png(render_text("HELLO"))
    rows = _run_stage(cfg, [("h1", png)])
    assert rows[0]["error_code"] == TIMEOUT
    assert rows[0]["text"] == ""


def test_bad_bytes_fail_soft_not_fatal():
    cfg = JobConfig()
    png = encode_png(render_text("OK"))
    rows = _run_stage(
        cfg,
        [("good", png), ("bad", b"not a png"), ("empty", b"")],
    )
    by = {r["content_hash"]: r for r in rows}
    assert by["good"]["error_code"] is None and by["good"]["text"] == "OK"
    assert by["bad"]["error_code"] == PREPROCESSING_FAILED
    assert by["empty"]["error_code"] == PREPROCESSING_FAILED
    # batch survived: error isolation per row (handler.go:200-216)
    assert len(rows) == 3


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(4, 40),
    w=st.integers(4, 40),
    seed=st.integers(0, 2**31 - 1),
    gray=st.booleans(),
)
def test_png_roundtrip_property(h, w, seed, gray):
    rng = np.random.Generator(np.random.Philox(seed))
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.int64).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)
    # determinism: same pixels => same bytes (content-hash stability, C3)
    assert encode_png(img) == encode_png(img.copy())


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 1000))
def test_engine_deterministic_property(seed):
    from mcp_ocr_server_spark.ocr.engine import TemplateMatchEngine

    rng = np.random.Generator(np.random.Philox(seed))
    words = ["SCAN", "TABLE", "OCR", "SPAN", "HASH"]
    text = " ".join(rng.choice(words, 3))
    img = render_text(text, scale=2)
    e = TemplateMatchEngine()
    r1, r2 = e.recognize(img), e.recognize(img)
    assert r1.text == r2.text == text
    assert r1.confidence == r2.confidence
