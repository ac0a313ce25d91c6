"""Adaptive pipeline policy tests — exact thresholds of analyzer.go:116-166."""

import numpy as np

from mcp_ocr_server_spark.config import PreprocessingConfig
from mcp_ocr_server_spark.imaging import analyzer, kernels
from mcp_ocr_server_spark.imaging.font import render_text

CFG = PreprocessingConfig()


def _mk(degradation: str) -> np.ndarray:
    img = render_text("POLICY CASE", scale=3)
    if degradation == "dark":
        return (img * 0.18).astype(np.uint8)  # mean < 50
    if degradation == "bright":
        return np.clip(img * 0.1 + 225, 0, 255).astype(np.uint8)  # mean > 200
    if degradation == "low_contrast":
        return np.clip(img * 0.08 + 125, 0, 255).astype(np.uint8)  # std < 30
    if degradation == "blurry":
        out = kernels._box_mean(kernels._box_mean(img, 9), 9)
        return out.astype(np.uint8)  # laplacian var < 100
    return img


def test_clean_pipeline():
    """A clean white page with black text has mean > 200 => the policy
    darkens (analyzer.go:145-147) — matches reference behavior on
    document scans."""
    q = analyzer.analyze(_mk("clean"), CFG)
    assert q.suggested_pipeline[0] == "grayscale"
    assert q.suggested_pipeline[-2:] == ("binarization", "deskew")
    assert "resize" not in q.suggested_pipeline  # never in auto pipeline


def test_dark_triggers_brighten():
    q = analyzer.analyze(_mk("dark"), CFG)
    assert q.brightness < 50
    assert "brighten" in q.suggested_pipeline
    assert "darken" not in q.suggested_pipeline
    assert q.needs_preprocessing


def test_bright_triggers_darken():
    q = analyzer.analyze(_mk("bright"), CFG)
    assert q.brightness > 200
    assert "darken" in q.suggested_pipeline
    assert "brighten" not in q.suggested_pipeline


def test_low_contrast_triggers_clahe():
    q = analyzer.analyze(_mk("low_contrast"), CFG)
    assert q.contrast < 30
    assert "contrast_enhance" in q.suggested_pipeline


def test_blurry_triggers_denoise():
    q = analyzer.analyze(_mk("blurry"), CFG)
    assert q.sharpness < 100
    assert "denoise" in q.suggested_pipeline


def test_pipeline_order_matches_reference():
    """analyzer.go:136-166 fixed order: grayscale, brightness fix,
    contrast fix, denoise, binarization, deskew."""
    img = (kernels._box_mean(_mk("clean"), 9) * 0.18).astype(np.uint8)
    q = analyzer.analyze(img, CFG)
    steps = list(q.suggested_pipeline)
    assert steps[0] == "grayscale"
    assert steps[-2:] == ["binarization", "deskew"]
    if "brighten" in steps and "denoise" in steps:
        assert steps.index("brighten") < steps.index("denoise")


def test_manual_default_pipeline():
    """preprocessor.go:342-366 fixed order, config-gated — resize is
    the fixed trailing step (identity with no dims configured), so the
    applied_steps rows enumerate the reference's full order (A6)."""
    assert analyzer.default_pipeline(CFG) == (
        "grayscale",
        "denoise",
        "binarization",
        "deskew",
        "resize",
    )
    cfg2 = PreprocessingConfig(denoise=False, deskew_enabled=False)
    assert analyzer.default_pipeline(cfg2) == (
        "grayscale", "binarization", "resize"
    )
    # identity without target dims: the step changes no pixels
    img = _mk("clean")
    assert (analyzer.apply_step(img, "resize", CFG) == img).all()


def test_unknown_step_is_identity():
    """preprocessor.go:182-184 (A8)."""
    img = _mk("clean")
    assert (analyzer.apply_step(img, "no_such_step", CFG) == img).all()


def test_preprocess_output_is_binary():
    out, q, steps = analyzer.preprocess(_mk("dark"), CFG)
    assert set(np.unique(out)) <= {0, 255}
    assert q is not None and steps == q.suggested_pipeline


def test_manual_mode_uses_default_pipeline():
    cfg = PreprocessingConfig(auto_mode=False)
    out, q, steps = analyzer.preprocess(_mk("clean"), cfg)
    assert q is None
    assert steps == analyzer.default_pipeline(cfg)
