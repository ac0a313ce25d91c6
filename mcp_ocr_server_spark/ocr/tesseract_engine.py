"""Optional real-Tesseract engine behind the same Engine seam.

The reference's production engine is pooled gosseract (tesseract.go:24-292)
with config defaults language eng+chi_sim+chi_tra+jpn, PSM 3, OEM 3, no
whitelist (config.go:186-196).  This container ships no Tesseract, so the
deterministic TemplateMatchEngine is the default; when `pytesseract` (or
`tesserocr`) IS available — e.g. on a production cluster image — this class
drops in behind the identical interface, preserving the reference's exact
engine configuration.  Import is lazy and failure-safe: `available()` is
the capability probe, mirroring the reference's Engine seam pluggability
(engine.go:9-21).
"""

from __future__ import annotations

import time

import numpy as np

from ..config import OCRConfig
from .engine import OCRDeadlineExceeded, RecognizeResult


def available() -> bool:
    try:
        import pytesseract  # noqa: F401

        return True
    except ImportError:
        return False


def tess_config_string(cfg: OCRConfig) -> str:
    """Tesseract CLI config matching the reference's engine setup
    (tesseract.go:84-92: SetPageSegMode, OEM, tessedit_char_whitelist;
    defaults config.go:190-192).  Module-level so the construction is
    unit-testable without Tesseract installed."""
    parts = [f"--psm {cfg.psm}", f"--oem {cfg.oem}"]
    if cfg.char_whitelist:
        parts.append(f"-c tessedit_char_whitelist={cfg.char_whitelist}")
    return " ".join(parts)


class PytesseractEngine:
    """pytesseract-backed engine with reference config parity.

    One instance per python worker (same pooling pattern as
    ocr/engine.get_engine); pytesseract itself shells out per call, so a
    production deployment should prefer tesserocr's persistent API —
    the interface here is identical either way.
    """

    def __init__(self, cfg: OCRConfig | None = None) -> None:
        if not available():
            raise ImportError("pytesseract is not installed")
        self.cfg = cfg or OCRConfig()

    def _tess_config(self) -> str:
        return tess_config_string(self.cfg)

    def recognize(
        self,
        img: np.ndarray,
        language: str | None = None,
        deadline: float | None = None,
    ) -> RecognizeResult:
        """Same seam as TemplateMatchEngine.recognize.  pytesseract
        shells out, so the deadline is checked at call boundaries only;
        the Spark task reaper (session.py) is the mid-call backstop."""
        import pytesseract

        t0 = time.monotonic()
        if deadline is not None and t0 > deadline:
            raise OCRDeadlineExceeded("deadline passed before engine call")
        lang = language or self.cfg.language
        data = pytesseract.image_to_data(
            img, lang=lang, config=self._tess_config(),
            output_type=pytesseract.Output.DICT,
        )
        if deadline is not None and time.monotonic() > deadline:
            raise OCRDeadlineExceeded(
                f"engine call exceeded deadline ({time.monotonic() - t0:.3f}s)"
            )
        words = [w for w in data["text"] if w.strip()]
        confs = [
            float(c) for c, w in zip(data["conf"], data["text"])
            if w.strip() and float(c) >= 0
        ]
        text = " ".join(words)
        conf = float(np.mean(confs)) if confs else 0.0  # tesseract.go:195-203
        return RecognizeResult(text, conf, lang, time.monotonic() - t0)

    def recognize_with_details(
        self, img: np.ndarray, language: str | None = None
    ) -> tuple[RecognizeResult, list]:
        """Word-box API (tesseract.go:206-278) behind the same seam as
        TemplateMatchEngine.recognize_with_details — image_to_data
        already returns per-word left/top/width/height/conf, so the
        details call is one pass, not a second OCR.  Keeps
        media_ocr.word_box_rows engine-agnostic (review finding: this
        method was template-only, so a tesseract-resolved config would
        have died with AttributeError inside the mapInPandas task)."""
        import pytesseract

        from .engine import WordBox

        t0 = time.monotonic()
        lang = language or self.cfg.language
        data = pytesseract.image_to_data(
            img, lang=lang, config=self._tess_config(),
            output_type=pytesseract.Output.DICT,
        )
        # Boxes carry tesseract's RAW conf (-1 marks entries tesseract
        # itself calls unconfident/structural) so the >= 0 filter below
        # is live and the aggregate matches recognize() on the same
        # image — the earlier max(0.0, c) clamp made the filter dead
        # and averaged the -1 entries in as 0.0 (round-4 review).
        boxes = [
            WordBox(int(x), int(y), int(w), int(h), txt, float(c))
            for x, y, w, h, txt, c in zip(
                data["left"], data["top"], data["width"], data["height"],
                data["text"], data["conf"],
            )
            if txt.strip()
        ]
        words = [b.text for b in boxes]
        confs = [b.confidence for b in boxes if b.confidence >= 0]
        res = RecognizeResult(
            " ".join(words),
            float(np.mean(confs)) if confs else 0.0,
            lang,
            time.monotonic() - t0,
        )
        return res, boxes
