"""OCR engine interface + deterministic template-matching implementation.

The reference defines an `Engine` interface (internal/ocr/engine.go:9-21)
with a pooled Tesseract implementation (tesseract.go:24-292).  This
container ships no Tesseract, so — exactly as SURVEY.md §7 prescribes —
we keep the same seam and provide a deterministic engine that recognizes
the fixture font (imaging/font.py) by template matching.  A real
Tesseract-backed engine can be dropped in behind the same interface
(gated on `import tesserocr`/`pytesseract` availability).

Result shape mirrors RecognizeResult (engine.go:42-48): text,
confidence 0-100 (mean per-glyph match score, analogous to Tesseract
MeanConfidence, tesseract.go:195-203 — 0 on failure), language,
duration seconds.  Word boxes mirror the latent DetailedResult
(engine.go:51-66, tesseract.go:206-278).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..config import OCRConfig
from ..deadline import DeadlineExceeded
from ..imaging import kernels
from ..imaging.font import CHARSET, GLYPH_H, GLYPH_W, GLYPHS


class OCRDeadlineExceeded(DeadlineExceeded):
    """Raised by recognize() when the cooperative deadline passes
    mid-decode (P4: tesseract.go:94-138 timeout semantics — the Spark
    task reaper is the hard backstop, session.py).  Subclasses the
    shared DeadlineExceeded so the mapInPandas stage catches the
    preprocessing and OCR variants with one handler."""


@dataclass
class RecognizeResult:
    text: str
    confidence: float  # 0-100
    language: str
    duration_s: float
    metadata: dict[str, str] = field(default_factory=dict)


@dataclass
class WordBox:
    x: int
    y: int
    width: int
    height: int
    text: str
    confidence: float


class TemplateMatchEngine:
    """Deterministic glyph recognizer for the 5x7 fixture font.

    Segmentation: horizontal ink-projection for line bands, per-line
    vertical projection for glyph cells; gaps wider than half a glyph
    are spaces.  Each cell is normalized to 5x7 and scored against every
    template; confidence is the mean best-match score * 100.
    """

    # matching grid = 2x the template resolution: keeps more shape detail
    # after the render-rotate -> deskew-rotate double resample
    MATCH_SCALE = 2

    def __init__(self, cfg: OCRConfig | None = None) -> None:
        self.cfg = cfg or OCRConfig()
        up = np.ones((self.MATCH_SCALE, self.MATCH_SCALE))
        self._templates = {
            c: np.kron(GLYPHS[c].astype(np.float64), up) for c in CHARSET
        }
        # K10 char_whitelist parity (tesseract.go:84-92 sets
        # tessedit_char_whitelist): matching is restricted to the
        # whitelisted subset of the charset.  Empty whitelist = all.
        if self.cfg.char_whitelist:
            self._charset = "".join(
                c for c in CHARSET if c in set(self.cfg.char_whitelist)
            )
        else:
            self._charset = CHARSET
        # stacked (n_chars, H, W) template tensor for vectorized scoring;
        # the charset is sorted, so argmax's first-index tie-break == the
        # smallest-character tie-break
        self._tstack = (
            np.stack([self._templates[c] for c in self._charset])
            if self._charset
            else np.zeros((0, GLYPH_H * self.MATCH_SCALE, GLYPH_W * self.MATCH_SCALE))
        )

    # -- segmentation ------------------------------------------------------

    @staticmethod
    def _bands(mask: np.ndarray) -> list[tuple[int, int]]:
        """Contiguous True runs in a 1-D boolean mask → [(start, stop))."""
        idx = np.flatnonzero(mask)
        if idx.size == 0:
            return []
        splits = np.flatnonzero(np.diff(idx) > 1)
        starts = np.concatenate([[idx[0]], idx[splits + 1]])
        stops = np.concatenate([idx[splits] + 1, [idx[-1] + 1]])
        return list(zip(starts.tolist(), stops.tolist()))

    @staticmethod
    def _area_resample(crop: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
        """Box-average a boolean ink mask onto an out_h x out_w float grid.

        Area averaging (vs nearest-neighbor) makes matching robust to the
        blur of render-rotate → deskew-rotate double resampling."""
        h, w = crop.shape
        ii = np.zeros((h + 1, w + 1), dtype=np.float64)
        ii[1:, 1:] = np.cumsum(np.cumsum(crop.astype(np.float64), axis=0), axis=1)
        yb = np.round(np.linspace(0, h, out_h + 1)).astype(int)
        xb = np.round(np.linspace(0, w, out_w + 1)).astype(int)
        # vectorized bin edges with non-empty-bin clamping (same op order
        # as the original per-cell loop, so outputs are bit-identical)
        y1 = np.minimum(np.maximum(yb[1:], yb[:-1] + 1), h)
        y0 = np.where(y1 > 0, np.minimum(yb[:-1], y1 - 1), 0)
        x1 = np.minimum(np.maximum(xb[1:], xb[:-1] + 1), w)
        x0 = np.where(x1 > 0, np.minimum(xb[:-1], x1 - 1), 0)
        s = (
            ii[np.ix_(y1, x1)] - ii[np.ix_(y0, x1)]
            - ii[np.ix_(y1, x0)] + ii[np.ix_(y0, x0)]
        )
        area = np.maximum(
            (y1 - y0)[:, None] * (x1 - x0)[None, :], 1
        ).astype(np.float64)
        return s / area

    def _match_glyph(self, cell: np.ndarray) -> tuple[str, float]:
        """cell: 2-D boolean ink mask cropped to its bounding box."""
        ys, xs = np.nonzero(cell)
        if ys.size == 0 or not self._charset:
            return " ", 0.0
        crop = cell[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
        norm = self._area_resample(
            crop, GLYPH_H * self.MATCH_SCALE, GLYPH_W * self.MATCH_SCALE
        )
        # one vectorized pass over the stacked templates; argmax's
        # first-index rule reproduces the smallest-char tie-break
        scores = 1.0 - np.abs(norm[None, :, :] - self._tstack).mean(axis=(1, 2))
        k = int(np.argmax(scores))
        return self._charset[k], float(scores[k])

    # -- public API (Engine seam, engine.go:9-21) --------------------------

    def recognize(
        self,
        img: np.ndarray,
        language: str | None = None,
        deadline: float | None = None,
    ) -> RecognizeResult:
        """`deadline` is an absolute time.monotonic() timestamp; the band
        loop checks it between text lines and raises OCRDeadlineExceeded,
        so a pathological page cannot hold the task past its budget
        (round-1 P4 gap: the timeout was only checked between stages)."""
        t0 = time.monotonic()
        lang = language or self.cfg.language
        gray = kernels.grayscale(img) if img.ndim == 3 else img
        # engine expects a binarized page; re-binarize defensively (cheap,
        # idempotent on already-binary input)
        t = kernels.otsu_threshold_value(gray)
        ink = gray <= t
        # guard: blank page => empty text, confidence 0 (tesseract.go:195-203)
        if not ink.any():
            return RecognizeResult("", 0.0, lang, time.monotonic() - t0)
        # K10 psm parity (tesseract.go:84-92 SetPageSegMode) — the FULL
        # Tesseract mode table (0-13), each mapped to its documented
        # degradation on this engine:
        #   0, 2        OSD/layout-only: Tesseract runs NO recognition
        #               pass => empty text, confidence 0
        #   1, 3, 4,    automatic page segmentation (1/12 add OSD and 11/12
        #   11, 12      are sparse-text variants — OSD and sparseness have
        #               no analogue on single-column fixture pages, so all
        #               degrade to the auto band segmentation, exactly how
        #               Tesseract degrades option combinations it cannot
        #               honor)
        #   5, 6        single uniform block => auto bands (5 is the
        #               vertical-text variant; fixture text is horizontal)
        #   7, 13       the page is ONE text line (13 = raw line, which
        #               additionally skips Tesseract-internal hacks that
        #               have no analogue here)
        #   8, 9        ONE word: one line AND inter-cell gaps never become
        #               spaces (9 = word-in-circle variant)
        #   10          ONE character: one line, one glyph cell
        psm = self.cfg.psm  # range-validated by OCRConfig.__post_init__
        if psm in (0, 2):  # no-recognition modes
            return RecognizeResult("", 0.0, lang, time.monotonic() - t0)
        one_line = psm in (7, 8, 9, 10, 13)
        one_word = psm in (8, 9)
        lines: list[str] = []
        scores: list[float] = []
        row_mask = ink.any(axis=1)
        if one_line:
            rows = np.flatnonzero(row_mask)
            bands = [(int(rows[0]), int(rows[-1]) + 1)]
        else:
            bands = self._bands(row_mask)
        for y0, y1 in bands:
            if deadline is not None and time.monotonic() > deadline:
                raise OCRDeadlineExceeded(
                    f"deadline exceeded after {time.monotonic() - t0:.3f}s"
                )
            band = ink[y0:y1]
            col_mask = band.any(axis=0)
            if psm == 10:
                cols = np.flatnonzero(col_mask)
                cells = [(int(cols[0]), int(cols[-1]) + 1)]
            else:
                cells = self._bands(col_mask)
            if not cells:
                continue
            # geometry estimates: median glyph width and median inter-cell
            # gap (most gaps are intra-word character gaps).  A run of n
            # spaces produces a gap of n*(glyph+chargap) + chargap pixels.
            widths = [b - a for a, b in cells]
            med_w = float(np.median(widths))
            gaps = [cells[i + 1][0] - cells[i][1] for i in range(len(cells) - 1)]
            med_gap = float(np.median(gaps)) if gaps else med_w * 0.4
            chars: list[str] = []
            prev_end: int | None = None
            for a, b in cells:
                if prev_end is not None and not one_word:
                    gap = a - prev_end
                    if gap > med_gap + med_w * 0.5:
                        n_spaces = max(
                            1, int(round((gap - med_gap) / (med_w + med_gap)))
                        )
                        chars.append(" " * n_spaces)
                ch, s = self._match_glyph(band[:, a:b])
                chars.append(ch)
                scores.append(s)
                prev_end = b
            lines.append("".join(chars))
        text = "\n".join(lines)
        conf = float(np.mean(scores) * 100.0) if scores else 0.0
        return RecognizeResult(text, conf, lang, time.monotonic() - t0)

    def recognize_with_details(
        self, img: np.ndarray, language: str | None = None
    ) -> tuple[RecognizeResult, list[WordBox]]:
        """Latent word-box API (tesseract.go:206-278, never exposed by a
        reference tool — kept as an optional column for v2)."""
        gray = kernels.grayscale(img) if img.ndim == 3 else img
        t = kernels.otsu_threshold_value(gray)
        ink = gray <= t
        result = self.recognize(img, language)
        boxes: list[WordBox] = []
        row_mask = ink.any(axis=1)
        for y0, y1 in self._bands(row_mask):
            band = ink[y0:y1]
            col_mask = band.any(axis=0)
            cells = self._bands(col_mask)
            if not cells:
                continue
            widths = [b - a for a, b in cells]
            med_w = float(np.median(widths))
            # group cells into words on space-sized gaps
            word_start = cells[0][0]
            word_chars: list[tuple[str, float]] = []
            prev_end = None
            for a, b in cells:
                if prev_end is not None and (a - prev_end) > med_w * 0.9 and word_chars:
                    boxes.append(self._word_box(word_chars, word_start, prev_end, y0, y1))
                    word_chars = []
                    word_start = a
                ch, s = self._match_glyph(band[:, a:b])
                word_chars.append((ch, s))
                prev_end = b
            if word_chars:
                boxes.append(self._word_box(word_chars, word_start, prev_end, y0, y1))
        return result, boxes

    @staticmethod
    def _word_box(
        chars: list[tuple[str, float]], x0: int, x1: int, y0: int, y1: int
    ) -> WordBox:
        text = "".join(c for c, _ in chars)
        conf = float(np.mean([s for _, s in chars]) * 100.0)
        return WordBox(int(x0), int(y0), int(x1 - x0), int(y1 - y0), text, conf)

    @staticmethod
    def supported_languages() -> list[str]:
        """tesseract.go:153-157."""
        from ..config import SUPPORTED_LANGUAGES

        return list(SUPPORTED_LANGUAGES)


_ENGINES: dict[OCRConfig, object] = {}


def get_engine(cfg: OCRConfig | None = None):
    """Per-process engine pool keyed by config — the analogue of the
    reference's sync.Pool of gosseract clients (tesseract.go:27-32):
    init once per Spark python worker PER CONFIG, reuse across Arrow
    batches (P3).  Keying on the frozen OCRConfig (hashable dataclass)
    means two jobs with different psm/whitelist in one worker process
    can never share a misconfigured engine.

    Engine selection (cfg.engine, config.go:187): "tesseract" uses the
    real PytesseractEngine when pytesseract is importable on the worker
    and falls back to the deterministic TemplateMatchEngine otherwise
    (this sandbox ships no tesseract, so the fallback is the default
    outcome); "template" pins the deterministic engine unconditionally
    (the fixtures/goldens config, FIXTURE_JOB)."""
    key = cfg or OCRConfig()
    eng = _ENGINES.get(key)
    if eng is None:
        resolved = resolved_engine(key)
        if resolved == "pytesseract":
            from . import tesseract_engine as te

            eng = te.PytesseractEngine(key)
        else:
            eng = TemplateMatchEngine(key)
        _ENGINES[key] = eng
    return eng


def resolved_engine(cfg: OCRConfig) -> str:
    """The engine that will actually run for this config:
    'pytesseract' or 'template'.  Unknown engine names raise (config_io
    validates file-driven configs; this guards programmatic ones).

    The resolved name participates in the memoization cache key
    (plans/pipeline.content_hash_col): text produced by one engine must
    never be replayed as another engine's output by the memo table —
    the reference's key (bytes||lang||preprocess, cache.go:188-198)
    didn't need this because it had exactly one engine."""
    if cfg.engine == "template":
        return "template"
    if cfg.engine == "pytesseract":
        # already-resolved name (make_ocr_map pins it driver-side so
        # executors never re-probe availability): honor it verbatim —
        # if pytesseract is missing on a worker, engine init fails
        # loudly rather than silently writing template output under
        # the pytesseract memo key
        return "pytesseract"
    if cfg.engine == "tesseract":
        from . import tesseract_engine as te

        return "pytesseract" if te.available() else "template"
    raise ValueError(f"unsupported OCR engine: {cfg.engine}")
