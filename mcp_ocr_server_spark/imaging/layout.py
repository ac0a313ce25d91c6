"""Page-layout parse: segment a page image into blocks / lines / words.

The north rule names "PDF/layout parse" alongside the HTML path.  The
layout half is implemented here for real over the imaging stack: ink
projection profiles segment a binarized page into paragraph BLOCKS
(vertical whitespace gaps larger than the dominant line pitch), LINES
within blocks, and WORDS within lines (gap analysis shared with the OCR
engine), each with pixel bounding boxes in reading order.  The PDF
*container* decode (pypdf/poppler, absent in this container) is gated
behind an import-try in functions/multimodal.py-style fashion — a PDF
page, once rasterized, enters exactly this function.

Pure numpy; deterministic; runs inside Arrow-batched stages.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import kernels


@dataclass(frozen=True)
class Box:
    x: int
    y: int
    width: int
    height: int


@dataclass(frozen=True)
class Word:
    box: Box


@dataclass(frozen=True)
class Line:
    box: Box
    words: tuple[Word, ...]


@dataclass(frozen=True)
class Block:
    box: Box
    lines: tuple[Line, ...]


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return []
    splits = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate([[idx[0]], idx[splits + 1]])
    stops = np.concatenate([idx[splits] + 1, [idx[-1] + 1]])
    return list(zip(starts.tolist(), stops.tolist()))


def parse_page(img: np.ndarray) -> tuple[Block, ...]:
    """Binarize and segment a page into reading-order blocks."""
    gray = kernels.grayscale(img) if img.ndim == 3 else img
    t = kernels.otsu_threshold_value(gray)
    ink = gray <= t
    if not ink.any():
        return ()
    row_mask = ink.any(axis=1)
    line_bands = _runs(row_mask)
    if not line_bands:
        return ()
    # paragraph gaps: vertical whitespace > 1.5x the median line gap
    gaps = [line_bands[i + 1][0] - line_bands[i][1] for i in range(len(line_bands) - 1)]
    med_gap = float(np.median(gaps)) if gaps else 0.0
    blocks: list[list[tuple[int, int]]] = [[line_bands[0]]]
    for i in range(1, len(line_bands)):
        gap = line_bands[i][0] - line_bands[i - 1][1]
        if med_gap > 0 and gap > med_gap * 1.5:
            blocks.append([line_bands[i]])
        else:
            blocks[-1].append(line_bands[i])

    out: list[Block] = []
    for band_group in blocks:
        lines: list[Line] = []
        for y0, y1 in band_group:
            band = ink[y0:y1]
            col_mask = band.any(axis=0)
            cells = _runs(col_mask)
            if not cells:
                continue
            widths = [b - a for a, b in cells]
            med_w = float(np.median(widths))
            # group glyph cells into words on space-sized gaps (same
            # rule as ocr/engine.py word segmentation)
            words: list[Word] = []
            wx0 = cells[0][0]
            prev = None
            for a, b in cells:
                if prev is not None and (a - prev) > med_w * 0.9:
                    words.append(Word(Box(int(wx0), int(y0), int(prev - wx0), int(y1 - y0))))
                    wx0 = a
                prev = b
            words.append(Word(Box(int(wx0), int(y0), int(prev - wx0), int(y1 - y0))))
            lx0, lx1 = cells[0][0], cells[-1][1]
            lines.append(
                Line(Box(int(lx0), int(y0), int(lx1 - lx0), int(y1 - y0)), tuple(words))
            )
        if not lines:
            continue
        bx0 = min(ln.box.x for ln in lines)
        bx1 = max(ln.box.x + ln.box.width for ln in lines)
        by0 = lines[0].box.y
        by1 = lines[-1].box.y + lines[-1].box.height
        out.append(Block(Box(int(bx0), int(by0), int(bx1 - bx0), int(by1 - by0)), tuple(lines)))
    return tuple(out)


def layout_summary(img: np.ndarray) -> dict:
    """Flat per-page summary for columnar output."""
    blocks = parse_page(img)
    n_lines = sum(len(b.lines) for b in blocks)
    n_words = sum(len(ln.words) for b in blocks for ln in b.lines)
    return dict(
        n_blocks=len(blocks),
        n_lines=n_lines,
        n_words=n_words,
        first_block_y=blocks[0].box.y if blocks else None,
        last_block_bottom=(
            blocks[-1].box.y + blocks[-1].box.height if blocks else None
        ),
    )
