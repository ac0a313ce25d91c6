"""5x7 bitmap font + deterministic text raster renderer.

This is the fixture-generation half of the deterministic OCR story
(SURVEY.md §7 "What's hard" / OCR determinism): the corpus generator
renders known strings with this font, and the template-matching engine
in ocr/engine.py recognizes the same font.  Glyph shapes are a classic
5x7 dot-matrix style (public-domain folklore, HD44780-era); exact
pixels only need to be mutually distinct, not typographically faithful.

Charset: A-Z 0-9 space . , - (enough for fixture strings; the engine
reports anything else as unrecognized).
"""

from __future__ import annotations

import numpy as np

GLYPH_W, GLYPH_H = 5, 7

# Each glyph: 7 strings of 5 chars; '#' = ink.
_GLYPHS_TXT = {
    "A": [" ### ", "#   #", "#   #", "#####", "#   #", "#   #", "#   #"],
    "B": ["#### ", "#   #", "#   #", "#### ", "#   #", "#   #", "#### "],
    "C": [" ### ", "#   #", "#    ", "#    ", "#    ", "#   #", " ### "],
    "D": ["#### ", "#   #", "#   #", "#   #", "#   #", "#   #", "#### "],
    "E": ["#####", "#    ", "#    ", "#### ", "#    ", "#    ", "#####"],
    "F": ["#####", "#    ", "#    ", "#### ", "#    ", "#    ", "#    "],
    "G": [" ### ", "#   #", "#    ", "# ###", "#   #", "#   #", " ### "],
    "H": ["#   #", "#   #", "#   #", "#####", "#   #", "#   #", "#   #"],
    "I": [" ### ", "  #  ", "  #  ", "  #  ", "  #  ", "  #  ", " ### "],
    "J": ["  ###", "   # ", "   # ", "   # ", "   # ", "#  # ", " ##  "],
    "K": ["#   #", "#  # ", "# #  ", "##   ", "# #  ", "#  # ", "#   #"],
    "L": ["#    ", "#    ", "#    ", "#    ", "#    ", "#    ", "#####"],
    "M": ["#   #", "## ##", "# # #", "# # #", "#   #", "#   #", "#   #"],
    "N": ["#   #", "##  #", "# # #", "#  ##", "#   #", "#   #", "#   #"],
    "O": [" ### ", "#   #", "#   #", "#   #", "#   #", "#   #", " ### "],
    "P": ["#### ", "#   #", "#   #", "#### ", "#    ", "#    ", "#    "],
    "Q": [" ### ", "#   #", "#   #", "#   #", "# # #", "#  # ", " ## #"],
    "R": ["#### ", "#   #", "#   #", "#### ", "# #  ", "#  # ", "#   #"],
    "S": [" ####", "#    ", "#    ", " ### ", "    #", "    #", "#### "],
    "T": ["#####", "  #  ", "  #  ", "  #  ", "  #  ", "  #  ", "  #  "],
    "U": ["#   #", "#   #", "#   #", "#   #", "#   #", "#   #", " ### "],
    "V": ["#   #", "#   #", "#   #", "#   #", "#   #", " # # ", "  #  "],
    "W": ["#   #", "#   #", "#   #", "# # #", "# # #", "## ##", "#   #"],
    "X": ["#   #", "#   #", " # # ", "  #  ", " # # ", "#   #", "#   #"],
    "Y": ["#   #", "#   #", " # # ", "  #  ", "  #  ", "  #  ", "  #  "],
    "Z": ["#####", "    #", "   # ", "  #  ", " #   ", "#    ", "#####"],
    "0": [" ### ", "#   #", "#  ##", "# # #", "##  #", "#   #", " ### "],
    "1": ["  #  ", " ##  ", "  #  ", "  #  ", "  #  ", "  #  ", " ### "],
    "2": [" ### ", "#   #", "    #", "   # ", "  #  ", " #   ", "#####"],
    "3": ["#####", "   # ", "  #  ", "   # ", "    #", "#   #", " ### "],
    "4": ["   # ", "  ## ", " # # ", "#  # ", "#####", "   # ", "   # "],
    "5": ["#####", "#    ", "#### ", "    #", "    #", "#   #", " ### "],
    "6": ["  ## ", " #   ", "#    ", "#### ", "#   #", "#   #", " ### "],
    "7": ["#####", "    #", "   # ", "  #  ", " #   ", " #   ", " #   "],
    "8": [" ### ", "#   #", "#   #", " ### ", "#   #", "#   #", " ### "],
    "9": [" ### ", "#   #", "#   #", " ####", "    #", "   # ", " ##  "],
    ".": ["     ", "     ", "     ", "     ", "     ", " ##  ", " ##  "],
    ",": ["     ", "     ", "     ", "     ", " ##  ", " ##  ", " #   "],
    "-": ["     ", "     ", "     ", "#####", "     ", "     ", "     "],
}


def _to_array(rows: list[str]) -> np.ndarray:
    return np.array(
        [[1 if ch == "#" else 0 for ch in row] for row in rows], dtype=np.uint8
    )


GLYPHS: dict[str, np.ndarray] = {c: _to_array(r) for c, r in _GLYPHS_TXT.items()}
CHARSET = "".join(sorted(GLYPHS))


def render_text(
    text: str,
    scale: int = 2,
    margin: int = 8,
    fg: int = 0,
    bg: int = 255,
    line_spacing: int = 3,
    char_spacing: int = 1,
) -> np.ndarray:
    """Render text (A-Z 0-9 space . , - ; '\\n' breaks lines) to a
    grayscale uint8 image, dark ink on light background.

    Deterministic pure function — the corpus generator and tests both
    call it, and the OCR engine's templates derive from the same GLYPHS.
    """
    lines = text.upper().split("\n")
    if not lines:
        lines = [""]
    cell_w = (GLYPH_W + char_spacing) * scale
    cell_h = GLYPH_H * scale
    width = max(len(ln) for ln in lines) * cell_w - char_spacing * scale
    height = len(lines) * cell_h + (len(lines) - 1) * line_spacing * scale
    img = np.full(
        (height + 2 * margin, max(width, 1) + 2 * margin), bg, dtype=np.uint8
    )
    for li, line in enumerate(lines):
        y0 = margin + li * (cell_h + line_spacing * scale)
        for ci, ch in enumerate(line):
            if ch == " " or ch not in GLYPHS:
                continue
            g = GLYPHS[ch]
            big = np.kron(g, np.ones((scale, scale), dtype=np.uint8))
            x0 = margin + ci * cell_w
            region = img[y0 : y0 + cell_h, x0 : x0 + GLYPH_W * scale]
            region[big == 1] = fg
    return img
