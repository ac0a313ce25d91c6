"""Layout-parse unit tests: block/line/word segmentation on constructed
pages with known structure."""

import numpy as np

from mcp_ocr_server_spark.imaging.font import render_text
from mcp_ocr_server_spark.imaging.layout import layout_summary, parse_page


def _page_two_blocks():
    """Two paragraphs (2 lines then 1 line) separated by a wide gap."""
    p1 = render_text("HELLO WORLD\nSECOND LINE", scale=2, margin=4)
    p2 = render_text("LAST PARA", scale=2, margin=4)
    w = max(p1.shape[1], p2.shape[1])

    def pad(img):
        return np.pad(img, ((0, 0), (0, w - img.shape[1])),
                      constant_values=255)

    gap = np.full((40, w), 255, dtype=np.uint8)
    return np.vstack([pad(p1), gap, pad(p2)])


def test_blocks_lines_words():
    page = _page_two_blocks()
    blocks = parse_page(page)
    assert len(blocks) == 2
    assert len(blocks[0].lines) == 2
    assert len(blocks[1].lines) == 1
    # words per line
    assert len(blocks[0].lines[0].words) == 2  # HELLO WORLD
    assert len(blocks[0].lines[1].words) == 2  # SECOND LINE
    assert len(blocks[1].lines[0].words) == 2  # LAST PARA
    # reading order: strictly increasing y
    ys = [b.box.y for b in blocks]
    assert ys == sorted(ys)
    # boxes nest: lines within block bounds
    for b in blocks:
        for ln in b.lines:
            assert ln.box.y >= b.box.y
            assert ln.box.y + ln.box.height <= b.box.y + b.box.height


def test_summary_counts():
    s = layout_summary(_page_two_blocks())
    assert s["n_blocks"] == 2
    assert s["n_lines"] == 3
    assert s["n_words"] == 6
    assert s["first_block_y"] < s["last_block_bottom"]


def test_blank_page():
    blank = np.full((50, 50), 255, dtype=np.uint8)
    assert parse_page(blank) == ()
    s = layout_summary(blank)
    assert s["n_blocks"] == 0 and s["first_block_y"] is None
