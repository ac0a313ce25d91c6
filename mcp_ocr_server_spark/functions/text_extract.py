"""Main-content extraction for text/HTML spans.

The reference has NO text path — this component is mandated by the
north rule ("HTML boilerplate strip, PDF/layout parse, DOM heuristics")
and re-uses only public-knowledge algorithms. Two cooperating
extractors live behind one entry point:

  * the DOM path (functions/dom.py): stdlib-html.parser tree,
    Readability-style candidate scoring + sibling inclusion, id/class
    boilerplate signals — the "DOM heuristics" half of the rule; used
    for every page that yields a scored candidate tree;
  * the FLAT path (this module): the Boilerpipe / Arc90 family of
    *text-density + link-density* block classifiers (Kohlschütter et
    al., "Boilerplate Detection using Shallow Text Features", WSDM
    2010) over regex block segmentation — the fallback for pages with
    no scoreable DOM (and the calibration baseline q_html_main_eval
    scores the DOM path against, class by adversarial class).

No reference file is cited because no reference code exists for this
(SURVEY.md §2.8).

Flat algorithm (deterministic, pure python — both paths run vectorized
inside an Arrow-batched pandas UDF, never per-row Spark Python):

1. Drop <script>/<style>/<head>/comments entirely.
2. Segment the document into blocks on block-level tags
   (p, div, h1-h6, li, td, nav, aside, header, footer, ...).
3. Per block compute word count and link density
   (chars inside <a> / total chars).
4. Keep blocks with >= MIN_WORDS words and link density < MAX_LINK_DENSITY.
5. Main content = kept blocks joined by "\n".

Plain-text spans pass through unchanged (identity).
"""

from __future__ import annotations

import html as _html
import re

# thresholds are shared with (and owned by) the DOM path so both
# operating points sit on the same published gates
from .dom import MAX_LINK_DENSITY, MIN_WORDS, extract_main_dom

__all__ = [
    "MIN_WORDS", "MAX_LINK_DENSITY", "extract_main_content",
    "extract_main_flat", "extract_batch", "main_content_eval_row",
]

_DROP_RE = re.compile(
    r"<(script|style|head|noscript)\b.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:p|div|h[1-6]|li|ul|ol|td|tr|table|nav|aside|header|footer|"
    r"section|article|main|br|blockquote|pre|body|html)\b[^>]*>",
    re.IGNORECASE,
)
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
# HTML sniff: require an actual known tag, so prose containing stray
# comparison operators ("a < b and c > d") stays on the identity path
_HTML_SNIFF_RE = re.compile(
    r"<\s*/?\s*(?:html|head|body|div|p|a|br|span|h[1-6]|ul|ol|li|table|"
    r"tr|td|nav|header|footer|aside|article|section|main|title|img|"
    r"blockquote|pre|script|style)\b",
    re.IGNORECASE,
)


def _clean_text(fragment: str) -> str:
    """Strip residual inline tags, unescape entities, normalize whitespace."""
    txt = _TAG_RE.sub(" ", fragment)
    txt = _html.unescape(txt)
    return _WS_RE.sub(" ", txt).strip()


def _is_html(doc: str) -> bool:
    return "<" in doc and ">" in doc and bool(_HTML_SNIFF_RE.search(doc))


def extract_main_flat(doc: str) -> str:
    """The flat Kohlschütter block classifier (assumes HTML input —
    callers sniff first).  Kept as the no-DOM fallback and as the
    calibration baseline of q_html_main_eval."""
    stripped = _DROP_RE.sub(" ", doc)
    blocks = _BLOCK_SPLIT_RE.split(stripped)
    kept: list[str] = []
    for raw in blocks:
        if not raw or not raw.strip():
            continue
        link_chars = sum(len(_clean_text(m)) for m in _ANCHOR_RE.findall(raw))
        text = _clean_text(raw)
        if not text:
            continue
        n_words = len(text.split())
        link_density = link_chars / max(len(text), 1)
        if n_words >= MIN_WORDS and link_density < MAX_LINK_DENSITY:
            kept.append(text)
    return "\n".join(kept)


def extract_main_content(doc: str, strategy: str = "dom") -> str:
    """HTML string -> main-content text (blocks joined by newline).

    Not-obviously-HTML input is returned as-is (identity) so the same
    function is safe on the text branch too.  strategy="dom" (default,
    what the extraction pipeline and the WARC path run) parses the
    page and applies the DOM heuristics, falling back to the flat
    block classifier when the page yields no scoreable tree (or the
    parse itself fails — crawl bytes can be arbitrarily hostile);
    strategy="flat" forces the baseline."""
    if not _is_html(doc):
        return doc
    if strategy == "dom":
        try:
            out = extract_main_dom(doc)
        except Exception:
            out = None  # fail-soft: tag soup degrades to the flat path
        if out is not None:
            return out
    return extract_main_flat(doc)


def extract_batch(texts: "list[str]", strategy: str = "dom") -> "list[str]":
    """Batch helper for pandas UDFs (one python call per Arrow batch)."""
    return [
        extract_main_content(t if t is not None else "", strategy)
        for t in texts
    ]


def _prf(extracted: str, cg, n_gold: int) -> tuple[int, int, float, float]:
    from collections import Counter

    te = extracted.split()
    ce = Counter(te)
    tp = sum(min(c, cg[w]) for w, c in ce.items())
    return (
        len(te), tp,
        round(tp / len(te), 6) if te else None,
        round(tp / n_gold, 6) if n_gold else None,
    )


def main_content_eval_row(doc_id: str, cls: str, doc: str,
                          golden: str) -> dict:
    """Token-multiset precision/recall of BOTH extractor operating
    points (flat baseline + DOM heuristics) against the generator's
    golden main text — one row per document, shared verbatim by the
    Spark UDF (queries.q_html_main_eval) and the fixture writer
    (scripts/gen_fixtures.gen_html_eval) so the committed golden and
    the live query can never drift.

    Multiset (not set) intersection: a word extracted once but golden
    twice is half-credit, the standard token-F1 convention."""
    from collections import Counter

    tg = golden.split()
    cg = Counter(tg)
    fn, ftp, fp_, fr = _prf(extract_main_content(doc, "flat"), cg, len(tg))
    dn, dtp, dp, dr = _prf(extract_main_content(doc, "dom"), cg, len(tg))
    return dict(
        doc_id=doc_id, cls=cls, n_gold=len(tg),
        flat_n=fn, flat_tp=ftp, flat_precision=fp_, flat_recall=fr,
        dom_n=dn, dom_tp=dtp, dom_precision=dp, dom_recall=dr,
    )
