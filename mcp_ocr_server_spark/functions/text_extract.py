"""Main-content extraction for text/HTML spans.

The reference has NO text path — this component is mandated by the
north rule ("HTML boilerplate strip, PDF/layout parse, DOM heuristics")
and re-uses only public-knowledge algorithms: the Boilerpipe / Arc90
readability family of *text-density + link-density* block classifiers
(Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010). No reference file is cited because no reference
code exists for this (SURVEY.md §2.8).

Algorithm (deterministic, pure python — runs vectorized inside an
Arrow-batched pandas UDF, never per-row Spark Python):

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

MIN_WORDS = 10
MAX_LINK_DENSITY = 0.33

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


def extract_main_content(doc: str) -> str:
    """HTML string -> main-content text (blocks joined by newline).

    Not-obviously-HTML input is returned as-is (identity) so the same
    function is safe on the text branch too.
    """
    if "<" not in doc or ">" not in doc or not _HTML_SNIFF_RE.search(doc):
        return doc
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


def extract_batch(texts: "list[str]") -> "list[str]":
    """Batch helper for pandas UDFs (one python call per Arrow batch)."""
    return [extract_main_content(t if t is not None else "") for t in texts]


def main_content_eval_row(doc_id: str, cls: str, doc: str,
                          golden: str) -> dict:
    """Token-multiset precision/recall of extract_main_content against
    the generator's golden main text — one row per document, shared
    verbatim by the Spark UDF (queries.q_html_main_eval) and the
    fixture writer (scripts/gen_fixtures.gen_html_eval) so the
    committed golden and the live query can never drift.

    Multiset (not set) intersection: a word extracted once but golden
    twice is half-credit, the standard token-F1 convention."""
    from collections import Counter

    extracted = extract_main_content(doc)
    te, tg = extracted.split(), golden.split()
    ce, cg = Counter(te), Counter(tg)
    tp = sum(min(c, cg[w]) for w, c in ce.items())
    return dict(
        doc_id=doc_id, cls=cls,
        n_gold=len(tg), n_extracted=len(te), tp=tp,
        precision=round(tp / len(te), 6) if te else None,
        recall=round(tp / len(tg), 6) if tg else None,
    )
