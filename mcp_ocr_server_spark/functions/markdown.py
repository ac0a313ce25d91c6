"""Structured main-content rendering: DOM tree -> Markdown.

Plain-text extraction (functions/dom.py, text_extract.py) flattens a
page to newline-joined blocks — the right shape for dedup hashes and
quality scores, but it throws away the document STRUCTURE an LLM
training corpus wants to keep: headings, list nesting, tables, code
blocks, emphasis.  This module renders the SAME pruned/selected
candidate subtree the plain extractor chooses, as deterministic
Markdown — the interchange shape modern training pipelines store
(the trafilatura/resiliparse output class, re-derived; no reference
code exists for a text path, the reference is an OCR server).

Rendering rules (CommonMark-shaped, chosen for determinism):

  h1-h6          -> "#"*n heading lines (kept even when short — a
                    heading is structure, not body text)
  p / text runs  -> paragraphs separated by blank lines
  ul / ol        -> "- " / "1. " items, 2-space nested indentation,
                    ordinal numbering per level
  blockquote     -> "> " prefixed lines
  pre            -> fenced code block (content verbatim, tags inside
                    stripped, entities already unescaped by the
                    parser)
  table          -> pipe rows; the first tr (or any th row) becomes
                    the header, followed by the |---| separator
  b/strong, i/em -> **bold**, *italic* (inline, whitespace-safe)
  a              -> [text](href) when the block survives the link
                    gates; bare text inside pruned/link-dense blocks
                    never reaches the renderer anyway
  br             -> hard line break inside a paragraph

Boilerplate handling reuses extract_main_dom's selection EXACTLY —
same pruning, same candidate scoring, same sibling inclusion.  The
per-block word/link gates differ by design: they decide WHICH SUBTREE
is main content; inside the winning subtree markdown keeps every
block, because structure (a short heading, a 3-word list item, a
link-bearing sentence) is the point of this output shape and the
candidate decision already made the boilerplate judgment.  The plain
extractor stays the flattened, gated twin for dedup/quality hashing.

Scale shape: pure per-document function over the already-parsed tree,
row-local inside the same Arrow-batched stages — zero shuffle.
"""

from __future__ import annotations

import re

from .dom import (
    HEADING_TAGS,
    Node,
    _collect_blocks,
    _pruned,
    parse_html,
    select_main_subtrees,
)

_WS_RE = re.compile(r"\s+")

_INLINE_WRAP = {"b": "**", "strong": "**", "i": "*", "em": "*",
                "code": "`"}


def _inline_text(node, in_link_href: str | None = None) -> str:
    """Render a subtree as inline markdown (no block structure)."""
    if isinstance(node, str):
        return _WS_RE.sub(" ", node)
    if _pruned(node):
        return ""
    parts = "".join(_inline_text(c) for c in node.children)
    wrap = _INLINE_WRAP.get(node.tag)
    if wrap:
        inner = parts.strip()
        return f" {wrap}{inner}{wrap} " if inner else ""
    if node.tag == "a":
        inner = parts.strip()
        href = node.attrs.get("href", "")
        if inner and href:
            return f" [{inner}]({href}) "
        return f" {inner} " if inner else ""
    if node.tag == "br":
        return "\n"
    return parts


def _clean_inline(text: str) -> str:
    # collapse spaces per line, preserve hard breaks
    lines = [_WS_RE.sub(" ", ln).strip() for ln in text.split("\n")]
    return "\n".join(lines).strip()


class _MdRenderer:
    def __init__(self):
        self.out: list[str] = []

    def emit(self, block: str) -> None:
        if block:
            self.out.append(block)

    # -- structural renderers ------------------------------------------
    def heading(self, node: Node) -> None:
        text = _clean_inline(_inline_text(node))
        if text:
            level = int(node.tag[1])
            self.emit("#" * level + " " + text)

    def paragraph_like(self, node: Node) -> None:
        text = _clean_inline(_inline_text(node))
        if text:
            self.emit(text)

    def list(self, node: Node, depth: int = 0) -> None:
        ordered = node.tag == "ol"
        lines: list[str] = []
        n = 0
        for child in node.children:
            if not isinstance(child, Node) or child.tag != "li":
                continue
            if _pruned(child):
                continue
            n += 1
            marker = f"{n}. " if ordered else "- "
            sublists = [c for c in child.children
                        if isinstance(c, Node) and c.tag in ("ul", "ol")]
            inline_children = [c for c in child.children
                               if not (isinstance(c, Node)
                                       and c.tag in ("ul", "ol"))]
            holder = Node("li", None, None)
            holder.children = inline_children
            text = _clean_inline(_inline_text(holder))
            lines.append("  " * depth + marker + text)
            for sub in sublists:
                sub_r = _MdRenderer()
                sub_r.list(sub, depth + 1)
                lines.extend(sub_r.out)
        if lines:
            self.emit("\n".join(lines))

    def blockquote(self, node: Node) -> None:
        inner = _MdRenderer()
        inner.walk_children(node)
        if inner.out:
            quoted = "\n".join(
                "> " + ln for blk in inner.out for ln in blk.split("\n")
            )
            self.emit(quoted)

    def pre(self, node: Node) -> None:
        def raw(n):
            if isinstance(n, str):
                return n
            return "".join(raw(c) for c in n.children)

        body = raw(node).strip("\n")
        if body.strip():
            self.emit("```\n" + body + "\n```")

    def table(self, node: Node) -> None:
        rows: list[tuple[bool, list[str]]] = []

        def find_rows(n):
            for c in n.children:
                if not isinstance(c, Node) or _pruned(c):
                    continue
                if c.tag == "tr":
                    cells = [
                        (_clean_inline(_inline_text(cell)).replace("|", r"\|"),
                         cell.tag == "th")
                        for cell in c.children
                        if isinstance(cell, Node)
                        and cell.tag in ("td", "th") and not _pruned(cell)
                    ]
                    if cells:
                        rows.append((any(h for _, h in cells),
                                     [t for t, _ in cells]))
                elif c.tag in ("thead", "tbody", "tfoot", "table"):
                    find_rows(c)

        find_rows(node)
        if not rows:
            return
        width = max(len(cells) for _, cells in rows)
        lines = []
        header_done = False
        for i, (is_header, cells) in enumerate(rows):
            cells = cells + [""] * (width - len(cells))
            lines.append("| " + " | ".join(cells) + " |")
            if not header_done and (is_header or i == 0):
                lines.append("|" + "---|" * width)
                header_done = True
        self.emit("\n".join(lines))

    # -- tree walk ------------------------------------------------------
    def walk_children(self, node: Node) -> None:
        text_run: list[str] = []

        def flush_run():
            if text_run:
                holder = Node("p", None, None)
                holder.children = list(text_run)
                text_run.clear()
                self.paragraph_like(holder)

        for child in node.children:
            if isinstance(child, str):
                if child.strip():
                    text_run.append(child)
                continue
            if _pruned(child):
                continue
            tag = child.tag
            if tag in HEADING_TAGS:
                flush_run()
                self.heading(child)
            elif tag in ("ul", "ol"):
                flush_run()
                self.list(child)
            elif tag == "blockquote":
                flush_run()
                self.blockquote(child)
            elif tag == "pre":
                flush_run()
                self.pre(child)
            elif tag == "table":
                flush_run()
                self.table(child)
            elif tag in ("p", "div", "section", "article", "main",
                         "figure", "figcaption", "dl", "dt", "dd",
                         "td", "th", "tr", "li", "body", "html"):
                flush_run()
                self.walk_children(child)
            else:  # inline element: joins the current text run
                text_run.append(child)
        flush_run()


def render_markdown(root: Node) -> str:
    """Render a (sub)tree to markdown blocks joined by blank lines."""
    r = _MdRenderer()
    r.walk_children(root)
    return "\n\n".join(r.out)


def extract_main_markdown(doc: str) -> str | None:
    """HTML -> structured Markdown of the main content, or None when
    no candidate scores (caller may fall back to plain extraction).

    Candidate selection is shared with extract_main_dom (same pruning
    / scoring / sibling inclusion), so the markdown document covers
    the same subtree the plain extractor flattens."""
    root = parse_html(doc)
    blocks = _collect_blocks(root)
    if not blocks:
        return None

    # the SAME candidate selection the plain extractor runs — one
    # implementation, two renderings
    selected = select_main_subtrees(blocks)
    if selected is None:
        return None
    picked, _top_density = selected
    parts = []
    for sub in picked:
        md = render_markdown(sub)
        if md:
            parts.append(md)
    return "\n\n".join(parts)


def markdown_eval_row(doc_id: str, cls: str, html: str,
                      golden: str) -> dict:
    """Exactness row for one structured page — shared verbatim by the
    Spark UDF (queries.q_html_main_markdown) and the fixture writer
    (scripts/gen_fixtures.gen_html_md).  golden is constructed by the
    corpus generator from the same pieces as the html (a TRUE
    independent golden); exact means the renderer reproduced every
    heading level, list nesting, table row, code fence and inline
    mark."""
    import hashlib

    got = extract_main_markdown(html) or ""
    return dict(
        doc_id=doc_id, cls=cls,
        exact=got == golden,
        md_md5=hashlib.md5(got.encode("utf-8")).hexdigest(),
        n_blocks=got.count("\n\n") + 1 if got else 0,
        n_chars=len(got),
    )
