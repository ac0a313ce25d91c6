"""DOM-tree main-content extraction — the "DOM heuristics" half of the
north rule's text path (the flat Kohlschütter block classifier in
functions/text_extract.py is the other half, and remains both the
fallback for unparseable input and the calibration baseline the
html_main_eval query scores this extractor against).

The reference has NO text path (it is an OCR server); no reference
file is cited because no reference code exists for this component
(SURVEY.md §2.8).  Everything here is a from-scratch re-derivation of
two published algorithm families:

  * Arc90 Readability / readability.js candidate scoring: score text
    blocks, credit the score to the block's candidate ancestor (full)
    and that candidate's own candidate parent (half), normalize by the
    candidate's aggregate link density, pick the best candidate
    subtree, then append qualifying SIBLING subtrees (score >= 20% of
    the winner) — the rule that reassembles main content split across
    wrapper <div>s.
  * Kohlschütter et al. WSDM 2010 shallow-text features: word count
    and link density remain the per-block admission gates inside the
    winning subtree.

Two deliberate operating-point recoveries over the flat path, both
standard readability.js behavior, both priced by html_main_eval:

  * link-dense blocks (citation-heavy paragraphs) are rescued when the
    WINNING CANDIDATE's aggregate link density is under the bar — the
    flat path can only see the block, the DOM path can see its home;
  * short trailing blocks (a closing one-liner) are rescued when they
    are link-free AND contain sentence punctuation — readability.js's
    "short sibling paragraph with a full stop" rule; bare word-soup
    fragments stay dropped.

Parsing is stdlib html.parser with an HTML5-style implied-close table
(an open <p> closes on any new block element, <li> on <li>, <td>/<th>
on a new cell or row, ...), stray end tags ignored, mis-nested end
tags recovered by popping to the nearest matching open element — so
real-crawl tag soup degrades gracefully instead of erroring.  Depth is
capped (children of a too-deep node attach AT the cap — flattening,
never failure) and every walk is iterative or cap-bounded: a
pathological page cannot blow the Python stack inside an executor.

Scale shape: one pure-Python pass per document inside the same
Arrow-batched mapInPandas stages that already run the flat path —
row-local, zero shuffle, no driver involvement.  Cost is linear in
page bytes (one parse, one walk, one scoring dict over candidates).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Per-block admission gates — shared with (imported by) the flat path
# so both operating points sit on the same published thresholds.
MIN_WORDS = 10
MAX_LINK_DENSITY = 0.33

# Subtrees that are never content, dropped by tag alone.
PRUNE_TAGS = frozenset(
    "script style noscript template head nav aside footer header form "
    "button select option iframe svg canvas".split()
)

# Elements that terminate/segment text blocks.  Matches the flat
# path's _BLOCK_SPLIT_RE so the two extractors segment identically.
BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol td th tr table nav aside header "
    "footer section article main br blockquote pre body html dl dt dd "
    "figure figcaption".split()
)

HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())

# Score-accumulating containers (Readability's candidate set).
CANDIDATE_TAGS = frozenset(
    "div article section main td body blockquote figure dl".split()
)

# HTML5 void elements — never pushed on the open stack.
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track "
    "wbr".split()
)

# Inline formatting — inert for segmentation (anything not in
# BLOCK_TAGS continues the current block), listed for documentation.

# id/class signals (Readability's unlikelyCandidates /
# okMaybeItsACandidate pair, re-derived): a node whose id+class hits
# NEGATIVE without also hitting POSITIVE is pruned with its subtree.
NEGATIVE_RE = re.compile(
    r"comment|disqus|sidebar|side-bar|banner|breadcrumb|advert|\bad\b|"
    r"ad-|-ad\b|promo|related|share|social|sponsor|shopping|menu|"
    r"navigation|navbar|widget|popup|modal|cookie|subscribe|newsletter|"
    r"footer|masthead|byline|pagination|pager",
    re.IGNORECASE,
)
POSITIVE_RE = re.compile(
    r"\barticle\b|\bbody\b|content|entry|\bmain\b|\bpage\b|\bpost\b|"
    r"\btext\b|\bstory\b|\bcolumn\b",
    re.IGNORECASE,
)

# Sibling subtrees join the winner at >= this fraction of its score
# (readability.js's sibling threshold).
SIBLING_FRACTION = 0.2

# Tree depth cap: children of a node at the cap attach at the cap
# (flattening).  Real pages sit around depth 15-30; framework soup
# rarely passes 60.
MAX_DEPTH = 120

_SENTENCE_RE = re.compile(r"[.!?](?:\s|$)")
_WS_RE = re.compile(r"\s+")


class Node:
    """One element.  Children are Node or str (text runs).  Parent
    pointers make ancestor checks O(depth) with no global index."""

    __slots__ = ("tag", "attrs", "children", "parent", "depth")

    def __init__(self, tag: str, attrs, parent: "Node | None"):
        self.tag = tag
        self.attrs = dict(attrs) if attrs else {}
        self.children: list = []
        self.parent = parent
        self.depth = 0 if parent is None else parent.depth + 1

    def signal(self) -> str:
        return (self.attrs.get("id") or "") + " " + (
            self.attrs.get("class") or "")


# HTML5 implied-close table: opening KEY closes an open entry of the
# mapped set.  <p> additionally closes on ANY block-level open (spec
# 8.1.2.4 "closing a p element"), handled separately below.
_CLOSES = {
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "thead": frozenset({"thead", "tbody", "tfoot"}),
    "tbody": frozenset({"thead", "tbody", "tfoot"}),
    "tfoot": frozenset({"thead", "tbody"}),
    "option": frozenset({"option"}),
}
_P_CLOSERS = BLOCK_TAGS - {"br", "html", "body"}


class _TreeBuilder(HTMLParser):
    """html.parser -> Node tree with HTML5-ish error recovery."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", None, None)
        self.stack: list[Node] = [self.root]

    # -- recovery helpers ----------------------------------------------
    def _implied_close(self, tag: str) -> None:
        top = self.stack[-1].tag
        if tag in _P_CLOSERS and top == "p":
            self.stack.pop()
            top = self.stack[-1].tag
        closers = _CLOSES.get(tag)
        if closers and top in closers:
            self.stack.pop()

    # -- parser events --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._implied_close(tag)
        parent = self.stack[-1]
        node = Node(tag, attrs, parent)
        parent.children.append(node)
        if tag not in VOID_TAGS and node.depth < MAX_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        parent = self.stack[-1]
        parent.children.append(Node(tag, attrs, parent))

    def handle_endtag(self, tag):
        # pop to the nearest matching open element; a stray end tag
        # (nothing matches) is ignored — both standard recovery moves.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(doc: str) -> Node:
    """Parse to a Node tree (never raises on tag soup — html.parser
    recovers; the builder adds implied closes and stray-end handling)."""
    b = _TreeBuilder()
    b.feed(doc)
    b.close()
    return b.root


# ---------------------------------------------------------------------------
# block collection


class _Block:
    __slots__ = ("parts", "link_chars", "container", "heading")

    def __init__(self, container, heading):
        self.parts: list[str] = []
        self.link_chars = 0
        self.container = container
        self.heading = heading

    def text(self) -> str:
        return _WS_RE.sub(" ", " ".join(self.parts)).strip()


def _pruned(node: Node) -> bool:
    if node.tag in PRUNE_TAGS:
        return True
    sig = node.signal()
    if len(sig) > 2 and NEGATIVE_RE.search(sig) and not POSITIVE_RE.search(
            sig):
        return True
    return False


def _collect_blocks(root: Node) -> list[_Block]:
    """Document-order text blocks with per-block link chars, the
    nearest candidate ancestor, and heading-ness.  Iterative walk —
    depth-capped trees keep it bounded, but no recursion regardless."""
    blocks: list[_Block] = []
    cur: _Block | None = None

    flush = object()  # sentinel: block-exit marker (can't collide with text)
    # stack entries: (node_or_text, candidate, in_link, heading) or (flush,)
    stack: list = [(root, None, 0, False)]
    while stack:
        entry = stack.pop()
        if entry[0] is flush:
            cur = None
            continue
        node, candidate, in_link, heading = entry
        if isinstance(node, str):
            txt = node
            if txt and not txt.isspace():
                if cur is None:
                    cur = _Block(candidate, heading)
                    blocks.append(cur)
                cur.parts.append(txt)
                if in_link:
                    cur.link_chars += len(
                        _WS_RE.sub(" ", txt).strip())
            continue
        if node.tag != "#root" and _pruned(node):
            continue
        is_block = node.tag in BLOCK_TAGS
        if is_block:
            cur = None  # entering a block boundary flushes
            stack.append((flush,))
            heading = node.tag in HEADING_TAGS
        if node.tag in CANDIDATE_TAGS:
            candidate = node
        if node.tag == "a":
            in_link = True
        for child in reversed(node.children):
            stack.append((child, candidate, in_link, heading))
    return [b for b in blocks if b.text()]


# ---------------------------------------------------------------------------
# candidate scoring + selection


def _candidate_chain(node: Node | None):
    while node is not None:
        if node.tag in CANDIDATE_TAGS:
            yield node
        node = node.parent


def _is_within(node: Node | None, ancestor: Node) -> bool:
    while node is not None:
        if node is ancestor:
            return True
        node = node.parent
    return False


def select_main_subtrees(
    blocks: "list[_Block]",
) -> "tuple[list[Node], float] | None":
    """The candidate-selection core shared by the plain extractor and
    the markdown renderer: score quality blocks up the candidate
    chain, normalize by aggregate link density, pick the winner, then
    append qualifying sibling subtrees.

    -> (included candidate nodes, document order, nested duplicates
    removed; the winner's aggregate link density) or None when no
    block scores."""
    score: dict[int, float] = {}
    nodes: dict[int, Node] = {}
    agg_text: dict[int, int] = {}
    agg_link: dict[int, int] = {}
    order: dict[int, int] = {}

    for blk in blocks:
        text = blk.text()
        n_words = len(text.split())
        density = blk.link_chars / max(len(text), 1)
        # aggregate text/link chars up the candidate chain (for the
        # link-density normalization and the linky-block rescue)
        for cand in _candidate_chain(blk.container):
            cid = id(cand)
            nodes[cid] = cand
            order.setdefault(cid, len(order))
            agg_text[cid] = agg_text.get(cid, 0) + len(text)
            agg_link[cid] = agg_link.get(cid, 0) + blk.link_chars
        # only quality blocks score (Kohlschütter gates), headings
        # name content but are not body text
        if blk.heading or n_words < MIN_WORDS or density >= MAX_LINK_DENSITY:
            continue
        credit = float(n_words)
        chain = list(_candidate_chain(blk.container))
        for boost, cand in zip((1.0, 0.5), chain):
            cid = id(cand)
            score[cid] = score.get(cid, 0.0) + credit * boost

    if not score:
        return None

    def norm(cid: int) -> float:
        dens = agg_link.get(cid, 0) / max(agg_text.get(cid, 1), 1)
        return score[cid] * (1.0 - dens)

    top_id = max(score, key=lambda c: (norm(c), -order[c]))
    top = nodes[top_id]
    top_density = agg_link.get(top_id, 0) / max(agg_text.get(top_id, 1), 1)

    # sibling inclusion: candidates sharing top's candidate parent,
    # scoring >= SIBLING_FRACTION of the winner
    top_parent = next(_candidate_chain(top.parent), None)
    included = [(order[top_id], top)]
    if top_parent is not None:
        for cid, cand in nodes.items():
            if cand is top or cid not in score:
                continue
            if next(_candidate_chain(cand.parent), None) is top_parent \
                    and score[cid] >= SIBLING_FRACTION * score[top_id]:
                included.append((order[cid], cand))
    included.sort()
    # drop nested duplicates (a pick inside another pick renders twice
    # in the markdown path; harmless but redundant for block filtering)
    picked: list[Node] = []
    for _, cand in included:
        if not any(_is_within(cand, p) for p in picked):
            picked.append(cand)
    return picked, top_density


def extract_main_dom(doc: str) -> str | None:
    """HTML -> main-content text (blocks joined by newline), or None
    when the page yields no scored candidate (caller falls back to the
    flat path, which returns "" on the same pages — None vs "" lets the
    caller distinguish "no tree signal" from "extracted empty")."""
    root = parse_html(doc)
    blocks = _collect_blocks(root)
    if not blocks:
        return None
    selected = select_main_subtrees(blocks)
    if selected is None:
        return None
    included, top_density = selected

    kept: list[str] = []
    for blk in blocks:
        if not any(_is_within(blk.container, inc) for inc in included):
            continue
        text = blk.text()
        n_words = len(text.split())
        density = blk.link_chars / max(len(text), 1)
        if blk.heading:
            ok = n_words >= MIN_WORDS and density < MAX_LINK_DENSITY
        elif n_words >= MIN_WORDS:
            # linky rescue: a citation-dense paragraph is kept when its
            # HOME is link-light (the flat path cannot see the home)
            ok = density < MAX_LINK_DENSITY or top_density < MAX_LINK_DENSITY
        else:
            # short-block rescue: link-free AND reads like a sentence
            ok = blk.link_chars == 0 and bool(_SENTENCE_RE.search(text))
        if ok:
            kept.append(text)
    return "\n".join(kept)


# ---------------------------------------------------------------------------
# page-level metadata (the curation signals a crawl pipeline dedups
# and routes on BEFORE main-content extraction): <title>, meta
# description, canonical link, OpenGraph og:title/og:type, the html
# lang attribute, and schema.org JSON-LD @type values.  Reference
# parity: none (no text path in mcp-ocr-server) — scale-pipeline
# extension like the rest of the HTML family.

class _HeadMetaParser(HTMLParser):
    """Tolerant single-pass collector — html.parser never raises on
    hostile bytes, and first-occurrence-wins matches browser
    behavior for duplicated tags."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title: str | None = None
        self.description: str | None = None
        self.canonical: str | None = None
        self.og: dict[str, str] = {}
        self.lang: str | None = None
        self.ldjson: list[str] = []
        self.n_meta = 0
        self._in_title = False
        self._in_ldjson = False
        self._title_parts: list[str] = []
        self._ld_parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "html" and self.lang is None and a.get("lang"):
            self.lang = a["lang"].strip()
        elif tag == "title" and self.title is None:
            self._in_title = True
            self._title_parts = []
        elif tag == "meta":
            self.n_meta += 1
            name = (a.get("name") or "").lower()
            prop = (a.get("property") or "").lower()
            content = a.get("content")
            if content is None:
                return
            if name == "description" and self.description is None:
                self.description = " ".join(content.split())
            elif prop.startswith("og:"):
                self.og.setdefault(prop[3:], content.strip())
        elif tag == "link":
            rels = (a.get("rel") or "").lower().split()
            if "canonical" in rels and self.canonical is None \
                    and a.get("href"):
                self.canonical = a["href"].strip()
        elif tag == "script":
            if (a.get("type") or "").lower() == "application/ld+json":
                self._in_ldjson = True
                self._ld_parts = []

    def handle_endtag(self, tag):
        if tag == "title" and self._in_title:
            self._in_title = False
            if self.title is None:
                self.title = " ".join(
                    "".join(self._title_parts).split())
        elif tag == "script" and self._in_ldjson:
            self._in_ldjson = False
            self.ldjson.append("".join(self._ld_parts))

    def handle_data(self, data):
        if self._in_title:
            self._title_parts.append(data)
        elif self._in_ldjson:
            self._ld_parts.append(data)


def _jsonld_types(payloads: list[str]) -> str | None:
    """Sorted, deduped, comma-joined @type values across every
    ld+json script — top-level objects, top-level arrays, and one
    @graph level; broken JSON is skipped (a lying script must not
    error the page)."""
    import json

    types: set[str] = set()

    def take(obj) -> None:
        if isinstance(obj, dict):
            t = obj.get("@type")
            if isinstance(t, str):
                types.add(t)
            elif isinstance(t, list):
                types.update(x for x in t if isinstance(x, str))
            g = obj.get("@graph")
            if isinstance(g, list):
                for item in g:
                    if isinstance(item, dict):
                        take(item)

    for raw in payloads:
        try:
            doc = json.loads(raw)
        except ValueError:
            continue
        if isinstance(doc, list):
            for item in doc:
                take(item)
        else:
            take(doc)
    return ",".join(sorted(types)) if types else None


def extract_html_metadata(doc: str) -> dict:
    """dict(title, description, canonical, og_title, og_type, lang,
    jsonld_types, n_meta) — every field None when absent (absence is
    data); the parse is total, so there is no error path."""
    p = _HeadMetaParser()
    try:
        p.feed(doc)
        p.close()
    except Exception:
        pass  # html.parser is documented-total; belt and braces
    if p._in_title and p.title is None:
        p.title = " ".join("".join(p._title_parts).split()) or None
    return dict(
        title=p.title or None,
        description=p.description,
        canonical=p.canonical,
        og_title=p.og.get("title"),
        og_type=p.og.get("type"),
        lang=p.lang,
        jsonld_types=_jsonld_types(p.ldjson),
        n_meta=p.n_meta,
    )
