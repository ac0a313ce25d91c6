"""DOM-tree extractor unit tests (functions/dom.py) — parser recovery,
signal pruning, Readability candidate selection + sibling inclusion,
and the two operating-point rescues (short sentence, linky block in a
link-light home).  Like the flat-path tests, these golden cases ARE
the spec: no reference code exists for the text path."""

from mcp_ocr_server_spark.functions.dom import (
    MAX_DEPTH,
    MIN_WORDS,
    Node,
    extract_main_dom,
    parse_html,
)

MAIN = ("the quick analytic engine reads every span and writes "
        "extracted content back")


def _children_tags(node):
    return [c.tag for c in node.children if isinstance(c, Node)]


# --- parser -----------------------------------------------------------------


def test_tree_shape_and_attrs():
    root = parse_html('<div id="a" class="x y"><p>hi</p><p>bye</p></div>')
    div = root.children[0]
    assert div.tag == "div" and div.attrs["id"] == "a"
    assert div.signal() == "a x y"
    assert _children_tags(div) == ["p", "p"]


def test_unclosed_p_implied_close():
    root = parse_html("<div><p>one<p>two</div>")
    div = root.children[0]
    ps = [c for c in div.children if isinstance(c, Node)]
    assert [p.tag for p in ps] == ["p", "p"]
    assert ps[0].children == ["one"] and ps[1].children == ["two"]


def test_li_td_implied_close():
    root = parse_html("<ul><li>a<li>b</ul><table><tr><td>x<td>y</table>")
    ul = root.children[0]
    assert _children_tags(ul) == ["li", "li"]
    table = root.children[1]
    tr = next(c for c in table.children if isinstance(c, Node))
    assert _children_tags(tr) == ["td", "td"]


def test_stray_end_tag_ignored_and_misnesting_recovered():
    root = parse_html("<div><b><i>x</b></i>y</span></div>")
    div = root.children[0]
    # </b> pops through i and b; </i> and </span> are stray: ignored
    assert div.children[-1] == "y"


def test_void_elements_do_not_nest():
    root = parse_html("<p>a<br>b<img src='x'>c</p>")
    p = root.children[0]
    assert [c for c in p.children if isinstance(c, str)] == ["a", "b", "c"]


def test_script_content_not_parsed_as_markup():
    root = parse_html("<script>var a = '<p>sneaky</p>';</script><p>ok</p>")
    assert _children_tags(root) == ["script", "p"]


def test_depth_cap_flattens_instead_of_failing():
    html = "<div>" * (MAX_DEPTH + 50) + "deep" + "</div>" * (MAX_DEPTH + 50)
    root = parse_html(html)  # must not raise / blow the stack
    node, depth = root, 0
    while True:
        kids = [c for c in node.children if isinstance(c, Node)]
        if not kids:
            break
        node, depth = kids[0], depth + 1
    assert depth <= MAX_DEPTH + 1


# --- extractor --------------------------------------------------------------


def _wrap(body):
    return f"<html><head><title>t</title></head><body>{body}</body></html>"


def test_signal_pruning_comments_sidebar():
    junk = " ".join(["junk"] * (MIN_WORDS + 5))
    html = _wrap(
        f'<div class="content"><p>{MAIN}</p></div>'
        f'<div id="comments"><p>{junk}</p></div>'
        f'<div class="sidebar-promo"><p>{junk}</p></div>'
    )
    assert extract_main_dom(html) == MAIN


def test_positive_signal_overrides_negative():
    # "article" positive beats "comment" negative (Readability's
    # okMaybeItsACandidate rule)
    html = _wrap(f'<div class="comment article"><p>{MAIN}</p></div>')
    assert extract_main_dom(html) == MAIN


def test_sibling_inclusion_reassembles_split_main():
    a = " ".join(["alpha"] * 20)
    b = " ".join(["beta"] * 25)
    c = " ".join(["gamma"] * 22)
    # three paragraphs split across sibling wrapper divs — candidate
    # scoring alone picks the biggest wrapper; sibling inclusion (>=20%
    # of the winner) reassembles all three in document order
    html = _wrap(
        '<div class="content">'
        f"<div><p>{a}</p></div><div><p>{b}</p><p>{c}</p></div>"
        "</div>"
    )
    assert extract_main_dom(html) == "\n".join([a, b, c])


def test_short_sentence_rescued_but_word_soup_dropped():
    tail = "and that was the end."
    soup = "w " * (MIN_WORDS - 2)
    html = _wrap(
        f'<div class="content"><p>{MAIN}</p><p>{tail}</p><p>{soup}</p></div>'
    )
    assert extract_main_dom(html) == MAIN + "\n" + tail


def test_linky_block_rescued_in_link_light_home():
    words = ["ref%d" % k for k in range(12)]
    linked = " ".join(
        f'<a href="/{w}">{w}</a>' if k % 2 == 0 else w
        for k, w in enumerate(words)
    )
    html = _wrap(f'<div class="content"><p>{MAIN}</p><p>{linked}</p></div>')
    out = extract_main_dom(html)
    assert out == MAIN + "\n" + " ".join(words)


def test_linky_block_dropped_in_link_heavy_home():
    words = " ".join(["word"] * 20)
    html = _wrap(f'<p><a href="/x">{words}</a></p><p>{MAIN}</p>')
    assert extract_main_dom(html) == MAIN


def test_headings_are_not_body_text():
    html = _wrap(f'<div class="content"><h1>short title</h1><p>{MAIN}</p></div>')
    assert extract_main_dom(html) == MAIN


def test_no_candidate_returns_none():
    assert extract_main_dom("<html><p>x</p></html>") is None
    assert extract_main_dom("plain words only") is None


def test_flagship_corpus_exactness():
    import numpy as np

    from mcp_ocr_server_spark.sources.synthetic import make_html

    for i in range(50):
        html, golden = make_html(np.random.default_rng(i))
        assert extract_main_dom(html) == golden, i


# --- exception-contract fuzz -------------------------------------------------
# Crawl bytes are hostile: for ARBITRARY input the extractor returns a
# str or None — never raises, never recurses to death (the same
# contract class the image/audio parsers pin).

from hypothesis import given, settings
from hypothesis import strategies as st

_TAGS = ["<div>", "</div>", "<p>", "</p>", "<a href='/x'>", "</a>",
         "<li>", "<table>", "<tr>", "<td>", "</b>", "<b>", "<br>",
         "<script>", "</script>", "<!--", "-->", "<h1>", "</h3>",
         "<div class='sidebar'>", "<meta charset=utf-8>", "words here"]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.sampled_from(_TAGS), max_size=60).map("".join),
       st.text(max_size=80))
def test_extract_main_dom_exception_contract(soup, noise):
    out = extract_main_dom(soup + noise)
    assert out is None or isinstance(out, str)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200))
def test_extract_main_content_total_on_text(noise):
    from mcp_ocr_server_spark.functions.text_extract import (
        extract_main_content,
    )

    assert isinstance(extract_main_content(noise), str)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300),
       st.sampled_from([None, "text/html", "text/html; charset=utf-8",
                        "text/html; charset=iso-8859-1",
                        "text/html; charset=bogus"]))
def test_decode_html_total_on_bytes(payload, ctype):
    from mcp_ocr_server_spark.functions.charset import decode_html

    text, charset, source = decode_html(ctype, payload)
    assert isinstance(text, str) and charset and source


def test_html_metadata_classes_and_fuzz():
    """extract_html_metadata matches the independently-constructed
    expectation on every corpus class, and is TOTAL on hostile
    input (never raises, absent = None)."""
    from hypothesis import given, settings, strategies as st

    from mcp_ocr_server_spark.functions.dom import extract_html_metadata
    from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
    from mcp_ocr_server_spark.sources import synthetic as S

    seen = set()
    for j in range(S.N_HTML_META_DOCS):
        (pid, cls, html, title, desc, canon, og_t, og_ty, lang, ld,
         n_meta) = S.html_meta_item(FLAGSHIP_CORPUS, j)
        seen.add(cls)
        m = extract_html_metadata(html)
        assert (m["title"], m["description"], m["canonical"],
                m["og_title"], m["og_type"], m["lang"],
                m["jsonld_types"], m["n_meta"]) == (
            title, desc, canon, og_t, og_ty, lang, ld, n_meta), (
            j, cls)
    assert seen == set(S._HTML_META_CLASSES)

    @settings(max_examples=100, deadline=None)
    @given(st.text(max_size=300))
    def run(doc):
        m = extract_html_metadata(doc)
        assert set(m) == {"title", "description", "canonical",
                          "og_title", "og_type", "lang",
                          "jsonld_types", "n_meta"}

    run()
