"""DOM -> Markdown renderer (functions/markdown.py): structural
round-trip exactness against generator-independent goldens, the
boilerplate selection shared with the plain extractor, and the
rendering rules for each block/inline family."""

from mcp_ocr_server_spark.functions.markdown import (
    extract_main_markdown,
    markdown_eval_row,
    render_markdown,
)
from mcp_ocr_server_spark.functions.dom import parse_html

MAIN = ("the quick analytic engine reads every span and writes "
        "extracted content back")


def _wrap(body):
    return (
        "<html><head><title>t</title></head><body>"
        '<nav><ul><li><a href="/">home</a></li></ul></nav>'
        f'<div class="content">{body}</div>'
        '<aside><a href="/ad">buy</a> sponsored</aside>'
        "<footer><p>copyright</p></footer></body></html>"
    )


def test_headings_and_paragraphs():
    md = extract_main_markdown(_wrap(f"<h1>the title</h1><p>{MAIN}</p>"))
    assert md == f"# the title\n\n{MAIN}"


def test_inline_marks_and_links():
    md = extract_main_markdown(_wrap(
        f"<p>{MAIN}</p>"
        '<p>see <b>bold</b> and <i>soft</i> and <a href="/r">a link</a>'
        " for more</p>"
    ))
    assert md.endswith(
        "see **bold** and *soft* and [a link](/r) for more")


def test_nested_lists():
    md = extract_main_markdown(_wrap(
        f"<p>{MAIN}</p>"
        "<ul><li>one</li><li>two<ul><li>sub a</li><li>sub b</li></ul>"
        "</li></ul><ol><li>x</li><li>y</li></ol>"
    ))
    assert "- one\n- two\n  - sub a\n  - sub b" in md
    assert "1. x\n2. y" in md


def test_table_with_and_without_th():
    md = extract_main_markdown(_wrap(
        f"<p>{MAIN}</p>"
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>a</td><td>1</td></tr></table>"
    ))
    assert "| k | v |\n|---|---|\n| a | 1 |" in md
    # no th: first row becomes the header
    md = extract_main_markdown(_wrap(
        f"<p>{MAIN}</p>"
        "<table><tr><td>a</td><td>1</td></tr>"
        "<tr><td>b</td><td>2</td></tr></table>"
    ))
    assert "| a | 1 |\n|---|---|\n| b | 2 |" in md


def test_code_fence_and_blockquote():
    md = extract_main_markdown(_wrap(
        f"<p>{MAIN}</p><pre>def f(x):\n    return x</pre>"
        "<blockquote><p>a quoted sentence of sufficient length to"
        " stand here</p></blockquote>"
    ))
    assert "```\ndef f(x):\n    return x\n```" in md
    assert "> a quoted sentence" in md


def test_boilerplate_stripped_same_as_plain_path():
    md = extract_main_markdown(_wrap(
        f"<p>{MAIN}</p>"
        '<div class="related">teaser words here with a'
        ' <a href="/m">link</a></div>'
    ))
    assert "teaser" not in md
    assert "sponsored" not in md and "copyright" not in md
    assert "home" not in md  # nav pruned


def test_no_candidate_returns_none():
    assert extract_main_markdown("<html><p>x</p></html>") is None


def test_pipe_escaped_in_cells():
    md = extract_main_markdown(_wrap(
        f"<p>{MAIN}</p>"
        "<table><tr><th>a|b</th><th>c</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"
    ))
    assert r"| a\|b | c |" in md


def test_render_markdown_direct():
    root = parse_html("<h2>t</h2><p>hello world</p>")
    assert render_markdown(root) == "## t\n\nhello world"


def test_markdown_exception_contract_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tags = ["<table>", "<tr>", "<td>", "<ul>", "<li>", "<ol>", "<pre>",
            "<blockquote>", "</blockquote>", "<h1>", "</h2>", "<b>",
            "</i>", "<code>", "<a href=x>", "text body words", "|pipe|"]

    @settings(max_examples=120, deadline=None)
    @given(st.lists(st.sampled_from(tags), max_size=50).map("".join))
    def run(soup):
        out = extract_main_markdown(soup)
        assert out is None or isinstance(out, str)

    run()


def test_corpus_exact_on_every_class():
    from collections import defaultdict

    from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
    from mcp_ocr_server_spark.sources.synthetic import (
        N_HTML_MD_DOCS,
        html_md_item,
    )

    per = defaultdict(list)
    for j in range(N_HTML_MD_DOCS):
        d, c, h, g = html_md_item(FLAGSHIP_CORPUS, j)
        r = markdown_eval_row(d, c, h, g)
        per[c].append(r["exact"])
    assert set(per) == {"article", "lists", "table_doc", "code_doc",
                        "quote_doc"}
    for c, flags in per.items():
        assert all(flags), c
