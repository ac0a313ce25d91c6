"""functions/robots.py — RFC 9309 robots.txt parsing: group
splitting, agent selection (most-specific wins, '*' fallback,
same-agent combination), wildcard regex translation, Sitemap:
discovery, the refuse-loudly contract, and fuzz."""

import re

import numpy as np
import pytest

from mcp_ocr_server_spark.functions.robots import (
    MAX_ROBOTS_BYTES,
    effective_rules,
    parse_robots,
    robots_rows,
    rule_regex,
)


def test_group_splitting_and_directives():
    groups, sitemaps = parse_robots(
        b"# header comment\n"
        b"User-agent: a\n"
        b"Disallow: /x\n"
        b"Allow: /x/pub\n"
        b"\n"
        b"User-agent: b\n"
        b"User-agent: c\n"
        b"Disallow: /y\n"
        b"Sitemap: https://h/s.xml\n"
    )
    assert [g["agents"] for g in groups] == [["a"], ["b", "c"]]
    assert groups[0]["rules"] == [(False, "/x"), (True, "/x/pub")]
    assert groups[1]["rules"] == [(False, "/y")]
    assert sitemaps == ["https://h/s.xml"]


def test_most_specific_agent_wins_star_is_fallback():
    groups, _ = parse_robots(
        b"User-agent: *\nDisallow: /all\n"
        b"User-agent: synth\nDisallow: /synth\n"
        b"User-agent: synthcrawler\nDisallow: /exact\n"
    )
    agent, rules = effective_rules(groups, "synthcrawler")
    assert agent == "synthcrawler" and rules == [(False, "/exact")]
    agent, rules = effective_rules(groups, "synthbot")
    assert agent == "synth" and rules == [(False, "/synth")]
    agent, rules = effective_rules(groups, "otherbot")
    assert agent == "*" and rules == [(False, "/all")]


def test_same_agent_groups_combine_in_file_order():
    groups, _ = parse_robots(
        b"User-agent: x\nDisallow: /a\n\n"
        b"User-agent: x\nAllow: /a/pub\n"
    )
    assert effective_rules(groups, "x")[1] == [
        (False, "/a"), (True, "/a/pub")]


def test_no_matching_group_yields_no_rules():
    groups, _ = parse_robots(b"User-agent: googlebot\nDisallow: /\n")
    assert effective_rules(groups, "synthcrawler") == ("", [])


def test_messy_formatting_parses_totally():
    groups, sitemaps = parse_robots(
        b"\xef\xbb\xbfUSER-AGENT: *\r\n"
        b"Crawl-delay: 10\r\n"
        b"Disallow:\r\n"              # empty = allow-all no-op
        b"DISALLOW: /tmp/ # comment\r\n"
        b"Unknown-thing: zzz\r\n"
    )
    assert effective_rules(groups, "any")[1] == [(False, "/tmp/")]


@pytest.mark.parametrize(
    "pattern, matches, rejects",
    [
        ("/docs/*3$", ["/docs/3", "/docs/13", "/docs/x/3"],
         ["/docs/30", "/doc/3"]),
        ("/a/*.pdf$", ["/a/x.pdf", "/a/b/c.pdf"], ["/a/x.pdfx"]),
        ("/plain", ["/plain", "/plainer"], ["/p"]),
        ("/q?x=1", ["/q?x=1", "/q?x=12"], ["/qax=1"]),  # ? is literal
    ],
)
def test_rule_regex_semantics(pattern, matches, rejects):
    rx = re.compile(rule_regex(pattern))
    for p in matches:
        assert rx.search(p), (pattern, p)
    for p in rejects:
        assert not rx.search(p), (pattern, p)


def test_refusals():
    with pytest.raises(ValueError, match="500 KiB"):
        parse_robots(b"x" * (MAX_ROBOTS_BYTES + 1))
    with pytest.raises(ValueError, match="NUL"):
        parse_robots(b"User-agent: *\x00\nDisallow: /\n")


def test_rows_contract_and_fuzz():
    rows = robots_rows("h", b"\x00binary")
    assert len(rows) == 1 and rows[0]["error"]
    assert robots_rows("h", b"User-agent: other\nDisallow: /\n") == []
    rng = np.random.default_rng(17)
    for _ in range(40):
        raw = bytes(rng.integers(1, 256, 120, dtype=np.uint8).tolist())
        robots_rows("h", raw)  # total: rows or one error row


def test_corpus_classes():
    from mcp_ocr_server_spark.queries import FLAGSHIP_CORPUS
    from mcp_ocr_server_spark.sources.synthetic import (
        N_ROBOTS, robots_item)

    kinds = {}
    for j in range(N_ROBOTS):
        ref, data, kind = robots_item(FLAGSHIP_CORPUS, j)
        rows = robots_rows(ref, data)
        kinds[kind] = kinds.get(kind, 0) + 1
        if kind in ("oversize", "nul"):
            assert len(rows) == 1 and rows[0]["error"]
        elif kind == "nomatch":
            assert rows == []
        elif kind == "specific":
            # the star group's allow-all must NOT leak in
            assert [r["agent"] for r in rows
                    if r["kind"] == "rule"] == ["synthcrawler"]
        elif kind == "wildcards":
            assert any("*" in r["pattern"] for r in rows)
            assert all(r["regex"].startswith("^") for r in rows
                       if r["kind"] == "rule")
        elif kind == "combined":
            assert [r["allow"] for r in rows] == [False, True]
    assert set(kinds) == {"star", "specific", "wildcards", "multi_ua",
                          "carveout", "oversize", "nul", "nomatch",
                          "messy", "combined"}


def test_admission_fold_tiebreak_matches_duckdb(spark):
    """Two same-length same-polarity patterns matching one path score
    identically; BOTH engines must pick the SAME winner (Spark
    array_max struct order = score, allow, pattern; the oracle QUALIFY
    mirrors it: score DESC, pattern DESC) — review finding."""
    import duckdb
    from pyspark.sql import functions as F

    from mcp_ocr_server_spark.functions.robots import (
        admission_fold,
        rule_regex,
    )

    rules = [("/docs/a*", False), ("/docs/*b", False)]
    rows = [("h", "/docs/ab",
             [(p, rule_regex(p), a) for p, a in rules])]
    df = spark.createDataFrame(
        rows, "host string, path string,"
        " rules array<struct<pattern string, regex string,"
        " allow boolean>>")
    got = df.withColumn("w", admission_fold()).select(
        "w.pattern", "w.allow").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE r(pattern VARCHAR, regex VARCHAR,"
                " allow BOOLEAN)")
    for p, a in rules:
        con.execute("INSERT INTO r VALUES (?, ?, ?)",
                    [p, rule_regex(p), a])
    want = con.execute(
        "SELECT pattern, allow FROM r"
        " WHERE regexp_matches('/docs/ab', regex)"
        " QUALIFY row_number() OVER (ORDER BY"
        " length(pattern) * 2 + allow::INT DESC, pattern DESC) = 1"
    ).fetchone()
    assert (got.pattern, got.allow) == want
