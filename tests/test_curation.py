"""Invariant + plan-shape tests for the round-4 continuation queries:
url_dedup (canonicalization laws), dedup_substring (window/run
invariants), curation_funnel (stage monotonicity + the no-Filter-on-
verdict plan contract), lang_sample_weights (distribution laws)."""

import re

from pyspark.sql import functions as F

from mcp_ocr_server_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_url_canonicalization_laws(spark):
    """Every canonical http(s) URL obeys the canonicalization rules
    (lowercase host, no default port, no fragment, no tracking params,
    no trailing slash, a stripped-tracking query never leaks a leading
    '&'), non-web schemes pass through untouched, and the injected mess
    exercises each rule (http and https, tracking before AND after the
    meaningful param, double slashes, ftp)."""
    rows = Q.QUERIES["url_dedup"][0](spark, SF).collect()
    assert len(rows) == 500
    seen_http = seen_ftp = 0
    for r in rows:
        u = r["canonical_url"]
        if u.startswith("ftp://"):
            seen_ftp += 1
            assert r["doc_id"] % 25 == 21, u  # passthrough class only
            continue
        m = re.match(r"^(https?)://([^/?#]+)", u)
        assert m, u
        if m.group(1) == "http":
            seen_http += 1
            assert ":80" not in u, u
        host = m.group(2)
        assert host == host.lower(), u
        assert ":443" not in u, u
        assert "#" not in u, u
        assert "utm_" not in u, u
        path = re.sub(r"[?#].*$", "", u)
        assert not path.endswith("/"), u
        assert "&" not in path, u  # the '&'->'?' repair fired
        if "?" in u:
            assert re.search(r"\?id=\d+$", u), u  # only the real param
    assert seen_http > 0 and seen_ftp > 0
    # dedup laws: exactly one keeper per group, group sizes consistent
    by_url = {}
    for r in rows:
        by_url.setdefault(r["canonical_url"], []).append(r)
    assert any(len(g) > 1 for g in by_url.values())  # dups exist
    for g in by_url.values():
        assert all(r["n_same_url"] == len(g) for r in g)
        keepers = [r for r in g if r["keep"]]
        assert len(keepers) == 1
        assert keepers[0]["doc_id"] == min(r["doc_id"] for r in g)


def test_url_canonicalization_idempotent(spark):
    """canon(canon(u)) == canon(u) for every corpus URL — a
    canonicalizer that isn't a fixpoint corrupts keys when a pipeline
    re-canonicalizes already-clean URLs (recrawls, merged sources)."""
    aug = Q._url_augment(
        Q._t(spark, SF, "documents").select("doc_id", "source")
    )
    once = aug.select(Q.url_canonical("url").alias("u"))
    n_bad = (
        once.select(
            "u", Q.url_canonical("u").alias("u2")
        )
        .where(F.col("u") != F.col("u2"))
        .count()
    )
    assert n_bad == 0


def test_dedup_substring_invariants(spark):
    """Window accounting laws + the run bound: a duplicated run of R
    consecutive window starts spans R + W - 1 tokens, and a doc's
    longest run cannot exceed its duplicated-window count + W - 1."""
    rows = Q.QUERIES["dedup_substring"][0](spark, SF).collect()
    assert len(rows) == 500
    w = Q.SUBSTR_W
    assert any(r["n_dup_windows"] > 0 for r in rows)  # corpus has dups
    for r in rows:
        assert 0 <= r["n_dup_windows"] <= r["n_windows"]
        if r["n_dup_windows"] == 0:
            assert r["max_dup_run_tokens"] == 0
            assert r["dup_ratio"] == 0.0
        else:
            assert r["max_dup_run_tokens"] >= w
            assert r["max_dup_run_tokens"] <= r["n_dup_windows"] + w - 1


def test_curation_funnel_monotone_and_plan(spark):
    """Stage counts are non-increasing (each stage only removes docs),
    raw matches the corpus, and the physical plan never evaluates the
    quality verdict inside a Filter (the 27x pushdown pathology: the
    verdict's higher-order signal folds re-evaluate per rule reference
    when Catalyst pushes keep into a Filter node)."""
    df = Q.QUERIES["curation_funnel"][0](spark, SF)
    rows = sorted(df.collect(), key=lambda r: r["stage"])
    assert [r["stage_name"] for r in rows] == [
        "raw", "quality", "exact_dedup", "decontaminated", "train",
    ]
    assert rows[0]["n_docs"] == 500
    assert rows[0]["pct_docs"] == 1.0
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if line.lstrip().startswith(("Filter", "+- Filter", ": +- Filter")) or (
            "Filter" in line and "Exchange" not in line and "(" in line
        ):
            assert "concat_ws" not in line, line
            assert "aggregate(" not in line, line


def test_lang_sample_weights_distribution_laws(spark):
    """p_sampled is a probability distribution; boost = p^(alpha-1) /
    sum(p^alpha) is strictly DECREASING in p (alpha < 1), so the
    smallest-share language gets the max boost (>= 1) and the largest
    gets the min (<= 1) — the boost>1 crossover sits at
    p* = (sum p^alpha)^(1/(alpha-1)), NOT at 1/n, so no per-language
    1/n comparison is asserted (the round-4 review's counterexample:
    shares (0.6, 0.35, 0.05) put p=0.35 > 1/3 at boost 1.045 > 1).
    Expected doc total is conserved up to per-language rounding."""
    rows = Q.QUERIES["lang_sample_weights"][0](spark, SF).collect()
    total = sum(r["n_docs"] for r in rows)
    assert abs(sum(r["p_sampled"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["expected_docs"] for r in rows) - total) <= len(rows)
    by_p = sorted(rows, key=lambda r: r["p_raw"])
    for lo, hi in zip(by_p, by_p[1:]):
        if hi["p_raw"] > lo["p_raw"] + 1e-9:
            assert hi["boost"] < lo["boost"] + 1e-6, (lo, hi)
    assert by_p[0]["boost"] >= 1.0 - 1e-6
    assert by_p[-1]["boost"] <= 1.0 + 1e-6


def test_url_canonical_grammar_exhaustive(spark):
    """Exhaustive sweep of the mess grammar — every combination of
    scheme x host case x default/explicit port x 0/1/2 trailing slashes
    x query shape (none / id / utm / id&utm / utm&id) x fragment: canon
    is idempotent on all of them, never emits a malformed query, and
    maps every variant of the same logical resource to ONE key."""
    import itertools

    urls = []
    for scheme, case, port, slashes, query, frag in itertools.product(
        ["https", "http", "ftp"],
        ["example.com", "EXAMPLE.com"],
        ["", ":443", ":80", ":8080"],
        ["", "/", "//"],
        ["", "?id=7", "?utm_source=x", "?id=7&utm_source=x",
         "?utm_source=x&id=7"],
        ["", "#frag"],
    ):
        urls.append(f"{scheme}://{case}{port}/p{slashes}{query}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select("url", Q.url_canonical("url").alias("c1"))
    both = once.select(
        "url", "c1", Q.url_canonical("c1").alias("c2")
    ).collect()
    groups = {}
    for r in both:
        assert r["c1"] == r["c2"], (r["url"], r["c1"], r["c2"])
        if r["url"].startswith("ftp://"):
            assert r["c1"] == r["url"]  # non-web passthrough
            continue
        # well-formed: at most one '?', no '&' before it, no fragment
        assert r["c1"].count("?") <= 1, r
        assert "#" not in r["c1"], r
        pathpart = r["c1"].split("?")[0]
        assert "&" not in pathpart, r
        assert "utm_" not in r["c1"], r
        scheme = r["url"].split("://")[0]
        meaningful = "id=7" in r["url"]
        if ":8080" in r["url"]:
            port_in = ":8080"
        elif ":443" in r["url"]:
            port_in = ":443"
        elif ":80" in r["url"]:
            port_in = ":80"
        else:
            port_in = ""
        is_default = (scheme == "https" and port_in == ":443") or (
            scheme == "http" and port_in == ":80"
        )
        # the port survives canonicalization unless it is THIS scheme's
        # default (:80 on https is a different resource and must stay)
        kept_port = "" if is_default else port_in
        key = (scheme, meaningful, kept_port)
        groups.setdefault(key, set()).add(r["c1"])
        if kept_port:
            assert kept_port in r["c1"], r
        else:
            assert not re.search(r":\d+", r["c1"]), r
    # every (scheme, meaningful-param, explicit-port) class collapses
    # to exactly ONE canonical key across all its surface variants
    for key, forms in groups.items():
        assert len(forms) == 1, (key, forms)


def test_url_blocklist_suffix_semantics(spark):
    """The gate blocks a rule's exact host AND its subdomains, never a
    sibling; the inert negative-control rule matches nothing; the
    matched rule is always a dot-boundary suffix of the host (no
    substring matching — 'notsrc1.example.com' style hosts must pass)."""
    from mcp_ocr_server_spark.queries import (
        URL_BLOCKLIST,
        q_url_blocklist,
    )

    rows = q_url_blocklist(spark, SF).collect()
    assert rows and any(r["blocked"] for r in rows)
    blocked_rules = set(URL_BLOCKLIST)
    saw_subdomain_block = False
    for r in rows:
        expect = any(
            r["host"] == rule or r["host"].endswith("." + rule)
            for rule in blocked_rules
        )
        assert r["blocked"] is expect, r
        if r["blocked"]:
            rule = r["matched_rule"]
            assert rule in blocked_rules and rule != "badsite.org", r
            assert r["host"] == rule or r["host"].endswith("." + rule), r
            if r["host"] != rule:
                saw_subdomain_block = True
        else:
            assert r["matched_rule"] is None, r
    # the planted cdn. sub-subdomain exercised the suffix path
    assert saw_subdomain_block


def test_url_robots_longest_match_semantics(spark):
    """RFC 9309 traps, asserted per row against independently computed
    buckets: site-wide Disallow '/' loses to the longer Allow
    '/docs/2' carve-out; the exact-length Allow/Disallow tie resolves
    to Allow; rule-less hosts and non-web schemes default to allowed
    with a null matched rule."""
    import hashlib

    rows = Q.QUERIES["url_robots"][0](spark, SF).collect()
    assert rows
    by_bucket = {0: 0, 1: 0, 2: 0, 3: 0, 4: 0}
    for r in rows:
        if r.host == "":  # ftp: robots out of scope
            assert r.allowed and r.matched_rule is None
            continue
        b = int(hashlib.md5(r.host.encode()).hexdigest()[:6], 16) % 5
        by_bucket[b] += 1
        if r.matched_rule is not None:
            assert r.path.startswith(r.matched_rule)
        if b == 0:
            assert r.allowed and r.matched_rule is None
        elif b == 3:
            # Disallow '/' everywhere except the Allow '/docs/2' carve
            assert r.allowed == r.path.startswith("/docs/2"), r
        elif b == 4:
            # both rules match every /docs/ path at equal length: Allow
            assert r.allowed and r.matched_rule == "/docs/", r
        elif b in (1, 2):
            expect_block = r.path.startswith("/docs/1")
            if b == 2 and r.path.startswith("/docs/12"):
                expect_block = False
            assert r.allowed == (not expect_block), (b, r)
    # the corpus must actually exercise at least 4 of 5 buckets
    assert sum(1 for v in by_bucket.values() if v) >= 4, by_bucket


def test_url_robots_empty_path_matches_as_root(spark):
    """RFC 9309: a URL with no path component matches rules as '/' —
    a site-wide Disallow must gate the homepage even though the
    canonicalizer strips the trailing slash (review finding: the
    synthetic corpus always carries '/docs/N' paths, so only a
    constructed root URL exercises this)."""
    import hashlib

    def bucket(h):
        return int(hashlib.md5(h.encode()).hexdigest()[:6], 16) % 5

    host3 = next(f"h{i}.example.com" for i in range(1000)
                 if bucket(f"h{i}.example.com") == 3)
    host0 = next(f"h{i}.example.com" for i in range(1000)
                 if bucket(f"h{i}.example.com") == 0)
    urls = spark.createDataFrame(
        [(1, host3, ""), (2, host3, "/docs/2"), (3, host0, "")],
        "doc_id long, host string, path string",
    )
    rows = {r.doc_id: r for r in Q.robots_verdict(urls).collect()}
    # bucket 3 = Disallow '/' with Allow '/docs/2' carve-out
    assert not rows[1].allowed and rows[1].matched_rule == "/"
    assert rows[2].allowed and rows[2].matched_rule == "/docs/2"
    assert rows[3].allowed and rows[3].matched_rule is None  # no rules


def test_frontier_schedule_politeness_invariants(spark):
    """Scheduling: per host never more than CRAWL_RATE URLs share a
    slot, ranks are contiguous from 1, capacity caps at
    CRAWL_RATE*SCHED_SLOTS, and higher-priority URLs never sit behind
    lower-priority ones."""
    from mcp_ocr_server_spark import queries as Q

    rows = Q.QUERIES["frontier_schedule"][0](spark, None).collect()
    assert rows
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    cap = Q.CRAWL_RATE * Q.SCHED_SLOTS
    for host, hr in by_host.items():
        hr.sort(key=lambda r: r.sched_rank)
        assert [r.sched_rank for r in hr] == list(range(1, len(hr) + 1))
        assert len(hr) <= cap
        slots = {}
        for r in hr:
            assert r.slot == (r.sched_rank - 1) // Q.CRAWL_RATE
            assert r.slot_pos == (r.sched_rank - 1) % Q.CRAWL_RATE
            slots[r.slot] = slots.get(r.slot, 0) + 1
        assert all(n <= Q.CRAWL_RATE for n in slots.values())
