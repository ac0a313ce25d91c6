"""Invariants for the PII scrubber and the line-level exact dedup that
the value-hash oracle can't express directly: redaction completeness
(no residual matches survive the scrub) and the dedup accounting
identities."""

import re

from pyspark.sql import functions as F

from mcp_ocr_server_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _scrubbed_texts(spark):
    """Re-derive the scrubbed text (the registry query ships only its
    sha256) via the SAME shared augment+scrub helpers the query uses,
    so this test can never validate a stale copy of the chain."""
    aug = Q._pii_augment(spark.read.parquet(f"{SF}/documents.parquet"))
    return aug.select(
        "doc_id", Q._pii_scrub_col("t").alias("scrubbed")
    ).collect()


def test_pii_scrub_leaves_no_residual_matches(spark):
    """After redaction, an independent Python `re` engine must find
    ZERO matches for any of the three patterns — the property a
    compliance reviewer actually cares about, checked with a third
    regex implementation (not Java, not RE2)."""
    rows = _scrubbed_texts(spark)
    assert len(rows) == 500
    pats = [re.compile(p) for p in (Q.PII_EMAIL_RE, Q.PII_PHONE_RE, Q.PII_IP_RE)]
    for r in rows:
        for p in pats:
            assert not p.search(r.scrubbed), (r.doc_id, p.pattern)


def test_pii_scrub_counts_match_planted_schedule(spark):
    """Planted-PII schedule is exact: every doc_id%3==0 doc reports
    exactly one email, %5 one phone, %7 one IP, and nothing else
    fires on the clean word-soup corpus."""
    rows = Q.QUERIES["pii_scrub"][0](spark, SF).collect()
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % 3 == 0 else 0), r
        assert r.n_phones == (1 if r.doc_id % 5 == 0 else 0), r
        assert r.n_ips == (1 if r.doc_id % 7 == 0 else 0), r
        assert r.has_pii == (r.n_emails + r.n_phones + r.n_ips > 0)


def test_line_dedup_accounting_identities(spark):
    """Per-doc line counts must re-derive from token counts
    (ceil(n_tokens/10), min 1), dup counts are bounded by line counts,
    and the corpus-wide duplicated-instance total is consistent with
    an independent recount of the chunk multiset."""
    rows = Q.QUERIES["line_dedup"][0](spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    from collections import Counter

    chunks = Counter()
    per_doc = {}
    for doc_id, text in docs.items():
        t = text.split(" ")
        n = max(-(-len(t) // Q.LINE_CHUNK), 1)
        per_doc[doc_id] = [
            " ".join(t[i * Q.LINE_CHUNK:(i + 1) * Q.LINE_CHUNK])
            for i in range(n)
        ]
        chunks.update(per_doc[doc_id])
    for r in rows:
        mine = per_doc[r.doc_id]
        assert r.n_lines == len(mine), r
        expect_dup = sum(1 for c in mine if chunks[c] > 1)
        assert r.n_dup_lines == expect_dup, r
        assert 0 <= r.n_dup_lines <= r.n_lines
        assert abs(r.dup_line_ratio - round(r.n_dup_lines / r.n_lines, 6)) < 1e-9


def test_line_dedup_flags_full_duplicate_docs(spark):
    """Two identical docs injected into a unique-text frame must both
    come back with dup_line_ratio == 1.0 while unique docs stay 0."""
    base = [
        (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"),
        (2, "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"),
        (3, "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"),
    ]
    df = spark.createDataFrame(base, ["doc_id", "text"])
    import mcp_ocr_server_spark.queries as QQ

    # run the same plan body on an in-memory frame
    orig = QQ._t
    try:
        QQ._t = lambda s, d, n: df
        rows = {r.doc_id: r for r in QQ.q_line_dedup(spark, "ignored").collect()}
    finally:
        QQ._t = orig
    assert rows[1].dup_line_ratio == 1.0
    assert rows[2].dup_line_ratio == 1.0
    assert rows[3].dup_line_ratio == 0.0


def test_text_normalize_roundtrip_and_plan(spark):
    """Every doc must round-trip (normalized == lower(original)) and
    the plan must be shuffle-free pure codegen like pii_scrub."""
    df = Q.QUERIES["text_normalize"][0](spark, SF)
    rows = df.collect()
    assert len(rows) == 500
    assert all(r.roundtrip_ok for r in rows)
    assert all(r.n_chars_raw > r.n_chars_norm for r in rows)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "Exchange" not in plan, plan
