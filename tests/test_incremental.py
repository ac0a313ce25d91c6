"""dedup_incremental (delta-vs-base simhash screen) and quality_filter
(composite verdict): semantics beyond what the oracle equality shows."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mcp_ocr_server_spark.queries import (
    clear_caches,
    q_dedup_incremental,
    q_dedup_simhash_pairs,
    q_quality_filter,
)

SF = "/root/testdata/sf0.001"


def _is_delta(doc_id: int) -> bool:
    return hashlib.md5(str(doc_id).encode()).hexdigest()[0] == "0"


def test_incremental_covers_exactly_the_delta_split(spark):
    rows = q_dedup_incremental(spark, SF).collect()
    got = {r["doc_id"] for r in rows}
    docs = {
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert got == {d for d in docs if _is_delta(d)}
    assert len(got) > 0
    clear_caches(spark)


def test_incremental_agrees_with_pairs_query(spark):
    """On a corpus where the hot-band cap never fires (sf0.001 is far
    below SIMHASH_BAND_MAX_DF per band), the delta-vs-base screen must
    equal the pairs query restricted to (delta, base) pairs: same dup
    set, witness = min (hamming, base_doc), hamming consistent."""
    pairs = q_dedup_simhash_pairs(spark, SF).collect()
    expected: dict[int, tuple[int, int]] = {}
    for p in pairs:
        for d, b in ((p["doc_a"], p["doc_b"]), (p["doc_b"], p["doc_a"])):
            if _is_delta(d) and not _is_delta(b):
                cand = (p["hamming"], b)
                if d not in expected or cand < expected[d]:
                    expected[d] = cand
    rows = q_dedup_incremental(spark, SF).collect()
    got = {
        r["doc_id"]: (r["hamming"], r["dup_of"])
        for r in rows
        if r["is_dup"]
    }
    assert got == expected
    # non-dups carry NULL witness columns, not sentinel values
    for r in rows:
        if not r["is_dup"]:
            assert r["dup_of"] is None and r["hamming"] is None
    clear_caches(spark)


@pytest.fixture()
def tiny_docs(spark, tmp_path):
    rows = [
        (1, "hi"),                                # 1 token -> too_few
        (2, "a b c d"),                           # 4 short tokens
        (3, "the cat sat on the mat quietly today ok"),  # clean keep
        (4, "spam ham " * 30 + "spam ham"),       # one dominant bigram
        (5, "x. y, z; q! r? s: t."),              # punctuation-heavy
        (6, ""),                                  # empty text
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.parquet(p)
    return str(tmp_path)


def test_quality_filter_reason_codes(spark, tiny_docs):
    out = {
        r["doc_id"]: r for r in q_quality_filter(spark, tiny_docs).collect()
    }
    assert out[1]["reasons"] == "too_few_tokens,low_stopword"
    # doc 2: 4 single-char tokens -> too_few + token_len; 'a' is a
    # stopword (ratio 0.25) so low_stopword does NOT fire; its 3
    # all-distinct bigrams make top_bigram_frac 1/3 > 0.18 — the
    # repetition fraction is trivially high on tiny docs, which
    # too_few_tokens already rejects (Gopher applies repetition rules
    # to long docs for the same reason)
    assert out[2]["reasons"] == "too_few_tokens,token_len,rep_bigram"
    assert out[3]["keep"] and out[3]["reasons"] == ""
    assert "rep_bigram" in out[4]["reasons"]
    assert "rep_trigram" in out[4]["reasons"]
    assert "high_punct" in out[5]["reasons"]
    # empty text: 0 tokens, repetition rules must NOT fire (inapplicable)
    assert "rep_" not in out[6]["reasons"]
    assert "too_few_tokens" in out[6]["reasons"]
    for r in out.values():
        assert r["keep"] == (r["n_reasons"] == 0)
        assert r["n_reasons"] == (
            0 if r["reasons"] == "" else r["reasons"].count(",") + 1
        )


def test_quality_filter_is_shuffle_free(spark):
    plan = q_quality_filter(
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Sort" not in plan
