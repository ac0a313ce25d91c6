"""BPE tokenizer-training queries (bpe_pairs / bpe_merges) — the
cross-engine replace-semantics pin and an INDEPENDENT pure-python
reference implementation checked against the Spark loop."""

import collections

import duckdb
import pytest

import mcp_ocr_server_spark.queries as Q

SF = "/root/testdata/sf0.001"


def test_replace_semantics_identical_across_engines(spark):
    """The double-space separator contract: with single spaces the
    pattern consumes the shared boundary and ' a a a a ' merges only
    ONCE (not greedy BPE); with two-space separators + a one-space
    pad, replace() merges runs exactly like greedy BPE — and the
    three engines agree byte-for-byte."""
    # the single-space representation really does under-merge (the
    # bug the representation exists to avoid):
    assert " a a a a ".replace(" a a ", " aa ") == " aa a a "
    # double-space: a 4-run merges twice, a 3-run once
    s4, s3 = " a  a  a  a ", " a  a  a "
    pat, rep = " a  a ", " aa "
    assert s4.replace(pat, rep) == " aa  aa "
    assert s3.replace(pat, rep) == " aa  a "
    for s, want in ((s4, " aa  aa "), (s3, " aa  a ")):
        got_spark = spark.sql(
            f"SELECT replace('{s}', '{pat}', '{rep}') AS x"
        ).collect()[0]["x"]
        got_duck = duckdb.sql(
            f"SELECT replace('{s}', '{pat}', '{rep}') AS x"
        ).fetchone()[0]
        assert got_spark == got_duck == want
    # no cross-token false positive: token 'a' then token 'bc'
    assert " a  bc ".replace(" a  b ", " ab ") == " a  bc "


def _reference_bpe(texts: list[str], n_merges: int):
    """Straightforward BPE on word frequencies (Sennrich et al. 2016),
    list-of-symbols representation — no string replace involved, so it
    cannot share a bug with the query's representation."""
    import re

    freq = collections.Counter()
    for t in texts:
        freq.update(re.findall(r"[a-z]+", t.lower()))
    vocab = {tuple(w): c for w, c in freq.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((step, left, right, left + right, cnt))
        out = {}
        for syms, c in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            out[tuple(merged)] = out.get(tuple(merged), 0) + c
        vocab = out
    return merges


def test_bpe_merges_match_independent_reference(spark):
    texts = [
        r.text for r in
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("text").collect()
    ]
    want = _reference_bpe(texts, Q.BPE_N_MERGES)
    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in Q.QUERIES["bpe_merges"][0](spark, SF)
        .orderBy("step").collect()
    ]
    assert got == want


def test_bpe_encode_matches_independent_reference(spark):
    """Per-doc token counts under the trained merges, recomputed with
    the list-of-symbols reference encoder (applies each learned merge
    left-to-right greedily, no string replace) — the query's chained
    replace() projection must agree on every document."""
    import re

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text").collect()
    )
    merges = [
        (left, right)
        for _s, left, right, _m, _c in
        _reference_bpe([r.text for r in rows], Q.BPE_N_MERGES)
    ]

    def encode(word: str) -> int:
        syms = list(word)
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want = {}
    for r in rows:
        words = re.findall(r"[a-z]+", r.text.lower())
        if words:
            want[r.doc_id] = (len(words), sum(encode(w) for w in words))
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in Q.QUERIES["bpe_encode"][0](spark, SF).collect()
    }
    assert got == want


def test_bpe_pairs_totals_match_reference(spark):
    texts = [
        r.text for r in
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("text").collect()
    ]
    import re

    freq = collections.Counter()
    for t in texts:
        freq.update(re.findall(r"[a-z]+", t.lower()))
    pairs = collections.Counter()
    for w, c in freq.items():
        for a, b in zip(w, w[1:]):
            pairs[(a, b)] += c
    want = sorted(
        ((a, b, c) for (a, b), c in pairs.items()),
        key=lambda x: (-x[2], x[0], x[1]),
    )[:Q.BPE_TOP_K]
    got = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in Q.QUERIES["bpe_pairs"][0](spark, SF).collect()
    ]
    assert got == want
