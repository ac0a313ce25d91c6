"""Corpus-generator invariants (hypothesis): the synthetic input must
hold the properties the pipeline and goldens rely on."""

from hypothesis import given, settings, strategies as st

from mcp_ocr_server_spark.sources import synthetic as S

CFG = S.CorpusConfig(n_docs=10_000)


@settings(max_examples=50, deadline=None)
@given(i=st.integers(0, CFG.n_docs - 1))
def test_doc_invariants(i):
    doc_id, spans = S.doc_item(CFG, i)
    assert doc_id == f"doc-{i:010d}"
    assert 1 <= len(spans) <= 12
    # offsets strictly increasing from 0 (input_hint contract)
    offs = [sp["offset"] for sp in spans]
    assert offs[0] == 0
    assert all(a < b for a, b in zip(offs, offs[1:]))
    for sp in spans:
        if sp["kind"] == "image":
            assert sp["media_ref"].startswith("img-") and sp["text"] == ""
        else:
            assert sp["media_ref"] == "" and sp["text"]
    # determinism: same (seed, i) => identical doc
    assert S.doc_item(CFG, i) == (doc_id, spans)


@settings(max_examples=20, deadline=None)
@given(j=st.integers(0, 499))
def test_media_invariants(j):
    ref, png, deg, true_text = S.media_item(CFG, j)
    assert ref == f"img-{j:08d}"
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert deg in S._DEGRADATIONS
    # byte determinism (content-hash memoization depends on it)
    assert S.media_item(CFG, j)[1] == png


def test_skew_profile_present():
    """~10% media-heavy docs (north-rule skew fixture)."""
    heavy = light = 0
    for i in range(400):
        _, spans = S.doc_item(CFG, i)
        n_img = sum(1 for sp in spans if sp["kind"] == "image")
        if len(spans) >= 8 and n_img >= 6:
            heavy += 1
        elif len(spans) <= 4 and n_img <= 1:
            light += 1
    assert 0.04 <= heavy / 400 <= 0.2
    assert light / 400 >= 0.7


def test_hot_pool_duplication_and_missing_refs():
    refs = [
        sp["media_ref"]
        for i in range(400)
        for sp in S.doc_item(CFG, i)[1]
        if sp["kind"] == "image"
    ]
    # hot-pool refs repeat (memoization fixture)
    from collections import Counter

    top = Counter(refs).most_common(1)[0][1]
    assert top >= 5
    # some referenced media are missing (FILE_NOT_FOUND fixture)
    assert any(
        not S.media_exists(CFG, int(r.split("-")[1])) for r in refs
    )
