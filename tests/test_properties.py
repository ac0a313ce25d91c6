"""Property-based tests (hypothesis) for the pure kernels and the
base64 validation semantics — no Spark session needed."""

import base64
import binascii
import math
import re

import numpy as np
from hypothesis import given, settings, strategies as st

from mcp_ocr_server_spark.imaging import hough, kernels
from mcp_ocr_server_spark.operators.base64_ingest import B64_CANONICAL_RE

_B64_RE = re.compile(B64_CANONICAL_RE)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               max_size=64))
def test_b64_regex_matches_strict_decoder(s):
    """The canonical-base64 regex accepts exactly the strings Python's
    strict decoder accepts (modulo non-canonical trailing bits, which
    both the regex and Go's StdEncoding treat as structure-valid) —
    so Spark-side validation can never disagree with a real decoder
    about structural validity."""
    regex_ok = bool(_B64_RE.fullmatch(s))
    try:
        base64.b64decode(s, validate=True)
        decoder_ok = len(s) % 4 == 0
    except (binascii.Error, ValueError):
        decoder_ok = False
    assert regex_ok == decoder_ok, (s, regex_ok, decoder_ok)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=1, max_size=96), st.integers(4, 16))
def test_b64_newline_wrapped_payloads_valid_after_strip(data, wrap):
    """Go's base64.StdEncoding.DecodeString ignores \\r and \\n, so the
    engine strips them before validation (operators/base64_ingest.py).
    Property: any line-wrapped canonical encoding passes the regex once
    stripped, and stripping recovers the canonical payload exactly."""
    b64 = base64.b64encode(data).decode("ascii")
    wrapped = "\r\n".join(b64[i : i + wrap] for i in range(0, len(b64), wrap))
    stripped = wrapped.replace("\r", "").replace("\n", "")
    assert stripped == b64
    assert _B64_RE.fullmatch(stripped)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_b64_roundtrip_always_valid(data):
    """Every encoder output passes the validation regex."""
    assert _B64_RE.fullmatch(base64.b64encode(data).decode("ascii"))


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=255),
       st.integers(min_value=8, max_value=40),
       st.integers(min_value=8, max_value=40))
def test_otsu_threshold_in_range(v, h, w):
    img = np.full((h, w), v, dtype=np.uint8)
    t = kernels.otsu_threshold_value(img)
    assert 0 <= t <= 255


@settings(max_examples=20, deadline=None)
@given(st.floats(min_value=-10, max_value=10).filter(lambda a: abs(a) > 1))
def test_rotate_roundtrip_preserves_ink_region(angle):
    """rotate(a) then rotate(-a) keeps the dark block roughly in place
    (bilinear blur aside): the block's center of mass moves < 2 px."""
    img = np.full((80, 80), 255, dtype=np.uint8)
    img[30:50, 25:55] = 0
    out = kernels.rotate(kernels.rotate(img, angle), -angle)
    ys, xs = np.nonzero(img < 128)
    ys2, xs2 = np.nonzero(out < 128)
    assert ys2.size > 0
    assert abs(ys.mean() - ys2.mean()) < 2.0
    assert abs(xs.mean() - xs2.mean()) < 2.0


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=-44.9, max_value=44.9,
                          allow_nan=False), min_size=1, max_size=9))
def test_reference_median_matches_statistics(vals):
    """calculate_median == the textbook median for odd counts and the
    mean-of-middle-two for even counts (analyzer.go:209-232)."""
    import statistics

    got = hough.calculate_median(list(vals))
    want = statistics.median(vals)
    assert math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-12)


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=1, max_value=6))
def test_nlmeans_bounded_and_shape_stable(seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    out = kernels.nl_means_denoise(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # a weighted average can never exceed the input range
    assert out.min() >= img.min() - 1 and out.max() <= img.max() + 1


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 5000))
def test_chunk_formula_covers_every_token_exactly(n):
    """The doc_chunks window arithmetic (pure integer function of the
    token count) covers tokens [0, n) with no gap: chunk i starts at
    i*stride, the last chunk ends at >= n, every non-final chunk is
    full-size, and consecutive chunks overlap by exactly
    size - stride tokens."""
    from mcp_ocr_server_spark.queries import CHUNK_SIZE, CHUNK_STRIDE

    k = math.ceil(max(n - CHUNK_SIZE, 0) / CHUNK_STRIDE) + 1
    spans = [
        (i * CHUNK_STRIDE, min(i * CHUNK_STRIDE + CHUNK_SIZE, n))
        for i in range(k)
    ]
    assert spans[0][0] == 0
    assert spans[-1][1] == n
    for (s0, e0), (s1, e1) in zip(spans, spans[1:]):
        assert e0 == s0 + CHUNK_SIZE          # non-final chunks full
        assert s1 - s0 == CHUNK_STRIDE        # stride spacing
        assert s1 < e0                        # genuine overlap
    # the last chunk is never empty and never exceeds CHUNK_SIZE
    assert 0 < spans[-1][1] - spans[-1][0] <= CHUNK_SIZE
    # one fewer chunk would leave a gap: chunk k-2 cannot reach n
    if k > 1:
        assert spans[-2][1] < n
