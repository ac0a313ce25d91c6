"""Round-over-round shuffle regression gate (VERDICT r4 next #7).

Per-query shuffle-write telemetry is the load-immune plan-shape signal:
wall time moves with co-tenant noise, but bytes through the exchange
layer only move when the PLAN changes.  Two committed contracts:

- ZERO_SHUFFLE: the queries whose execution writes no shuffle files
  (row-local family + broadcast-only joins at this scale).  A stray
  groupBy/join/window sneaking into one of them shows up here as
  shuffle bytes, even if the query stays green on values.
- MOVER_BUDGET_MB: per-query ceilings for the shuffle-bearing movers,
  set at ~2.5x their measured sf0.001 cost so data jitter never flakes
  but a plan regression (e.g. a key spine widening back to text, the
  r3->r4 dedup_ngram_jaccard win reverting) trips.

The status store drains asynchronously off the event bus, so each
measurement settles briefly and the zero gate is a small epsilon, not
an exact 0.0 (the r4 ADVICE flake).  Plan-level zero-shuffle contracts
for individual queries remain in test_plan_properties.py; this file is
the fleet-wide telemetry sweep.
"""

import time

import pytest

import mcp_ocr_server_spark.queries as Q

SF = "/root/testdata/sf0.001"

# queries whose execution writes NO shuffle files at sf0.001.
# Broadcast exchanges do not write shuffle files, so broadcast-only
# joins belong here too.  keyword_rank's LAZY plan also shows no
# Exchange, but its iterative PageRank sweeps shuffle at runtime —
# it lives in the mover budgets instead (telemetry beats plan-grep).
ZERO_SHUFFLE = [
    "quality_filter", "pii_scrub", "text_normalize", "doc_chunks",
    "repetition_stats", "media_quality", "media_layout",
    "extract_base64", "html_main_content", "html_links", "link_rank",
    "media_words", "media_image_features",
    "media_audio_features", "pdf_text", "media_video_frames",
    "media_audio_inventory", "media_video_inventory",
    "warc_records", "warc_main_content", "pdf_scan_ocr", "audio_tags",
    "pdf_render_ocr", "pdf_layout", "scan_inventory", "scan_ocr",
    "sitemap_urls", "robots_rules", "warc_redirects", "feed_entries",
    "dedup_simhash", "lang_id",
    "text_quality", "token_stats", "doc_fingerprint",
    # closing-session additions: metadata extraction is row-local
    # mapInPandas (pdf_info, html_metadata); bpe_encode's corpus
    # rollup rides a broadcast join at this scale
    "pdf_info", "html_metadata",
]

# sf0.001 ceilings ~2.5x measured (2026-08, r5 probe); the comment is
# the measured value the budget was set from.
MOVER_BUDGET_MB = {
    "dedup_ngram_jaccard": 3.0,    # 1.11 — 60-bit key spine, not text
    "dedup_substring": 2.5,        # 0.90 — hashes-only suffix shuffles
    "lm_score": 2.5,               # 0.86 — corpus trigram aggregate
    "dedup_clusters": 1.5,         # 0.51 — CC label loop (pairs warm)
    "dedup_simhash_pairs": 1.0,    # 0.28 — sketch-only band fan-out
    "tfidf_topk": 1.0,             # 0.33
    "decontaminate_bloom": 1.0,    # 0.29 — bitset, not eval strings
    "dedup_minhash_pairs": 0.8,    # 0.19 — banded signature join
    "line_dedup": 0.5,             # 0.11 — three hash-only shuffles
    "extract_spans": 0.5,          # 0.12 — bytes cross the wire once
    "keyword_rank": 0.5,           # 0.14 — 3 PageRank sweep joins
}

EPS_MB = 0.05


@pytest.fixture(scope="module")
def measure(spark):
    def shuffle_written() -> int:
        ex = (
            spark.sparkContext._jsc.sc().statusStore()
            .executorList(False)
        )
        return sum(
            ex.apply(i).totalShuffleWrite() for i in range(ex.size())
        )

    def run(name: str) -> float:
        Q.clear_caches(spark)
        time.sleep(0.2)  # drain stragglers from the previous query
        s0 = shuffle_written()
        df = Q.QUERIES[name][0](spark, SF)
        # force every output column (bench.py's validity fix): a bare
        # count() lets Catalyst prune row-local projections entirely
        df.selectExpr(
            "count(*) AS n", "bit_xor(xxhash64(struct(*))) AS h"
        ).collect()
        time.sleep(0.3)
        return (shuffle_written() - s0) / 1e6

    return run


def test_zero_shuffle_queries_stay_zero(measure):
    over = {}
    for name in ZERO_SHUFFLE:
        mb = measure(name)
        if mb > EPS_MB:
            over[name] = round(mb, 3)
    assert not over, f"zero-shuffle contract broken: {over}"


def test_movers_stay_under_budget(measure):
    over = {}
    for name, budget in MOVER_BUDGET_MB.items():
        mb = measure(name)
        if mb > budget:
            over[name] = (round(mb, 3), budget)
    assert not over, f"shuffle budget exceeded (measured, budget): {over}"


def test_gate_lists_stay_in_registry():
    # a renamed/removed query must update the gate, not silently skip
    missing = [
        n for n in [*ZERO_SHUFFLE, *MOVER_BUDGET_MB]
        if n not in Q.QUERIES
    ]
    assert not missing, missing
