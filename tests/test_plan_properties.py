"""Machine-checked physical-plan properties (PLANS.md).

These assert the *shape* of the plans — pushdown, broadcast, and above
all that no exchange or sort ever carries the media bytes column — so a
regression that silently reintroduces a corpus-wide byte shuffle fails
CI, not a 100 TB run.
"""

import re

from pyspark.sql import functions as F

from mcp_ocr_server_spark import queries as Q
from mcp_ocr_server_spark.plans.pipeline import extract
from mcp_ocr_server_spark.sources import synthetic as S

from conftest import FIXTURE_JOB

SF = "/root/testdata/sf0.001"


def _plan(spark, df, mode="formatted"):
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def _assert_no_col_in_movement(plan, col_re, what):
    """No Exchange / Sort / SortAggregate line of `plan` may reference a
    column matching `col_re`.  Substring-matched (not tree-gutter-prefix
    matched): Spark prints left-branch descendants of binary nodes with
    a ':' gutter ('  :  +- Exchange ...'), which prefix matching
    silently skips — half the plan of any join would go unchecked."""
    for ln in plan.splitlines():
        if "Exchange" in ln or "Sort" in ln:
            assert not re.search(col_re, ln), f"{what} in shuffle/sort: {ln}"


def test_extract_plan_no_byte_shuffle(spark):
    c = S.CorpusConfig(n_docs=24)
    res = extract(S.docs_df(spark, c), S.media_df(spark, c), FIXTURE_JOB)
    plan = _plan(spark, res.spans, "simple")
    # every Exchange/Sort node's visible arguments must not reference the
    # bytes column (bytes may only flow scan -> repartition -> OCR UDF)
    _assert_no_col_in_movement(plan, r"\bbytes#", "bytes")
    # no window over the corpus in the extraction path
    assert "Window" not in plan


def test_extract_plan_guards_before_python(spark):
    c = S.CorpusConfig(n_docs=24)
    res = extract(S.docs_df(spark, c), S.media_df(spark, c), FIXTURE_JOB)
    plan = _plan(spark, res.spans, "simple")
    # size guard is a plain CASE on n_bytes/length, evaluated in a
    # Project, not inside a python stage
    assert "IMAGE_TOO_LARGE" in plan
    ocr_pos = plan.find("ocr_map")
    guard_pos = plan.find("IMAGE_TOO_LARGE")
    assert guard_pos != -1 and ocr_pos != -1


def test_pricing_pushdown(spark):
    plan = _plan(spark, Q.q_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 6 needed columns are read
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and len(m.group(1).split(",")) == 6


def test_top_suppliers_broadcast_and_topk(spark):
    plan = _plan(spark, Q.q_top_suppliers(spark, SF), "simple")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # rank-limit pushdown, no global sort


def test_ann_topk_broadcasts_queries_not_corpus(spark):
    plan = _plan(spark, Q.q_ann_topk(spark, SF), "simple")
    # the broadcast side must be the filtered query subset (pmod filter)
    bcast = plan[plan.find("BroadcastExchange"):]
    assert "pmod" in bcast or "% 50" in bcast or "(vec_id" in bcast


def test_ocr_stage_partition_balance(spark):
    """Skew evidence (north rule): media-heavy docs must NOT produce
    straggler partitions.  The corpus is 10% heavy docs (8-12 spans,
    >=6 images each); after explode+dedup+uniform redistribution the
    OCR stage's per-partition work counts should be near-uniform."""
    import statistics

    c = S.CorpusConfig(n_docs=1200)
    res = extract(S.docs_df(spark, c), S.media_df(spark, c), FIXTURE_JOB)
    counts = {}
    for r in res.ocr_results.select("partition_id").collect():
        counts[r.partition_id] = counts.get(r.partition_id, 0) + 1
    sizes = list(counts.values())
    assert len(sizes) >= 4, "OCR work not spread across partitions"
    mean = statistics.mean(sizes)
    # statistically sound straggler bound: uniform hashing at occupancy
    # m is ~Poisson(m), so max over P partitions stays within
    # mean + 5*sqrt(mean) with overwhelming probability; a true hot-key
    # pile-up (the failure this guards) lands far outside.  A fixed
    # 2x-mean bound false-alarms at the finer partition counts the
    # straggler-smoothing floor now produces (mean ~12 => max 26 is
    # plain Poisson noise).
    bound = mean + 5 * mean ** 0.5
    assert max(sizes) <= bound, (
        f"straggler partition: max={max(sizes)} mean={mean:.1f}"
        f" bound={bound:.1f} sizes={sizes}"
    )


def test_clear_caches_releases_persisted_storage(spark):
    """Cache lifecycle (VERDICT r2 #4/#8): repeated query invocations
    with clear_caches() between them must not grow executor storage —
    getPersistentRDDs returns to its baseline and the module dicts
    empty out."""
    from mcp_ocr_server_spark import queries as Q

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    Q.clear_caches(spark)
    base = n_persisted()
    for _ in range(3):
        # touches the persisted shingle cache each time
        before = n_persisted()
        Q.QUERIES["dedup_ngram_jaccard"][0](spark, SF).count()
        assert n_persisted() > before  # cache live while in use
        Q.clear_caches(spark)
        # "<= base", not "== base": earlier suites in the same session
        # can leave persisted RDDs clear_caches doesn't own (e.g.
        # dedup_clusters' localCheckpoints), and the ContextCleaner
        # reaps those ASYNCHRONOUSLY — the count may dip BELOW the
        # captured baseline mid-loop.  The contract under test is
        # "no growth / ours fully released", which <= pins exactly.
        assert n_persisted() <= base  # fully released, no growth
        base = min(base, n_persisted())
    assert not Q._SHINGLE_CACHE and not Q._SPANS_CACHE


def test_repetition_stats_plan_is_shuffle_free(spark):
    """q_repetition_stats is row-local by design (the Gopher signals
    never need cross-row state): its physical plan must contain no
    Exchange at all — the same zero-shuffle contract as
    dedup_simhash."""
    from mcp_ocr_server_spark import queries as Q

    plan = (
        Q.QUERIES["repetition_stats"][0](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_source_quota_precap_bounds_mega_source(spark):
    """Heavy-hitter safety (VERDICT r3 #2): a constructed mega-source
    never reaches the exact per-source window whole.  The pre-cap
    remnant for a 10^6-row single-domain corpus is exactly
    QUOTA_SALTS * SOURCE_QUOTA rows, so the final sort touches <= 320
    rows no matter how large the source is."""
    mega = spark.range(1_000_000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.lit("megadomain.example").alias("source"),
    )
    remnant = Q.quota_precap(mega).groupBy("source").count().collect()
    assert len(remnant) == 1
    assert remnant[0]["count"] == Q.QUOTA_SALTS * Q.SOURCE_QUOTA


def test_source_quota_two_phase_matches_exact_window(spark):
    """Lossless pre-cap: the two-phase kept set equals the brute-force
    single-window top-quota on a multi-source input with one heavy
    source (includes sources smaller than the quota)."""
    from pyspark.sql import Window

    docs = spark.range(5_000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 50 == 0, F.concat(F.lit("s"), F.col("id") % 7))
        .otherwise(F.lit("heavy.example"))
        .alias("source"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    exact = (
        docs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= Q.SOURCE_QUOTA)
        .select("doc_id", F.col("r").cast("int").alias("src_rank"))
    )
    final_w = Window.partitionBy("source").orderBy("hk", "doc_id")
    two_phase = (
        Q.quota_precap(docs)
        .withColumn("src_rank", F.row_number().over(final_w).cast("int"))
        .filter(F.col("src_rank") <= Q.SOURCE_QUOTA)
        .select("doc_id", "src_rank")
    )
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, two_phase.collect())
    )


def test_source_quota_plan_full_scan_feeds_only_sharded_window(spark):
    """Plan-shape assertion: the window partitioned by source ALONE
    must sit above the shard-rank filter (remnant), never directly on
    the full documents scan — only the (source, salt) window may see
    every row."""
    plan = _plan(
        spark, Q.QUERIES["source_quota"][0](spark, SF), "formatted"
    )
    win_specs = re.findall(
        r"windowspecdefinition\(([^)]*?)specifiedwindowframe", plan
    )
    assert win_specs, plan
    per_source = [s for s in win_specs if "salt" not in s]
    sharded = [s for s in win_specs if "salt" in s]
    assert sharded, plan  # the pre-cap window exists
    assert per_source, plan  # the exact window exists
    # the exact window's input must be the filtered remnant: in the
    # formatted plan the Filter on shard_rank appears below it
    assert re.search(r"shard_rank#\d+ <= 20", plan), plan


def test_interleaved_plan_pdf_bytes_never_shuffle_keys(spark):
    """The pdf branch obeys the same byte-movement contract as the
    image branch: pdf bytes are never an Exchange/Sort key and never
    sort-aggregated; no Window anywhere in the interleaved plan."""
    c = S.CorpusConfig(n_docs=24, p_pdf=0.35)
    res = extract(
        S.docs_df(spark, c), S.media_df(spark, c), FIXTURE_JOB,
        pdfs=S.pdf_df(spark, c),
    )
    plan = _plan(spark, res.spans, "simple")
    _assert_no_col_in_movement(plan, r"\bbytes#", "bytes")
    assert "Window" not in plan


def test_source_quota_precap_lossless_property(spark):
    """Hypothesis sweep of the pre-cap losslessness proof: for random
    source-size distributions (including sources below, at, and far
    above the quota) the two-phase kept set equals the exact window's.
    Driver-side data generation, one Spark job per example — examples
    kept small so the property runs in CI time."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Window

    @settings(max_examples=5, deadline=None)
    @given(
        sizes=st.lists(st.integers(1, 400), min_size=1, max_size=6),
        seed=st.integers(0, 10_000),
    )
    def run(sizes, seed):
        rows = [
            (f"d{seed}-{s}-{i}", f"src{s}")
            for s, n in enumerate(sizes)
            for i in range(n)
        ]
        docs = spark.createDataFrame(rows, "doc_id string, source string")
        w = Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
        exact = set(
            r.doc_id
            for r in docs.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= Q.SOURCE_QUOTA)
            .collect()
        )
        final_w = Window.partitionBy("source").orderBy("hk", "doc_id")
        got = set(
            r.doc_id
            for r in Q.quota_precap(docs)
            .withColumn("r", F.row_number().over(final_w))
            .filter(F.col("r") <= Q.SOURCE_QUOTA)
            .collect()
        )
        assert got == exact

    run()


def test_pack_sequences_plan_and_invariants(spark):
    """Sequence packing must never fall back to a global running sum:
    every window in the plan is partitioned (by bucket).  Invariants:
    offsets stay under capacity, packing is gap-free within a bucket
    (greedy straddle => zero waste: total tokens >= max_seq * CAP)."""
    df = Q.QUERIES["pack_sequences"][0](spark, SF)
    plan = _plan(spark, df, "formatted")
    specs = re.findall(
        r"windowspecdefinition\(([^)]*?)specifiedwindowframe", plan
    )
    assert specs, plan
    for s in specs:
        assert "bucket" in s, f"unpartitioned window in pack plan: {s}"
    rows = df.collect()
    assert rows and all(0 <= r.seq_offset < Q.PACK_CAP for r in rows)
    per_bucket = {}
    for r in rows:
        tot, mx = per_bucket.get(r.bucket, (0, 0))
        per_bucket[r.bucket] = (tot + r.n_tokens, max(mx, r.seq_id))
    for b, (tot, mx) in per_bucket.items():
        assert tot >= mx * Q.PACK_CAP, (b, tot, mx)


def test_vocab_topk_per_lang_group_limit_pushdown(spark):
    """Per-group top-k must run as a rank-limited window that Catalyst
    prunes with WindowGroupLimit (partial before the shuffle, final
    after) — never a full per-group sort feeding a plain Filter."""
    df = Q.QUERIES["vocab_topk_per_lang"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert "WindowGroupLimit" in plan, plan
    rows = df.collect()
    assert rows
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append((r.rnk, r.n))
    for lang, rs in per_lang.items():
        rs.sort()
        assert [rk for rk, _ in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 10
        ns = [n for _, n in rs]
        assert ns == sorted(ns, reverse=True), (lang, ns)


def test_aqe_splits_skewed_join_partition(spark):
    """The skew story's runtime half, machine-checked: a join with one
    hot key (200k rows vs ~20 rows/key elsewhere) is re-planned by AQE
    into SortMergeJoin(skew=true) over an `AQEShuffleRead skewed` —
    the hot partition is split into multiple tasks instead of
    straggling on one.  Thresholds are lowered to make toy data skew
    the same way a 100 TB hot key does; every conf is restored."""
    tuned = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in tuned.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        hot = spark.range(200_000).select(
            F.lit(7).alias("k"), F.col("id").alias("lv")
        )
        rest = spark.range(1000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("lv")
        )
        right = spark.range(50).select(
            F.col("id").alias("k"), F.col("id").alias("rv")
        )
        j = hot.union(rest).join(right, "k")
        # collect() on j ITSELF, not count(): count()/write() build a
        # separate query execution, leaving j's plan isFinalPlan=false
        # (verified) — the skew assertions below need j's own executed
        # adaptive plan
        assert len(j.collect()) == 201_000
        plan = _plan(spark, j, "simple")
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_corpus_split_is_row_local_until_rollup(spark):
    """Split assignment must be a pure row-local function of doc_id:
    the only shuffle in the plan is the final audit groupBy, and the
    assignment covers every doc exactly once at ~90/5/5."""
    df = Q.QUERIES["corpus_split"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert plan.count("Exchange") == 1, plan
    rows = df.collect()
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    total = sum(by_split.values())
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert total == n_docs  # exhaustive + disjoint
    assert set(by_split) == {"train", "val", "test"}
    assert 0.80 <= by_split["train"] / total <= 0.97


def test_pii_scrub_plan_is_shuffle_free_and_jvm_only(spark):
    """PII scrub must be a single codegen stage: zero exchanges, zero
    Python stages (regexes run JVM-side), and the scan pruned to the
    two columns it needs — the embarrassingly-parallel shape its
    docstring promises at 100 TB."""
    df = Q.QUERIES["pii_scrub"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython",
                   "FlatMapGroupsInPandas", "MapInPandas", "PythonUDF"):
        assert marker not in plan, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and sorted(c.split(":")[0] for c in m.group(1).split(",")) == [
        "doc_id", "text",
    ]


def test_line_dedup_plan_shuffles_hashes_never_text(spark):
    """Every Exchange in the line-dedup plan must carry only the md5
    line hash / doc_id — never the text or token-array columns — and
    both groupBys must have map-side partial aggregation.  No window,
    no global sort."""
    df = Q.QUERIES["line_dedup"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    text_ids = set(re.findall(r"\b(?:text|t)#(\d+)", plan))
    for ln in plan.splitlines():
        s = ln.strip()
        if "Exchange" in s:
            tail = s.split("Exchange", 1)[1]
            for tid in text_ids:
                # boundary-anchored: '#1' must not match '#16'
                assert not re.search(rf"#{tid}(?![0-9])", tail), s
    assert "Window" not in plan
    assert "partial_count" in plan  # map-side combine on both rollups


def test_tfidf_topk_plan_broadcasts_n_and_prunes_rank(spark):
    """The 1-row N aggregate must broadcast (explicit hint); the tf⋈df
    join is deliberately AQE's call (broadcast at test scale, SMJ when
    the term table is crawl-sized) so the static plan is only required
    NOT to hard-wire a nested-loop join for it.  The per-doc rank must
    be WindowGroupLimit-pruned.  Invariants: ranks are 1..k per doc,
    scores non-increasing within a doc."""
    df = Q.QUERIES["tfidf_topk"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("BroadcastExchange") >= 1, plan
    assert "CartesianProduct" not in plan, plan
    rows = df.collect()
    assert rows
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.rnk, r.score))
    for doc_id, rs in per_doc.items():
        rs.sort()
        assert [rk for rk, _ in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        scores = [s for _, s in rs]
        assert scores == sorted(scores, reverse=True), (doc_id, scores)


def test_doc_chunks_plan_is_shuffle_free_and_invariant(spark):
    """q_doc_chunks is row-local by design (chunk_id is per-doc): its
    physical plan must contain no Exchange — the same zero-shuffle
    contract as repetition_stats.  Invariants: chunk sizes equal
    CHUNK_SIZE except each doc's last chunk; consecutive chunk_ids
    start at 0; total tokens covered per doc = n + overlap*(k-1)."""
    df = Q.QUERIES["doc_chunks"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert "Exchange" not in plan, plan
    rows = df.collect()
    assert rows
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_tokens))
    for doc_id, cs in per_doc.items():
        cs.sort()
        assert [c for c, _ in cs] == list(range(len(cs)))
        for _, tok in cs[:-1]:
            assert tok == Q.CHUNK_SIZE, (doc_id, cs)
        assert 1 <= cs[-1][1] <= Q.CHUNK_SIZE


def test_lm_score_model_join_is_broadcast(spark):
    """The trigram model table is bounded by the 37^3 alphabet cube, so
    its join onto the per-doc counts must be a broadcast (and the
    1-row total a broadcast nested loop) — never a sort-merge join,
    which would shuffle the per-doc side on the trigram key.
    Invariants: logprob < 0 (probabilities), n_trigrams =
    len(canonical text) - 2 for every scored doc."""
    df = Q.QUERIES["lm_score"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    rows = df.collect()
    assert rows
    assert all(r.logprob < 0 for r in rows)
    # the advertised count invariant, recomputed independently in
    # python: n_trigrams == len(canonical text) - 2 for every scored
    # doc, and docs shorter than 3 canonical chars emit no row
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    expected = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        s = " ".join(re.findall(r"[a-z0-9]+", text.lower()))
        if len(s) >= 3:
            expected[doc_id] = len(s) - 2
    got = {r.doc_id: r.n_trigrams for r in rows}
    assert got == expected


def test_embedding_outliers_plan_broadcasts_centroids(spark):
    """The centroid table is (n_labels x dims) cells — bounded — and
    must broadcast onto the exploded vector stream (no SortMergeJoin);
    the per-label top-k must be WindowGroupLimit-pruned.  Invariants:
    ranks 1..k per label, distances non-increasing within a label."""
    df = Q.QUERIES["embedding_outliers"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    rows = df.collect()
    assert rows
    per_label = {}
    for r in rows:
        per_label.setdefault(r.label, []).append((r.rnk, r.dist))
    for label, rs in per_label.items():
        rs.sort()
        assert [rk for rk, _ in rs] == list(range(1, len(rs) + 1))
        dists = [d for _, d in rs]
        assert dists == sorted(dists, reverse=True), (label, dists)


def test_minhash_pairs_verify_needs_no_corpus_join(spark):
    """dedup_minhash_pairs estimates similarity from the signature
    columns riding on the banded rows — the plan must scan the
    documents table only through the ONE persisted signature build
    (InMemoryTableScan afterwards), never join back to the corpus for
    verification.  Invariants: n_eq in [MINHASH_MIN_EQ, 4],
    est_jaccard = n_eq/4, doc_a < doc_b, pairs unique."""
    Q.clear_caches(spark)
    df = Q.QUERIES["dedup_minhash_pairs"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert "InMemoryTableScan" in plan, plan
    # text never enters this query: only the sig table's hex strings
    assert not re.search(r"Exchange[^\n]*\btext#", plan), plan
    rows = df.collect()
    assert rows  # candidate generation must produce pairs on this corpus
    seen = set()
    for r in rows:
        assert Q.MINHASH_MIN_EQ <= r.n_eq <= 4
        assert r.est_jaccard == r.n_eq / 4
        assert r.doc_a < r.doc_b
        assert (r.doc_a, r.doc_b) not in seen
        seen.add((r.doc_a, r.doc_b))


def test_source_lang_pivot_single_scan_single_shuffle(spark):
    """Explicit pivot values => no distinct-values discovery job: the
    plan must read the documents parquet exactly once; pivot lowers to
    two aggregations (groupBy(source, lang) count, then pivotfirst
    over the cell table), both map-side combined — at most two
    exchanges, only the first of which sees corpus-sized input.  Row
    sums must equal the corpus size."""
    df = Q.QUERIES["source_lang_pivot"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") <= 2, plan
    assert "partial_pivotfirst" in plan, plan  # map-side combine
    rows = df.collect()
    n_total = sum(r.n_docs for r in rows)
    n_corpus = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert n_total == n_corpus
    for r in rows:
        assert r.n_docs == r.n_de + r.n_en + r.n_es + r.n_fr + r.n_zh


def test_corpus_diff_shuffles_hashes_never_text(spark):
    """q_corpus_diff must reduce both snapshots to (doc_id, md5) BEFORE
    the full outer join: no Exchange or Sort may reference the text
    column — checked on EVERY plan line, including the ':'-guttered
    left branch of the join (prefix matching skips those).
    Invariants: status counts match the modular derivation exactly —
    every doc_id%17==3 is removed, %23==7 added (as id+offset), and
    changed ids are %13==5 minus the removed overlap."""
    df = Q.QUERIES["corpus_diff"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    _assert_no_col_in_movement(plan, r"\btext#", "text")
    rows = df.collect()
    ids = set(
        r.doc_id for r in
        spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").collect()
    )
    removed = {r.doc_id for r in rows if r.status == "removed"}
    added = {r.doc_id for r in rows if r.status == "added"}
    changed = {r.doc_id for r in rows if r.status == "changed"}
    assert removed == {i for i in ids if i % Q.DIFF_REMOVE_MOD == 3}
    assert added == {
        i + Q.DIFF_ADD_OFFSET for i in ids if i % Q.DIFF_ADD_MOD == 7
    }
    assert changed == {
        i for i in ids
        if i % Q.DIFF_CHANGE_MOD == 5 and i % Q.DIFF_REMOVE_MOD != 3
    }


def test_html_links_rowlocal_and_complete(spark):
    """Link extraction is row-local after the corpus materialization:
    no Exchange in the plan.  Every synthetic html span carries
    exactly 5 anchors (3 nav + ad + terms), link_pos is 0..4 in
    document order, and the last two hrefs are the fixed boilerplate
    targets."""
    df = Q.QUERIES["html_links"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert "Exchange" not in plan, plan
    rows = df.collect()
    assert rows
    per_span = {}
    for r in rows:
        per_span.setdefault((r.doc_id, r.order), []).append(
            (r.link_pos, r.href)
        )
    for key, ls in per_span.items():
        ls.sort()
        assert [p for p, _ in ls] == [0, 1, 2, 3, 4], (key, ls)
        assert ls[3][1] == "/ad" and ls[4][1] == "/terms", (key, ls)


def test_nation_profit_pushdown_and_dims_broadcast(spark):
    """The PROMO predicate must reach the part parquet scan
    (PushedFilters), the three dimension tables must broadcast, and no
    nested-loop join may appear.  The lineitem⋈orders strategy is
    deliberately AQE's call (broadcast at test scale, SMJ at 10^12
    rows) — pinning it would wire in a scale assumption.  Invariant:
    profit_cents is an exact integer-cents sum, reproducible against
    a driver-side pandas recomputation."""
    df = Q.QUERIES["nation_profit"][0](spark, SF)
    plan = _plan(spark, df)
    assert re.search(r"PushedFilters:.*EqualTo\(p_type,PROMO\)", plan), plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    rows = df.collect()
    assert rows
    import pandas as pd

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    p = pd.read_parquet(f"{SF}/part.parquet")
    s = pd.read_parquet(f"{SF}/supplier.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    m = (
        li.merge(p[p.p_type == "PROMO"][["p_partkey"]],
                 left_on="l_partkey", right_on="p_partkey")
        .merge(s[["s_suppkey", "s_nationkey"]],
               left_on="l_suppkey", right_on="s_suppkey")
        .merge(n[["n_nationkey", "n_name"]],
               left_on="s_nationkey", right_on="n_nationkey")
        .merge(o[["o_orderkey", "o_orderdate"]],
               left_on="l_orderkey", right_on="o_orderkey")
    )
    import numpy as np

    # half-up like Spark/DuckDB round() on positives — numpy/pandas
    # .round() is half-even and disagrees on exact .5 products
    m["c"] = np.floor(
        m.l_extendedprice * (1 - m.l_discount) * 100 + 0.5
    ).astype("int64")
    m["o_year"] = pd.to_datetime(m.o_orderdate).dt.year
    exp = m.groupby(["n_name", "o_year"]).c.sum().to_dict()
    got = {(r.n_name, r.o_year): r.profit_cents for r in rows}
    assert got == exp


def test_all_queries_global_plan_guardrails(spark):
    """Fleet-wide guardrail over EVERY registry query's physical plan:
    (1) no CartesianProduct anywhere — an unkeyed n×m join is never
    acceptable at corpus scale; (2) no BatchEvalPython anywhere — a
    row-at-a-time Python UDF in any query would silently serialize
    the hot path (Arrow-batched ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas are the sanctioned Python seams).  New
    queries get these checks for free the moment they register.
    Caches are deliberately NOT cleared first: plan rendering needs no
    cold state, and a cleared codebook cache would make this
    plan-shape test re-run the IVF Lloyd training jobs."""
    offenders = {}
    for name, (qfn, _) in sorted(Q.QUERIES.items()):
        plan = _plan(spark, qfn(spark, SF), "simple")
        bad = [
            node for node in ("CartesianProduct", "BatchEvalPython")
            if node in plan
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_decontaminate_bloom_no_false_negatives_and_plan(spark):
    """The bloom prefilter may admit false positives (quantified as
    n_bloom_hits - n_confirmed, both oracle-checked) but NEVER false
    negatives: every doc the exact broadcast-join decontaminate flags
    must appear with the identical confirmed count.  Plan shape: the
    eval side reaches the corpus as a BroadcastExchange (never a
    SortMergeJoin — at 10^12 docs a shuffle of the corpus shingle
    stream on shingle is the exact cost this query exists to avoid),
    the probe is Arrow-vectorized, and the only hash shuffle is the
    final per-doc aggregation."""
    bloom = Q.QUERIES["decontaminate_bloom"][0](spark, SF)
    exact = Q.QUERIES["decontaminate"][0](spark, SF)
    got = {r["doc_id"]: (r["n_bloom_hits"], r["n_confirmed"])
           for r in bloom.collect()}
    want = {r["doc_id"]: r["n_shared_8grams"] for r in exact.collect()}
    for doc_id, n_exact in want.items():
        assert doc_id in got, f"bloom false negative: doc {doc_id}"
        assert got[doc_id][1] == n_exact, (doc_id, got[doc_id], n_exact)
    for doc_id, (hits, conf) in got.items():
        assert hits >= conf
        assert conf == want.get(doc_id, 0)

    plan = _plan(spark, bloom)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "ArrowEvalPython" in plan, plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "doc_id" in ln and "shingle" not in ln, ln


def test_runtime_bloom_filter_fires_on_unbroadcastable_dim(spark):
    """Scale evidence for the Q9-family star join: when a filtered
    dimension is too big to broadcast (the 100 TB case — part at full
    scale exceeds any broadcast threshold), Spark's runtime bloom
    filter must inject a might_contain() prefilter on the FACT side of
    the shuffle join, so lineitem rows failing the PROMO-part filter
    die at the scan instead of crossing the exchange.  Defaults
    (creationSideThreshold 10 MB, application-side scan 10 GB) only
    trigger on real volumes, so the thresholds — and only the
    thresholds — are widened to make the optimizer's decision
    observable at sandbox scale; the join is the exact nation_profit
    fact⋈dim shape with broadcast disabled."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        p = (
            spark.read.parquet(f"{SF}/part.parquet")
            .filter(F.col("p_type") == "PROMO")
            .select("p_partkey")
        )
        plan = _plan(spark, li.join(p, li.l_partkey == p.p_partkey))
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        # the prefilter must land on the fact side's key
        assert re.search(r"might_contain.*l_partkey", plan), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """Skew evidence for the join side of the engine (the north rule's
    'skew handled explicitly'): a '/the'-grade hot key that lands 500x
    its siblings' bytes in one shuffle partition must be SPLIT by AQE's
    skew-join rule — the final adaptive plan carries
    SortMergeJoin(skew=true) with a skewed AQEShuffleRead — instead of
    one straggler task sorting the whole hot key.  Thresholds (and
    only thresholds) are scaled down so the decision is observable on
    sandbox volumes; broadcast is disabled because at 100 TB neither
    side fits."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(0, 50000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(0, 100).select(
            (F.col("id") % 100 + 1).cast("long").alias("k"),
            F.col("id").alias("v"),
        )
        left = hot.union(cold).withColumn("pad", F.expr("repeat('x', 100)"))
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), F.col("id").alias("r")
        )
        j = left.join(right, "k")
        j.collect()  # run it: AQE decides skew splits at runtime
        plan = _plan(spark, j)
        assert "isFinalPlan=true" in plan, plan
        assert "SortMergeJoin(skew=true)" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_merge_upsert_plan_shuffles_hashes_never_text(spark):
    """MERGE's one required shuffle is the full-outer key join; both
    sides must be reduced to (doc_id, md5) BEFORE it — no Exchange may
    carry the text column.  Statuses must partition the output
    exhaustively, and delete tombstones must actually remove rows."""
    df = Q.QUERIES["merge_upsert"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    text_ids = set(re.findall(r"\btext#(\d+)", plan))
    for ln in plan.splitlines():
        s = ln.strip()
        if "Exchange" in s:
            tail = s.split("Exchange", 1)[1]
            for tid in text_ids:
                assert not re.search(rf"#{tid}(?![0-9])", tail), s
    rows = df.collect()
    assert set(r["status"] for r in rows) == {
        "kept", "updated", "inserted",
    }
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # deleted rows are ABSENT from the output: the count identity below
    n_ins = sum(1 for r in rows if r["status"] == "inserted")
    assert len(rows) - n_ins < n_docs  # tombstones removed something
    assert len({r["doc_id"] for r in rows}) == len(rows)  # key unique


def test_corpus_profile_plan_single_scan_with_expand(spark):
    """The profiler is ONE scan + one aggregation: exactly one
    FileScan, and the documented Expand of exact multi-column distinct
    is present (the event_cardinality trade-off the docstring names).
    Null counts are 0 on this corpus and distincts are sane."""
    df = Q.QUERIES["corpus_profile"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Expand" in plan, plan
    rows = {r["col_name"]: r for r in df.collect()}
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert rows["doc_id"]["n_nulls"] == 0
    assert rows["doc_id"]["n_distinct"] == n
    for r in rows.values():
        assert 0 < r["n_distinct"] <= n


def test_bm25_search_plan_prefilter_and_topk(spark):
    """The query-term filter must live INSIDE the explode's generator
    (a row-local array lambda), so the generator never emits
    non-query tokens; the final ranking must be TakeOrderedAndProject
    (per-partition heaps), never a global Sort; the tiny df/stats
    sides must not force a sort-merge join.  Invariants: <= top-k
    rows, scores strictly ordered by (score desc, doc_id asc),
    1 <= n_terms_matched <= |query|."""
    df = Q.QUERIES["bm25_search"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert re.search(r"Generate explode\(filter\(", plan), plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    rows = df.collect()
    assert 0 < len(rows) <= Q.BM25_TOP_K
    keys = [(-r.score, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert 1 <= r.n_terms_matched <= len(Q.BM25_QUERY)
        assert r.score > 0


def _winnow_ref(text):
    """Independent pure-python winnowing reference (hashlib, no
    Spark): k-gram 60-bit md5-prefix hashes, min per w-window."""
    import hashlib

    k, w = Q.WINNOW_K, Q.WINNOW_W
    toks = re.findall(r"[a-z0-9]+", text.lower())
    hs = [
        int(hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()[:15], 16)
        for i in range(len(toks) - k + 1)
    ]
    return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}


def test_fingerprint_winnow_matches_reference_and_plan(spark):
    """Value check against the from-scratch python reference over the
    whole sf0.001 corpus, plus the zero-shuffle-until-distinct plan
    contract: exactly ONE Exchange (the final distinct) and no python
    UDF — the sweep is whole-stage-codegen array expressions."""
    df = Q.QUERIES["fingerprint_winnow"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan, plan
    got = {}
    for r in df.collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert docs
    for d in docs:
        expect = _winnow_ref(d.text)
        assert got.get(d.doc_id, set()) == expect, d.doc_id


def test_fingerprint_winnow_shared_run_guarantee(spark, tmp_path):
    """Schleimer'03 theorem: any two docs sharing a run of at least
    k + w - 1 tokens share at least one fingerprint — the property
    that makes winnowing a NEAR-dup detector rather than a sampler.
    Constructed corpus: doc a and doc b embed the same 12-token run
    inside different surroundings (k+w-1 = 9 here); doc c shares
    nothing.  Guarantee must hold for (a, b) and not fire for c."""
    run = "zq" + " zq".join(str(i) for i in range(12))  # 12 unique toks
    rows = [
        (0, f"alpha beta gamma {run} delta epsilon", "en", "s", 1),
        (1, f"one two {run} three four five six", "en", "s", 1),
        (2, "totally disjoint vocabulary with nothing shared at all "
            "seven eight nine ten eleven twelve thirteen", "en", "s", 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    by_doc = {}
    for r in Q.QUERIES["fingerprint_winnow"][0](spark, sf).collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[0] & by_doc[1], "shared 12-token run must share a fp"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_dedup_winnow_pairs_persists_index_and_invariants(spark):
    """The fingerprint table must be persisted and reused by all its
    consumers (DF filter, sizes, both self-join aliases) — the plan
    must read it via InMemoryTableScan, never re-run the winnow sweep
    per consumer — and no text column can reach the join (the index
    carries only 60-bit hashes by construction).  Invariants:
    doc_a < doc_b, 0 < jaccard_est <= 1, n_shared >= 1."""
    Q.clear_caches(spark)
    df = Q.QUERIES["dedup_winnow_pairs"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert "CartesianProduct" not in plan, plan
    # the tokenize+sweep may appear ONLY inside the one InMemoryRelation
    # cache-build subtree, never inlined per consumer
    assert plan.count("regexp_extract_all") <= plan.count("InMemoryRelation"), plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.n_shared >= 1
        assert 0 < r.jaccard_est <= 1


def test_doc_fingerprint_plan_is_shuffle_free(spark):
    """Both fingerprint aggregates are per-doc facts of the token
    array: the plan must contain no Exchange (the explode+groupBy
    formulation shuffled the full distinct shingle text — caught by
    bench.py's shuffle_write_mb metric and rewritten row-local)."""
    plan = (
        Q.QUERIES["doc_fingerprint"][0](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_ngram_jaccard_joins_move_hashes_never_text(spark):
    """The jaccard join spine must carry 60-bit shingle keys, not
    shingle strings: no Exchange/Sort line may reference the shingle
    text column (the same contract line_dedup/corpus_diff carry;
    shuffle_write_mb measured 21.9 -> 10.6 MB at sf0.1)."""
    Q.clear_caches(spark)
    df = Q.QUERIES["dedup_ngram_jaccard"][0](spark, SF)
    plan = _plan(spark, df, "simple")
    _assert_no_col_in_movement(plan, r"\bshingle#", "shingle text")
    assert df.count() > 0
