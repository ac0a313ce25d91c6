"""Kill-and-resume semantics (north_rule): a killed job must resume
without reprocessing committed buckets and produce exactly the same
output rows as an uninterrupted run — no duplicates, no gaps."""

import pytest
from pyspark.sql import functions as F

from mcp_ocr_server_spark.plans.checkpoint import (
    CheckpointStore,
    run_checkpointed,
)
from mcp_ocr_server_spark.plans.pipeline import extract
from mcp_ocr_server_spark.sources import synthetic as S

from conftest import FIXTURE_JOB

CORPUS = S.CorpusConfig(n_docs=40)
N_BUCKETS = 4


def _key_rows(df):
    return sorted(
        (r.doc_id, r.order, r.kind, r.text, r.media_ref, r.error_code)
        for r in df.collect()
    )


def test_kill_and_resume_no_reprocessing(spark, tmp_path):
    docs = S.docs_df(spark, CORPUS)
    media = S.media_df(spark, CORPUS)

    store = CheckpointStore(str(tmp_path / "ckpt"))
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(
            spark, docs, media, store, FIXTURE_JOB,
            n_buckets=N_BUCKETS, fail_after_buckets=2,
        )
    assert len(store.committed_buckets()) == 2

    # resume: only the remaining buckets run
    second = run_checkpointed(
        spark, docs, media, store, FIXTURE_JOB, n_buckets=N_BUCKETS,
        run_id="run-1",
    )
    assert second.buckets_done_before == 2
    assert second.buckets_committed == N_BUCKETS - 2
    assert len(store.committed_buckets()) == N_BUCKETS

    # output == single uninterrupted run, row-for-row
    resumed = store.spans_df(spark)
    oneshot = extract(docs, media, FIXTURE_JOB).spans
    assert _key_rows(resumed) == _key_rows(oneshot)

    # no doc appears in two buckets; no span row duplicated
    dups = (
        resumed.groupBy("doc_id", "order").count().filter(F.col("count") > 1)
    )
    assert dups.count() == 0

    # lineage table: one watermark per bucket with counts
    wm = store.watermarks_df(spark)
    assert wm.count() == N_BUCKETS
    assert wm.agg(F.sum("n_spans")).first()[0] == resumed.count()
    # later buckets reuse earlier buckets' OCR results via the memo table
    runs = {r.run_id for r in wm.collect()}
    assert runs == {"run-0", "run-1"}

    # per-partition metrics table (north_star lineage+metrics): image
    # counts reconcile with the committed OCR results, and partition ids
    # were stamped by the compute tasks
    metrics = store.metrics_df(spark)
    assert metrics.agg(F.sum("n_images")).first()[0] == sum(
        r.n_ocr_computed for r in wm.collect()
    )
    assert all(r.partition_id >= 0 for r in metrics.collect())


def test_precomputed_bucket_mismatch_rejected(spark, tmp_path):
    """A docs table carrying a bucket column written for a different B
    must be refused loudly, not silently drop rows."""
    import pytest
    from pyspark.sql import functions as F

    from mcp_ocr_server_spark.config import FIXTURE_JOB
    from mcp_ocr_server_spark.plans.checkpoint import (
        CheckpointStore,
        bucket_col,
        run_checkpointed,
    )
    from mcp_ocr_server_spark.sources import synthetic as S

    c = S.CorpusConfig(n_docs=40)
    docs = S.docs_df(spark, c).withColumn("bucket", bucket_col(64))
    p = str(tmp_path / "docs64")
    docs.write.partitionBy("bucket").parquet(p)
    bad_docs = spark.read.parquet(p)
    media = S.media_df(spark, c)
    with pytest.raises(ValueError, match="different.*bucket count"):
        run_checkpointed(
            spark, bad_docs, media,
            CheckpointStore(str(tmp_path / "out")), FIXTURE_JOB,
            n_buckets=4,
        )


def test_store_bucket_count_pinned(spark, tmp_path):
    """A store committed under one bucket count refuses any other —
    including the early no-op-resume path (watermarks from B=8 must
    never satisfy a B=4 run)."""
    import pytest

    from mcp_ocr_server_spark.plans.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path / "store"))
    store.check_bucket_count(8)
    for k in range(8):
        store.commit(k, dict(bucket=k, run_id="r", n_docs=0, n_spans=0,
                             n_errors=0, n_ocr_computed=0, wall_s=0.0,
                             committed_at=0.0))
    with pytest.raises(ValueError, match="created with 8 buckets"):
        store.check_bucket_count(4)
    store.check_bucket_count(8)  # same B stays fine


def test_legacy_store_without_marker_refused(tmp_path):
    """Marker-less store with ANY committed watermark is refused — the
    bucket count is unverifiable, and max(done) >= b only catches a
    subset of mismatches (buckets 0-1 under B=4 would 'pass' B=64 and
    then skip the wrong doc subsets on resume).  Restoring the marker
    by hand re-enables the store."""
    import os

    import pytest

    from mcp_ocr_server_spark.plans.checkpoint import CheckpointStore

    store = CheckpointStore(str(tmp_path / "legacy"))
    store.commit(1, dict(bucket=1, run_id="r", n_docs=0, n_spans=0,
                         n_errors=0, n_ocr_computed=0, wall_s=0.0,
                         committed_at=0.0))
    marker = os.path.join(store.root, "BUCKETS")
    if os.path.exists(marker):
        os.remove(marker)
    # the seemingly-compatible direction (max(done)=1 < b=64) must ALSO
    # be refused: the store might have been written under B=4
    with pytest.raises(ValueError, match="cannot be verified"):
        store.check_bucket_count(64)
    with pytest.raises(ValueError, match="cannot be verified"):
        store.check_bucket_count(4)
    # manual migration: restore the marker with the true original count
    with open(marker, "w") as fh:
        fh.write("4")
    store.check_bucket_count(4)  # now verifiable and accepted
    with pytest.raises(ValueError, match="created with 4 buckets"):
        store.check_bucket_count(64)


def test_interleaved_checkpoint_kill_resume_matches_monolithic(
    spark, tmp_path
):
    """The pdf sidecar threads through the bucket loop: a killed
    interleaved run (all four span kinds) resumes without reprocessing
    and its union equals the monolithic extract with the same pdfs —
    no duplicates, no gaps, pdf error codes intact."""
    cfg = S.CorpusConfig(n_docs=40, p_pdf=0.35)
    docs = S.docs_df(spark, cfg)
    media = S.media_df(spark, cfg)
    pdfs = S.pdf_df(spark, cfg)

    store = CheckpointStore(str(tmp_path / "ckpt"))
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(
            spark, docs, media, store, FIXTURE_JOB,
            n_buckets=N_BUCKETS, fail_after_buckets=2, pdfs=pdfs,
        )
    assert len(store.committed_buckets()) == 2
    run_checkpointed(
        spark, docs, media, store, FIXTURE_JOB,
        n_buckets=N_BUCKETS, pdfs=pdfs,
    )
    got = _key_rows(store.spans_df(spark))
    want = _key_rows(extract(docs, media, FIXTURE_JOB, pdfs=pdfs).spans)
    assert got == want
    kinds = {k for (_d, _o, k, _t, _m, _e) in got}
    assert kinds == {"text", "html", "image", "pdf"}
    codes = {e for (_d, _o, _k, _t, _m, e) in got if e}
    assert "PDF_PARSE_FAILED" in codes
