"""Streaming ingestion: continuous extraction over arriving documents.

The reference is a request/response service — its "streaming" is a
stdio loop (server.go:98).  The Spark-native equivalent of "documents
keep arriving" is Structured Streaming over the docs table's landing
zone: each micro-batch runs the SAME batch dataflow (plans/pipeline.py)
via foreachBatch, so batch and streaming share one code path and one
output schema — the recommended Spark pattern for reusing a complex
batch plan (joins + mapInPandas stages) in a stream.

Exactly-once: foreachBatch appends with per-batch parquet sub-dirs
keyed by batch id (idempotent re-writes on retry); on Iceberg this
would be a transactional append per micro-batch.

Also provides the stateful-streaming twins of the batch analytics
(late data bounded by watermarks, state bounded by window/session/
join-horizon eviction): tumbling-window counts (q_events_hourly),
gap-based sessionization (q_event_sessions), a stream-stream interval
join (q_purchase_error_window), and windowed approx quantiles
(q_event_quantiles) — each unit-tested against its batch twin on the
same input.  A fifth twin, the ordered conversion funnel
(q_event_funnel), lives in streaming/funnel.py as a custom
applyInPandasWithState operator with fixed 24-byte per-user state;
a sixth, per-source quota admission (q_source_quota's ingestion-time
policy twin), lives in streaming/quota.py with one long of state per
source; a seventh, ingestion-time decontamination (the
decontaminate_bloom screen with the eval bitset trained once and
probed per micro-batch, zero state), lives in streaming/decon.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DEFAULT_CONFIG, JobConfig
from ..plans.pipeline import extract
from ..sources.synthetic import DOCS_SCHEMA

# the events fixture's exact parquet schema (ts is timestamp_NTZ on
# disk; each streaming reader casts to LTZ explicitly where a
# watermark requires it) — one definition for all three events twins
EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long,"
    " event_type string, value double, props string"
)


def _memo_sources(memo_dir: str | None, batch_id: int | None) -> list[str]:
    """Paths the cross-batch memo reads: the NEWEST committed compacted
    dir (compact_upto=N covers every batch id < N) plus committed
    batch dirs it does not cover — restricted, when `batch_id` is
    given, to dirs strictly earlier than that batch (a retried batch
    must not treat its own overwritten output as done work).  Dirs
    without _SUCCESS are partial writes and never read."""
    if memo_dir is None or not os.path.isdir(memo_dir):
        return []
    compact_upto, compact_path = -1, None
    batches: list[tuple[int, str]] = []
    for d in os.listdir(memo_dir):
        path = os.path.join(memo_dir, d)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        if d.startswith("compact_upto="):
            upto = int(d.split("=")[1])
            if upto > compact_upto:
                compact_upto, compact_path = upto, path
        elif d.startswith("batch_id="):
            batches.append((int(d.split("=")[1]), path))
    out = [compact_path] if compact_path is not None else []
    out.extend(
        path
        for bid, path in sorted(batches)
        if bid >= compact_upto and (batch_id is None or bid < batch_id)
    )
    return out


def compact_memo(spark: SparkSession, memo_dir: str) -> int:
    """Merge all committed memo sources (prior compacted dir + batch
    dirs) into ONE deduped parquet dir `compact_upto=N`, then delete
    the dirs it covers — bounding a long stream's per-batch memo read
    at one dir + the batches since the last compaction (VERDICT r3
    #4).

    The batch_id < N read rule is preserved: N = max covered batch id
    + 1, so a later batch reads the compacted dir exactly where it
    would have read the covered batch dirs.  Crash-safe: covered dirs
    are removed only AFTER the compacted write commits (_SUCCESS); a
    compaction that dies mid-write leaves an uncommitted dir the
    loader ignores.  Returns N (0 if there was nothing to compact)."""
    import shutil

    from ..operators.media_ocr import OCR_RESULT_SCHEMA

    # orphan sweep (review finding): a prior compaction that crashed
    # between its _SUCCESS commit and its rmtree leaves covered batch
    # dirs behind, and the bid >= compact_upto read filter would hide
    # them from every future listing — delete them here, where the
    # covering compacted dir proves they are redundant.
    newest_upto = max(
        (
            int(d.split("=")[1])
            for d in os.listdir(memo_dir)
            if d.startswith("compact_upto=")
            and os.path.exists(os.path.join(memo_dir, d, "_SUCCESS"))
        ),
        default=-1,
    ) if os.path.isdir(memo_dir) else -1
    if newest_upto >= 0:
        for d in os.listdir(memo_dir):
            covered_batch = (
                d.startswith("batch_id=")
                and int(d.split("=")[1]) < newest_upto
            )
            stale_compact = (
                d.startswith("compact_upto=")
                and int(d.split("=")[1]) < newest_upto
            )
            if covered_batch or stale_compact:
                shutil.rmtree(os.path.join(memo_dir, d), ignore_errors=True)

    sources = _memo_sources(memo_dir, None)
    covered_bids = [
        int(os.path.basename(p).split("=")[1])
        for p in sources
        if os.path.basename(p).startswith("batch_id=")
    ]
    prev_upto = max(
        (
            int(os.path.basename(p).split("=")[1])
            for p in sources
            if os.path.basename(p).startswith("compact_upto=")
        ),
        default=0,
    )
    if not covered_bids:
        return prev_upto  # nothing new since the last compaction
    # strictly > prev_upto: the target must never be one of its own
    # input dirs (a stale-generation batch dir can carry an id below
    # the previous compaction's upto).  After a checkpoint rebuild the
    # restarted generation's batches below `upto` are recomputed
    # rather than memo-read until its ids pass `upto` — a bounded
    # efficiency loss, never a correctness one (results are
    # content-addressed and deterministic).
    upto = max(max(covered_bids) + 1, prev_upto + 1)
    merged = (
        spark.read.schema(OCR_RESULT_SCHEMA)
        .parquet(*sources)
        .dropDuplicates(["content_hash"])
    )
    target = os.path.join(memo_dir, f"compact_upto={upto}")
    merged.write.mode("overwrite").parquet(target)
    for path in sources:
        if os.path.abspath(path) != os.path.abspath(target):
            shutil.rmtree(path, ignore_errors=True)
    return upto


def stream_extract(
    spark: SparkSession,
    docs_dir: str,
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    cfg: JobConfig = DEFAULT_CONFIG,
    available_now: bool = True,
    memo_dir: str | None = None,
    compact_every: int | None = None,
    pdfs: DataFrame | None = None,
):
    """readStream(docs landing dir) -> foreachBatch(batch extract) -> parquet.

    `available_now=True` drains what's currently in the directory and
    stops (test/backfill mode); False runs continuously.
    Returns the StreamingQuery.

    `memo_dir` enables CROSS-MICRO-BATCH memoization (the streaming
    face of C2): each batch reads every EARLIER batch's ocr_results as
    the memo table — content already decoded in a prior micro-batch is
    never re-OCR'd — and appends its own newly-computed rows under
    `batch_id=N`.  Only subdirs with batch_id < N are read, so a
    retried batch never treats its own partial output as done work
    (the overwrite would otherwise erase rows it just memo-skipped);
    the memo read dedups by content_hash, so reusing a memo_dir across
    a rebuilt checkpoint (batch ids restarting at 0) stays correct.
    `pdfs` is the static (media_ref, bytes) sidecar for pdf-kind spans
    (stream-static join per micro-batch — the standard Spark pattern
    for a slowly-changing dimension; swap in a fresh DataFrame between
    runs to pick up sidecar updates).

    `compact_every=K` runs compact_memo after every K-th batch, so the
    per-batch memo read stays bounded at ONE compacted dir plus < K
    batch dirs for arbitrarily long streams (VERDICT r3 #4).  On
    Iceberg this directory is simply the ocr_results table (one
    transactional append per batch, one snapshot read — no growth in
    file-listing cost), and compaction is `rewrite_data_files`.
    """
    if memo_dir is not None and "://" in memo_dir and not memo_dir.startswith(
        "file:"
    ):
        # the memo bookkeeping (_memo_sources/compact_memo) lists and
        # prunes batch dirs with LOCAL filesystem calls; on a remote URI
        # Spark would happily write batches while os.listdir sees
        # nothing — memoization silently off, dirs growing forever.
        # Refuse loudly; at cluster scale the memo is an Iceberg
        # ocr_results table, not a directory protocol.
        raise ValueError(
            f"memo_dir must be a local path (got {memo_dir!r}): the "
            "batch-dir bookkeeping is local-filesystem-only; use an "
            "Iceberg ocr_results table for remote storage"
        )
    docs_stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(docs_dir)
    )
    # Hash the STATIC sides once per stream, not once per micro-batch:
    # extract() with media_hashed=None re-derives sha256 over the whole
    # media corpus every call (review finding — a 1000-batch stream
    # over a 100 GB corpus would hash ~100 TB of unchanged bytes).
    # Parked in the shared sketch cache => released by
    # queries.clear_caches, the house lifecycle for persisted handles.
    from ..queries import _persisted_sig
    from ..plans.pipeline import content_hash_col

    media_hashed = _persisted_sig(
        spark,
        ("stream_media_hashed", out_dir),
        lambda: media.select(
            "media_ref",
            F.length("bytes").alias("n_bytes"),
            content_hash_col(cfg).alias("content_hash"),
        ),
    )
    pdfs_hashed = (
        _persisted_sig(
            spark,
            ("stream_pdfs_hashed", out_dir),
            lambda: pdfs.select(
                "media_ref", F.sha2("bytes", 256).alias("content_hash")
            ),
        )
        if pdfs is not None
        else None
    )

    def _memo_for(batch_id: int) -> DataFrame | None:
        prior = _memo_sources(memo_dir, batch_id)
        if not prior:
            return None
        from ..operators.media_ocr import OCR_RESULT_SCHEMA

        # one row per hash even if the memo_dir carries stale subdirs
        # from a previous checkpoint generation (batch ids restart at 0
        # on a rebuilt checkpoint, so a hash can exist both in a stale
        # dir and a new one; results are content-addressed and the
        # engine is deterministic, so any copy is THE result — without
        # this dedup the span join would duplicate rows).  Cf.
        # CheckpointStore.memo_df (plans/checkpoint.py), the batch twin
        # of this loader with watermark markers as its commit predicate.
        return (
            spark.read.schema(OCR_RESULT_SCHEMA)
            .parquet(*prior)
            .dropDuplicates(["content_hash"])
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        res = extract(
            batch_df, media, cfg, memo=_memo_for(batch_id), pdfs=pdfs,
            media_hashed=media_hashed, pdfs_hashed=pdfs_hashed,
        )
        if memo_dir is None:
            res.spans.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch_id={batch_id}")
            )
            return
        # persist the OCR stage so the spans write reuses it instead of
        # re-running the mapInPandas (same pattern as the checkpoint
        # loop, plans/checkpoint.py)
        cached = res.ocr_results.persist()
        try:
            # newly-computed rows only; overwrite => idempotent retry
            cached.write.mode("overwrite").parquet(
                os.path.join(memo_dir, f"batch_id={batch_id}")
            )
            res.spans.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch_id={batch_id}")
            )
        finally:
            cached.unpersist()
        # memo_dir is non-None here: the no-memo path returned above
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_memo(spark, memo_dir)

    writer = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_hourly(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Watermarked tumbling-window counts per event_type.

    Late events older than the watermark are dropped; state for closed
    windows is evicted — bounded state at unbounded input, which a
    batch job can't express.

    `ts` is read as timestamp_ntz (the events parquet's actual type)
    and cast to LTZ for the watermark, the same explicit-cast treatment
    as sessionize_stream — hour_start's UTC dependency is a visible
    cast in the plan, not the reader defaulting to LTZ.
    """
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type", "n", "sum_value",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming sessionization: built-in `session_window` (gap-based,
    merging) with a watermark — the streaming twin of
    queries.q_event_sessions (same 30-min inactivity gap, same
    session_start per (user, session)).  A session closes once the
    watermark passes its end + gap; its state is then evicted, so
    state stays bounded at unbounded input.  Output mode must be
    `append`: a session row is only final after closing.

    Two documented semantic deltas vs the batch twin (review finding):
      - `session_end` here is session_window's window end = last event
        + gap, NOT max(ts) like q_event_sessions' session_end; join
        the twins on (user_id, session_start) and compare n_events, or
        subtract the gap to recover last-event time.
      - `ts` is read as timestamp_ntz to MATCH the batch corpus's
        parquet type exactly.  Spark's watermark/session_window REQUIRE
        an LTZ event-time column, so the plan casts ntz -> ltz for the
        stateful op and the window bounds back to ntz on output; both
        casts preserve wall-clock time under the session timezone,
        which session.py pins to UTC.  The UTC dependency is thereby
        an explicit pair of casts in the plan, not an accident of the
        reader defaulting to LTZ."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_purchase_error_pairs(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "24 hours",
    watermark: str = "25 hours",
    available_now: bool = True,
):
    """Watermarked stream-stream INTERVAL join — the streaming twin of
    `operators/asof.bucketed_range_join` / q_purchase_error_window:
    each purchase meets the same user's error events inside the
    following `window`, as they arrive.

    The batch operator buckets time to dodge Catalyst's
    equi-join-then-post-filter plan; streaming needs no bucketing trick
    because Structured Streaming plans a time-range equi-join natively
    as StreamingSymmetricHashJoin: both sides hash-partition on
    user_id, and the WATERMARK plus the recognized time-bound
    (`e_ts` in [p_ts, p_ts + window)) derive a state-retention horizon
    per side — a purchase row is evicted once the error-side watermark
    passes p_ts + window, an error row once the purchase-side watermark
    passes e_ts.  Bounded state at unbounded input; the same join
    WITHOUT the time bound would grow state forever (Spark allows it
    for inner joins — the time condition is what makes it safe).

    Inner join, append mode: a pair is emitted the moment both rows
    have arrived (inner matches are final immediately; only the state
    cleanup, not emission, waits on the watermark).  Aggregation to
    the batch query's per-purchase rollup happens downstream (e.g.
    foreachBatch MERGE into the rollup table): an append-mode
    aggregation AFTER a stream-stream join would hold every open
    window's group in state a second time for no benefit here.

    `watermark` must be >= `window` plus the real out-of-orderness
    bound, else a purchase's late-window errors can be dropped as
    late; the default gives 1 h of slack over the 24 h window —
    ENFORCED below, so a widened window with a stale watermark fails
    loudly instead of silently undercounting.  Error amounts are
    integer cents exactly like the batch twin."""
    if not spark.sql(
        f"SELECT INTERVAL {watermark} >= INTERVAL {window}"
    ).first()[0]:
        raise ValueError(
            f"watermark ({watermark}) must be >= window ({window}): "
            "purchase-side state would be evicted before the window "
            "closes, silently dropping in-window late pairs"
        )

    def src() -> DataFrame:
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(events_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )

    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    errors = (
        src()
        .filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user_id"),
            F.col("ts").alias("e_ts"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .withWatermark("e_ts", watermark)
    )
    pairs = purchases.join(
        errors,
        (F.col("user_id") == F.col("e_user_id"))
        & F.expr(f"e_ts >= p_ts AND e_ts < p_ts + INTERVAL {window}"),
    ).select("p_event_id", "user_id", "e_ts", "cents")
    writer = (
        pairs.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_quantiles(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    accuracy: int = 10_000,
    available_now: bool = True,
):
    """Watermarked hourly tail-latency rollup — the streaming twin of
    queries.q_event_quantiles: p50/p90/p99 of `value` per (hour,
    event_type) window.

    Streaming aggregation state must be bounded and mergeable, so this
    uses `approx_percentile` — the GK sketch documented as
    q_event_quantiles' 100 TB swap — NOT exact `percentile`: an exact
    per-group value->count map in streaming state would grow with the
    window's distinct-value count and be rebuilt per micro-batch;
    the sketch is fixed-size and merges micro-batch partials the same
    way map-side partials merge in batch.  Rank error <= n/accuracy
    per window (asserted against the batch EXACT per-window quantiles
    in test_streaming.py).  Append mode: a window's row is final once
    the watermark closes it."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                f"approx_percentile(value,"
                f" array(0.5D, 0.9D, 0.99D), {accuracy})"
            ).alias("ps"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type", "n",
            F.col("ps")[0].alias("p50"),
            F.col("ps")[1].alias("p90"),
            F.col("ps")[2].alias("p99"),
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
