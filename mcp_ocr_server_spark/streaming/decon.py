"""Streaming decontamination: flag eval-overlapping docs at ingestion.

The batch `decontaminate_bloom` query (queries.py) screens a full
corpus against the eval suite's 8-gram Bloom bitset.  In production
the eval suite is STATIC while documents arrive continuously, so the
natural deployment is a stream: train the bitset once from the eval
table, broadcast it, and probe every arriving micro-batch — each doc
is screened the moment it lands instead of waiting for an offline
sweep.  This is the train-once-broadcast pattern on a stream; state
is ZERO (the operator is per-doc, so no watermark or GroupState is
needed — the bitset broadcast is the only cross-batch artifact).

Per micro-batch (foreachBatch, reusing the exact batch operators
`bloom_bits` / `bloom_survivors` from queries.py so stream and batch
share one code path):

  shingle the batch -> JVM md5 bit positions -> Arrow-batch numpy
  bitset probe -> exact-confirm survivors against the real eval
  shingles (broadcast) -> per-doc (n_bloom_hits, n_confirmed) rows
  appended under batch_id=N (idempotent on retry).

Docs are per-doc atomic within a batch (the file source delivers whole
rows), so batching cannot split a document and the union of all batch
outputs equals the batch query's answer on the same corpus — pinned by
tests/test_streaming.py::test_streaming_decontaminate_matches_batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..queries import _persisted_sig, _shingles_spark, bloom_bits, bloom_screen


def run_streaming_decontaminate(
    spark: SparkSession,
    docs_dir: str,
    eval_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Watch a docs landing dir; emit per-doc contamination rows.

    `eval_docs` is the static eval-suite table (doc_id, text, ...);
    its bitset and exact shingle set are built once, before the stream
    starts, and reused by every micro-batch."""
    ev = _shingles_spark(eval_docs, 8).select("shingle").distinct()
    bc = spark.sparkContext.broadcast(bloom_bits(ev))
    # parked in the shared sketch cache: released by queries.clear_caches
    # (a bare .persist() here leaked one eval-shingle copy per call for
    # the session lifetime — review finding)
    ev_exact = _persisted_sig(
        spark,
        ("stream_decon_ev", out_dir),
        lambda: F.broadcast(ev.withColumn("is_eval", F.lit(1))),
    )
    ev_exact.count()  # materialize before the stream needs it

    def _screen_batch(batch_df: DataFrame, batch_id: int) -> None:
        # ONE shared screen body with the batch query (bloom_screen) —
        # the stream-equals-batch contract holds by construction
        out = bloom_screen(_shingles_spark(batch_df, 8), bc, ev_exact)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(_screen_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
