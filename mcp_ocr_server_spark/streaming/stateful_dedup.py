"""Custom stateful streaming operator: first-seen content dedup.

The batch pipeline's memoization (anti-join vs the committed memo
table) has a streaming twin: as media spans arrive continuously, only
the FIRST occurrence of each content hash should reach the expensive
OCR stage; later occurrences wait for (or reuse) the first's result.

Implemented with `applyInPandasWithState` — the Structured Streaming
custom-stateful-operator API (the round brief's named tool for
operators Spark's built-in streaming aggregations can't express):

- stream is keyed by a hash prefix (bounded key cardinality; state
  scales with distinct prefixes × hashes, sharded across executors);
- per-key state = the set of content hashes already admitted;
- each micro-batch emits only rows whose hash wasn't in state, then
  folds the new hashes into state.

`dropDuplicates` on a stream would grow unbounded state with no
control and no timeout hook; the explicit operator owns its state
shape and can evict (GroupStateTimeout) when a retention policy is
added.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "content_hash string, media_ref string, admit_ordinal long"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    out_hash: list[str] = []
    out_ref: list[str] = []
    out_ord: list[int] = []
    for pdf in pdfs:
        for h, ref in zip(pdf["content_hash"], pdf["media_ref"]):
            if h not in seen:
                out_ord.append(len(seen))  # admission ordinal within shard
                seen.add(h)
                out_hash.append(h)
                out_ref.append(ref)
    state.update((sorted(seen),))
    yield pd.DataFrame(
        {
            "content_hash": out_hash,
            "media_ref": out_ref,
            "admit_ordinal": out_ord,
        }
    )


def streaming_first_seen(media_stream: DataFrame) -> DataFrame:
    """media stream (media_ref, bytes) -> first-seen (hash, ref) rows.

    Key = 2-hex-char hash prefix: 256 state shards, each holding its
    own seen-set — the state is partitioned exactly like a shuffle.
    """
    hashed = media_stream.select(
        F.sha2(F.col("bytes"), 256).alias("content_hash"),
        "media_ref",
    ).withColumn("shard", F.substring("content_hash", 1, 2))
    return (
        hashed.groupBy("shard")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_streaming_dedup(
    spark,
    media_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source wiring: watch a media landing dir, emit first-seen rows."""
    stream = (
        spark.readStream.schema(
            "media_ref string, bytes binary, degradation string, true_text string"
        )
        .option("maxFilesPerTrigger", 4)
        .parquet(media_dir)
    )
    deduped = streaming_first_seen(stream)
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
