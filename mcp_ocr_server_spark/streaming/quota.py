"""Custom stateful streaming operator: per-source quota admission.

The batch `source_quota` query (queries.py) caps each source at
SOURCE_QUOTA docs by a deterministic md5 rank over the WHOLE corpus —
an offline policy that needs every candidate before it can rank.  At
ingestion time (a live crawl landing docs continuously) the same cap
must be enforced without ever seeing the full corpus, so the streaming
twin switches policy: FIRST-ARRIVED admission.  Each source admits its
first `quota` docs across all micro-batches and rejects the rest.

Semantics difference vs the batch twin, by design (documented, not
hidden): batch keeps the md5-rank winners (content-independent uniform
sample), streaming keeps the arrival winners (admission control).
Counts per source agree — min(quota, n_source) — which the test pins.

State is ONE long per source (the admitted count): a 10^8-source crawl
carries ~800 MB of state fleet-wide, sharded by the groupBy key across
executors, and a '/the'-grade mega-source costs O(its batch rows) per
micro-batch — the operator stops admitting after `quota`, so the hot
key never accumulates state beyond one integer.  Contrast with trying
the batch query's window on a stream: unbounded buffering per source.

Reference seam: the reference's worker pool bounds in-flight work per
server (worker_pool.go:40-187); this bounds accepted work per source —
the corpus-scale version of the same backpressure idea.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id long, source string, admit_ordinal long"
STATE_SCHEMA = "n_admitted long"


def _make_quota_fn(quota: int):
    def _quota_fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        n_admitted = int(state.get[0]) if state.exists else 0
        out_id: list[int] = []
        out_src: list[str] = []
        out_ord: list[int] = []
        for pdf in pdfs:
            if n_admitted >= quota:
                continue  # cheap drain: state already full for this key
            # arrival order within a micro-batch = row order as
            # delivered; ties across files in one batch follow the
            # source ordering, which the test fixes via sorted writes
            for doc_id, src in zip(pdf["doc_id"], pdf["source"]):
                if n_admitted >= quota:
                    break
                out_id.append(int(doc_id))
                out_src.append(src)
                out_ord.append(n_admitted)
                n_admitted += 1
        state.update((n_admitted,))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_id, dtype="int64"),
                "source": pd.Series(out_src, dtype="object"),
                "admit_ordinal": pd.Series(out_ord, dtype="int64"),
            }
        )

    return _quota_fn


def streaming_source_quota(docs_stream: DataFrame, quota: int) -> DataFrame:
    """doc stream (doc_id, source, ...) -> admitted (doc_id, source,
    admit_ordinal) rows, first-arrived-first-admitted per source."""
    return (
        docs_stream.select("doc_id", "source")
        .groupBy("source")
        .applyInPandasWithState(
            _make_quota_fn(quota),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_streaming_quota(
    spark,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    quota: int,
    available_now: bool = True,
):
    """File-source wiring: watch a docs landing dir, emit admitted rows."""
    stream = (
        spark.readStream.schema("doc_id long, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    admitted = streaming_source_quota(stream, quota)
    writer = (
        admitted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
