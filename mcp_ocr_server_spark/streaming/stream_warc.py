"""Streaming crawl ingestion — warc_main_content's streaming twin,
fused with cross-batch canonical-URL admission.

The batch composition (queries.q_warc_main_content) assumes the whole
crawl is on disk; a live crawler DELIVERS archives continuously and
needs the same three steps as each lands, with the dedup state
surviving across micro-batches:

  archive bytes ── row-local 1:N fan-out ──────────────┐
  (WARC parse + HTTP split + charset-resolved decode   │ stateless:
   + DOM boilerplate strip — functions/warc.py,        │ the batch
   SAME code, mapInPandas works unchanged on a         │ mapInPandas
   streaming DataFrame)                                │ stage reused
                                                       ▼
  canonicalize url (queries.url_canonical, shared) ── md5 ── 256-shard
  first-seen admission (stateful_dedup.make_first_seen_fn — the ONE
  first-seen operator every streaming gate in this repo runs)

Only the FIRST page per canonical URL survives — the crawl corpus
carries real cross-archive duplicates (every site serves the same
/legacy/* paths), so the gate does real work in the equivalence test.

Equivalence contract (the url_admission twin's): admitted canonical-
URL set == the batch distinct set; exactly one admission per URL;
keeper IDENTITY may differ from batch min-keeper when arrival order
differs — pinned by test_streaming.

Scale shape: the fan-out is row-local (archives are the scan unit,
payload bytes never leave the task); the only shuffle is the 256-way
state sharding on a 2-hex md5 prefix — fixed width regardless of URL
length, bounded state per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from .stateful_dedup import make_first_seen_fn

OUT_FIELDS = ["canonical_url", "warc_ref", "rec_idx", "url",
              "main_text", "n_chars", "charset", "charset_source"]
OUTPUT_SCHEMA = (
    "canonical_url string, warc_ref string, rec_idx int, url string,"
    " main_text string, n_chars long, charset string,"
    " charset_source string, admit_ordinal long"
)
STATE_SCHEMA = "seen array<string>, n_admitted long"

_admit_fn = make_first_seen_fn("h", OUT_FIELDS)


def streaming_warc_admitted(archives: DataFrame) -> DataFrame:
    """(warc_ref, bytes) stream -> first-admitted main-content rows
    per canonical URL."""
    from ..functions.warc import warc_main_content
    from ..queries import url_canonical

    rows = warc_main_content(archives).filter(
        F.col("error").isNull() & (F.col("main_text") != "")
    )
    canon = (
        rows.withColumn("canonical_url", url_canonical("url"))
        .withColumn("h", F.md5("canonical_url"))
        .withColumn("shard", F.substring("h", 1, 2))
    )
    return canon.groupBy("shard").applyInPandasWithState(
        _admit_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_warc_main(
    spark,
    warc_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source wiring: watch a WARC landing dir (one parquet row
    per archive: warc_ref, bytes), emit first-admitted main-content
    rows to parquet."""
    stream = (
        spark.readStream.schema("warc_ref string, bytes binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(warc_dir)
    )
    writer = (
        streaming_warc_admitted(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
