"""Streaming canonical-URL admission — url_dedup's streaming twin: as
crawled docs arrive continuously, admit only the FIRST doc per
canonical URL to the rest of the pipeline (the ingestion-side gate a
crawler runs before any content work, same position url_dedup holds in
batch).

Shares the EXACT canonicalization rules with the batch query
(queries.url_canonical — the factoring promised in its docstring) and
the stateful_dedup operator shape: `applyInPandasWithState`, state
sharded by a 2-hex md5 prefix (256 shards, partitioned exactly like a
shuffle), per-shard state = the set of admitted canonical-URL md5s as
32-hex-char strings (fixed 32 bytes per entry, never the URL itself —
state width is bounded no matter how long URLs get; storing unhex'd
16-byte binary would halve it again at the cost of a binary state
column).

Equivalence contract (the quota twin's): the batch query keeps the
min-doc_id row per canonical URL, the stream keeps the FIRST-ARRIVED
row — set-of-admitted-URLs and one-admission-per-URL parity are pinned
by test; keeper identity coincides only when arrival order is doc_id
order (micro-batch shuffling does not guarantee intra-shard order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from .stateful_dedup import make_first_seen_fn

OUTPUT_SCHEMA = "canonical_url string, doc_id long, admit_ordinal long"
STATE_SCHEMA = "seen array<string>, n_admitted long"


# ONE shared state-function body with the content-hash dedup operator
# (stateful_dedup.make_first_seen_fn) — the two first-seen loops were
# verbatim copies that could drift (review finding)
_admit_fn = make_first_seen_fn("h", ["canonical_url", "doc_id"])


def _admit_first_seen(canon: DataFrame) -> DataFrame:
    """Shared tail of every admission variant: md5-shard the canonical
    URL into 256 state partitions and run the first-seen operator.
    ONE copy — a change to shard width, state schema, or timeout must
    hit the plain and robots-gated paths together (review finding:
    the two tails were verbatim copies that could drift, the same
    class the _admit_fn factoring already fixed once)."""
    return (
        canon.withColumn("h", F.md5("canonical_url"))
        .withColumn("shard", F.substring("h", 1, 2))
        .groupBy("shard")
        .applyInPandasWithState(
            _admit_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_url_admission(
    docs_stream: DataFrame, url_col: str = "url"
) -> DataFrame:
    """(doc_id, url) stream → first-admitted (canonical_url, doc_id)."""
    from ..queries import url_canonical

    return _admit_first_seen(
        docs_stream.select(
            "doc_id", url_canonical(url_col).alias("canonical_url")
        )
    )


def streaming_robots_admission(
    docs_stream: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Robots-gated first-arrival admission — the full crawl-ingest
    gate: the stateless RFC 9309 verdict (queries.robots_verdict,
    shared VERBATIM with the batch q_url_robots — a row-local array
    fold over a broadcast stream-static rules join, legal in append
    mode because it aggregates nothing) drops disallowed URLs BEFORE
    the stateful canonical-URL dedup, so a disallowed URL never
    consumes admission state; the surviving stream then goes through
    the same sharded first-seen operator as streaming_url_admission
    (host/path extraction shared via queries.host_path_of)."""
    from ..queries import host_path_of, robots_verdict, url_canonical

    canon = docs_stream.select(
        "doc_id", url_canonical(url_col).alias("canonical_url")
    )
    host, path = host_path_of("canonical_url")
    urls = canon.select(
        "doc_id", "canonical_url",
        host.alias("host"), path.alias("path"),
    )
    return _admit_first_seen(
        robots_verdict(urls)
        .filter(F.col("allowed"))
        .select("doc_id", "canonical_url")
    )


def _run_admission(
    spark,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    admit,
    available_now: bool = True,
):
    """File-source wiring shared by both admission runners: watch a
    crawled-docs landing dir carrying a raw `url` column, emit
    first-admitted rows."""
    stream = (
        spark.readStream.schema("doc_id long, source string, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    writer = (
        admit(stream).writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_streaming_url_admission(
    spark, docs_dir, out_dir, checkpoint_dir, available_now=True
):
    return _run_admission(
        spark, docs_dir, out_dir, checkpoint_dir,
        streaming_url_admission, available_now,
    )


def run_streaming_robots_admission(
    spark, docs_dir, out_dir, checkpoint_dir, available_now=True
):
    return _run_admission(
        spark, docs_dir, out_dir, checkpoint_dir,
        streaming_robots_admission, available_now,
    )


def streaming_frontier_admission(
    urls_stream: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """q_frontier_admission's streaming twin with PARSED robots rules
    (functions/robots.py output) instead of the planted-bucket store:
    discovered URLs (sitemap entries, redirect targets, page links)
    arrive in micro-batches, join the host-keyed rules table
    (stream-static broadcast — the rules side is one KB-sized array
    per HOST, refreshed out of band at production scale), the RFC 9309
    verdict is the same row-local rlike/longest-pattern fold as batch
    (aggregates nothing, legal in append mode), and survivors flow
    through the shared 256-shard first-seen operator so each canonical
    URL is admitted exactly once ACROSS batches.

    `rules` schema: (host string, rules array<struct<row_idx, pattern,
    regex, allow>>) — exactly what q_frontier_admission builds.  The
    verdict expression is functions/robots.admission_fold, shared
    VERBATIM with the batch composition."""
    from ..functions.robots import admission_fold
    from ..queries import host_path_of, url_canonical

    canon = urls_stream.select(
        "doc_id", url_canonical(url_col).alias("canonical_url")
    )
    host, path = host_path_of("canonical_url")
    urls = canon.select(
        "doc_id", "canonical_url",
        host.alias("host"), path.alias("path"),
    )
    gated = (
        urls.join(F.broadcast(rules), "host", "left")
        .withColumn("w", admission_fold())
        .filter(F.coalesce(F.col("w.allow"), F.lit(True)))
        .select("doc_id", "canonical_url")
    )
    return _admit_first_seen(gated)
