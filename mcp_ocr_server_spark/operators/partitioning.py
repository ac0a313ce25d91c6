"""Skew-aware partitioning for the media OCR stage (north_rule).

The skew problem: document-granularity parallelism puts a 12-image
scanned PDF and a 1-span text doc in the same-size work units (the
reference has the identical problem — one goroutine per *image*, not
per request, was its answer: handler.go:192-230).  Our answer has three
layers, applied in plans/pipeline.py:

1. **Explode to image granularity.**  `posexplode(spans)` makes the
   work unit one image, not one document — a media-heavy doc becomes
   many independent rows.
2. **Dedup to distinct content.**  `dropDuplicates(content_hash)`
   collapses byte-identical images (hot keys) to one compute each; the
   result re-joins to every referencing span.  This is both the
   memoization (cache.go:188-198) and the hot-key de-skew.
3. **Uniform redistribution.**  sha256 content hashes are uniformly
   distributed, so `repartition(n, salted_hash)` gives near-perfect
   row balance with no hot partition; n is sized from a byte-cost
   hint so each partition carries a bounded volume of media bytes.

At cluster scale the cost hint comes from table metadata (Iceberg
tracks file/column sizes — no data scan needed); locally we default to
a multiple of the scheduler's parallelism and let AQE coalesce.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# target media bytes per task at scale: small enough that a partition of
# encoded images + decoded arrays fits executor memory comfortably
TARGET_BYTES_PER_PARTITION = 64 * 1024 * 1024


def n_partitions_for_cost(
    spark,
    total_cost_bytes: int | None,
    min_parts: int | None = None,
    max_parts: int = 100_000,
) -> int:
    # Floor = 4x parallelism, not 1x: per-image cost is heavy-tailed
    # (NL-means runs only on low-sharpness pages, 10-30x the cost of a
    # clean page), so core-count-sized partitions leave straggler tasks
    # holding several heavy images.  Finer work units let the scheduler
    # rebalance; measured 9.0 s -> 7.0 s on the sf0.1 extraction at
    # local[32] (128 partitions), with task overhead negligible against
    # per-image compute.  The byte-cost term still dominates at scale.
    base = spark.sparkContext.defaultParallelism
    min_parts = min_parts or base * 4
    if total_cost_bytes is None:
        return min_parts
    return max(min_parts, min(max_parts, math.ceil(total_cost_bytes / TARGET_BYTES_PER_PARTITION)))


def repartition_media(
    df: DataFrame,
    key: str = "content_hash",
    total_cost_bytes: int | None = None,
    salt: int = 0,
) -> DataFrame:
    """Redistribute distinct media work units uniformly.

    `xxhash64(key, salt)` re-keys the (already uniform) content hash so
    repeated runs with different salts land differently — useful when a
    straggler analysis wants a different placement without changing n.
    """
    spark = df.sparkSession
    n = n_partitions_for_cost(spark, total_cost_bytes)
    return df.repartition(n, F.xxhash64(F.col(key), F.lit(salt)))
