"""As-of (backward, inclusive) join — an operator Spark SQL lacks.

For each left row, attach the value columns of the LATEST right row of
the same key whose timestamp is <= the left row's timestamp.  The
classic formulations both fail at scale:

- range join (``l.key = r.key AND r.ts <= l.ts`` + max-per-row):
  Catalyst plans a per-key candidate EXPLOSION (every left row matches
  every earlier right row before the max prunes) — quadratic per key;
- per-key ``applyInPandas`` merge: a Python round-trip plus one pandas
  merge_asof per group, Arrow overhead on every row.

This implementation is the UNION-TAG pattern: tag right rows kind=0 /
left rows kind=1, union them, and take a cumulative
``last(value, ignorenulls=True)`` over a window partitioned by key and
ordered by (ts, kind).  Each left row then carries the most recent
right values at-or-before its timestamp, right rows are filtered out.

Cost: ONE shuffle of |left| + |right| rows on the join key plus a
per-partition sort — the same plan class as any window aggregate, with
whole-stage-codegen'd JVM execution and no Python in the path.  Skew
follows the key distribution (a hot key sorts its own rows only, never
the corpus); AQE's skew-join handling does not apply to windows, so a
pathological single-key stream should pre-bucket by time range.

Semantics notes:
- kind=0 sorts before kind=1, so a right row at EXACTLY the left
  timestamp is matched (inclusive, DuckDB ``ASOF JOIN ... >=``).
- The right side must be unique per (key, ts): with duplicates the
  within-window order of equal (key, ts, kind) rows is not defined, so
  the attached values would be nondeterministic.  Callers dedup first
  (e.g. ``max_by`` a tiebreak column); this is asserted cheaply only
  at test time, never with a runtime count job.
- Left rows with NULL timestamps get NULL values (they sort first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward-inclusive as-of join.

    ``right`` must contain ``on + [right_ts] + value_cols`` with the
    SAME key column names as ``left`` (rename before calling), and be
    unique per (on, right_ts).  Returns ``left``'s columns plus
    ``value_cols`` (NULL where no right row is at-or-before)."""
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    l = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__kind", F.lit(1)
    )
    for v in value_cols:
        l = l.withColumn(v, F.lit(None).cast(rtypes[v]))
    r = right.withColumn("__ts", F.col(right_ts)).withColumn(
        "__kind", F.lit(0)
    )
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(ltypes[c]))
    u = l.select(*l.columns).unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in value_cols:
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return u.filter(F.col("__kind") == 1).drop("__ts", "__kind")
