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
- The right row's value columns are carried as ONE STRUCT through the
  cumulative fill, so the matched row is attached ATOMICALLY: a NULL
  value inside the latest right row stays NULL, exactly like the
  DuckDB ASOF JOIN.  (The original per-column
  ``last(v, ignorenulls=True)`` silently mixed columns across right
  rows — a NULL in the matched row was replaced by a stale value from
  an older row; round-4 review finding.)
- Right rows with NULL ``right_ts`` are dropped: a row with no
  position in time cannot be "at or before" anything (they previously
  sorted first and leaked their values into match-less left rows).
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
    struct_ddl = (
        "struct<" + ",".join(f"{v}:{rtypes[v]}" for v in value_cols) + ">"
    )
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__kind", F.lit(1))
        .withColumn("__vals", F.lit(None).cast(struct_ddl))
    )
    r = (
        right.filter(F.col(right_ts).isNotNull())
        .withColumn("__ts", F.col(right_ts))
        .withColumn("__kind", F.lit(0))
        .withColumn("__vals", F.struct(*value_cols))
    )
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(ltypes[c]))
    cols = list(left.columns) + ["__ts", "__kind", "__vals"]
    u = l.select(*cols).unionByName(r.select(*cols))
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__vals", F.last("__vals", ignorenulls=True).over(w))
    out = u.filter(F.col("__kind") == 1)
    for v in value_cols:
        out = out.withColumn(v, F.col("__vals")[v])
    return out.drop("__ts", "__kind", "__vals")


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window_us: int,
) -> DataFrame:
    """Range join — right rows inside ``[left_ts, left_ts + window)``
    of the same key — WITHOUT the inequality-join explosion.

    Catalyst plans a bare ``l.key = r.key AND r.ts BETWEEN ...`` as an
    equi-join on key followed by a post-filter: every left row meets
    every right row of its key first (quadratic per key — a hot user's
    task explodes).  The scalable shape buckets time into window-width
    epochs: a right row in ``[t0, t0 + W)`` lives in t0's bucket or the
    next one, so each left row is exploded into exactly TWO (key,
    bucket) join keys, the join is a plain equi-join on (key, bucket)
    — shuffle-partitioned, AQE-skew-splittable — and the exact interval
    predicate filters the at-most-2x candidates.  Candidate count is
    bounded by rows per (key, window-width slot), not rows per key.

    Timestamps compare as integer MICROSECONDS (``unix_micros``) on
    both sides: exact, timezone-free, no interval arithmetic to
    diverge between engines.  Each matching pair appears exactly once
    (a right row has ONE bucket; the left row's two exploded buckets
    are distinct).  Inner join: unmatched left rows are the caller's
    left-join-after-aggregate concern.  Column names must not collide
    across sides (rename before calling); `__b` is reserved for the
    internal bucket key on both sides (enforced)."""
    for side, df in (("left", left), ("right", right)):
        if "__b" in df.columns:
            raise ValueError(
                f"{side} input already has a '__b' column — reserved "
                "for the internal bucket key; rename it before calling"
            )
    # cast handles TIMESTAMP_NTZ inputs (unix_micros needs LTZ); the
    # session pins UTC, and a range predicate is shift-invariant anyway
    # (both sides map through the same monotonic cast)
    lu = f"unix_micros(cast({left_ts} as timestamp))"
    ru = f"unix_micros(cast({right_ts} as timestamp))"
    l = left.withColumn(
        "__b",
        F.explode(
            F.array(
                F.expr(f"{lu} div {window_us}"),
                F.expr(f"{lu} div {window_us} + 1"),
            )
        ),
    )
    r = right.withColumn("__b", F.expr(f"{ru} div {window_us}"))
    rus = F.expr(ru)
    lus = F.expr(lu)
    return (
        l.join(r, on + ["__b"])
        .filter((rus >= lus) & (rus < lus + F.lit(window_us)))
        .drop("__b")
    )
