"""Stateful streaming conversion funnel — the streaming twin of
q_event_funnel (view -> click -> purchase with strict temporal
ordering), the second custom stateful operator next to
streaming/stateful_dedup.py and a different state SHAPE: dedup state
is an unbounded-ish seen-set per shard; funnel state is a FIXED
24 bytes per user (three first-conversion timestamps), the smallest
state a sequential-pattern matcher can carry.

Implemented with `applyInPandasWithState`, keyed by user_id:

- per-user state = (t_view, t_click, t_purchase) epoch-micros of the
  first ORDERED conversions, -1 until reached;
- each micro-batch sorts the user's new events by timestamp and folds
  them through the transition rules (a step-k event converts only
  STRICTLY AFTER the user's first step-(k-1) conversion — the batch
  query's exact semantics);
- a row (user_id, step, ts_micros) is emitted the moment a step first
  completes, so downstream sees conversions as they happen; counts per
  step equal the batch funnel's n_users.

Equivalence contract (same class as sessionize_stream's documented
session_end note): stream == batch when events arrive in timestamp
order ACROSS micro-batches (within a batch any order is fine — the
operator sorts).  A cross-batch straggler older than an already-taken
conversion can flip a strict-> comparison the batch query (which sees
all history at once) would have resolved differently; production
streams bound that with a watermark + per-user buffer, which this
operator deliberately omits to keep state at three longs.

State scale: 24 bytes x distinct users, hash-sharded across executors
by the state store exactly like a shuffle; no timeout is registered
because a funnel's firsts are permanent facts, not expiring sessions.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, step int, ts_micros long"
STATE_SCHEMA = "t_view long, t_click long, t_purchase long"

_STEP_OF = {"view": 1, "click": 2, "purchase": 3}


def _funnel_fn(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    t = list(state.get) if state.exists else [-1, -1, -1]
    events: list[tuple[int, str]] = []
    for pdf in pdfs:
        events.extend(zip(pdf["ts_micros"], pdf["event_type"]))
    events.sort(key=lambda e: e[0])  # strict-> rules need time order
    out_step: list[int] = []
    out_ts: list[int] = []
    for ts, etype in events:
        step = _STEP_OF.get(etype)
        if step is None:
            continue
        i = step - 1
        if t[i] != -1:
            continue  # first conversion is permanent
        if i > 0 and (t[i - 1] == -1 or ts <= t[i - 1]):
            continue  # previous step not yet converted strictly before
        t[i] = int(ts)
        out_step.append(step)
        out_ts.append(int(ts))
    state.update(tuple(t))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(out_step),
            "step": out_step,
            "ts_micros": out_ts,
        }
    )


def funnel_stream(events_stream: DataFrame) -> DataFrame:
    """events stream -> append-mode (user_id, step, ts_micros) rows,
    one per user per step, emitted at first conversion."""
    # the null-ts filter matches the batch twin (min/> comparisons drop
    # null ts silently) — without it a null becomes NaN in the Arrow
    # batch and int(NaN) would poison the checkpoint permanently
    prepared = events_stream.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_micros"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_funnel(
    spark,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """File-source wiring: watch an events landing dir, emit conversion
    rows.  `ts` is read as timestamp_ntz to match the batch corpus
    (the shared EVENTS_SCHEMA, one definition for all events twins);
    session timezone is pinned UTC by session.py, so unix_micros is
    deterministic."""
    from .stream_extract import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    conv = funnel_stream(stream)
    writer = (
        conv.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
