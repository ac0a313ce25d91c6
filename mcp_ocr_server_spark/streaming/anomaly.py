"""Streaming volume-anomaly alerting — the streaming twin of
queries.q_events_anomaly (hourly per-type z-scores flagged at 3 sigma).

Same train-once/probe-per-micro-batch shape as streaming/decon.py: the
per-type baseline moments come from a ONE-time batch pass over history
(`train_baseline`, sharing q_events_anomaly's exact-BIGINT moment
contract), and reach the stream as literal map expressions — the
n_types-row "model" travels inside the plan, so the stream carries ZERO
anomaly state beyond the watermarked hourly count Spark already keeps
for the window aggregation.  A stream-static join would work too, but
the map literal sidesteps the join-after-aggregation restrictions of
append mode entirely and is the natural encoding for a model that is
bounded by the event-type universe, not the corpus.

Append mode: an hour's row (and its alert flag) is emitted exactly once,
when the watermark closes the window — the alerting semantics a pager
wants (no flapping partial counts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .stream_extract import EVENTS_SCHEMA


def train_baseline(events: DataFrame) -> list[dict]:
    """One batch pass over history → per-type {event_type, mean, var}.

    Moments are EXACT BIGINT aggregates (n_hours, sum_n, sum_n2 —
    accumulation-order-proof), mean/var derived from them with the
    same expression order as q_events_anomaly, so a window that both
    the batch query and the stream score gets the identical z."""
    hourly = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    mean = F.col("sum_n").cast("double") / F.col("n_hours")
    var = F.col("sum_n2").cast("double") / F.col("n_hours") - mean * mean
    rows = (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum("n").cast("long").alias("sum_n"),
            F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_n2"),
        )
        .select("event_type", mean.alias("mean"), var.alias("var"))
        .collect()
    )
    # A NULL event_type cannot be a map key (create_map throws, killing
    # the stream on every trigger — review finding); null-typed events
    # score as unknown (z=0), the same path as a brand-new type.
    return [
        {"event_type": r["event_type"], "mean": r["mean"], "var": r["var"]}
        for r in rows
        if r["event_type"] is not None
    ]


def stream_event_anomaly(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    baseline: list[dict],
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Watermarked hourly counts scored against the trained baseline.

    Unknown event types (absent from the baseline) surface with z=0 /
    is_anomaly=false rather than being dropped — an alerting stream
    must not silently swallow a brand-new event type."""
    baseline = [b for b in baseline if b["event_type"] is not None]
    mean_map = F.create_map(
        *[
            x
            for b in baseline
            for x in (F.lit(b["event_type"]), F.lit(float(b["mean"])))
        ]
    )
    var_map = F.create_map(
        *[
            x
            for b in baseline
            for x in (F.lit(b["event_type"]), F.lit(float(b["var"])))
        ]
    )
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    mean = mean_map[F.col("event_type")]
    var = var_map[F.col("event_type")]
    z = F.round(
        F.when(
            var > 1e-12, (F.col("n") - mean) / F.sqrt(var)
        ).otherwise(F.lit(0.0)),
        4,
    )
    out = agg.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n",
        z.alias("z"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    )
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
