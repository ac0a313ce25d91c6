"""event_quantiles: exact per-group percentiles (oracle surface) and
the approx_percentile scale path asserted against them."""

import pyspark.sql.functions as F

from mcp_ocr_server_spark.queries import q_event_quantiles

SF = "/root/testdata/sf0.001"


def test_quantiles_ordered_and_bounded(spark):
    rows = q_event_quantiles(spark, SF).collect()
    assert len(rows) > 1
    for r in rows:
        assert r["n_events"] > 0
        assert r["p50"] <= r["p90"] <= r["p99"]


def test_known_small_group(spark):
    """Hand-checkable fixture: percentile(0.5) of [1,2,3,4] is the
    rank-1.5 interpolation = 2.5."""
    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 4)], "g string, v double"
    )
    out = df.groupBy("g").agg(
        F.expr("percentile(v, 0.5D)").alias("p50"),
        F.expr("percentile(v, 0.25D)").alias("p25"),
    ).collect()[0]
    assert out["p50"] == 2.5
    assert out["p25"] == 1.75  # rank 0.75 between 1 and 2


def test_approx_scale_path_within_rank_bound(spark):
    """The documented 100 TB swap: approx_percentile returns a MEMBER
    value whose rank must be within n/accuracy (+1 for the discrete
    step — GK returns a data point, exact percentile interpolates
    between two) of the target rank p*n."""
    acc = 1000
    p = 0.9
    from mcp_ocr_server_spark.queries import _t

    ev = _t(spark, SF, "events")
    got = ev.groupBy("event_type").agg(
        F.expr(f"approx_percentile(value, {p}D, {acc})").alias("ap"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    assert got
    stats = {r["event_type"]: r for r in got}
    # the returned value may be duplicated in the group, so it owns a
    # RANK INTERVAL [count(value < ap) + 1, count(value <= ap)]; GK's
    # guarantee holds if ANY rank in that interval is close enough
    ranks = ev.groupBy("event_type").agg(
        *[
            f
            for t in stats
            for f in (
                F.sum(
                    (F.col("value") < F.lit(stats[t]["ap"])).cast("long")
                ).alias(f"{t}_lo"),
                F.sum(
                    (F.col("value") <= F.lit(stats[t]["ap"])).cast("long")
                ).alias(f"{t}_hi"),
            )
        ]
    ).collect()
    for r in ranks:
        t = r["event_type"]
        s = stats[t]
        target = p * s["n"]
        lo, hi = r[f"{t}_lo"] + 1, r[f"{t}_hi"]
        dist = max(lo - target, target - hi, 0)
        assert dist <= s["n"] / acc + 1, (t, lo, hi, s)


def test_cardinality_hll_scale_path_within_rsd(spark):
    """The documented HLL swap for event_cardinality: approx_count_
    distinct at rsd must land within ~3*rsd of the exact distinct
    (HLL++ error is approximately Gaussian with sd = rsd)."""
    rsd = 0.02
    from mcp_ocr_server_spark.queries import _t, q_event_cardinality

    exact = {
        r["event_type"]: r["n_users"]
        for r in q_event_cardinality(spark, SF).collect()
    }
    approx = (
        _t(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd).alias("a"))
        .collect()
    )
    assert approx
    for r in approx:
        e = exact[r["event_type"]]
        assert abs(r["a"] - e) <= max(3 * rsd * e, 1), (r, e)


def test_cardinality_plan_has_expand_and_hll_does_not(spark):
    """The docstring's plan claim, machine-checked: exact multi-column
    distinct inserts an Expand; the HLL form does not."""
    from mcp_ocr_server_spark.queries import _t, q_event_cardinality

    exact_plan = q_event_cardinality(
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan
    hll_plan = (
        _t(spark, SF, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("u"),
            F.approx_count_distinct(F.to_date("ts"), 0.02).alias("d"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in hll_plan
