"""pagerank (operators/pagerank.py): the exact-integer determinism
contract, structural rank sanity, and dangling-mass accounting — on
graphs big enough to exercise the distributed shape (the registry's
link_rank fixture graph is tiny; the operator's claims are tested
here)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mcp_ocr_server_spark.operators.pagerank import (
    pagerank,
    pagerank_oracle_sql,
)

UNIT = 10**9


def _edges(spark, triples, parts=None):
    df = spark.createDataFrame(
        [(str(a), str(b), int(w)) for a, b, w in triples],
        "src string, dst string, w bigint",
    )
    return df.repartition(parts) if parts else df


def _ranks(df):
    return {r["page"]: r["rank"] for r in df.collect()}


def _star_graph(n_leaves):
    # every leaf links to the hub AND to its neighbor leaf; the hub
    # links back to leaf 0 only — hub must dominate
    edges = []
    for i in range(n_leaves):
        edges.append((f"leaf{i}", "hub", 1))
        edges.append((f"leaf{i}", f"leaf{(i + 1) % n_leaves}", 1))
    edges.append(("hub", "leaf0", 1))
    return edges


def test_hub_outranks_leaves(spark):
    r = _ranks(pagerank(spark, _edges(spark, _star_graph(40))))
    hub = r["hub"]
    assert all(hub > v for k, v in r.items() if k != "hub")
    # and the hub's sole target inherits: leaf0 beats every other leaf
    assert all(
        r["leaf0"] > v for k, v in r.items() if k.startswith("leaf") and k != "leaf0"
    )


def test_deterministic_across_partitioning(spark):
    """THE contract: integer micro-unit ranks are bit-identical no
    matter how the edge table is partitioned (float PageRank is not —
    partial-aggregation sum order varies)."""
    edges = _star_graph(60) + [(f"leaf{i}", f"leaf{(i * 7) % 60}", i % 3 + 1)
                               for i in range(60)]
    a = _ranks(pagerank(spark, _edges(spark, edges, parts=1)))
    b = _ranks(pagerank(spark, _edges(spark, edges, parts=32)))
    assert a == b


def test_matches_duckdb_oracle_iteration_for_iteration(spark):
    edges = _star_graph(15) + [("hub", "sink", 2)]  # sink = dangling
    spark_r = _ranks(pagerank(spark, _edges(spark, edges), n_iters=4))
    vals = ", ".join(f"('{a}', '{b}', {w})" for a, b, w in edges)
    sql = pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS v(src, dst, w)", n_iters=4
    )
    duck_r = {
        p: r for p, r in duckdb.connect().execute(sql).fetchall()
    }
    assert spark_r == duck_r


def test_dangling_mass_redistributed_not_lost(spark):
    # two pages both linking into a pure sink: without the dangling
    # term the sink's mass would leak each sweep and totals collapse
    # toward base*N; with it, total mass stays within per-row rounding
    # (< 1 unit per node per iteration) of N * UNIT
    edges = [("a", "sink", 1), ("b", "sink", 1), ("a", "b", 1), ("b", "a", 1)]
    out = pagerank(spark, _edges(spark, edges), n_iters=5)
    total = out.agg(F.sum("rank")).collect()[0][0]
    n = out.count()
    assert abs(total - n * UNIT) <= n * 5
    # the sink soaks rank but its mass is recycled: everyone stays > base
    assert all(v > 0.15 * UNIT for v in _ranks(out).values())


def test_self_loop_and_isolated_edge_nodes(spark):
    # self-loops are legal edges (link_rank's first-href construction
    # emits them); ranks still defined for every node
    edges = [("x", "x", 3), ("x", "y", 1), ("y", "x", 1)]
    r = _ranks(pagerank(spark, _edges(spark, edges)))
    assert set(r) == {"x", "y"}
    assert r["x"] > r["y"]  # x keeps 3/4 of its own outflow


def test_update_plan_has_no_cartesian_or_python(spark):
    """The 1-row dangling-share crossJoin must plan as a broadcast,
    never a CartesianProduct; no Python stage anywhere.  The result
    itself is a checkpoint leaf, so the operator parks the
    pre-checkpoint update plan in PLAN_PROBE for exactly this check."""
    from mcp_ocr_server_spark.operators import pagerank as PR

    PR.CAPTURE_PLAN = True
    try:
        pagerank(spark, _edges(spark, _star_graph(10)), n_iters=1)
    finally:
        PR.CAPTURE_PLAN = False
    plan = PR.PLAN_PROBE["update"]
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row share join
