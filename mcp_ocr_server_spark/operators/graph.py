"""Distributed connected components over a pair/edge table.

The dedup family produces near-duplicate PAIRS (simhash / minhash /
jaccard); an actual pipeline must then resolve pairs into CLUSTERS and
pick one canonical survivor per cluster — transitively: if A~B and B~C,
all three are one duplicate group even when A~C was never emitted.
That resolution is a connected-components computation on the pair
graph.

Algorithm: iterative min-label propagation with POINTER JUMPING
(label(x) <- label(label(x)) each round), the classic
O(log diameter)-round PRAM scheme (Shiloach & Vishkin 1982) expressed
as DataFrame joins — the same round complexity class as the
large-star/small-star MapReduce formulation (Kiveris et al., SoCC'14)
but with a fixed two-join round body:

  round := one edges⋈labels join + min-aggregate (shuffle on node id)
           + one labels⋈labels pointer-jump join
  rounds := O(log d), d = graph diameter

Scale notes (100 TB / 1e9 docs):
- The label table is (id, label) — two BIGINTs per doc, ~16 GB at 1e9
  rows, comfortably shuffle-able; the edge table is the NEAR-DUP PAIR
  set, orders of magnitude smaller than the corpus.
- Near-dup components are small and dense (boilerplate clusters,
  mirrored pages), so d is tiny and the loop converges in a handful of
  rounds; pointer jumping bounds even adversarial long chains at
  log2(d) rounds rather than d.
- Each round carries TWO lazy ``localCheckpoint``s (``stepped`` and
  the round result ``jumped``), both materialized by the round's one
  convergence aggregate: the round body references the label table
  three times (neighbor join, least-fold, pointer-jump self-join) and
  ``stepped`` twice (probe + parent side of the jump), so without
  lineage truncation the logical plan grows ~3x per round —
  exponential, and it OOMs the driver on plan *analysis* long before
  any data is large (measured: Java heap exhausted inside
  ``explainString`` at sf0.001) — and the neighbor-join subtree would
  re-run once per extra reference (measured 2x per round).
  ``persist`` caches data but NOT the plan; ``localCheckpoint`` cuts
  the plan to a leaf.
  Prior rounds' checkpoint storage is reclaimed by the ContextCleaner
  once unreferenced.  On a real cluster with executor loss in scope,
  swap for reliable ``checkpoint()`` into the cluster checkpoint dir —
  same call shape, durable storage.
- Convergence detection is a single sum(label) aggregate, NOT a
  changed-row join: labels only ever decrease (min-propagation keeps
  the invariant label(x) <= x), so the BIGINT sum strictly decreases
  until the fixpoint and is an exact, overflow-safe (1e9 docs * 1e9
  max id = 1e18 < 2^63) convergence metric costing one map-side-combined
  aggregate per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class ConvergenceError(RuntimeError):
    """Label propagation failed to reach a fixpoint within max_iters."""


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 50
) -> DataFrame:
    """Resolve ``edges`` (columns ``src``, ``dst``, undirected) over
    ``nodes`` (column ``id``) into components.

    Returns a materialized (locally-checkpointed) DataFrame
    ``(id, label)`` where ``label`` is the minimum node id of the
    component.  Its storage is reclaimed by the ContextCleaner when the
    handle is dropped (the registry query parks it in the module cache
    released by ``clear_caches``).

    ``max_iters`` bounds rounds; with pointer jumping the requirement
    is ~log2(diameter) + 2, so 50 covers any graph that fits on disk.
    A non-converged loop raises :class:`ConvergenceError` rather than
    returning partial labels.
    """
    # Persist the edge table BEFORE symmetrizing: the union's two
    # branches are two plan references to the pair-mining subtree, and
    # without the persist each branch recomputes it (measured: the
    # 20-table Manku join ran twice inside sym.count()).  persist, not
    # localCheckpoint: the BlockManager dedupes the two branches'
    # computation identically and the copy is explicitly releasable
    # once sym holds the symmetrized rows.
    e = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).persist()
    sym = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    sym.count()  # materialize ONCE — the loop must not recompute the
    # (potentially expensive) pair-mining subtree every round
    e.unpersist()  # sym now holds both directions; drop the staging copy
    labels = nodes.select(
        F.col("id"), F.col("id").alias("label")
    ).localCheckpoint(eager=False)  # lazy: next line materializes
    prev_sum = labels.agg(F.sum("label")).collect()[0][0] or 0
    converged = False
    for _ in range(max_iters):
        nbr = (
            sym.join(labels, sym["b"] == labels["id"])
            .select(sym["a"].alias("id"), labels["label"].alias("lbl"))
            .groupBy("id")
            .agg(F.min("lbl").alias("nbr_min"))
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id",
            F.least(
                F.col("label"), F.coalesce("nbr_min", "label")
            ).alias("label"),
            # checkpoint: the pointer-jump below references `stepped`
            # twice (probe side and parent side); without truncation
            # the neighbor join + min-aggregate subtree runs twice per
            # round.  Lazy — materialized by the convergence aggregate.
        ).localCheckpoint(eager=False)
        # pointer jump: every label value is itself a node id (labels
        # start as ids and only min-fold over other labels), so
        # label(label(x)) is total; the left join + coalesce is
        # defensive only.
        parent = stepped.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        jumped = (
            stepped.join(parent, stepped["label"] == parent["pid"], "left")
            .select(
                stepped["id"],
                F.coalesce(parent["plabel"], stepped["label"]).alias("label"),
            )
            # truncate lineage — see module docstring; exponential plan
            # growth otherwise.  Lazy: the convergence aggregate below
            # is the first action and materializes the checkpoint, so
            # each round costs one fewer Spark job than eager would.
            .localCheckpoint(eager=False)
        )
        cur_sum = jumped.agg(F.sum("label")).collect()[0][0] or 0
        labels = jumped
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    sym.unpersist()
    if not converged:
        raise ConvergenceError(
            f"connected_components: no fixpoint after {max_iters} rounds"
        )
    return labels
