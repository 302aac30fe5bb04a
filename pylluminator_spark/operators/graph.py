"""Distributed connected components — the clustering step of a dedup
pipeline (beyond-reference: after exact/MinHash/SimHash/embedding passes
emit near-duplicate PAIRS, components turn pairs into duplicate GROUPS so
one canonical document per group survives).

Algorithm: iterative min-label propagation with pointer-jumping
(short-cutting), the standard scheme of the published large-scale CC
literature (Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds"; Kiveris et al. "Connected Components in MapReduce and
Beyond"). Each round is a few shuffles (neighbour join + label-chain join +
groupBy-min) entirely in DataFrame ops; rounds needed = O(log(diameter)),
and near-dup graphs have tiny diameters anyway (similarity-threshold pairs
form near-cliques), so 2-4 rounds is typical.

Scale notes:
- State per round is one (node, label) table — no driver-side graph.
- Convergence check is a 1-row aggregate (sum of label changes).
- Each round re-partitions on the join key only; AQE handles skew from
  high-degree nodes (a viral duplicate) via skew-join splitting.
- `checkpoint_every` truncates the lineage so long chains don't blow the
  plan optimizer at high round counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    checkpoint_every: int = 5,
    num_partitions: int | None = None,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the MINIMUM
    node id reachable from it (its component id).

    Returns (node, component). Nodes must be orderable (numeric or string);
    isolated nodes only appear if present as self-edges or in both columns.
    Raises after ``max_iter`` rounds without convergence (pathological
    diameter — raise the cap for chain-shaped graphs).

    ``num_partitions`` sizes the per-round shuffles: the iterative state is
    (node, label) — usually orders of magnitude smaller than the corpus the
    edges came from, so running each round at the session's full shuffle
    width is pure task-scheduling overhead. Set it to roughly
    ``n_nodes / 5M`` (AQE coalescing handles the rest); at driver-default
    None the session's shuffle width is used.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    if num_partitions:
        sym = sym.repartition(num_partitions, "b")
    # persist AFTER any repartition so the exit-path unpersist() targets the
    # exact cached plan (persisting earlier would leak the cache: the
    # repartitioned frame is a different plan and unpersist would miss it).
    # Re-read EVERY round: without the cache the upstream edge pipeline
    # (which may itself be a join/similarity computation) re-executes once
    # per iteration.
    sym = sym.persist()
    # initial label: min neighbour (including self)
    labels = (
        sym.unionByName(sym.select(F.col("a"), F.col("a").alias("b")))
        .groupBy("a")
        .agg(F.min("b").alias("lab"))
        .select(F.col("a").alias("node"), "lab")
        .persist()  # consumed three times per round (nbr, jump, changed)
    )
    # Caches that are safe to drop only after the NEXT action has run
    # (unpersisting a not-yet-materialized frame would force the folded
    # round to recompute it once per consumer).
    pending = [labels]
    for it in range(max_iter):
        # propagate: each node adopts min(own, neighbours', and its label's
        # label). The third term is pointer-jumping (short-cutting): label
        # chains halve every round, giving O(log diameter) convergence even
        # on path-shaped graphs (neighbour propagation alone is O(diameter)).
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(sym["a"].alias("node"), F.col("lab"))
        )
        l1, l2 = labels.alias("l1"), labels.alias("l2")
        jump = l1.join(l2, F.col("l1.lab") == F.col("l2.node")).select(
            F.col("l1.node").alias("node"), F.col("l2.lab").alias("lab")
        )
        # Tag the node's own previous label through the union so the
        # convergence signal (did any min() beat the old label?) falls out
        # of the SAME aggregation — no separate old-vs-new join pass.
        merged = (
            labels.select("node", "lab", F.lit(True).alias("_self"))
            .unionByName(nbr.withColumn("_self", F.lit(False)))
            .unionByName(jump.withColumn("_self", F.lit(False)))
        )
        if num_partitions:
            merged = merged.repartition(num_partitions, "node")
        agg = merged.groupBy("node").agg(
            F.min("lab").alias("lab"),
            F.min(F.when(F.col("_self"), F.col("lab"))).alias("_prev"),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            # lineage cut without requiring a checkpoint dir; keeps the
            # iterative plan bounded for the optimizer
            agg = agg.localCheckpoint(eager=True)
        agg = agg.persist()
        labels = agg.select("node", "lab")
        pending.append(agg)
        # One action per round: the count both materializes this round's
        # labels (so the three consumers of the next round hit the cache —
        # deferring it would let parallel stages recompute the uncached
        # plan multiplicatively) and reads the convergence signal off the
        # same aggregation.
        changed = agg.filter(F.col("lab") < F.col("_prev")).count()
        for df in pending[:-1]:
            df.unpersist()
        pending = pending[-1:]
        if changed == 0:
            out = labels.select("node", F.col("lab").alias("component"))
            # materialize the (small) label table before dropping caches so
            # the returned plan does not depend on the unpersisted inputs
            out = out.localCheckpoint(eager=True)
            agg.unpersist()
            sym.unpersist()
            return out
    for df in pending:
        df.unpersist()
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_components(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Duplicate groups from near-duplicate pairs: every document keyed by
    the minimum reachable id of its duplicate cluster. Documents with no
    duplicate partner (absent from ``pairs``) keep themselves as component
    when ``all_ids`` is given.

    The canonical-document rule downstream is then one groupBy: keep
    ``min(id)`` (or max quality score) per component.
    """
    comp = connected_components(pairs, id_a, id_b, num_partitions=num_partitions)
    comp = comp.select(F.col("node").alias(id_col), "component")
    if all_ids is not None:
        comp = (
            all_ids.select(id_col)
            .distinct()
            .join(comp, id_col, "left")
            .withColumn("component", F.coalesce("component", F.col(id_col)))
        )
    return comp
