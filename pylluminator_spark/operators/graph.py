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
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the MINIMUM
    node id reachable from it (its component id).

    Returns (node, component). Nodes must be orderable (numeric or string);
    isolated nodes only appear if present as self-edges or in both columns.
    Raises after ``max_iter`` rounds without convergence (pathological
    diameter — raise the cap for chain-shaped graphs).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # initial label: min neighbour (including self)
    labels = (
        sym.unionByName(sym.select(F.col("a"), F.col("a").alias("b")))
        .groupBy("a")
        .agg(F.min("b").alias("lab"))
        .select(F.col("a").alias("node"), "lab")
    )
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
        new_labels = (
            labels.unionByName(nbr)
            .unionByName(jump)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            # lineage cut without requiring a checkpoint dir; keeps the
            # iterative plan bounded for the optimizer
            new_labels = new_labels.localCheckpoint(eager=True)
        new_labels = new_labels.persist()
        changed = (
            labels.select("node", F.col("lab").alias("_old"))
            .join(new_labels.select("node", F.col("lab").alias("_new")), "node")
            .filter(F.col("_old") != F.col("_new"))
            .count()
        )
        labels.unpersist() if it > 0 else None
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("lab").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_components(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicate groups from near-duplicate pairs: every document keyed by
    the minimum reachable id of its duplicate cluster. Documents with no
    duplicate partner (absent from ``pairs``) keep themselves as component
    when ``all_ids`` is given.

    The canonical-document rule downstream is then one groupBy: keep
    ``min(id)`` (or max quality score) per component.
    """
    comp = connected_components(pairs, id_a, id_b)
    comp = comp.select(F.col("node").alias(id_col), "component")
    if all_ids is not None:
        comp = (
            all_ids.select(id_col)
            .distinct()
            .join(comp, id_col, "left")
            .withColumn("component", F.coalesce("component", F.col(id_col)))
        )
    return comp
