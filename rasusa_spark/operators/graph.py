"""Distributed connected components over a pair table — the clustering
step of near-duplicate deduplication (pairs from minhash/simhash/jaccard
→ duplicate clusters → one canonical doc per cluster).

Algorithm: iterative min-label propagation with pointer doubling
(label(x) ← min(label(x), min_{(x,y)∈E} label(y), label(label(x)))).
Plain propagation needs O(diameter) rounds; the label(label(x)) shortcut
(pointer jumping, Shiloach-Vishkin style) cuts that to O(log diameter).
Every round is two shuffle joins on bounded-width rows — no collect of
edges, no driver-side graph. Convergence is checked with one count per
round (dup clusters are shallow: near-dup graphs converge in 2-4 rounds).

Scale notes (100 TB): the state is one (node, label) row per doc — skinny
even at 10^12 docs; edges are re-joined each round from their own shuffle
partitioning, so the cost per round is edges + state, not edges². The label
state is ``localCheckpoint``-ed every round: each round's plan references
the previous state THREE times (neighbor-min, self, pointer hop), so
without lineage truncation the analyzed plan grows 3× per round —
measured as a driver OOM in AQE's plan-string rendering by round ~7.
``persist`` alone does NOT cut the logical plan; checkpointing is the
same pattern GraphFrames uses for its iterative algorithms. Old round
states are dropped by reference and reclaimed by the ContextCleaner.

Reference: rasusa has no graph op; this extends its dedup story
(SURVEY §2 LLM-pipeline additions). Public algorithm: Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SoCC'14) motivates the
alternating-star/shortcut family; we use the simpler label+shortcut
variant because dedup components are tiny and shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Component label per node: ``(node, component)`` where ``component``
    is the minimum node id reachable from ``node`` (any orderable id type).
    Input is an undirected pair table; both orientations are derived here.

    Deterministic, partition-layout-invariant: labels depend only on the
    edge set. Raises if ``max_iter`` rounds don't converge (a dedup pair
    graph that deep signals an upstream bug, not a tuning problem).

    The returned frame is backed by the final localCheckpoint-ed label
    state (one skinny row per node, already materialized); intermediate
    round states are reclaimed by the ContextCleaner once dereferenced."""
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # seed labels with the FIRST propagation step fused into the node
    # derivation: label(x) = min(x, min neighbor) — the same shuffle a
    # plain distinct would pay, one round's head start for free (the
    # fixpoint is unchanged: this is exactly one neighbor-min step from
    # the identity labeling)
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("_nb"))
        .select("node", F.least(F.col("node"), F.col("_nb")).alias("label"))
        .localCheckpoint(eager=True)
    )

    for round_no in range(1, max_iter + 1):
        nb_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("_nb"))
        )
        # the pre-round label rides along as _old so convergence needs no
        # extra new-vs-old join (one fewer shuffle join per round)
        stepped = (
            labels.join(nb_min, labels.node == nb_min.src, "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(F.col("label"), F.coalesce("_nb", "label")).alias("label"),
            )
        )
        # pointer doubling: label ← min(label, label(label))
        hop = labels.select(F.col("node").alias("_ln"), F.col("label").alias("_ll"))
        new_labels = (
            stepped.join(hop, stepped.label == hop._ln, "left")
            .select(
                "node",
                (
                    F.least(F.col("label"), F.coalesce("_ll", "label"))
                ).alias("label"),
                F.col("_old"),
            )
            # truncate lineage EVERY round; lazy so the convergence count
            # below is the single materializing action of the round
            .localCheckpoint(eager=False)
        )
        changed = new_labels.where(F.col("label") != F.col("_old")).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            if stats is not None:
                stats["rounds"] = round_no
            return labels.select(F.col("node"), F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
