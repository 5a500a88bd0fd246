"""Iterative graph operators.

Connected components is the canonical follow-on to near-dup pair
generation: dedup groups ARE the components of the pair graph, and the
canonical document of a group is its minimum doc_id.

Scale posture: min-label propagation converges in O(component diameter)
rounds — near-dup clusters are shallow (a dup cluster's pair graph is
dense), so a handful of rounds suffices; each round is one join + one
aggregate, both shuffled on the node id, and the label frame is
localCheckpoint()ed to truncate lineage (without it, round k's plan
re-executes rounds 1..k-1). For adversarially long chains at 100 TB the
same loop upgrades to the large-star/small-star decomposition
(O(log n) rounds, same per-round plan shape); the loop structure,
convergence test, and checkpointing here carry over unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component label is the minimum node id reachable from the node.

    Each round: every node adopts min(own label, neighbors' labels).
    Terminates when a round changes nothing (checked with a count — one
    action per round, which is what makes the loop driver-paced; the
    per-round dataset is one row per node, NOT per edge).
    """
    # materialize the edge list once — without this, every round's join
    # AND convergence count re-executes the upstream edge computation
    # (for neardup_clusters that is the whole Jaccard pipeline per round)
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("comp", F.col("node"))
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("node").alias("b"), F.col("comp").alias("bcomp")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("bcomp").alias("nbr_min"))
            .withColumnRenamed("a", "node")
        )
        proposed = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))
                ).alias("comp"),
                F.col("comp").alias("_old"),
            )
        ).localCheckpoint()
        changed = proposed.filter(F.col("comp") != F.col("_old")).count()
        labels = proposed.drop("_old")
        if changed == 0:
            break
    return labels


def pagerank_exact(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 1_000_000,
    edges_distinct: bool = False,
) -> DataFrame:
    """Scaled-integer PageRank (damping 0.85), bit-exact across engines.

    Ranks live in integer micro-units (``scale`` = 1.0): per round,
    contribution = rank DIV out-degree, new rank = 0.15·scale +
    (85 · Σ contributions) DIV 100 — all integer arithmetic, so any
    engine (and the DuckDB oracle) reproduces the values exactly; float
    PageRank differs in the last bits across summation orders.

    Per round: one join + one aggregate, both shuffled on the node id —
    the same bounded shape as connected_components, fixed iteration
    count (the classic 100 TB posture: ranks converge to working
    precision in a handful of rounds; exactness makes runs reproducible
    and testable).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    if not edges_distinct:
        # callers that already deduped (and orient src < dst, so the
        # two union legs cannot collide) skip this full-edge shuffle
        sym = sym.distinct()
    sym = sym.localCheckpoint()
    # degree is consulted every round — materialize once and carry it
    # INSIDE the ranks frame, so each round is exactly one edge join +
    # one aggregate + one node-sized rank rebuild (no per-round deg join)
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    ranks = deg.select("a", F.lit(scale).cast("long").alias("pr"), "deg")
    base = F.lit((15 * scale) // 100).cast("long")
    for _ in range(iterations):
        contrib = (
            # per-node contribution is computed on the node-sized ranks
            # frame BEFORE touching the edge list, so the edge join
            # carries one long instead of (pr, deg)
            sym.join(ranks.select("a", F.expr("pr DIV deg").alias("c")), "a")
            .groupBy(F.col("b").alias("a"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            deg.join(contrib, "a", "left")
            .select(
                "a",
                (base + F.expr("85 * coalesce(s, 0L) DIV 100").cast("long")).alias("pr"),
                "deg",
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("a").alias("node"), "pr")
