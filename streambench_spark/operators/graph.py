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


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected graph given as
    distinct (src, dst) edges with src < dst.

    Enumeration uses the degree-ordered orientation (each undirected
    edge points from its lower-(degree, id) endpoint): every wedge
    (u→v, u→w) then closes into a triangle at most once, and — the scale
    property — the wedge join fans out per node by its ORIENTED
    out-degree, which is O(sqrt(|E|)) even for celebrity nodes
    (Schank & Wagner 2005), instead of the raw degree's quadratic blowup.
    The triangle SET is orientation-independent, so a plain id-ordered
    enumeration (the correctness oracle) yields identical counts.

    Shape: degree aggregate → two hash joins to stamp endpoint degrees →
    wedge self-join on the middle node → closing-edge semi-equi-join →
    per-corner explode + count. Every join is an equi-join on a node id;
    nothing is broadcast (the degree frame is node-cardinality).
    """
    deg = (
        edges.select(F.col("src").alias("n"))
        .unionAll(edges.select(F.col("dst").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    stamped = (
        edges.join(deg.select(F.col("n").alias("src"), F.col("deg").alias("ds")), "src")
        .join(deg.select(F.col("n").alias("dst"), F.col("deg").alias("dd")), "dst")
    )
    oriented = stamped.select(
        F.when(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))),
            F.struct(F.col("src").alias("u"), F.col("dst").alias("v")),
        )
        .otherwise(F.struct(F.col("dst").alias("u"), F.col("src").alias("v")))
        .alias("e")
    ).select("e.u", "e.v")
    # wedges u→v, u→w with v "before" w in the same orientation order;
    # the closing edge v→w must then also be oriented v→w.
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    wedges = o1.join(o2, F.expr("o1.u = o2.u AND o1.v <> o2.v")).select(
        F.col("o1.u").alias("a"), F.col("o1.v").alias("b"), F.col("o2.v").alias("c")
    )
    closing = oriented.select(
        F.col("u").alias("b"), F.col("v").alias("c")
    )
    tris = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    corners = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
