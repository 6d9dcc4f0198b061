"""Iterative graph operators over pair/edge frames.

PageRank here ranks documents by their position in the NEAR-DUP graph
(nodes = vectors/docs, edges = near-duplicate pairs): a high-rank node
sits at the center of a duplication cluster — the canonical-pick /
crawl-importance signal a curation pipeline propagates before choosing
which copy of a duplicated page to keep (the same role link-graph
PageRank plays in crawl-frontier weighting).

Classic power iteration (Brin & Page 1998) on DataFrames: each round is
one (dst-keyed) aggregation of contributions plus the damping/dangling
correction — (long, double) rows only, localCheckpoint'd per round like
connected_components so lineage stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "id",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """PageRank over an UNDIRECTED pair graph. Returns (id, rank, degree).

    Semantics: edges run both ways; isolated nodes (degree 0) are
    dangling — their mass redistributes uniformly each round, so ranks
    sum to 1 exactly (the gate checks this). Deterministic: no RNG, no
    data-dependent iteration count.

    Scale shape: the edge frame is materialized ONCE with per-source
    degrees attached (|E| rows of three longs); every iteration is one
    broadcast-or-hash join of ranks onto edges + one dst-keyed agg with
    map-side partials + a one-row dangling-mass aggregate folded in as a
    literal-free broadcast — (long, double) tuples move, never payloads.
    localCheckpoint per round keeps the plan flat (the CC lesson:
    persist alone nests each round's join+agg and Catalyst analysis
    explodes by ~8 rounds).
    """
    # materialize the loop-invariant frames ONCE: deg, the distinct node
    # set, and the isolated-node set are all referenced every round, and
    # without their own checkpoints each of the 10 rounds would re-run
    # the |E|-row degree aggregation and the |V|-row distinct
    n_frame = nodes.select(F.col(id_col).alias("id")).distinct().localCheckpoint()
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    deg = (
        edges.groupBy("u").agg(F.count(F.lit(1)).alias("degree")).localCheckpoint()
    )
    edges = edges.join(deg, "u").localCheckpoint()
    isolated = n_frame.join(
        deg, n_frame["id"] == deg["u"], "left_anti"
    ).localCheckpoint()

    n_nodes = n_frame.count()
    ranks = n_frame.select(
        "id", F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint()

    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["u"] == ranks["id"])
            .select(F.col("v").alias("id"), (F.col("rank") / F.col("degree")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass: rank held by degree-0 nodes, redistributed
        # uniformly (one-row agg, folded in as a broadcast cross join)
        # (no broadcast hint: the isolated set can be most of the graph)
        dangling = ranks.join(isolated, "id", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            n_frame.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.join(deg, ranks["id"] == deg["u"], "left").select(
        "id", F.round("rank", 8).alias("rank"),
        F.coalesce("degree", F.lit(0)).alias("degree"),
    )
