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

    Scale shape (r16): the edge frame is materialized ONCE with
    per-source degrees attached (|E| rows of three longs); the rank
    frame carries CONNECTED nodes only — in the undirected both-ways
    edge frame every connected node has >= 1 in-neighbor, so the former
    per-round |V|-row left join against the full node set never
    produced a NULL inflow and is gone. Isolated (degree-0) nodes all
    hold the SAME rank every round (no inflow, same damping/dangling
    update), so the dangling mass is the scalar recurrence
    ``dm = n_iso * r_iso`` tracked on the driver — the per-round
    semi-join + 1-row aggregate over a rank frame that can be mostly
    isolated nodes is gone too (guide §2.4: remove shuffles outright).
    Each iteration is now exactly one join of ranks onto edges + one
    dst-keyed agg with map-side partials; (long, double) tuples move,
    never payloads. localCheckpoint per round keeps the plan flat (the
    CC lesson: persist alone nests each round's join+agg and Catalyst
    analysis explodes by ~8 rounds). ``n_iso * r_iso`` vs the former
    distributed sum of n_iso identical doubles can differ in the last
    ulps; the 8-dp output rounding absorbs it (verified identical on
    the sf0.1 near-dup graph) and no pagerank consumer is value-
    oracled (neardup_pagerank is rows-only with invariant gates).
    """
    # materialize the loop-invariant frames ONCE: deg, the distinct node
    # set, and the isolated-node set are all referenced every round, and
    # without their own checkpoints each of the 10 rounds would re-run
    # the |E|-row degree aggregation and the |V|-row distinct
    n_frame = nodes.select(F.col(id_col).alias("id")).distinct().localCheckpoint()
    # NOTE (r16): checkpointing the projected pairs before the
    # both-directions union (the connected_components upairs shape) was
    # A/B-measured SLOWER here twice — ReuseExchange already dedups the
    # expensive pair pipeline below the union's identical agg exchange,
    # so the checkpoint only added a materialization pass. Checkpointing
    # the unioned-distinct EDGE frame, by contrast, wins (r16 batch 4):
    # `deg` below is checkpointed, but edges.join(deg) re-derived the
    # union+distinct from the raw pair pipeline — the applyInPandas GEMM
    # ran twice per query. One |E|-row (long,long) checkpoint makes the
    # pair pipeline execute exactly once (guide §5 localCheckpoint to cut
    # lineage; interleaved A/B, 5 reps/arm, neardup_pagerank noop at
    # sf0.1: min 6.06 -> 4.34, med 7.49 -> 6.09).
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        edges.groupBy("u").agg(F.count(F.lit(1)).alias("degree")).localCheckpoint()
    )
    edges = edges.join(deg, "u").localCheckpoint()
    isolated = n_frame.join(
        deg, n_frame["id"] == deg["u"], "left_anti"
    ).localCheckpoint()

    n_nodes = n_frame.count()
    n_iso = isolated.count()
    r_iso = 1.0 / n_nodes
    ranks = deg.select(
        F.col("u").alias("id"), F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint()

    for _ in range(iters):
        dm = n_iso * r_iso
        base = (1.0 - damping) / n_nodes
        ranks = (
            edges.join(ranks, edges["u"] == ranks["id"])
            .select(F.col("v").alias("id"), (F.col("rank") / F.col("degree")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * (F.col("inflow") + F.lit(dm / n_nodes))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        # the isolated-rank recurrence mirrors the column formula exactly
        # (inflow = 0): same IEEE ops, same literals
        r_iso = base + damping * (0.0 + dm / n_nodes)

    conn = ranks.join(deg, ranks["id"] == deg["u"]).select(
        "id", F.round("rank", 8).alias("rank"), F.col("degree")
    )
    iso = isolated.select(
        "id",
        F.round(F.lit(r_iso), 8).alias("rank"),
        F.lit(0).cast("long").alias("degree"),
    )
    return conn.unionByName(iso)
