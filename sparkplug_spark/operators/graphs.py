"""Graph centrality: distributed PageRank by power iteration.

Complements the star-contraction connected components in ``groups.py``:
CC answers "which items form one cluster", PageRank answers "which nodes
matter most inside it" — the standard importance prior for co-purchase
recommendation graphs, citation/link corpora, and crawl frontier
prioritization (Page et al., 1999; the DataFrame formulation follows the
classic iterative join-aggregate shape every Spark-native graph library
uses).

Scale plan: the edge list (annotated once with 1/out-degree weights) is
checkpointed and hash-partitioned on ``src`` up front, so every
iteration's rank join reshuffles only the node-sized rank table against a
STABLE edge partitioning; contributions aggregate map-side before the one
``dst`` shuffle per iteration.  Dangling-node mass is folded in through a
1-row broadcast (never a driver collect), and each iteration's rank
checkpoint frees the previous one (``checkpoint_tracked`` /
``unpersist_ids`` — the same lineage-truncation-plus-release discipline
as the CC loops, without which 20 iterations of lazy lineage would both
blow up the plan and leak 20 generations of shuffle blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import checkpoint_tracked, unpersist_ids

__all__ = ["pagerank", "bfs_distances"]


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list; returns (node, rank) with
    ranks summing to 1 over the graph's nodes (union of endpoints).

    Semantics: the classic damped power iteration —

        rank(v) = (1-d)/N + d · (Σ_{u→v} rank(u)/deg(u)  +  dangling/N)

    where ``dangling`` is the total rank mass sitting on nodes without
    out-edges, redistributed uniformly (mass conservation: ranks sum to 1
    after every iteration, up to float associativity).  Duplicate edges
    are collapsed; self-loops count like any edge.

    Rank values are IEEE doubles whose partition-order summation makes
    the last ulps run-dependent — this operator is therefore rows-only
    territory for cross-engine checks; tests pin small graphs against a
    dense NumPy power-iteration twin at 1e-9.

    Every iteration checkpoints (not every Nth): the dangling-mass scalar
    is an aggregate OVER the iteration's own contributions, so a lazily
    chained iteration embeds the previous subtree twice (once under the
    broadcast agg, once under the join) — k lazy steps cost 2^k subtree
    evaluations, measurably slower by k=3.  One eager action per
    iteration keeps the work linear."""
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # weight each edge once; partition by src so every iteration's rank
    # join lands on a stable edge partitioning
    weighted = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("__deg")).alias("__w"))
        .repartition("src")
    )
    weighted, w_ids = checkpoint_tracked(weighted, reliable=reliable_checkpoint)
    n_df = nodes.select(F.count(F.lit(1)).cast("long").alias("__n"))
    base = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("node", (F.lit(1.0) / F.col("__n")).alias("rank"), "__n")
    )
    ranks, prev_ids = checkpoint_tracked(base, reliable=reliable_checkpoint)
    d = float(damping)
    for _ in range(iterations):
        # persist: BOTH the dangling aggregate and the stepped join read
        # contribs — unpersisted, the edge join (the dominant cost) would
        # run twice per iteration
        contribs = (
            weighted.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__w")).alias("__in"))
        ).persist()
        # rank mass on dangling nodes (no out-edges): 1 - mass that flowed
        dangling = contribs.agg(
            (F.lit(1.0) - F.coalesce(F.sum("__in"), F.lit(0.0))).alias(
                "__dangling"
            )
        )
        stepped = (
            ranks.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    (1.0 - d) / F.col("__n")
                    + d
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dangling") / F.col("__n")
                    )
                ).alias("rank"),
                "__n",
            )
        )
        ranks, new_ids = checkpoint_tracked(
            stepped, reliable=reliable_checkpoint
        )
        contribs.unpersist()  # checkpoint materialized; cache done
        unpersist_ids(spark, prev_ids)
        prev_ids = new_ids
    unpersist_ids(spark, w_ids)
    return ranks.select("node", "rank")


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Multi-source BFS: minimum hop count from ANY source node to every
    reachable node within ``max_hops`` — the influence-radius /
    blast-impact query ("everything within k links of these seeds") that
    pairs with :func:`pagerank`'s global importance.

    Output: (node, distance BIGINT), distance 0 for the sources
    themselves.  Hop counts are INTEGER-exact, so unlike PageRank this
    iterative operator is fully oracle-checkable (a recursive SQL CTE
    reproduces it bit-for-bit).

    Plan: classic frontier iteration — join the (shrinking) frontier to
    the src-partitioned checkpointed edge list, anti-join out nodes
    already visited, checkpoint the new frontier and release the old one
    (the CC/PageRank lineage discipline).  Each round shuffles only
    frontier-sized data; the loop exits EARLY via a cheap ``isEmpty`` on
    the checkpointed frontier when the graph is exhausted before
    ``max_hops``."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().repartition("src")
    e, e_ids = checkpoint_tracked(e, reliable=reliable_checkpoint)
    frontier = sources.select(F.col(node_col).alias("node")).distinct()
    frontier, f_ids = checkpoint_tracked(
        frontier, reliable=reliable_checkpoint
    )
    visited = frontier.withColumn("distance", F.lit(0).cast("long"))
    visited, v_ids = checkpoint_tracked(visited, reliable=reliable_checkpoint)
    for hop in range(1, max_hops + 1):
        if frontier.isEmpty():
            break
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        nxt, n_ids = checkpoint_tracked(nxt, reliable=reliable_checkpoint)
        unpersist_ids(spark, f_ids)
        frontier, f_ids = nxt, n_ids
        new_visited = visited.unionByName(
            frontier.withColumn("distance", F.lit(hop).cast("long"))
        )
        new_visited, nv_ids = checkpoint_tracked(
            new_visited, reliable=reliable_checkpoint
        )
        unpersist_ids(spark, v_ids)
        visited, v_ids = new_visited, nv_ids
    unpersist_ids(spark, e_ids)
    unpersist_ids(spark, f_ids)
    return visited
