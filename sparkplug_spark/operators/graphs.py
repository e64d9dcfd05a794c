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

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..caching import checkpoint_tracked, unpersist_ids
from ..partitioning import loop_partitions, shuffle_scope

#: min-propagation sub-steps chained per checkpoint in the SCC peeler's
#: inner fixpoint.  Soundness is chain-length-independent (monotone fold:
#: zero changes in the LAST chained sub-step certifies F(x)=x, and extra
#: sub-steps past the fixpoint recompute identical labels), so the knob
#: trades wasted node-sized exchanges past the fixpoint for fewer
#: checkpoint actions.  Measured (sf0.1, min-of-3 interleaved, noop):
#: chain=2 7.39 s / 139 jobs, chain=4 10.42 s / 143 jobs, chain=6
#: 11.38 s / 115 jobs — each peel round's fixpoint converges in ~2-3
#: sub-steps, so longer chains mostly re-propagate already-stable labels
#: through the full edge set and LOSE despite fewer jobs.  2 is the
#: sweet spot; left as a named constant with the evidence so the next
#: tuner doesn't re-derive it.
_SCC_CHAIN = 2

#: Rank-loop iteration chaining was MEASURED AND REJECTED in r11
#: (tools/chain_ab.py, bit-identical outputs at every depth): letting
#: 2-4 HITS/PageRank iterations share one checkpoint, with the
#: per-iteration scalar (L1 total / dangling mass) entering as a
#: broadcast 1-row subquery, LOST or tied at every depth — AQE does not
#: stage-cache-reuse the subquery's subtree against the main chain, so
#: each inner step re-executed its edge joins (hits_exact jobs
#: 70→86→116 at depth 1/2/3; pagerank_incremental wall 11.1→12.6→15.9s).
#: A node-sized identity for the HITS total (Σ hraw_i = Σ hub_{i-1}·W,
#: W(s)=Σ_{d∈out(s)} indeg(d)) fixed the re-execution but still only
#: tied (10.6 vs 11.3/10.4s; jobs 70→78→97): the saved driver round
#: trip ≈ the added subquery materialization, and iteration-count
#: probes show the per-iteration marginal cost is ~0.27 s against a
#: multi-second setup floor — the loop was never the bottleneck at
#: sf0.1, and at scale the W build is an edge-sized pass traded for
#: node-sized checkpoint writes, a net loss.  Both loops therefore keep
#: ONE eager checkpoint per iteration wherever a scalar must feed
#: forward (dangling mass / L1 total) and lazy `checkpoint_every`
#: chaining where none does.

__all__ = [
    "pagerank",
    "pagerank_integer",
    "bfs_distances",
    "triangle_counts",
    "coreness",
    "hits",
    "hits_integer",
    "hits_incremental",
    "strongly_connected_components",
    "bow_tie_report",
    "label_propagation",
    "pagerank_personalized_integer",
    "pagerank_weighted_integer",
]


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    tol: float | None = None,
    checkpoint_every: int = 3,
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

    Iteration cost: ONE eager action (the rank checkpoint).  The
    dangling-mass scalar and the L1 step delta both ride that action as
    ``observe`` metrics over the stepped ranks — dangling nodes carry a
    static per-node flag, so next iteration's mass is a driver-side
    float, not a broadcast subquery over the contributions (which had
    forced a second consumer of the edge join and a persist/unpersist
    cycle per iteration).

    Checkpoint cadence: when the graph has dangling nodes, every
    iteration must run eagerly (the next step's plan needs this step's
    observed mass as a literal).  When it has none — every symmetrized /
    co-occurrence graph — the mass is identically zero, iterations are
    pure lazy transformations, and ``checkpoint_every`` steps chain into
    one action (lineage stays bounded by the cadence; blocks of round
    N-1 free at each checkpoint).  At bench scale the action launch IS
    the iteration cost, so the cadence is a direct wall-clock divisor.

    ``tol``: optional convergence early exit — stop once the L1 delta
    Σ|rank_i - rank_{i-1}| drops below it (power iteration contracts
    geometrically at rate ~damping, so late iterations mostly re-buy the
    same digits; at 100 TB each saved iteration is a full edge-join
    shuffle).  ``iterations`` remains the hard upper bound."""
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if tol is not None and tol <= 0.0:
        raise ValueError("tol must be positive")
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    n_edges = e.count()
    with shuffle_scope(spark, loop_partitions(spark, n_edges)):
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
        # weight each edge once; partition by src so every iteration's
        # rank join lands on a stable edge partitioning (at an
        # edge-count-derived partition count — cached/checkpointed
        # layouts pin the loop's joins, so AQE alone cannot coalesce
        # them; no-op at production scale)
        weighted = (
            e.join(deg, "src")
            .select(
                "src", "dst", (F.lit(1.0) / F.col("__deg")).alias("__w")
            )
            .repartition("src")
        )
        weighted, w_ids = checkpoint_tracked(
            weighted, reliable=reliable_checkpoint
        )
        n_df = nodes.select(F.count(F.lit(1)).cast("long").alias("__n"))
        # static dangling flag: a node with no out-edges keeps its mass,
        # which next iteration redistributes uniformly.  Flagging nodes
        # once lets each checkpoint action ALSO observe the mass for the
        # next step.
        base = (
            nodes.join(
                deg.select(F.col("src").alias("node"), "__deg"),
                "node",
                "left",
            )
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (F.lit(1.0) / F.col("__n")).alias("rank"),
                "__n",
                F.col("__deg").isNull().alias("__dang"),
            )
        )
        obs0 = Observation()
        base = base.observe(
            obs0, F.sum(F.when(F.col("__dang"), F.col("rank"))).alias("dm")
        )
        ranks, prev_ids = checkpoint_tracked(
            base, reliable=reliable_checkpoint
        )
        if ranks.isEmpty():
            # no nodes: the loop's observations would never fire (zero
            # tasks can mean no metrics), so return the empty result
            # directly.  prev_ids stays persisted — those blocks back the
            # RETURNED DataFrame (a local checkpoint cannot be recomputed
            # once freed)
            unpersist_ids(spark, w_ids)
            e.unpersist()
            return ranks.select("node", "rank")
        dangling_mass = float(obs0.get["dm"] or 0.0)
        has_dangling = dangling_mass != 0.0
        cadence = 1 if has_dangling else max(1, int(checkpoint_every))
        d = float(damping)

        def step(r: DataFrame) -> DataFrame:
            contribs = (
                weighted.join(
                    r.select(F.col("node").alias("src"), "rank"), "src"
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") * F.col("__w")).alias("__in"))
            )
            return r.join(contribs, "node", "left").select(
                "node",
                (
                    (1.0 - d) / F.col("__n")
                    + d
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.lit(dangling_mass) / F.col("__n")
                    )
                ).alias("rank"),
                F.col("rank").alias("__prev"),
                "__n",
                "__dang",
            )

        done = 0
        while done < iterations:
            steps = min(cadence, iterations - done)
            stepped = ranks
            for _ in range(steps):
                stepped = step(stepped.drop("__prev"))
            obs = Observation()
            stepped = stepped.observe(
                obs,
                F.sum(F.when(F.col("__dang"), F.col("rank"))).alias("dm"),
                # delta of the chain's LAST sub-step: a per-checkpoint
                # convergence probe (the tightest of the chained steps)
                F.sum(F.abs(F.col("rank") - F.col("__prev"))).alias("l1"),
            ).drop("__prev")
            ranks, new_ids = checkpoint_tracked(
                stepped, reliable=reliable_checkpoint
            )
            unpersist_ids(spark, prev_ids)
            prev_ids = new_ids
            done += steps
            got = obs.get
            dangling_mass = float(got["dm"] or 0.0)
            if tol is not None and float(got["l1"] or 0.0) < tol:
                break
        unpersist_ids(spark, w_ids)
        e.unpersist()
        return ranks.select("node", "rank")


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    reliable_checkpoint: bool = False,
    _pre: tuple[DataFrame, int] | None = None,
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
    frontier-sized data.  ONE action per hop: the new frontier's
    checkpoint, with its row count riding the materialization as an
    ``observe`` metric (the early-exit probe); the visited set is the
    lazy union of the per-hop frontier checkpoints — re-materializing it
    per hop bought nothing (the anti-join reads the ≤max_hops pieces
    directly).  Loop shuffles run at an edge-count-derived partition
    count (no-op at production scale)."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    spark = edges.sparkSession
    if _pre is not None:
        # caller-managed canonical edge table (already distinct,
        # src-partitioned, checkpointed) + its row count: a multi-sweep
        # composition like :func:`bow_tie_report` canonicalizes ONCE
        # instead of per sweep; the caller owns the blocks' lifetime
        e, n_edges = _pre
        e_ids: set[int] = set()
    else:
        e0 = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).distinct().persist()
        n_edges = e0.count()
    with shuffle_scope(spark, loop_partitions(spark, n_edges)):
        if _pre is None:
            e, e_ids = checkpoint_tracked(
                e0.repartition("src"), reliable=reliable_checkpoint
            )
            e0.unpersist()
        frontier = sources.select(F.col(node_col).alias("node")).distinct()
        obs = Observation()
        frontier, f_ids = checkpoint_tracked(
            frontier.observe(obs, F.count(F.lit(1)).alias("n")),
            reliable=reliable_checkpoint,
        )
        n_frontier = int(obs.get["n"] or 0)
        # the visited set is the union of the per-hop frontier pieces;
        # every piece's checkpoint blocks back the returned DataFrame and
        # stay persisted (a local checkpoint is the blocks' only copy)
        pieces = [frontier.withColumn("distance", F.lit(0).cast("long"))]
        visited_nodes = frontier.select("node")
        for hop in range(1, max_hops + 1):
            if n_frontier == 0:
                break
            nxt = (
                e.join(frontier.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited_nodes, "node", "left_anti")
            )
            obs = Observation()
            nxt, f_ids = checkpoint_tracked(
                nxt.observe(obs, F.count(F.lit(1)).alias("n")),
                reliable=reliable_checkpoint,
            )
            n_frontier = int(obs.get["n"] or 0)
            frontier = nxt
            if n_frontier == 0:
                break
            pieces.append(
                frontier.withColumn("distance", F.lit(hop).cast("long"))
            )
            visited_nodes = visited_nodes.unionByName(
                frontier.select("node")
            )
        unpersist_ids(spark, e_ids)
        visited = pieces[0]
        for p in pieces[1:]:
            visited = visited.unionByName(p)
        return visited


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    release: bool = True,
) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient over
    an undirected graph — the classic cohesion/community signal (and spam
    detector: link farms have pathological triangle density) that
    completes the graph family next to CC (:mod:`groups`), PageRank, and
    BFS reach.

    Input edges may be directed/duplicated either way; they are
    canonicalized (``min < max``, distinct, self-loops dropped) first.
    Output per node: (item, degree, triangles, clustering_ppm) where
    clustering_ppm = ``2·T·10⁶ div (d·(d-1))`` — exact truncating integer
    ppm of the closed-wedge ratio, no float division anywhere.

    Scale plan (the Suri–Vassilvitskii / Cohen MapReduce orientation
    trick): every canonical edge is ORIENTED from its lower-(degree, id)
    endpoint to its higher one, so wedge generation fans out from each
    node's out-neighborhood only — out-degree is bounded by O(sqrt(m))
    regardless of how big a hub's real degree is, which is exactly what
    kills the naive plan on power-law graphs at 100 TB.  One self-join on
    the apex makes wedges, one equi-join against the oriented edge list
    closes them; every triangle is found exactly once (its corners appear
    in rank order).  The oriented edge list is persisted and shared by
    both joins, released on return."""
    from ..caching import materialize_release

    # e feeds the degree union (twice) AND the orientation join; deg
    # feeds both orientation sides AND the output join — un-persisted,
    # each consumer re-ran the upstream edge build and the distinct
    # shuffle (the fan-out-intermediates invariant)
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .persist()
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("__db"))
    # orient toward the higher (degree, id) rank; ties impossible on id
    lower_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("__db")).otherwise(F.col("__da")).alias(
                "__dv"
            ),
        )
        .persist()
    )
    w1 = oriented.select(
        F.col("u"), F.col("v").alias("x"), F.col("__dv").alias("__dx")
    )
    w2 = oriented.select(
        F.col("u"), F.col("v").alias("y"), F.col("__dv").alias("__dy")
    )
    wedges = w1.join(w2, "u").filter(
        (F.col("__dx") < F.col("__dy"))
        | ((F.col("__dx") == F.col("__dy")) & (F.col("x") < F.col("y")))
    )
    closed = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
    )
    tri = (
        closed.select(
            F.explode(F.array(F.col("u"), F.col("x"), F.col("y"))).alias("n")
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    out = (
        deg.join(tri, "n", "left")
        .select(
            F.col("n").alias("item"),
            F.col("deg").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias(
                "triangles"
            ),
            F.when(
                F.col("deg") >= 2,
                F.expr(
                    "(2 * coalesce(triangles, 0) * 1000000)"
                    " div (deg * (deg - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("clustering_ppm"),
        )
    )
    return materialize_release(out, e, deg, oriented, release=release)


def coreness(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    checkpoint_every: int = 3,
) -> DataFrame:
    """k-core decomposition — each node's CORE NUMBER (the largest k such
    that the node survives in the subgraph where everyone keeps ≥ k
    neighbors).  The classic density/robustness peel: spam rings and
    bot farms concentrate in abnormally high cores, long-tail content in
    low ones; next to triangles (local cohesion) this gives the GLOBAL
    cohesion hierarchy.

    Algorithm: iterated h-index propagation (Lü et al., Nature Comms
    2016): start from ``c(v) = degree(v)`` and repeatedly replace each
    value with the h-index of its neighbors' values (largest h with ≥ h
    neighbors scoring ≥ h); the fixed point IS the coreness — a
    node-local monotone iteration that needs no sequential peeling, so
    it distributes.  Values only decrease, so convergence is detected
    exactly (no changed rows) and the answer is deterministic and
    partitioning-independent: rows-only territory only because DuckDB
    has no iterative twin; tests pin small graphs against an
    exact-peeling Python twin.

    Returns (item, degree, core).

    Scale shape: edges canonicalized once into a persisted symmetric
    adjacency (8-byte pairs); each iteration is one join (neighbor
    values), one per-node rank window (h-index = max min(value, rank) —
    no arrays collected, a hub's window is just its own partition), and
    one changed-count aggregate that doubles as the convergence test.
    Core tables checkpoint every ``checkpoint_every`` rounds, releasing
    the previous generation (the CC/PageRank lineage discipline)."""
    from pyspark.sql import Window

    from ..caching import checkpoint_tracked, unpersist_ids

    spark = edges.sparkSession
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    n_edges = e.count()
    with shuffle_scope(spark, loop_partitions(spark, 2 * n_edges)):
        # symmetric adjacency partitioned on u — the key every round's
        # neighbor join uses (unpartitioned, the full adjacency
        # re-exchanged per round); count derived from the working set
        adj = (
            e.select(F.col("a").alias("v"), F.col("b").alias("u"))
            .unionAll(e.select(F.col("b").alias("v"), F.col("a").alias("u")))
            .repartition("u")
            .persist()
        )
        deg = adj.groupBy("v").agg(
            F.count(F.lit(1)).cast("long").alias("deg")
        )
        cores, ids = checkpoint_tracked(
            deg.select("v", F.col("deg").alias("c"))
        )
        degrees = deg.persist()
        degrees.count()
        e.unpersist()
        w = Window.partitionBy("v").orderBy(F.desc("cu"))
        for _ in range(max_iterations):
            nbr = adj.join(
                cores.withColumnsRenamed({"v": "u", "c": "cu"}), "u"
            ).select("v", "cu")
            h = (
                nbr.withColumn("r", F.row_number().over(w))
                .groupBy("v")
                .agg(F.max(F.least(F.col("cu"), F.col("r"))).alias("h"))
            )
            # carry the previous value through the checkpoint so the
            # convergence count rides the materialization as an observe
            # metric — no separate nxt-vs-cores join+count job per round
            obs = Observation()
            nxt = (
                cores.join(h, "v", "left")
                .select(
                    "v",
                    F.col("c").alias("__old"),
                    F.least(
                        F.col("c"), F.coalesce(F.col("h"), F.lit(0))
                    ).alias("c"),
                )
                .observe(
                    obs,
                    F.sum(
                        F.when(F.col("c") != F.col("__old"), 1).otherwise(0)
                    ).alias("chg"),
                )
                .select("v", "c")
            )
            nxt, new_ids = checkpoint_tracked(nxt)
            changed = int(obs.get["chg"] or 0)
            unpersist_ids(spark, ids)
            cores, ids = nxt, new_ids
            if changed == 0:
                break
        out = degrees.join(cores, "v").select(
            F.col("v").alias("item"),
            F.col("deg").alias("degree"),
            F.col("c").alias("core"),
        )
        from ..caching import materialize_release

        out = materialize_release(out, adj, degrees)
        unpersist_ids(spark, ids)
        return out


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    checkpoint_every: int = 2,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM 1999) over a directed
    edge list: (node, hub, authority), both vectors L2-normalized.  The
    natural bipartite ranking :func:`pagerank` can't express — "good
    hubs point at good authorities" (customers ↔ products, crawl seeds
    ↔ content pages): per iteration ``auth = Aᵀ·hub`` then ``hub =
    A·auth`` (authorities first, from the CURRENT hubs — the standard
    update order).

    HITS is scale-invariant, so normalization is deferred to checkpoint
    boundaries: each cadence chain runs un-normalized (growth over
    ``checkpoint_every`` chained steps is bounded by λ₁^(2k) ≪ double
    range for any sane cadence), then the observed Σhub²/Σauth² scale
    the checkpointed state as literals — no extra action per iteration.

    Like PageRank, scores are IEEE doubles with run-dependent last ulps
    — rows-only territory; tests pin small graphs to a dense NumPy twin
    at 1e-9.

    Plan per iteration: two partition-aligned shuffles (edges are kept
    as TWO checkpointed copies, partitioned by src for the authority
    gather and by dst for the hub gather); the per-iteration authority
    table is persisted for its two consumers and released at the next
    checkpoint; lineage stays bounded by the cadence."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    spark = edges.sparkSession
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    n_edges = e.count()
    if n_edges == 0:
        e.unpersist()
        return spark.createDataFrame(
            [], "node long, hub double, authority double"
        )
    with shuffle_scope(spark, loop_partitions(spark, n_edges)):
        e_src, src_ids = checkpoint_tracked(
            e.repartition("src"), reliable=reliable_checkpoint
        )
        e_dst, dst_ids = checkpoint_tracked(
            e_src.repartition("dst"), reliable=reliable_checkpoint
        )
        e.unpersist()
        state = (
            e_src.select(F.col("src").alias("node"))
            .unionByName(e_src.select(F.col("dst").alias("node")))
            .distinct()
            .select(
                "node", F.lit(1.0).alias("auth"), F.lit(1.0).alias("hub")
            )
        )
        prev_ids: set[int] = set()
        pending: list[DataFrame] = []
        done = 0
        while done < iterations:
            steps = min(checkpoint_every, iterations - done)
            st = state
            for _ in range(steps):
                a = (
                    e_src.join(
                        st.select(F.col("node").alias("src"), "hub"), "src"
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum("hub").alias("auth"))
                    .persist()
                )
                pending.append(a)
                h = (
                    e_dst.join(
                        a.select(F.col("node").alias("dst"), "auth"), "dst"
                    )
                    .groupBy(F.col("src").alias("node"))
                    .agg(F.sum("auth").alias("hub"))
                )
                # full outer: only-out-edge nodes miss from a,
                # only-in-edge nodes miss from h; together they cover
                # every node
                st = a.join(h, "node", "full").select(
                    "node",
                    F.coalesce("auth", F.lit(0.0)).alias("auth"),
                    F.coalesce("hub", F.lit(0.0)).alias("hub"),
                )
            obs = Observation()
            st = st.observe(
                obs,
                F.sum(F.col("auth") * F.col("auth")).alias("a2"),
                F.sum(F.col("hub") * F.col("hub")).alias("h2"),
            )
            ck, new_ids = checkpoint_tracked(
                st, reliable=reliable_checkpoint
            )
            unpersist_ids(spark, prev_ids)
            prev_ids = new_ids
            for c in pending:
                c.unpersist()
            pending = []
            got = obs.get
            an = float(got["a2"] or 0.0) ** 0.5 or 1.0
            hn = float(got["h2"] or 0.0) ** 0.5 or 1.0
            state = ck.select(
                "node",
                (F.col("auth") / F.lit(an)).alias("auth"),
                (F.col("hub") / F.lit(hn)).alias("hub"),
            )
            done += steps
        unpersist_ids(spark, src_ids)
        unpersist_ids(spark, dst_ids)
        return state.select(
            "node", "hub", F.col("auth").alias("authority")
        )


def pagerank_integer(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping_pct: int = 85,
    unit: int = 10**9,
    checkpoint_every: int = 3,
    assume_no_dangling: bool = False,
    init_ranks: DataFrame | None = None,
    assume_canonical: bool = False,
) -> DataFrame:
    """PageRank in EXACT integer nano-units — the oracle-checkable tier
    of :func:`pagerank`.  Every quantity is a BIGINT: initial mass
    ``unit`` per node, per-edge contributions ``mass div out_degree``,
    damping as integer percent, dangling mass redistributed by integer
    division (sub-nano remainders vanish — documented, deterministic).
    Integer sums commute, so the result is bit-identical under ANY
    partitioning/summation order — the float tier's last-ulp
    partition-order dependence (why it's rows-only) just disappears.
    Runs a FIXED ``iterations`` count, no convergence test: integer
    ranks can oscillate by one nano at the fixpoint, and a fixed
    schedule is what a SQL twin replays exactly.

    Returns (node, rank_nano).  Same per-iteration shape as the float
    tier: one rank-to-src join against an out-degree-annotated,
    src-partitioned persisted edge table + one dst aggregation (two
    exchanges total); when dangling nodes exist their mass total rides
    each checkpoint action as an ``observe`` metric and enters the next
    step as an int literal (never a lazy broadcast subquery: the r11
    chain A/B measured that alternative and it lost — AQE does not
    stage-cache-reuse the subquery's subtree, so it re-executes the
    edge join per inner step; see the cadence comment), which forces
    the cadence to 1; with none, lazy steps chain at
    ``checkpoint_every``.  ``assume_no_dangling=True``
    skips even the one-time dangling count when the caller KNOWS every
    node has out-edges — true by construction for symmetrized graphs;
    the dangling share is exactly zero there, so results are
    identical.

    ``init_ranks`` (node, rank_nano) warm-starts iteration 0 from a
    PREVIOUS run's vector instead of ``unit`` everywhere (nodes absent
    from it seed at ``unit``) — the incremental-maintenance tier
    (:func:`pagerank_incremental`); with dangling nodes, the initial
    redistributable mass is the exact integer sum of the init vector
    over the dangling set (one bounded 1-row action on a checkpointed
    table — never a lazy broadcast subquery).  ``assume_canonical=True``
    skips the null-filter + dropDuplicates pre-pass when the caller
    KNOWS the edge table is already canonical (true by construction for
    a maintained edge store) — at corpus scale that pre-pass is a full
    edge shuffle per batch."""
    from ..caching import checkpoint_tracked, unpersist_ids
    from ..partitioning import loop_partitions, shuffle_scope

    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (0, 100)")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if not assume_canonical:
        e = e.where(
            F.col("src").isNotNull() & F.col("dst").isNotNull()
        ).dropDuplicates(["src", "dst"])
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    # int64 headroom: total mass is conserved at ~n_nodes*unit (floor
    # losses only shrink it), and a near-sink node can receive almost
    # all of it, so `damping_pct * (inc + __ds)` peaks near
    # damping_pct * n_nodes * unit.  Spark's non-ANSI multiply WRAPS
    # silently on overflow, so fail loudly instead of diverging.
    if int(damping_pct) * n_nodes * int(unit) >= 2**63:
        raise ValueError(
            f"int64 headroom exceeded: damping_pct*n_nodes*unit = "
            f"{damping_pct}*{n_nodes}*{unit} >= 2^63; pass a smaller "
            f"unit (<= {2**63 // (int(damping_pct) * n_nodes) - 1})"
        )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).persist()
    spark = edges.sparkSession
    base = ((100 - damping_pct) * unit) // 100
    # Static dangling flag, counted ONCE: the dangling set never changes
    # (a node without out-edges cannot gain them mid-iteration).  When it
    # is non-empty, each iteration's mass total rides the checkpoint
    # action as an `observe` metric and feeds the NEXT step as a Python
    # int literal — NOT a lazy crossJoin(broadcast(agg)) whose subquery
    # re-executes the chain (the r5 hits_integer class; re-confirmed by
    # the r11 chain A/B, where the subquery form lost at every depth).
    # one node-sized aggregate over the persisted out-degree table
    # yields the dangling count (n_nodes - #distinct src) AND the edge
    # count (Σ outdeg) — replacing a nodes⟕outdeg anti-join count job
    # plus a separate e.count() rescan of the edge table
    od_row = outdeg.agg(
        F.count(F.lit(1)).alias("__c"), F.sum("outdeg").alias("__n")
    ).first()
    n_edges = int(od_row["__n"] or 0)
    n_dang = 0 if assume_no_dangling else n_nodes - int(od_row["__c"])
    has_dang = n_dang > 0
    if has_dang:
        marked = nodes.join(
            outdeg.select("node", F.lit(1).alias("__o")), "node", "left"
        ).select("node", F.col("__o").isNull().alias("__dang"))
    else:
        marked = nodes.withColumn("__dang", F.lit(False))
    # dangling mass forces cadence 1: the r11 chain A/B measured the
    # alternative — inner steps taking the mass from a broadcast 1-row
    # aggregate over the lazy previous step — and it LOST (pagerank_
    # incremental 11.1 s → 12.6 s at chain 2, 15.9 s at chain 3, jobs
    # 101 → 122 → 157): AQE does NOT stage-cache-reuse the aggregate's
    # subtree against the main chain, so every inner step re-executed
    # the full edge join just to sum the dangling slice.  Unlike HITS
    # (whose L1 total reduces to a NODE-sized static-weight aggregate,
    # see hits_integer), the dangling sum needs the per-node floor of
    # the incoming mass — no node-sized identity exists, so eager every
    # iteration stays the right schedule.
    cadence = 1 if has_dang else max(1, int(checkpoint_every))
    with shuffle_scope(spark, loop_partitions(spark, n_edges)):
        # out-degree folded INTO the edge table once, hash-partitioned on
        # src (the float tier's `weighted` shape): each iteration then
        # costs exactly TWO exchanges — the node-sized rank table to
        # hash(src) and the dst aggregation — instead of re-joining m with
        # outdeg and e separately (~5 exchanges/iteration; on bench-scale
        # graphs the exchange count IS the wall clock).  `rank_nano div
        # outdeg` per edge equals the per-src share joined onto each edge:
        # identical integer arithmetic, identical sums.  The loop runs at
        # an edge-count-derived partition count (cached layouts pin every
        # join, so AQE cannot coalesce these; no-op at production scale).
        we = (
            e.join(
                outdeg.select(F.col("node").alias("src"), "outdeg"), "src"
            )
            .repartition("src")
            .persist()
        )
        marked = marked.repartition("node").persist()
        live: set[int] = set()
        if init_ranks is None:
            m = marked.withColumn(
                "rank_nano", F.lit(int(unit)).cast("long")
            )
            dm = n_dang * int(unit)  # initial state: `unit` mass per node
        else:
            m = marked.join(
                init_ranks.select(
                    "node", F.col("rank_nano").alias("__init")
                ),
                "node",
                "left",
            ).select(
                "node",
                "__dang",
                F.coalesce(F.col("__init"), F.lit(int(unit)))
                .cast("long")
                .alias("rank_nano"),
            )
            dm = 0
            if has_dang:
                # the initial redistributable mass is data-dependent now:
                # checkpoint the init join ONCE, then take the 1-row total
                # as an eager action (the r5 lazy-broadcast lesson)
                m, live = checkpoint_tracked(m)
                dm = int(
                    m.where(F.col("__dang"))
                    .agg(F.sum("rank_nano"))
                    .first()[0]
                    or 0
                )
        for i in range(int(iterations)):
            ds = dm // n_nodes if has_dang else 0  # ranks >= 0: // == div
            incoming = (
                we.join(
                    m.select(F.col("node").alias("src"), "rank_nano"),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    F.sum(F.expr("rank_nano div outdeg"))
                    .cast("long")
                    .alias("inc")
                )
            )
            m = marked.join(incoming, "node", "left").select(
                "node",
                "__dang",
                (
                    F.lit(int(base))
                    + F.expr(
                        f"{int(damping_pct)}L * (coalesce(inc, 0L)"
                        f" + {int(ds)}L) div 100"
                    )
                ).cast("long").alias("rank_nano"),
            )
            if (i + 1) % cadence == 0 or i == iterations - 1:
                obs = None
                if has_dang:
                    obs = Observation()
                    m = m.observe(
                        obs,
                        F.sum(
                            F.when(F.col("__dang"), F.col("rank_nano"))
                        ).alias("dm"),
                    )
                m, ids = checkpoint_tracked(m)
                unpersist_ids(spark, live)
                live = ids
                if obs is not None:
                    dm = int(obs.get["dm"] or 0)
        for df_ in (e, nodes, outdeg, we, marked):
            df_.unpersist()
        return m.select("node", "rank_nano")


def fold_edges(
    edges: DataFrame | None,
    new_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fold a raw edge batch into a canonical (src, dst) edge store:
    null-filter + dedup the BATCH, anti-join it against the store, union
    the survivors — the store itself is never re-canonicalized or
    re-deduplicated (it is canonical by construction), so per-batch prep
    cost scales with the batch, not the graph.  ``edges=None`` builds
    the initial store from the first batch."""
    fresh = (
        new_edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .dropDuplicates(["src", "dst"])
    )
    if edges is None:
        return fresh
    store = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    return store.unionByName(fresh.join(store, ["src", "dst"], "left_anti"))


def pagerank_incremental(
    ranks: DataFrame,
    edges: DataFrame,
    new_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 4,
    damping_pct: int = 85,
    unit: int = 10**9,
    checkpoint_every: int = 3,
    assume_no_dangling: bool = False,
) -> DataFrame:
    """Incremental integer-PageRank maintenance (the E154
    incremental-CC discipline applied to E199): fold a NEW edge batch
    into an existing canonical edge store and re-rank with a BOUNDED
    warm-start schedule — ``iterations`` fixed steps seeded from the
    stored rank vector (nodes first seen in this batch seed at
    ``unit``) instead of a full cold restart.  Everything stays exact
    BIGINT arithmetic on a fixed schedule, so the result is a
    deterministic integer function of (stored ranks, merged edges) that
    a SQL twin replays bit-for-bit — the oracle-checkable tier of
    incremental ranking, not an unpinned approximation.

    Why warm start is the right maintenance tier: PageRank's power
    iteration contracts at the damping factor per step, so from an
    already-converged vector a handful of steps re-absorbs a small edge
    delta; a cold recompute pays the full 8-10 step schedule per batch.
    Per-batch cost: batch-sized canonicalization + one anti-join against
    the store (:func:`fold_edges`), then ``iterations`` × two exchanges
    — the crawl-cadence path for E247's link graph, where each day adds
    ~1% new edges.

    Returns (node, rank_nano) over the MERGED graph.  Callers
    maintaining a store persist :func:`fold_edges`' output as the next
    edge version alongside this vector (manifest-publish discipline).
    """
    merged = fold_edges(edges, new_edges, src_col=src_col, dst_col=dst_col)
    return pagerank_integer(
        merged,
        iterations=iterations,
        damping_pct=damping_pct,
        unit=unit,
        checkpoint_every=checkpoint_every,
        assume_no_dangling=assume_no_dangling,
        init_ranks=ranks,
        assume_canonical=True,
    )


def hits_incremental(
    hubs: DataFrame,
    edges: DataFrame,
    new_edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    unit: int = 10**6,
) -> DataFrame:
    """Incremental HITS maintenance — :func:`pagerank_incremental`'s
    sibling: fold a NEW edge batch into the canonical edge store
    (:func:`fold_edges`, batch-sized prep only) and re-run a BOUNDED
    warm-start schedule seeded from the stored hub vector (nodes first
    seen in this batch seed at the uniform share, then one integer L1
    normalization restores the sum(hub) <= unit headroom invariant).
    All-BIGINT fixed schedule: the result is a deterministic integer
    function of (stored hubs, merged edges) a SQL twin replays exactly.

    Returns (node, hub_units, auth_units) over the MERGED graph."""
    merged = fold_edges(edges, new_edges, src_col=src_col, dst_col=dst_col)
    return hits_integer(
        merged,
        iterations=iterations,
        unit=unit,
        init_hubs=hubs,
        assume_canonical=True,
    )


def strongly_connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 16,
    max_inner: int = 64,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph — the web
    bow-tie decomposition (Broder et al., WWW'00): the giant SCC is the
    crawlable core, IN/OUT tendrils are where frontier budget dies —
    the structural audit a link corpus runs beside PageRank.  The
    undirected CC tiers (E12/E154) answer "one cluster?"; this answers
    "mutually reachable?", which direction-blind contraction cannot.

    Deterministic min-pivot peeling (the FW-BW idea with the min node
    id as every subgraph's pivot, so no RNG): per round, propagate
    f(v) = min ancestor id and b(v) = min descendant id to fixpoint
    (monotone integer min-folds — converge in <= remaining-diameter
    steps); f(v)=b(v)=p proves v and p mutually reachable, so those
    nodes finalize with ``scc_id = p`` and leave the graph.  SOUND in
    every round (an equal pair is a mutual-reachability certificate);
    COMPLETE because the minimum node of each remaining weak component
    always satisfies f=b=self, so at least one SCC per weak component
    peels per round.  Raises after ``max_rounds`` with work remaining
    (pathological SCC chains — raise the cap) rather than returning
    silent NULLs.

    Integer-exact ⇒ fully oracle-checkable: a reachability-closure SQL
    twin (scc_id = min over mutual-reach partners) reproduces the
    assignment bit-for-bit, independent of the peeling mechanics.

    Scale shape: per inner step ONE frontier-sized join against the
    remaining edge set + a dst min-aggregate (two exchanges), with the
    CC/PageRank checkpoint-and-release lineage discipline; per outer
    round two semi-joins shrink the edge set.  Labels are node-sized;
    nothing is driver-resident.

    Action dieting (the loop's wall clock at bench scale is job-launch
    count, and at cluster scale every saved exchange is a saved shuffle):
    min-propagation sub-steps chain TWO per checkpoint — the monotone
    fold makes observing only the LAST sub-step's change count sound
    (zero changes in the last sub-step means F(x)=x, a fixpoint
    certificate; any extra chained sub-step recomputes identical labels);
    the remaining edge set is checkpointed per round in BOTH directions,
    hash-partitioned on the gather key, so inner steps re-exchange only
    node-sized labels; the per-round (assigned, new remainder) pair is
    ONE checkpoint of the f=b comparison with the remainder count riding
    it as an observe metric (three actions per round become one); loop
    shuffles run at an edge-count-derived partition count
    (:func:`~..partitioning.loop_partitions`, no-op at scale)."""
    from ..caching import checkpoint_tracked, unpersist_ids

    if max_rounds < 1 or max_inner < 1:
        raise ValueError("max_rounds and max_inner must be >= 1")
    spark = edges.sparkSession
    e0 = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .dropDuplicates(["src", "dst"])
    )
    e0, e0_ids = checkpoint_tracked(e0)
    n_edges = e0.count()
    with shuffle_scope(spark, loop_partitions(spark, n_edges)):
        rem = (
            e0.select(F.col("src").alias("node"))
            .unionByName(e0.select(F.col("dst").alias("node")))
            .distinct()
        )
        rem, rem_ids = checkpoint_tracked(rem)
        n_rem = rem.count()
        sube, sube_ids = e0, set()
        sube_is_partitioned = False
        done_parts: list[DataFrame] = []
        done_part_ids: list[set[int]] = []

        def _min_fixpoint(edges_dir: DataFrame, nodes: DataFrame) -> tuple:
            """labels (node, lab) after propagating min over in-edges of
            ``edges_dir`` to fixpoint; returns (labels, live_block_ids).
            Two sub-steps chain per checkpoint; the observed change count
            of the LAST sub-step being zero certifies the fixpoint."""
            lab = nodes.withColumn("lab", F.col("node"))
            lab, live = checkpoint_tracked(lab)

            def _step(cur: DataFrame) -> DataFrame:
                contrib = (
                    edges_dir.join(
                        cur.select(
                            F.col("node").alias("src"), F.col("lab")
                        ),
                        "src",
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.min("lab").alias("__lin"))
                )
                return (
                    cur.withColumnRenamed("lab", "__old")
                    .join(contrib, "node", "left")
                    .select(
                        "node",
                        F.least(
                            F.col("__old"), F.coalesce("__lin", "__old")
                        ).alias("lab"),
                        "__old",
                    )
                )
            done_steps = 0
            while done_steps < int(max_inner):
                steps = min(int(_SCC_CHAIN), int(max_inner) - done_steps)
                new = lab
                for _ in range(steps):
                    new = _step(new.select("node", "lab"))
                obs = Observation()
                new = new.observe(
                    obs,
                    F.sum(
                        F.when(F.col("lab") < F.col("__old"), 1).otherwise(
                            0
                        )
                    ).alias("chg"),
                ).select("node", "lab")
                new, ids = checkpoint_tracked(new)
                unpersist_ids(spark, live)
                live = ids
                lab = new
                done_steps += steps
                if int(obs.get["chg"] or 0) == 0:
                    break
            else:
                raise ValueError(
                    f"min-label propagation did not converge in "
                    f"{max_inner} steps; raise max_inner"
                )
            return lab, live

        for _ in range(int(max_rounds)):
            if n_rem == 0:
                break
            if not sube_is_partitioned:
                # both gather directions, hash-partitioned on the gather
                # key, so each inner step re-exchanges only labels
                sube_fwd, sf_ids = checkpoint_tracked(
                    sube.repartition("src")
                )
                sube_rev, sr_ids = checkpoint_tracked(
                    sube.select(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ).repartition("src")
                )
                unpersist_ids(spark, sube_ids)
                sube_is_partitioned = True
            f_lab, f_ids = _min_fixpoint(sube_fwd, rem)
            b_lab, b_ids = _min_fixpoint(sube_rev, rem)
            # ONE checkpoint holds both the round's assignments and the
            # remainder; the remainder count rides it as an observation
            obs = Observation()
            both = (
                f_lab.join(b_lab.withColumnRenamed("lab", "__b"), "node")
                .observe(
                    obs,
                    F.sum(
                        F.when(F.col("lab") != F.col("__b"), 1).otherwise(0)
                    ).alias("n_rem"),
                )
            )
            both, both_ids = checkpoint_tracked(both)
            n_rem = int(obs.get["n_rem"] or 0)
            assigned = both.where(F.col("lab") == F.col("__b")).select(
                "node", F.col("lab").alias("scc_id")
            )
            done_parts.append(assigned)
            done_part_ids.append(both_ids)
            new_rem = both.where(F.col("lab") != F.col("__b")).select(
                "node"
            )
            unpersist_ids(spark, f_ids | b_ids | rem_ids)
            rem, rem_ids = new_rem, set()
            if n_rem == 0:
                unpersist_ids(spark, sf_ids | sr_ids)
                break
            new_sube = sube_fwd.join(
                new_rem.withColumnRenamed("node", "src"), "src", "semi"
            ).join(new_rem.withColumnRenamed("node", "dst"), "dst", "semi")
            sube_fwd2, sf2_ids = checkpoint_tracked(
                new_sube.repartition("src")
            )
            sube_rev2, sr2_ids = checkpoint_tracked(
                new_sube.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ).repartition("src")
            )
            unpersist_ids(spark, sf_ids | sr_ids)
            sube_fwd, sf_ids = sube_fwd2, sf2_ids
            sube_rev, sr_ids = sube_rev2, sr2_ids
        else:
            if n_rem != 0:
                raise ValueError(
                    f"SCC peeling did not finish in {max_rounds} rounds;"
                    " raise max_rounds"
                )
        unpersist_ids(spark, e0_ids)
        out = done_parts[0]
        for p_ in done_parts[1:]:
            out = out.unionByName(p_)
        return out


def bow_tie_report(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 16,
    max_hops: int = 64,
    detailed: bool = False,
) -> DataFrame:
    """Web bow-tie decomposition (Broder et al., WWW'00) — the E295
    capstone: every node classified as ``CORE`` (member of the largest
    SCC; ties on size break to the smallest scc_id), ``IN`` (reaches
    the core but is not in it — pages that link toward the crawlable
    center), ``OUT`` (reachable from the core — where frontier budget
    drains), or ``OTHER`` (tendrils/tubes/disconnected).  The structure
    audit that tells a crawl operator how much of the link graph a
    core-seeded frontier can ever see.

    Returns ``(node, scc_id, region)``.  Composition: E295 SCC → one
    size aggregate picks the core → two multi-source BFS sweeps
    (forward for OUT, reversed for IN) from the core members — all
    integer/set-exact, so the closure-based oracle replays the regions
    without referencing any of this machinery.

    ``detailed=True`` refines OTHER into the full Broder taxonomy with
    two more sweeps (forward from IN, backward from OUT): ``TUBE``
    (an IN→OUT path that bypasses the core), ``TENDRIL`` (hangs off IN
    or feeds OUT, one-sided), ``DISCONNECTED`` (touches none of it)."""
    scc = strongly_connected_components(
        edges, src_col=src_col, dst_col=dst_col, max_rounds=max_rounds
    ).persist()
    core_row = (
        scc.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), F.asc("scc_id"))
        .limit(1)
        .collect()[0]
    )
    core_id = core_row["scc_id"]
    core = scc.where(F.col("scc_id") == F.lit(core_id)).select("node")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    # canonicalize the edge table ONCE for every sweep (2 plain, 4
    # detailed): each bfs_distances call otherwise re-runs the distinct
    # + count + src-partitioned checkpoint over the full edge set.  Both
    # gather directions are checkpointed; blocks released after the last
    # sweep (the BFS outputs are eager checkpoints of their own).
    from ..caching import checkpoint_tracked, unpersist_ids
    from ..partitioning import loop_partitions, shuffle_scope

    spark = edges.sparkSession
    e0 = e.distinct().persist()
    n_e = e0.count()
    with shuffle_scope(spark, loop_partitions(spark, n_e)):
        e_fwd, ef_ids = checkpoint_tracked(e0.repartition("src"))
        e_rev, er_ids = checkpoint_tracked(
            e0.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            ).repartition("src")
        )
    e0.unpersist()
    fwd = bfs_distances(
        e_fwd, core, max_hops=max_hops, _pre=(e_fwd, n_e)
    ).select("node")
    rev = bfs_distances(
        e_rev, core, max_hops=max_hops, _pre=(e_rev, n_e)
    ).select("node")
    out = (
        scc.join(fwd.withColumn("__out", F.lit(True)), "node", "left")
        .join(rev.withColumn("__in", F.lit(True)), "node", "left")
        .select(
            "node",
            "scc_id",
            F.when(F.col("scc_id") == F.lit(core_id), F.lit("CORE"))
            .when(F.col("__in").isNotNull(), F.lit("IN"))
            .when(F.col("__out").isNotNull(), F.lit("OUT"))
            .otherwise(F.lit("OTHER"))
            .alias("region"),
        )
    )
    from ..caching import materialize_release

    if not detailed:
        res = materialize_release(out, scc)
        unpersist_ids(spark, ef_ids | er_ids)
        return res
    base = out.persist()
    in_nodes = base.where(F.col("region") == "IN").select("node")
    out_nodes = base.where(F.col("region") == "OUT").select("node")
    # seed the refinement sweeps with the reach sets already computed:
    # when IN is non-empty every IN node reaches the core, so
    # reach(core) = fwd ⊆ reach(IN) and reach(IN ∪ fwd) = reach(IN) —
    # identical result, but the sweep explores only past the known
    # region (tubes/tendrils) instead of re-walking the core's whole
    # forward cone; symmetrically rev ⊆ reverse-reach(OUT) when OUT is
    # non-empty.  Empty region ⇒ seed unaugmented (reach must be empty).
    region_n = {
        r["region"]: r["n"]
        for r in base.groupBy("region")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    fi_seeds = (
        in_nodes.unionByName(fwd) if region_n.get("IN") else in_nodes
    )
    to_seeds = (
        out_nodes.unionByName(rev) if region_n.get("OUT") else out_nodes
    )
    from_in = bfs_distances(
        e_fwd, fi_seeds, max_hops=max_hops, _pre=(e_fwd, n_e)
    ).select("node")
    to_out = bfs_distances(
        e_rev, to_seeds, max_hops=max_hops, _pre=(e_rev, n_e)
    ).select("node")
    unpersist_ids(spark, ef_ids | er_ids)
    refined = (
        base.join(from_in.withColumn("__fi", F.lit(True)), "node", "left")
        .join(to_out.withColumn("__to", F.lit(True)), "node", "left")
        .select(
            "node",
            "scc_id",
            F.when(F.col("region") != "OTHER", F.col("region"))
            .when(
                F.col("__fi").isNotNull() & F.col("__to").isNotNull(),
                F.lit("TUBE"),
            )
            .when(
                F.col("__fi").isNotNull() | F.col("__to").isNotNull(),
                F.lit("TENDRIL"),
            )
            .otherwise(F.lit("DISCONNECTED"))
            .alias("region"),
        )
    )
    return materialize_release(refined, scc, base)


def hits_integer(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 8,
    unit: int = 10**6,
    init_hubs: DataFrame | None = None,
    assume_canonical: bool = False,
) -> DataFrame:
    """HITS with L1 normalization in EXACT integers — the
    oracle-checkable tier of :func:`hits`.  The INITIAL hub vector is
    already L1-normalized (``unit div n`` per node), then per
    iteration: authority = Σ hub over in-edges (kept RAW — normalizing
    it is scale bookkeeping the hub normalization cancels); hub = Σ
    authority over out-edges, L1-normalized to ``unit`` total by one
    integer division; the final authority vector is normalized once on
    output.  Any norm keeps the Kleinberg fixpoint DIRECTION, and L1
    needs no sqrt — every quantity stays BIGINT, integer sums commute,
    so scores are bit-identical under any partitioning and a SQL twin
    replays the fixed schedule exactly.

    int64 headroom (CHECKED up front, since Spark's non-ANSI multiply
    wraps silently): with Σhub ≤ unit from iteration 0 on, raw
    authorities ≤ Σhub ≤ unit and raw hubs ≤ Σauth ≤ outdeg_max·unit,
    so the ``raw * unit`` normalization product is bounded by
    outdeg_max·unit² — the preflight requires that < 2^63 and fails
    loudly otherwise (an UN-normalized start would instead peak at
    outdeg_max·indeg_max·unit² on iteration 1, overflowing on large
    skewed graphs).  ``unit`` must also exceed the node count, else
    every integer L1 share floors to zero.

    Returns (node, hub_units, auth_units) — integer shares of ``unit``.

    Plan per iteration: two partition-aligned shuffles (src gather, dst
    gather — the edge table is persisted TWICE, hash-partitioned by src
    and by dst, so only node-sized vectors ever re-exchange) + ONE eager
    local checkpoint (the raw hub table) whose materialization ALSO
    carries the L1 total as an ``observe`` metric — no broadcast-total
    job per iteration (the lazy-broadcast subplan was the r5 68 s
    regression class; the r11 chain A/B re-measured every chaining
    alternative and none beat one observe-riding checkpoint per
    iteration — see the module note above _SCC_CHAIN).  The FINAL
    iteration checkpoints the authority gather first (its L1 total
    riding that materialization), so the output authority vector is a
    projection of blocks the loop computed anyway instead of a second
    execution of the last gather.  Zero-fill of nodes missing from a gather
    is DEFERRED to the output join: a missing row contributes exactly
    what an explicit 0 contributes to every downstream integer sum
    (gather sums and L1 totals alike), so the per-iteration
    nodes-join zero-fill bought nothing but two node-sized joins per
    round.  Loop shuffles run at a partition count derived from the
    edge count (:func:`~..partitioning.loop_partitions`) — a cached
    table's layout pins every downstream join, so AQE alone cannot
    coalesce these; at production scale the derivation clamps to the
    session's configured partitions and is a no-op.  Round N-1's blocks
    are freed as soon as round N's checkpoint lands."""
    from ..caching import checkpoint_tracked, materialize_release, unpersist_ids
    from ..partitioning import loop_partitions, shuffle_scope

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if not assume_canonical:
        e = e.where(
            F.col("src").isNotNull() & F.col("dst").isNotNull()
        ).dropDuplicates(["src", "dst"])
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    spark = edges.sparkSession
    n_nodes = nodes.count()
    if n_nodes == 0:
        for df_ in (e, nodes):
            df_.unpersist()
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("hub_units"),
            F.lit(0).cast("long").alias("auth_units"),
        )
    if n_nodes >= int(unit):
        raise ValueError(
            f"unit={unit} must exceed the node count ({n_nodes}): every "
            "node's integer share of a unit-total L1 vector would floor "
            "to zero; pass a larger unit (respecting the degree headroom "
            "bound below)"
        )
    # one pass over the cached edge table yields both preflight facts:
    # max out-degree (headroom check) and the edge count (Σ per-src
    # degrees) — the separate e.count() job re-scanned e for a number
    # this aggregate already holds
    deg_row = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("__d"))
        .agg(F.max("__d").alias("__m"), F.sum("__d").alias("__n"))
        .first()
    )
    outdeg_max = int(deg_row["__m"] or 1)
    n_edges = int(deg_row["__n"] or 0)
    if outdeg_max * int(unit) * int(unit) >= 2**63:
        raise ValueError(
            f"int64 headroom exceeded: outdeg_max*unit^2 = "
            f"{outdeg_max}*{unit}^2 >= 2^63; pass a smaller unit "
            f"(<= {int((2**63 / outdeg_max) ** 0.5) - 1})"
        )
    with shuffle_scope(spark, loop_partitions(spark, n_edges)):
        e_src = e.repartition("src").persist()
        e_dst = e.repartition("dst").persist()

        def _l1_normalize(df, col):
            # EAGER local checkpoint; the L1 total rides its
            # materialization as an observe metric and enters the next
            # step as an int literal (a lazy broadcast subplan would
            # recompute the un-checkpointed chain — the r5 class)
            obs = Observation()
            df = df.observe(
                obs,
                F.greatest(F.sum(col), F.lit(1)).cast("long").alias("__t"),
            )
            df, ids = checkpoint_tracked(df)
            tot = int(obs.get["__t"])
            return (
                df.select(
                    "node",
                    F.expr(f"{col} * {int(unit)}L div {tot}L").alias(col),
                ),
                ids,
            )

        # iteration-0 L1 normalization of the constant start vector: floor
        # of unit·unit/(n·unit) per node — guarantees Σhub ≤ unit before
        # the first gather (the ADVICE r5 headroom fix)
        if init_hubs is None:
            hub = nodes.withColumn(
                "hub_units", F.lit(int(unit) // n_nodes).cast("long")
            )
            prev_ids: set[int] = set()  # blocks backing hub_{i-1}
        else:
            # warm start (:func:`hits_incremental`): stored hubs for old
            # nodes, the uniform share for nodes first seen in this batch,
            # then ONE integer L1 normalization so the headroom invariant
            # (sum(hub) <= unit before the first gather) still holds
            hub0 = nodes.join(
                init_hubs.select("node", F.col("hub_units").alias("__h")),
                "node",
                "left",
            ).select(
                "node",
                F.coalesce(F.col("__h"), F.lit(int(unit) // n_nodes))
                .cast("long")
                .alias("hub_units"),
            )
            hub, prev_ids = _l1_normalize(hub0, "hub_units")
        araw = None
        for i in range(int(iterations)):
            final = i == int(iterations) - 1
            # nodes absent from a gather (no in-/out-edges) would carry 0
            # through every sum and total — rows omitted until the output
            araw = (
                e_src.join(
                    hub.select(F.col("node").alias("src"), "hub_units"),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub_units").cast("long").alias("auth_units"))
            )
            if final:
                # the last gather feeds BOTH the final hub step and the
                # output authority vector: checkpoint it ONCE with its
                # L1 total riding the materialization (the old shape
                # re-executed this whole gather inside the separate auth
                # normalization checkpoint)
                obs_a = Observation()
                araw = araw.observe(
                    obs_a,
                    F.greatest(F.sum("auth_units"), F.lit(1))
                    .cast("long")
                    .alias("__t"),
                )
                araw, _a_ids = checkpoint_tracked(araw)
                tot_a = int(obs_a.get["__t"])
                # araw's materialization was the last consumer of the
                # previous segment's checkpoint blocks (covers the
                # warm-start init blocks when iterations == 1)
                unpersist_ids(spark, prev_ids)
                prev_ids = set()
            hraw = (
                e_dst.join(
                    araw.select(F.col("node").alias("dst"), "auth_units"),
                    "dst",
                )
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("auth_units").cast("long").alias("hub_units"))
            )
            # one checkpoint+observe per iteration: the r11 chain A/B
            # measured every lazy-chaining alternative (subquery totals,
            # node-sized identity totals) and none beat this — see the
            # module-level note above _SCC_CHAIN
            hub, ids = _l1_normalize(hraw, "hub_units")
            unpersist_ids(spark, prev_ids)
            prev_ids = ids
        auth = araw.select(
            "node",
            F.expr(f"auth_units * {int(unit)}L div {tot_a}L").alias(
                "auth_units"
            ),
        )
        out = (
            nodes.join(hub, "node", "left")
            .join(auth, "node", "left")
            .select(
                "node",
                F.coalesce("hub_units", F.lit(0))
                .cast("long")
                .alias("hub_units"),
                F.coalesce("auth_units", F.lit(0))
                .cast("long")
                .alias("auth_units"),
            )
        )
        # the deferred zero-fill reads `nodes`: materialize before the
        # persisted inputs are released (and before the scope lifts, so
        # nothing plans against the restored partition count)
        return materialize_release(out, e, nodes, e_src, e_dst)


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan,
    Albert & Kumara 2007, the deterministic variant): every node starts
    as its own label; each round, a node adopts the label most frequent
    among its neighbors (previous round's labels only), ties to the
    SMALLEST label.  Densely connected clusters converge to one label in
    a few rounds — the cheap community pass over co-purchase / link /
    near-dup graphs where modularity methods are overkill.

    Fixed synchronous rounds + integer counts + smallest-label ties make
    the result an exact deterministic function of the edge set — fully
    oracle-checkable by unrolling the rounds in SQL (unlike the
    randomized-order asynchronous LPA in the original paper).

    Output: (node, label BIGINT) for every node with ≥1 edge; nodes
    sharing a label form one community.

    Plan: edges symmetrized, hash-partitioned on src and checkpointed
    ONCE; each round joins the node-sized label table against the
    stable edge layout, aggregates (node, label) counts map-side, takes
    the per-node argmax window over ≤degree rows, checkpoints the new
    labels, and releases the previous round's blocks — per-round shuffle
    is edge-count rows of 24 bytes, the lineage-truncation discipline of
    the other iterative loops."""
    from pyspark.sql import Window

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    spark = edges.sparkSession
    fwd = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    e0 = (
        fwd.unionByName(fwd.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .persist()
    )
    n_edges = e0.count()
    with shuffle_scope(spark, loop_partitions(spark, n_edges)):
        # partitioned on d — the key every round's label join uses (the
        # old hash(s) layout re-exchanged the full edge set per round);
        # partition count derived from the edge count (no-op at scale)
        e, e_ids = checkpoint_tracked(
            e0.repartition("d"), reliable=reliable_checkpoint
        )
        e0.unpersist()
        labels = e.select(F.col("s").alias("node")).distinct().select(
            "node", F.col("node").alias("label")
        )
        labels, l_ids = checkpoint_tracked(
            labels, reliable=reliable_checkpoint
        )
        w = Window.partitionBy("node").orderBy(
            F.desc("__c"), F.asc("label")
        )
        for _ in range(iterations):
            counts = (
                e.join(labels.withColumnRenamed("node", "d"), "d")
                .groupBy(F.col("s").alias("node"), "label")
                .agg(F.count(F.lit(1)).alias("__c"))
            )
            nxt = (
                counts.withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk") == 1)
                .select("node", "label")
            )
            nxt, n_ids = checkpoint_tracked(
                nxt, reliable=reliable_checkpoint
            )
            unpersist_ids(spark, l_ids)
            labels, l_ids = nxt, n_ids
        unpersist_ids(spark, e_ids)
        return labels.select(
            "node", F.col("label").cast("long").alias("label")
        )


def pagerank_personalized_integer(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    iterations: int = 8,
    damping_pct: int = 85,
    unit: int = 10**9,
    checkpoint_every: int = 3,
    assume_no_dangling: bool = False,
) -> DataFrame:
    """PERSONALIZED PageRank in exact integer nano-units: teleport mass
    returns to the SEED set instead of everywhere, so ranks measure
    relevance *to the seeds* — "what belongs near these trusted /
    flagged / purchased nodes" (TrustRank-style propagation, related-
    item scoring, seed-expanded dedup clusters).  Same integer
    discipline as :func:`pagerank_integer` (its oracle-checkable E199
    sibling): BIGINT everywhere, fixed iteration schedule, dangling
    mass redistributed to the seeds by integer division.

    Initial mass is the teleport distribution itself (total
    ``n_nodes·unit``, all on seeds) — with a FIXED schedule the init is
    part of the contract, and starting at the teleport vector is the
    standard power-iteration choice.  Seeds not present in the graph
    still teleport (they are nodes with rank and no edges).

    Returns (node, rank_nano); non-seed nodes unreachable from any seed
    hold exactly 0."""
    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (0, 100)")
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    sd = seeds.select(F.col(seed_col).alias("node")).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(sd.select("node"))
        .distinct()
        .persist()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).persist()
    spark = edges.sparkSession
    is_seed = F.col("__s").isNotNull()
    # seed + out-degree flags in ONE node-sized frame whose single
    # aggregate yields every preflight fact — n_nodes, n_seeds, both
    # dangling counts, and the edge count (Σ outdeg) — replacing four
    # separate preflight jobs (sd.count, nodes.count, the dangling
    # aggregate, and an e.count rescan of the edge table)
    marked0 = (
        nodes.join(
            sd.select(F.col("node"), F.lit(1).alias("__s")), "node", "left"
        )
        .join(outdeg, "node", "left")
        .persist()
    )
    stats = marked0.agg(
        F.count(F.lit(1)).alias("nn"),
        F.count("__s").alias("ns"),
        F.count(F.when(F.col("outdeg").isNull(), 1)).alias("nd"),
        F.count(F.when(F.col("outdeg").isNull() & is_seed, 1)).alias("nds"),
        F.sum("outdeg").alias("ne"),
    ).first()
    n_seeds = int(stats["ns"])
    if n_seeds == 0:
        raise ValueError("seeds must be non-empty")
    n_nodes = int(stats["nn"])
    if int(damping_pct) * n_nodes * int(unit) >= 2**63:
        raise ValueError(
            f"int64 headroom exceeded: damping_pct*n_nodes*unit = "
            f"{damping_pct}*{n_nodes}*{unit} >= 2^63; pass a smaller unit"
        )
    # teleport total = (100-d)% of n*unit, split over seeds; the full
    # n*unit starts on the seeds
    seed_total = n_nodes * int(unit)
    seed_base = ((100 - damping_pct) * seed_total // 100) // n_seeds
    init_share = seed_total // n_seeds
    marked = marked0.select(
        "node", "__s", F.col("outdeg").isNull().alias("__dang")
    )
    if assume_no_dangling:
        n_dang, n_dang_seeds = 0, 0
    else:
        n_dang, n_dang_seeds = int(stats["nd"]), int(stats["nds"])
    has_dang = n_dang > 0
    # cadence 1 with dangling mass — the broadcast-subquery chaining
    # alternative measured slower (see pagerank_integer's cadence note)
    cadence = 1 if has_dang else max(1, int(checkpoint_every))
    n_edges = int(stats["ne"] or 0)
    with shuffle_scope(spark, loop_partitions(spark, n_edges)):
        # out-degree folded into a src-partitioned persisted edge table —
        # two exchanges per iteration, at an edge-count-derived partition
        # count (see pagerank_integer)
        we = (
            e.join(
                outdeg.select(F.col("node").alias("src"), "outdeg"), "src"
            )
            .repartition("src")
            .persist()
        )
        marked_p = marked.repartition("node").persist()
        m = marked_p.select(
            "node",
            "__dang",
            F.when(is_seed, F.lit(int(init_share)))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rank_nano"),
        )
        # initial state: init_share on every seed, 0 elsewhere
        dm = n_dang_seeds * int(init_share)
        live: set[int] = set()
        for i in range(int(iterations)):
            ds = dm // n_seeds if has_dang else 0
            incoming = (
                we.join(
                    m.select(F.col("node").alias("src"), "rank_nano"),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    F.sum(F.expr("rank_nano div outdeg"))
                    .cast("long")
                    .alias("inc")
                )
            )
            m = marked_p.join(incoming, "node", "left").select(
                "node",
                "__dang",
                (
                    F.when(is_seed, F.lit(int(seed_base)))
                    .otherwise(F.lit(0))
                    .cast("long")
                    + F.expr(
                        f"{int(damping_pct)}L * (coalesce(inc, 0L)"
                        f" + CASE WHEN __s IS NOT NULL THEN {int(ds)}L"
                        " ELSE 0L END) div 100"
                    )
                ).cast("long").alias("rank_nano"),
            )
            if (i + 1) % cadence == 0 or i == iterations - 1:
                obs = None
                if has_dang:
                    obs = Observation()
                    m = m.observe(
                        obs,
                        F.sum(
                            F.when(F.col("__dang"), F.col("rank_nano"))
                        ).alias("dm"),
                    )
                m, ids = checkpoint_tracked(m)
                unpersist_ids(spark, live)
                live = ids
                if obs is not None:
                    dm = int(obs.get["dm"] or 0)
        for df_ in (e, sd, nodes, outdeg, marked0, marked_p, we):
            df_.unpersist()
        return m.select("node", "rank_nano")


def pagerank_weighted_integer(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    iterations: int = 8,
    damping_pct: int = 85,
    unit: int = 10**9,
    checkpoint_every: int = 3,
    assume_no_dangling: bool = False,
) -> DataFrame:
    """WEIGHTED PageRank in exact integer nano-units: each node splits
    its mass across out-edges in proportion to INTEGER edge weights
    (``share = rank·w div Σw_out``) — the natural rank for co-purchase
    / co-occurrence / citation graphs where tie strength matters and
    the unweighted walk over-rewards promiscuous low-weight hubs.
    Same integer discipline as :func:`pagerank_integer`: BIGINT
    everywhere, fixed schedule, integer-division flooring documented —
    so the ranks value-hash and a SQL twin replays them.

    Weights must be POSITIVE integers; duplicate (src, dst) rows sum
    their weights.  ``rank·w`` must fit int64: the operator checks
    ``damping_pct · n_nodes · unit · max_weight < 2^63`` up front and
    tells you the max safe ``unit`` when it does not.

    Returns (node, rank_nano)."""
    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (0, 100)")
    e = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("w") > 0)
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    # one pass over the cached edge table yields the max weight
    # (headroom check) and the edge count (loop partition sizing)
    mw_row = e.agg(
        F.max("w").alias("__mw"), F.count(F.lit(1)).alias("__ne")
    ).first()
    max_w = mw_row["__mw"] or 1
    n_edges = int(mw_row["__ne"] or 0)
    if int(damping_pct) * n_nodes * int(unit) * int(max_w) >= 2**63:
        safe = 2**63 // (int(damping_pct) * n_nodes * int(max_w)) - 1
        raise ValueError(
            f"int64 headroom exceeded (max_weight={max_w}); pass "
            f"unit <= {safe}"
        )
    outw = e.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").alias("outw")
    ).persist()
    spark = edges.sparkSession
    base = ((100 - damping_pct) * unit) // 100
    # dangling count = n_nodes minus the out-weight table's row count —
    # a node-sized aggregate instead of an anti-join count job; the
    # dangling mass rides the checkpoint's `observe` metric as an int
    # literal for the next step (see pagerank_integer for the rationale)
    n_dang = (
        0
        if assume_no_dangling
        else n_nodes - int(outw.count())
    )
    has_dang = n_dang > 0
    if has_dang:
        marked = nodes.join(
            outw.select("node", F.lit(1).alias("__o")), "node", "left"
        ).select("node", F.col("__o").isNull().alias("__dang"))
    else:
        marked = nodes.withColumn("__dang", F.lit(False))
    # cadence 1 with dangling mass — the broadcast-subquery chaining
    # alternative measured slower (see pagerank_integer's cadence note)
    cadence = 1 if has_dang else max(1, int(checkpoint_every))
    with shuffle_scope(spark, loop_partitions(spark, n_edges)):
        # out-weight folded into a src-partitioned persisted edge table —
        # two exchanges per iteration, at an edge-count-derived partition
        # count (see pagerank_integer)
        we = (
            e.join(outw.select(F.col("node").alias("src"), "outw"), "src")
            .repartition("src")
            .persist()
        )
        marked = marked.repartition("node").persist()
        m = marked.withColumn("rank_nano", F.lit(int(unit)).cast("long"))
        dm = n_dang * int(unit)
        live: set[int] = set()
        for i in range(int(iterations)):
            ds = dm // n_nodes if has_dang else 0
            incoming = (
                we.join(
                    m.select(F.col("node").alias("src"), "rank_nano"),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    F.sum(F.expr("rank_nano * w div outw"))
                    .cast("long")
                    .alias("inc")
                )
            )
            m = marked.join(incoming, "node", "left").select(
                "node",
                "__dang",
                (
                    F.lit(int(base))
                    + F.expr(
                        f"{int(damping_pct)}L * (coalesce(inc, 0L)"
                        f" + {int(ds)}L) div 100"
                    )
                ).cast("long").alias("rank_nano"),
            )
            if (i + 1) % cadence == 0 or i == iterations - 1:
                obs = None
                if has_dang:
                    obs = Observation()
                    m = m.observe(
                        obs,
                        F.sum(
                            F.when(F.col("__dang"), F.col("rank_nano"))
                        ).alias("dm"),
                    )
                m, ids = checkpoint_tracked(m)
                unpersist_ids(spark, live)
                live = ids
                if obs is not None:
                    dm = int(obs.get["dm"] or 0)
        for df_ in (e, nodes, outw, we, marked):
            df_.unpersist()
        return m.select("node", "rank_nano")
