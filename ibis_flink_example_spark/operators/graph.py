"""Distributed iterative graph algorithms over edge-list DataFrames.

The reference engine's surface stops at connected components (used by its
dedup clustering); PageRank is the canonical *iterative* graph workload a
training-data pipeline adds on top (authority scoring for source/domain
weighting, seed-page selection). The design constraint is the same one the
BPE trainer solved (operators/bpe.py): a loop of DataFrame jobs must not
let the lineage chain grow — each iteration eagerly ``localCheckpoint``s
its rank frame, so iteration k plans one join + one aggregation, never a
k-deep recursive subtree.

Exactness: ranks are FIXED-POINT BIGINTs (scale 1e9), every step is pure
integer arithmetic (``DIV`` floor division on positive operands matches
DuckDB's ``//``), so a DuckDB oracle that unrolls the same iterations is
bit-identical — no float accumulation, no partition-order sensitivity.

Scale posture (100 TB): per iteration the edge table is joined with the
rank table on ``src`` and re-aggregated on ``dst`` — two hash exchanges of
the *rank* table (|V| rows, tiny next to |E|) plus one shuffle of edge
contributions bounded by |E|. The edge table itself is shuffled once up
front (repartition on ``src``) and the checkpointed rank frames inherit
the aggregation partitioning, so AQE coalesces the tiny rank exchanges.
Iteration count is a fixed small constant — total cost is O(iters × |E|)
with no driver-side state beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000  # fixed-point 1e9 = rank 1.0


# Above this node count the rank table stops being broadcast into the
# per-iteration edge join and the loop falls back to the co-partitioned
# shuffle join (~16 B/node: 5M nodes ≈ 80 MB per executor — the same
# budget the decontamination broadcast guard uses).
BROADCAST_MAX_NODES = 5_000_000


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list ``(src, dst)``.

    Every node reachable as a ``src`` gets initial rank ``RANK_SCALE``;
    each iteration routes ``rank DIV out_degree`` along every edge and
    re-bases: ``rank' = (100-d)% * SCALE + d% * sum(contributions)`` with
    integer floor division throughout. The node set is kept alive by
    ZERO-ROW SEEDING: each iteration unions one (node, 0) contribution
    per out-degree node into the aggregation, so a node with no in-edges
    keeps a rank row (the base term) without a second join. Nodes that
    appear only as ``dst`` carry rank rows through the loop but are
    dropped by the final inner join on the out-degree table — their
    damping mass is lost, so symmetrize the edge list if that matters,
    as the bipartite queries do.

    Returns ``(node, rank, deg)`` with BIGINT fixed-point ranks.
    """
    from ibis_flink_example_spark.operators.dedup import (
        _release_local_checkpoint,
    )

    # Evaluate the caller's edge subtree exactly ONCE: both the degree
    # aggregation and the enrichment join read this materialization (a
    # deg checkpoint and an edges_deg checkpoint each re-running the
    # source scan is the reused-derived-frame pitfall).
    edges_cp = edges.localCheckpoint(eager=True)
    # |V|-row frame, checkpointed: reused by the edge enrichment, the
    # per-iteration node anchor, AND the final output join.
    deg = (
        edges_cp.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint(eager=True)
    )
    # Control-plane scalar: checkpointed frames carry no statistics, so
    # without the explicit hint Catalyst would shuffle-join the FULL edge
    # table against the |V|-row rank table every iteration. One count on
    # the already-materialized degree frame decides the strategy for the
    # whole loop.
    n_nodes = deg.count()
    small = n_nodes <= BROADCAST_MAX_NODES
    hint = F.broadcast if small else (lambda df: df)
    # Materialize edges+degree once; every iteration re-reads this frame,
    # never the source scan. On the broadcast path the enrichment is
    # map-only; on the fallback path one up-front shuffle on src
    # co-partitions the loop's join side.
    edges_deg = edges_cp.join(hint(deg), "src")
    if not small:
        edges_deg = edges_deg.repartition("src")
    edges_deg = edges_deg.localCheckpoint(eager=True)
    _release_local_checkpoint(edges_cp)  # superseded by edges_deg
    base = ((100 - damping_pct) * RANK_SCALE) // 100
    nodes = deg.select(F.col("src").alias("node"))
    ranks = nodes.select(
        "node", F.lit(RANK_SCALE).cast("long").alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        prev = ranks
        contrib = edges_deg.join(
            hint(
                ranks.select(
                    F.col("node").alias("src"), F.col("rank").alias("src_rank")
                )
            ),
            "src",
        ).select(
            F.col("dst").alias("node"),
            F.expr("src_rank DIV deg").alias("c"),
        )
        # Zero-row seeding replaces the anchor left-join: union one
        # (node, 0) row per node into the contribution stream, so the
        # single keyed aggregation both sums contributions AND keeps
        # no-in-edge nodes alive — one exchange per iteration, no
        # second join. (sum(c + 0-seed) == COALESCE(sum(c), 0).)
        seeded = contrib.unionAll(
            nodes.select("node", F.lit(0).cast("long").alias("c"))
        )
        # Damped sum in DECIMAL(38,0): SUM(c) alone can approach the
        # total rank mass (|V| * RANK_SCALE) when in-edges concentrate
        # on one node, and the further *damping_pct product would wrap
        # BIGINT silently past ~1e8 nodes with ANSI mode off. Decimal
        # integer arithmetic is exact, DIV floors identically on the
        # non-negative operands, and the final per-node rank is bounded
        # by the total mass, so the BIGINT cast is safe where the
        # algorithm itself is (|V| * RANK_SCALE < 2^63).
        ranks = (
            seeded.groupBy("node")
            .agg(
                F.expr(
                    f"CAST({base} + ({damping_pct}"
                    " * SUM(CAST(c AS DECIMAL(38,0)))) DIV 100"
                    " AS BIGINT)"
                ).alias("rank")
            )
            .localCheckpoint(eager=True)
        )
        _release_local_checkpoint(prev)  # superseded rank frame
    # The loop is done with the edge materialization; only the final
    # ranks + deg stay pinned (the returned plan reads both).
    _release_local_checkpoint(edges_deg)
    return ranks.join(
        hint(deg.select(F.col("src").alias("node"), "deg")), "node"
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    max_hops: int = 4,
) -> DataFrame:
    """Frontier-expansion BFS over a directed edge list: hop distances
    from a seed node set, the second iterative-graph family next to
    :func:`pagerank` (dense fixpoint there, sparse frontier here).

    Per hop: the CURRENT frontier (never the visited set) joins the edge
    table, and an anti-join against the visited set keeps only fresh
    nodes — so per-iteration work tracks the frontier size, which is the
    property that makes BFS tractable on a 100 TB edge list. Frontier
    and visited frames are localCheckpoint-ed per hop (lineage cut) and
    superseded checkpoints are released.

    ``seeds``: single-column ``node`` DataFrame. Returns ``(node, dist)``
    for every node within ``max_hops``. Deterministic: distances are
    unique minima by construction (a node enters exactly one frontier).
    """
    from ibis_flink_example_spark.operators.dedup import (
        _release_local_checkpoint,
    )

    edges_cp = edges.select("src", "dst").localCheckpoint(eager=True)
    # Same one-time decision pagerank makes: if the node universe can
    # outgrow the broadcast budget, pre-partition the edge table on src
    # ONCE so the fallback hops shuffle only the frontier side — without
    # it every non-broadcast hop would re-shuffle the full |E| rows.
    n_nodes = edges_cp.select("src").distinct().count()
    if n_nodes > BROADCAST_MAX_NODES:
        repart = edges_cp.repartition("src").localCheckpoint(eager=True)
        _release_local_checkpoint(edges_cp)
        edges_cp = repart
    frontier = seeds.select("node").distinct().localCheckpoint(eager=True)
    visited = frontier.select(
        "node", F.lit(0).cast("int").alias("dist")
    ).localCheckpoint(eager=True)
    for hop in range(1, max_hops + 1):
        # One control-plane count per hop does double duty: loop
        # termination AND the broadcast decision (BFS frontiers can grow
        # to |V| mid-traversal — an unconditional broadcast hint would
        # ship the whole frontier to every executor right when it is
        # largest).
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        hint = (
            F.broadcast
            if n_frontier <= BROADCAST_MAX_NODES
            else (lambda df: df)
        )
        neighbors = (
            edges_cp.join(
                hint(frontier.select(F.col("node").alias("src"))), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        fresh = (
            neighbors.join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        _release_local_checkpoint(frontier)
        frontier = fresh
        prev_visited = visited
        visited = visited.unionAll(
            frontier.select("node", F.lit(hop).cast("int").alias("dist"))
        ).localCheckpoint(eager=True)
        _release_local_checkpoint(prev_visited)
    _release_local_checkpoint(edges_cp)
    _release_local_checkpoint(frontier)
    return visited


def triangle_count(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact global triangle count over an undirected simple graph, by
    degree orientation (the standard distributed algorithm — cf. Suri &
    Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the Last
    Reducer"):

    1. canonicalize: undirected edges dedup to (lo, hi) pairs, self-loops
       dropped;
    2. orient each edge from its lower-(degree, id) endpoint to the
       higher one — a total order, so the oriented graph is acyclic and
       every triangle has exactly ONE source node with out-edges to the
       other two;
    3. wedges: self-join the oriented adjacency on the source, keeping
       (v, w) with v before w in the same order;
    4. count wedges whose closing edge (v, w) exists (semi-join
       before the count — the wedge frame never materializes past the
       probe).

    Why orientation matters at 100 TB: out-degrees under (degree, id)
    orientation are bounded by O(sqrt(|E|)) for any graph, so the wedge
    self-join generates O(|E|^1.5) candidates WORST case instead of the
    Θ(Σ deg²) a naive neighbor self-join pays — a star node (every
    co-purchase graph has them) produces ZERO wedges from its hub side.
    All joins are equi-joins (hash-partitioned); no driver-side state.

    Returns ONE row: (n_nodes, n_edges, n_wedges, n_triangles).
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    ranked = e.join(da, "a").join(db, "b")
    fwd = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("x"),
        F.when(fwd, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_x"),
    )
    lhs = oriented.select("u", F.col("x").alias("v"), F.col("deg_x").alias("deg_v"))
    rhs = oriented.select("u", F.col("x").alias("w"), F.col("deg_x").alias("deg_w"))
    wedges = lhs.join(rhs, "u").filter(
        (F.col("deg_v") < F.col("deg_w"))
        | ((F.col("deg_v") == F.col("deg_w")) & (F.col("v") < F.col("w")))
    )
    # the closing edge (v, w) is oriented v->w by construction: the wedge
    # filter above uses the SAME (degree, id) total order as step 2
    closing = oriented.select(F.col("u").alias("v"), F.col("x").alias("w"))
    tri = wedges.select("v", "w").join(closing, ["v", "w"], "left_semi")
    counts = (
        e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .crossJoin(
            F.broadcast(deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
        )
        .crossJoin(
            F.broadcast(
                wedges.agg(F.count(F.lit(1)).cast("long").alias("n_wedges"))
            )
        )
        .crossJoin(
            F.broadcast(tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
        )
    )
    return counts.select("n_nodes", "n_edges", "n_wedges", "n_triangles")
