"""Connected components over a similarity-pair graph — the clustering
step of near-duplicate deduplication (SURVEY.md §2.C N1/N2: pairs say
"these two are dups"; components say "this whole family is one
document, keep one representative").

Algorithm: iterative minimum-label propagation on DataFrames. Each
round, every node adopts the smallest component id among itself and
its neighbors; a fixpoint is reached within graph-diameter rounds.
Near-dup graphs are overwhelmingly tiny cliques/chains (diameter ≤ a
few hops), so convergence is fast in practice; ``max_iter`` bounds the
worst case.

Scale design (100 TB): each round is one equi join (labels ⋈ edges)
plus one groupBy-min — both plain shuffles on the node key, AQE-
handled. Lineage is truncated every round with ``localCheckpoint``
so the plan does not grow with iteration count (the classic iterative-
DataFrame trap). Convergence is detected from the monotone global
label sum (labels only ever decrease), which costs one tiny scalar agg
per round rather than an old⋈new anti join. For graphs with huge
diameters (not the dedup shape) the large-star/small-star variant
would halve rounds; the hook here keeps the simple form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src_col: str,
    dst_col: str,
    max_iter: int = 20,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``nodes``: one row per node (isolated nodes become their own
    component). ``edges``: undirected pairs (each pair listed once is
    enough). Returns ``(node_col, component)``.

    Convergence is VERIFIED, never assumed: min-label propagation
    needs as many rounds as the longest label-distance in a
    component, and a transitive near-dup chain can exceed any fixed
    bound — returning silently at ``max_iter`` (the pre-r12 behavior)
    handed unconverged labels to callers whose oracles compute the
    exact closure, splitting one true component into several
    "canonical" survivors with wrong keep/drop decisions. Exhausting
    ``max_iter`` without reaching the fixpoint now raises.
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym["src"] == labels["node"], "inner"
        ).select(F.col("dst").alias("node"), "component")
        labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:  # labels are monotone non-increasing
            return labels.withColumnRenamed("node", node_col)
        prev_sum = cur_sum

    raise RuntimeError(
        f"connected_components: no fixpoint within max_iter={max_iter} "
        "rounds — labels are still propagating (a component's label "
        "distance exceeds the bound); raise max_iter rather than "
        "accept unconverged components"
    )


def bfs_distances(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    sources: DataFrame,
    max_depth: int = 12,
    symmetrize: bool = True,
) -> DataFrame:
    """Unweighted single/multi-source shortest-path distances by
    frontier-expansion BFS (the iterative-algorithm complement to
    :func:`connected_components`).

    ``edges`` are treated as undirected (symmetrized here like
    connected_components, unless the caller's edge set already
    contains both directions — pass ``symmetrize=False`` to skip the
    union+distinct shuffle). ``sources`` is a one-column DataFrame of
    start nodes (distance 0). Returns ``(node, dist)`` for every node
    within ``max_depth`` hops of any source — first arrival is the
    minimum distance because expansion is strictly level-by-level.

    Scale shape: each level is ONE equi-join frontier ⋈ edges plus an
    anti-join against the visited set — shuffle volume is O(frontier ×
    avg-degree), never all-pairs. Only each level's FRONTIER is
    localCheckpoint-ed (flat lineage, like components); the cumulative
    visited set is a plain union of those checkpointed frontiers, so
    total materialized data stays O(reached nodes), not
    O(nodes × depth). The per-level emptiness probe is a control-plane
    scalar. On a cluster the visited set stays hash-partitioned on
    node across levels, so the anti-join reuses the partitioning.
    """
    sym = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    if symmetrize:
        sym = sym.union(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        ).distinct()
    frontier = (
        sources.toDF("node")
        .distinct()
        .select("node", F.lit(0).cast("int").alias("dist"))
        .localCheckpoint(eager=True)
    )
    dist = frontier
    for level in range(1, max_depth + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["u"], "inner")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(level).cast("int").alias("dist"))
            .localCheckpoint(eager=True)
        )
        # control-plane scalar: loop convergence, not data movement
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt)  # union of flat-lineage checkpoints
        frontier = nxt
    return dist


def k_core(
    edges: DataFrame,
    k: int,
    max_iter: int = 50,
    stats: list | None = None,
) -> DataFrame:
    """K-core of an undirected graph: iteratively peel nodes of degree
    < k until the fixpoint — the density filter behind spam/bot
    subgraph extraction and community seeding (what survives is the
    maximal subgraph where every node keeps >= k neighbors).

    ``edges`` is one row per undirected edge (u, v), u != v, deduped.
    Per round: one degree aggregation over both endpoint columns, a
    broadcast semi-join of surviving nodes back onto the edges, and a
    one-scalar convergence collect — the same bounded-control-plane
    loop as :func:`connected_components`, lineage truncated per round.
    Peeling rounds are bounded by the graph's degeneracy ordering
    depth (typically << |V|); ``max_iter`` is the runaway stop.

    Returns the surviving nodes with their in-core degree
    (node, degree) — every degree is >= k by construction (gated in
    tests alongside a driver-side reference peel).

    ``stats``, if given, receives one dict per peeling round:
    ``{"round", "wall_s", "n_weak", "edge_parts"}`` — the SCALING.md
    stress-run telemetry (per-round cost and partition width).
    """
    import time

    cur = edges.select("u", "v").localCheckpoint(eager=True)
    # range(max_iter + 1), not range(max_iter): since the r14 removal
    # of the per-round isEmpty() probe, a fully-peeled graph is
    # detected by the NEXT round's n_weak == 0 check on the empty
    # degree table — so a graph whose last edges peel exactly at round
    # max_iter - 1 needs one extra (cheap, empty-aggregate) round to
    # return its empty core instead of raising (ADVICE r14).
    for rnd in range(max_iter + 1):
        t0 = time.monotonic()
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("degree"))
        ).localCheckpoint(eager=True)
        n_weak = deg.filter(F.col("degree") < k).count()  # control-plane
        if n_weak == 0:
            if stats is not None:
                stats.append(
                    {
                        "round": rnd,
                        "wall_s": time.monotonic() - t0,
                        "n_weak": 0,
                        "edge_parts": cur.rdd.getNumPartitions(),
                    }
                )
            return deg
        keep = deg.filter(F.col("degree") >= k).select("node")
        cur = (
            cur.join(
                F.broadcast(keep.select(F.col("node").alias("u"))), "u"
            )
            .join(F.broadcast(keep.select(F.col("node").alias("v"))), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        if stats is not None:
            stats.append(
                {
                    "round": rnd,
                    "wall_s": time.monotonic() - t0,
                    "n_weak": n_weak,
                    "edge_parts": cur.rdd.getNumPartitions(),
                }
            )
        # No per-round isEmpty() probe (r14, guide §1.2 — one fewer
        # job per round): if every edge was peeled, the NEXT round's
        # degree aggregate is empty, n_weak is 0, and the empty deg
        # (same schema) returns through the fixpoint branch.
    raise RuntimeError(f"k_core: no fixpoint within {max_iter} rounds")
