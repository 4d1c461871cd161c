"""Distributed PageRank: iterative DataFrame power iteration.

The one algorithm class the relational surface can't express in a
single plan: a fixpoint loop. The engine-native pattern (also how
GraphX/GraphFrames structure it) is

    rank_{t+1}(v) = (1-d)/N + d * ( Σ_{u→v} rank_t(u)/outdeg(u)
                                    + dangling_mass_t / N )

with each iteration one join (edges ⋈ ranks on src) + one groupBy
(dst). The two scale-critical details this module gets right:

- **Lineage truncation.** Each iteration extends the logical plan; by
  iteration ~20 the plan alone is megabytes and Catalyst analysis
  dominates runtime (or the driver OOMs). ``localCheckpoint`` every
  ``checkpoint_every`` iterations materializes the ranks and CUTS the
  plan — the difference between 10 iterations and 50 working at all.
- **Pre-partitioned edges.** Edges are hash-partitioned on ``src``
  once, up front; every iteration's join then reuses that layout and
  only the (small) ranks side shuffles. Degrees ride along with the
  edges so the per-iteration join is edges ⋈ ranks only.

Dangling nodes (no out-edges) donate their mass uniformly — one
driver-side scalar agg per iteration (a few bytes, not a collect of
the graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 5,
    stats: list | None = None,
) -> DataFrame:
    """Return ``(node, rank)`` after ``iters`` power iterations.

    ``edges`` is a directed edge list; parallel edges count once
    (deduped here). Ranks sum to 1 at every iteration.

    ``stats``, if given, receives one dict per iteration:
    ``{"iter", "wall_s", "rank_parts"}`` — the per-round cost/width
    telemetry the SCALING.md stress runs read (the BPE trainer's
    partition-snowball was caught by exactly this kind of hook).
    """
    import time
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .repartition("node")
        .cache()
    )
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # degree rides with the edge: per-iteration join touches ranks only
    edges = edges.join(outdeg, "src").repartition("src").cache()
    edges.count()

    # The dangling-node SET is iteration-invariant (topology, not
    # rank): materialize it once and reuse — per iteration only the
    # scalar mass is re-aggregated (a semi-join against this cached
    # set), not the anti-join recomputed.
    dangling_nodes = (
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left_anti")
        .select("node")
        .cache()
    )
    has_dangling = dangling_nodes.count() > 0

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iters):
        t0 = time.monotonic()
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # mass on nodes with no out-edges, redistributed uniformly
        dangling = 0.0
        if has_dangling:
            dangling = (
                ranks.join(dangling_nodes, "node", "left_semi")
                .agg(F.sum("rank"))
                .first()[0]
                or 0.0
            )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
        if stats is not None:
            # materialization is lazy; force the round so wall_s is the
            # real per-iteration cost, and record the partition width
            # (the snowball telemetry)
            ranks = ranks.localCheckpoint(eager=True)
            stats.append(
                {
                    "iter": i,
                    "wall_s": time.monotonic() - t0,
                    "rank_parts": ranks.rdd.getNumPartitions(),
                }
            )
    return ranks


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 8,
    scale: int = 10**12,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Deterministic PageRank in scaled-integer (fixed-point)
    arithmetic: ``(node, rank_fp)`` with ``rank_fp`` a BIGINT in units
    of ``1/scale``, damping fixed at 85/100.

        rank_{t+1}(v) = base + (85 * Σ_{u→v} (rank_t(u) div deg(u))
                                + 85 * (dangling_t div N)) div 100
        base          = (15 * scale) div (100 * N)

    Why integers: float power iteration is order-of-addition dependent
    — the same graph on a different partitioning (or a different
    executor count) produces last-ulp-different ranks, so results are
    not reproducible across cluster topologies and not comparable
    across engines. Integer contributions make every Σ exact and
    commutative: the result is BIT-IDENTICAL on any partitioning, any
    engine — which is exactly what lets a plain recursive-CTE oracle
    (DuckDB) replay it hash-for-hash (queries/graph.py). The price is
    a deterministic floor-truncation leak of < 1/scale mass per node
    per iteration — at scale=1e12 that is 1e-12 relative, tighter
    than float64 noise. Same per-iteration plan shape as
    :func:`pagerank`: edges pre-partitioned on src with degree riding
    along, ranks-only shuffle, lineage cut every
    ``checkpoint_every`` rounds.
    """
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .repartition("node")
        .cache()
    )
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edges = edges.join(outdeg, "src").repartition("src").cache()
    edges.count()
    dangling_nodes = (
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left_anti")
        .select("node")
        .cache()
    )
    has_dangling = dangling_nodes.count() > 0

    base = (15 * scale) // (100 * n)
    ranks = nodes.select(
        "node", F.lit(scale // n).cast("long").alias("rank_fp")
    )
    for i in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select("dst", F.expr("rank_fp div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling_share = 0
        if has_dangling:
            mass = (
                ranks.join(dangling_nodes, "node", "left_semi")
                .agg(F.sum("rank_fp"))
                .first()[0]
                or 0
            )
            dangling_share = int(mass) // n
        ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"(85 * (coalesce(contrib, 0L) + {dangling_share}L)) div 100"
                )
            ).cast("long").alias("rank_fp"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
