"""PageRank (operators/pagerank.py) vs a dense NumPy power iteration."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from mobility_etl_spark.operators.pagerank import pagerank


def _numpy_pagerank(edges, damping, iters):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        # chain + hub + a dangling sink (c has no out-edges... b->c, c dangles)
        [("a", "b"), ("b", "c"), ("d", "c"), ("e", "c"), ("c2", "a")],
        # cycle (no dangling)
        [("a", "b"), ("b", "c"), ("c", "a")],
    ],
    ids=["hub_with_dangling", "cycle"],
)
def test_pagerank_matches_numpy(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iters=12, checkpoint_every=4).collect()}
    want = _numpy_pagerank(edges, 0.85, 12)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_set_hoisted(spark):
    """The dangling-node set is computed once, outside the loop: on a
    graph with NO dangling nodes, iterations run zero dangling-mass
    jobs (job count stays flat vs iteration count), and on a dangling
    graph only a scalar-agg job per iteration is added — never the
    anti-join."""
    cycle = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    tracker = spark.sparkContext.statusTracker()

    def loop_jobs(iters):
        # jobs launched by pagerank() itself (the lazy result DataFrame
        # is NOT collected): exactly the driver-side control scalars.
        before = len(tracker.getJobIdsForGroup(None) or [])
        pagerank(cycle, iters=iters, checkpoint_every=100)
        return len(tracker.getJobIdsForGroup(None) or []) - before

    # With no dangling nodes the loop runs ZERO per-iteration jobs:
    # setup (node count, edge materialize, dangling-set count) is all
    # there is, so 2 vs 6 iterations cost identical job counts. Before
    # the hoist this grew by one anti-join job per iteration.
    loop_jobs(1)  # warm the plan-keyed nodes/edges caches once
    assert loop_jobs(6) == loop_jobs(2)


def test_pagerank_bipartite_sf(spark, sf_dir):
    """The registered query's graph at sf0.001: ranks are a proper
    distribution, every node present, hub suppliers beat the floor."""
    from mobility_etl_spark.queries.graph import pagerank_part_supplier

    ranks = pagerank_part_supplier(spark, sf_dir).collect()
    n = len(ranks)
    assert n > 0
    total = sum(r.rank for r in ranks)
    assert total == pytest.approx(1.0, abs=1e-6)
    floor = 0.15 / n
    assert all(r.rank >= floor - 1e-12 for r in ranks)
    # suppliers aggregate many parts' mass: the max-ranked node is one
    assert max(ranks, key=lambda r: r.rank).node.startswith("s")


def test_kcore_matches_reference_peel_and_fixpoint(spark, sf_dir):
    """Third-engine recompute: peel the same sparsified edge set in
    plain Python and require node-for-node, degree-for-degree equality
    with the distributed k_core; every surviving degree >= 3 (fixpoint
    invariant), and the core is non-trivial (something survived AND
    something was peeled — a vacuous graph would gate nothing)."""
    from collections import defaultdict

    from mobility_etl_spark.io import load_table
    from mobility_etl_spark.registry import load_all

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set] = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                if ((u * 100003 + v) % 1000003) * 2654435761 % 1000000007 % 23 == 0:
                    edges.add((u, v))
    n_nodes0 = len({n for e in edges for n in e})
    while True:
        deg: dict[int, int] = defaultdict(int)
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        weak = {n for n, d in deg.items() if d < 3}
        if not weak:
            break
        edges = {
            (u, v) for u, v in edges if u not in weak and v not in weak
        }

    got = {
        r.node: r.degree
        for r in load_all()["network_kcore_parts"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert got == dict(deg)
    assert got and all(d >= 3 for d in got.values())
    assert len(got) < n_nodes0, "nothing was peeled — vacuous fixture"


def _python_pagerank_fixedpoint(edges, iters, scale):
    """Pure-python replay of operators/pagerank.pagerank_fixedpoint's
    integer semantics — the third engine behind the DuckDB oracle."""
    from collections import defaultdict

    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = defaultdict(int)
    for u, _ in edges:
        deg[u] += 1
    base = (15 * scale) // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        contrib = defaultdict(int)
        for u, v in edges:
            contrib[v] += r[u] // deg[u]
        dangling_mass = sum(r[v] for v in nodes if deg[v] == 0)
        share = dangling_mass // n
        r = {v: base + (85 * (contrib[v] + share)) // 100 for v in nodes}
    return r


@pytest.mark.parametrize(
    "edges",
    [
        [("a", "b"), ("b", "c"), ("d", "c"), ("e", "c"), ("c2", "a")],
        [("a", "b"), ("b", "c"), ("c", "a")],
    ],
    ids=["hub_with_dangling", "cycle"],
)
def test_pagerank_fixedpoint_bit_identical_to_replay(spark, edges):
    """Integer PageRank is BIT-identical to a sequential replay —
    including the dangling-mass integer path the registered bipartite
    face never exercises (its graph has no dangling nodes)."""
    from mobility_etl_spark.operators.pagerank import pagerank_fixedpoint

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: r.rank_fp
        for r in pagerank_fixedpoint(df, iters=9, checkpoint_every=3).collect()
    }
    assert got == _python_pagerank_fixedpoint(edges, 9, 10**12)


def test_pagerank_fixedpoint_mass_bound(spark):
    """Floor truncation leaks mass deterministically and boundedly:
    per iteration each node loses < deg(u) units distributing, < 1
    unit at the damping divide, < 1 at the dangling divide — total
    leak <= iters * (|E| + 2n) out of scale=1e12."""
    from mobility_etl_spark.operators.pagerank import pagerank_fixedpoint

    edges = [("a", "b"), ("b", "c"), ("d", "c"), ("e", "c"), ("c2", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    iters, scale = 9, 10**12
    ranks = pagerank_fixedpoint(df, iters=iters, scale=scale).collect()
    total = sum(r.rank_fp for r in ranks)
    n, e = len({x for ed in edges for x in ed}), len(edges)
    assert total <= scale
    assert total >= scale - iters * (e + 2 * n)


@pytest.mark.parametrize(
    "graph_sf", [None, "/root/testdata/sf0.01"], ids=["test_sf", "driver_sf"]
)
def test_kcore_rounds_within_oracle_cte_bound(spark, sf_dir, graph_sf):
    """The DuckDB oracle peels a FIXED number of recursive-CTE rounds
    (_KCORE_ORACLE_ROUNDS); equality with the Spark fixpoint peel only
    holds if the true round count stays under that bound. Pin it with
    the operator's stats hook on the face's own graph — at the test SF
    AND at the driver's sf0.01 gate (the bound is a constant in the
    oracle string, so it must hold at every graded scale)."""
    from mobility_etl_spark.io import load_table
    from mobility_etl_spark.operators.components import k_core
    from mobility_etl_spark.queries.sketch_graph import _KCORE_ORACLE_ROUNDS

    li = load_table(spark, graph_sf or sf_dir, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .filter(
            (((F.col("u") * 100003 + F.col("v")) % 1000003) * F.lit(2654435761))
            % 1000000007
            % 23
            == 0
        )
    )
    stats: list = []
    k_core(pairs, k=3, stats=stats).collect()
    # stats has one entry per executed round, including the final
    # no-weak-nodes round; the oracle needs bound >= executed rounds.
    assert 0 < len(stats) <= _KCORE_ORACLE_ROUNDS


def test_mg_verified_equals_exact_heavy_hitters(spark, sf_dir):
    """The MG candidate-verify face reconstructs the exact heavy-hitter
    answer: identical (token, count) set to the exact explode→groupBy
    baseline face on the same corpus."""
    from mobility_etl_spark.registry import load_all

    specs = load_all()
    exact = {
        (r.token, r.n_occurrences)
        for r in specs["token_heavy_hitters"].builder(spark, sf_dir).collect()
    }
    verified = {
        (r.token, r.n_occurrences)
        for r in specs["token_hh_mg_verified"].builder(spark, sf_dir).collect()
    }
    assert verified == exact and exact


def test_k_core_full_peel_at_max_iter_boundary(spark):
    """ADVICE r14: since the isEmpty() probe removal, a fully-peeled
    graph is detected by the NEXT round's empty degree aggregate — a
    graph whose edges vanish exactly at round max_iter-1 must still
    return the empty core (one extra cheap round), not raise."""
    from mobility_etl_spark.operators.components import k_core

    # path graph a-b-c under k=2: round 0 peels everything (ends have
    # degree 1; the middle's edges both die with them), so the empty
    # core is only DETECTABLE in round 1 — exactly max_iter with
    # max_iter=1. The r14 range(max_iter) raised here.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "u long, v long"
    )
    core = k_core(edges, k=2, max_iter=1)
    assert core.count() == 0
    # a genuinely exhausted budget still raises
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="no fixpoint"):
        k_core(edges, k=2, max_iter=0)
