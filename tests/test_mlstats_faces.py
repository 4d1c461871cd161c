"""Property gates for the mlstats face pack (multi-predictor OLS, token
mutual information, BFS shortest paths, trigram similarity join) —
algorithmic guarantees the DuckDB oracle equality alone doesn't pin:
the OLS solve against an independent numeric solver, MI's non-negativity,
BFS's local-consistency certificate, and Jaccard recomputed from raw
strings in Python."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import load_all

SPECS = load_all()


def _run(name, spark, sf_dir):
    return SPECS[name].builder(spark, sf_dir)


# ------------------------------------------------------------- regression


def test_regression_multi_matches_numpy_lstsq(spark, sf_dir):
    """The distributed normal-equations solve must agree with numpy's
    QR-based lstsq (a genuinely different algorithm) to well inside the
    rounding the face applies."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.hour("ts").cast("double").alias("x1"),
            F.expr("CAST(dayofweek(ts) AS DOUBLE)").alias("x2"),
            F.col("value").alias("y"),
        )
        .collect()
    )
    fit = {
        r.event_type: r
        for r in _run("regression_multi_events", spark, sf_dir).collect()
    }
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.x1, r.x2, r.y))
    assert set(by_type) == set(fit)
    for etype, pts in by_type.items():
        X = np.array([[1.0, x1, x2] for x1, x2, _ in pts])
        y = np.array([v for *_, v in pts])
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        got = fit[etype]
        assert got.n == len(pts)
        for want, have_fx in zip(beta, (got.b0_fx, got.b1_fx, got.b2_fx)):
            assert abs(want - have_fx / 1e6) < 1e-4, (etype, want, have_fx)


# ---------------------------------------------------------------------- MI


def test_mutual_information_nonnegative_and_sorted(spark, sf_dir):
    """Full-table MI is ≥ 0; with per-cell 1e-9 flooring the integer sum
    can undershoot by at most one unit per cell (2 × n_classes cells).
    Output must arrive sorted by (mi desc, token) and respect the df
    floor the face documents."""
    out = _run("mutual_information_tokens", spark, sf_dir).collect()
    assert out, "some token must clear the df floor"
    n_classes = (
        load_table(spark, sf_dir, "documents").select("lang").distinct().count()
    )
    keys = [(-r.mi_fx, r.token) for r in out]
    assert keys == sorted(keys)
    for r in out:
        assert r.mi_fx >= -2 * n_classes
        assert r.df_t >= 10


def test_mutual_information_detects_planted_signal(spark, sf_dir):
    """Rank sanity on the real corpus: every reported token's MI is
    bounded above by ln(n_classes) in nats (the entropy ceiling of the
    class variable)."""
    out = _run("mutual_information_tokens", spark, sf_dir).collect()
    n_classes = (
        load_table(spark, sf_dir, "documents").select("lang").distinct().count()
    )
    ceiling = int(np.log(n_classes) * 1e9) + 1
    for r in out:
        assert r.mi_fx <= ceiling


# --------------------------------------------------------------------- BFS


def test_bfs_local_consistency_certificate(spark, sf_dir):
    """A distance labelling is THE BFS result iff: the source is 0;
    adjacent reached nodes differ by ≤ 1; and every reached node at
    d > 0 has a neighbor at d − 1. Verifies the iterative loop's output
    without re-deriving distances."""
    from mobility_etl_spark.queries.mlstats import _BFS_MAX_ORDERS

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < _BFS_MAX_ORDERS
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("v"))
    edges = [
        (r.u, r.v)
        for r in a.join(b, "ok")
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
        .distinct()
        .collect()
    ]
    dist = {
        r.node: r.dist for r in _run("shortest_paths_bfs", spark, sf_dir).collect()
    }
    src = min(u for u, _ in edges)
    assert dist[src] == 0
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for node, d in dist.items():
        for nb in adj[node]:
            if nb in dist:
                assert abs(dist[nb] - d) <= 1
        if d > 0:
            assert any(dist.get(nb) == d - 1 for nb in adj[node])


# ----------------------------------------------------------------- trigram


def _trigrams(s: str) -> set:
    return {s[i : i + 3] for i in range(len(s) - 2)}


def test_trigram_join_scores_match_python_sets(spark, sf_dir):
    """Recompute every reported pair's Jaccard from the raw strings
    with Python set ops — the scaled-integer SQL arithmetic must agree
    exactly — and verify no qualifying pair was missed (the inverted
    index is lossless for Jaccard ≥ 0.5: such pairs always share a
    gram)."""
    part = load_table(spark, sf_dir, "part")
    by_pk = {
        r.pk: r.name
        for r in part.filter(F.length("p_name") >= 3)
        .groupBy(F.lower("p_name").alias("name"))
        .agg(F.min("p_partkey").alias("pk"))
        .collect()
    }
    got = {
        (r.a_key, r.b_key): r
        for r in _run("trigram_similarity_join", spark, sf_dir).collect()
    }
    for (ak, bk), r in got.items():
        ga, gb = _trigrams(by_pk[ak]), _trigrams(by_pk[bk])
        inter = len(ga & gb)
        assert ak < bk
        assert (r.n_shared, r.a_size, r.b_size) == (inter, len(ga), len(gb))
        assert r.sim_1e6 == inter * 1_000_000 // len(ga | gb)
        assert 500_000 <= r.sim_1e6 <= 1_000_000
    expected = set()
    pks = sorted(by_pk)
    for i, ak in enumerate(pks):
        for bk in pks[i + 1 :]:
            ga, gb = _trigrams(by_pk[ak]), _trigrams(by_pk[bk])
            if len(ga & gb) * 1_000_000 // len(ga | gb) >= 500_000:
                expected.add((ak, bk))
    assert set(got) == expected


# ------------------------------------------------------ phrase / hashing


def test_phrase_search_agrees_with_python_scan(spark, sf_dir):
    """Index-lookup ≡ scan, re-proven in a third engine (Python): count
    adjacent ('table','scan') token pairs per doc by direct iteration."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want = {}
    for r in docs:
        toks = r.text.split(" ")
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "table" and toks[i + 1] == "scan"
        )
        if n:
            want[r.doc_id] = n
    got = {
        r.doc_id: r.n_occurrences
        for r in _run("phrase_search_positional", spark, sf_dir).collect()
    }
    assert got == want
    assert want, "phrase must occur in the corpus for the gate to mean anything"


def test_feature_hash_preserves_token_mass(spark, sf_dir):
    """The hashing trick loses identity, never mass: per-doc sum over
    buckets equals the doc's token count, and every bucket id is in
    [0, dim)."""
    from mobility_etl_spark.queries.mlstats import _FH_DIM

    vec = _run("vectorize_feature_hash", spark, sf_dir)
    per_doc = {r.doc_id: r.s for r in
               vec.groupBy("doc_id").agg(F.sum("n").alias("s")).collect()}
    toks = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    assert per_doc == toks
    buckets = [r.bucket for r in vec.select("bucket").distinct().collect()]
    assert all(0 <= b < _FH_DIM for b in buckets)


# ----------------------------------------------------- sampled quantiles


def test_hash_sample_quantiles_bounded_rank_error(spark, sf_dir):
    """The sampled estimate must sit at a true rank close to the target
    quantile: for each group and each p in {0.5, 0.9, 0.99}, the exact
    rank of the estimate within the FULL data is within 4·σ of p·n,
    where σ = √(p(1−p)·n/s_frac) is the binomial rank deviation of a
    30% sample. Also pins determinism: two runs produce identical
    estimates (hash sampling has no RNG state)."""
    est1 = {r.event_type: r for r in
            _run("quantile_hash_sample_events", spark, sf_dir).collect()}
    est2 = {r.event_type: r for r in
            _run("quantile_hash_sample_events", spark, sf_dir).collect()}
    assert {k: (v.p50_est, v.p90_est, v.p99_est) for k, v in est1.items()} == {
        k: (v.p50_est, v.p90_est, v.p99_est) for k, v in est2.items()
    }
    full = {}
    for r in load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).collect():
        full.setdefault(r.event_type, []).append(r.value)
    assert set(full) == set(est1)
    for etype, vals in full.items():
        vals.sort()
        n = len(vals)
        got = est1[etype]
        assert 0 < got.n_sampled < n
        from mobility_etl_spark.queries.mlstats import _QHS_BUCKETS, _QHS_KEEP

        s_frac = _QHS_KEEP / _QHS_BUCKETS  # single-sourced with the face
        for p, est in ((0.5, got.p50_est), (0.9, got.p90_est), (0.99, got.p99_est)):
            import bisect

            rank = bisect.bisect_right(vals, est)
            sigma = (p * (1 - p) * n / s_frac) ** 0.5
            assert abs(rank - p * n) <= 4 * sigma + 1, (
                etype, p, rank, p * n, sigma
            )
