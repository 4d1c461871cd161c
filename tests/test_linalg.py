"""Distributed Gram matrix gates (operators/linalg.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.linalg import gram_matrix


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def _dense(rows, dim):
    g = np.zeros((dim, dim))
    n = None
    for r in rows:
        if r.i == -1:
            n = r.s
        else:
            g[r.i - 1, r.j - 1] = r.s
            g[r.j - 1, r.i - 1] = r.s
    return g, n


def test_gram_blas_matches_numpy_and_exact(spark, sf_dir, emb):
    """The BLAS path equals a single-machine numpy XᵀX to float64
    round-off, under different partitionings (mergeable partials), and
    carries the exact row count."""
    x = np.stack(
        [r.embedding for r in emb.select("embedding").collect()]
    ).astype(np.float64)
    ref = x.T @ x
    for n_parts in (3, 7):
        got, n = _dense(
            gram_matrix(emb.repartition(n_parts), "embedding", 64).collect(),
            64,
        )
        assert n == x.shape[0]
        assert np.max(np.abs(got - ref)) <= 1e-9 * max(1.0, np.abs(ref).max())


def test_gram_registered_queries_agree(spark, sf_dir):
    """vector_gram_blas (scale path) vs vector_gram_matrix (decimal-
    exact oracle baseline): same upper triangle to 1e-9 relative."""
    from mobility_etl_spark.registry import load_all

    specs = load_all()
    exact = {
        (r.i, r.j): r.s
        for r in specs["vector_gram_matrix"].builder(spark, sf_dir).collect()
    }
    blas = {
        (r.i, r.j): r.s
        for r in specs["vector_gram_blas"].builder(spark, sf_dir).collect()
        if r.i != -1
    }
    assert set(exact) == set(blas)
    # the exact query is 1e-9 fixed-point (floor-quantized per row):
    # allow the accumulated downward quantization bias, n_rows × 1e-9
    n_rows = 2000
    for k, v in exact.items():
        assert abs(blas[k] - v) <= n_rows * 1e-9 + 1e-9


def test_gram_blas_plan_has_no_explode(spark, sf_dir, emb):
    """The scale path must not fan out vectors: no Generate (explode)
    in the plan — its shuffle is the d²-scalar partial merge only."""
    plan = (
        gram_matrix(emb, "embedding", 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan


def test_pca_fit_matches_numpy(spark, sf_dir, emb):
    """Distributed PCA fit ≡ single-machine numpy PCA: same explained
    variances, same components up to the fixed sign convention; the
    projection matches X_centered @ V computed locally."""
    from mobility_etl_spark.operators.linalg import pca_fit, pca_project

    rows = emb.select("vec_id", "embedding").collect()
    x = np.stack([r.embedding for r in rows]).astype(np.float64)
    comps, evar = pca_fit(emb, "embedding", 64, k=4)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    assert np.allclose(evar, evals[order], rtol=1e-8)
    ref = evecs[:, order].T.copy()
    for c in ref:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    assert np.allclose(comps, ref, atol=1e-8)
    # orthonormal components
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    # distributed projection == x @ V (per vec_id, uncentered projection)
    got = {
        r.vec_id: (r.pc1, r.pc2, r.pc3, r.pc4)
        for r in pca_project(
            emb, "embedding", comps, ("vec_id",)
        ).collect()
    }
    proj = x @ comps.T
    ids = [r.vec_id for r in rows]
    for idx, vid in enumerate(ids):
        assert np.allclose(got[vid], proj[idx], atol=1e-9)


def test_pca_projection_plan_stays_jvm(spark, sf_dir, emb):
    from mobility_etl_spark.operators.linalg import pca_fit, pca_project

    comps, _ = pca_fit(emb, "embedding", 64, k=2)
    plan = (
        pca_project(emb, "embedding", comps, ("vec_id",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # narrow map only
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_matches_numpy_lloyd(spark, sf_dir, emb):
    """Distributed Lloyd's ≡ single-machine numpy Lloyd's from the same
    deterministic seeds: centroids allclose after each of 4 iterations,
    and inertia is monotone non-increasing."""
    import pyspark.sql.functions as F

    from mobility_etl_spark.operators.linalg import kmeans_assign, kmeans_fit

    k, dim, iters = 8, 64, 4
    rows = (
        emb.select("vec_id", "embedding")
        .withColumn("__h", F.xxhash64("vec_id"))
        .orderBy("__h", "vec_id")
        .collect()
    )
    x = np.stack([r.embedding for r in rows]).astype(np.float64)
    ref = x[:k].copy()  # same seeds: k smallest hashes

    inertias = []
    for _ in range(iters):
        d2 = ((x[:, None, :] - ref[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        inertias.append(d2[np.arange(len(x)), a].sum())
        for c in range(k):
            if (a == c).any():
                ref[c] = x[a == c].mean(axis=0)
    assert all(b <= a + 1e-9 for a, b in zip(inertias, inertias[1:]))

    cents, counts = kmeans_fit(
        emb.repartition(5), "embedding", dim, k=k, iters=iters
    )
    assert np.allclose(cents, ref, atol=1e-8)
    assert int(counts.sum()) == len(x)

    assigned = kmeans_assign(emb, "embedding", cents, ("vec_id",))
    got = {r.vec_id: r.cluster_id for r in assigned.collect()}
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    order = {r.vec_id: i for i, r in enumerate(rows)}
    expect = d2.argmin(axis=1)
    mismatches = sum(
        1 for vid, cid in got.items() if cid != expect[order[vid]]
    )
    assert mismatches == 0
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_fixedpoint_partitioning_invariant(spark, sf_dir, emb):
    """The fixed-point clustering is BIT-identical across partition
    layouts — the reproducibility claim behind its exact DuckDB
    oracle (float kmeans_fit genuinely cannot pass this test: partial
    -sum merge order wobbles the means)."""
    from mobility_etl_spark.operators.linalg import kmeans_fixedpoint

    runs = []
    for parts in (3, 13):
        assigned, cents = kmeans_fixedpoint(
            emb.repartition(parts), k=8, iters=3
        )
        runs.append(
            (
                sorted((r.key, r.cluster_id) for r in assigned.collect()),
                cents,
            )
        )
    assert runs[0] == runs[1]
    # centroids are genuinely updated integers, not the raw seeds
    assert any(c != [0] * len(c) for c in runs[0][1])


def test_kmeans_fixedpoint_empty_cluster_zero_rule(spark):
    """An empty cluster becomes the zero vector (the total-semantics
    rule the oracle mirrors): with k=3 over two far-apart point
    groups whose two lowest-id seeds COINCIDE, one seed ends up
    memberless after round 1."""
    from mobility_etl_spark.operators.linalg import kmeans_fixedpoint

    rows = [
        (0, [1.0, 1.0]),
        (1, [1.0, 1.0]),  # seed 1 == seed 0: ties go to cluster 0,
        (2, [10.0, 10.0]),  # so cluster 1 is memberless after round 1
        (3, [10.0, 10.1]),
        (4, [1.002, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = kmeans_fixedpoint(df, k=3, iters=1)
    assigned.collect()  # must complete despite the empty cluster
    assert cents[1] == [0, 0]
    assert cents[0] != [0, 0] and cents[2] != [0, 0]


def test_power_iteration_fixedpoint_finds_dominant_direction(spark):
    """The integer iterate is not just deterministic — it converges
    when a dominant direction exists: on a planted anisotropic corpus
    (strong u-component + small deterministic noise), 8 rounds align
    with numpy's true top eigenvector to cos > 0.99. (The sf
    embeddings are deliberately near-isotropic — spectral gap ~ 0 —
    so convergence is gated on planted data; determinism on the real
    corpus is the DuckDB oracle's job.) Also pins partitioning
    invariance: bit-identical across layouts."""
    from mobility_etl_spark.operators.linalg import (
        power_iteration_fixedpoint,
    )

    d, n = 16, 200
    u = np.array([np.sin(1.0 + 0.37 * i) for i in range(d)])
    u /= np.linalg.norm(u)
    rows = []
    for t in range(n):
        noise = np.array(
            [np.sin(0.11 * t + 0.53 * i) for i in range(d)]
        ) * 0.2
        x = (3.0 if t % 2 == 0 else -3.0) * u + noise
        rows.append((t, [float(v) for v in x]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    outs = []
    for parts in (2, 9):
        got = power_iteration_fixedpoint(df.repartition(parts)).collect()
        outs.append(
            [r.v_fp for r in sorted(got, key=lambda r: r.dim_i)]
        )
    assert outs[0] == outs[1]  # bit-identical across partitionings

    v = np.array(outs[0], dtype=float)
    X = np.array([r[1] for r in rows])
    evals, evecs = np.linalg.eigh(X.T @ X)
    top = evecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.99


def test_kmeans_assign_blas_matches_codegen_and_tolerates_nulls(spark, emb):
    """r13: the BLAS twin must agree with the codegen assign on every
    well-formed vector, pass keep_cols through unchanged, and emit a
    NULL cluster_id/dist for null or wrong-length vectors — the
    codegen form's null-propagation behavior — instead of crashing the
    stage on np.stack."""
    import numpy as np
    from pyspark.sql import functions as F

    from mobility_etl_spark.operators.linalg import (
        kmeans_assign,
        kmeans_assign_blas,
        kmeans_fit,
    )

    cents, _ = kmeans_fit(emb, "embedding", 64, k=8, iters=2)
    want = {
        r.vec_id: r.cluster_id
        for r in kmeans_assign(emb, "embedding", cents, ("vec_id",)).collect()
    }
    got_rows = kmeans_assign_blas(
        emb, "embedding", cents, ("vec_id",), dist_col="d2",
        keep_cols=("embedding",),
    ).collect()
    assert {r.vec_id: r.cluster_id for r in got_rows} == want
    # keep_cols round-trip + dist consistency for one spot row
    r0 = got_rows[0]
    x = np.asarray(r0.embedding, dtype=np.float64)
    ref = float(((x - cents[r0.cluster_id]) ** 2).sum())
    assert abs(r0.d2 - ref) < 1e-6

    # orderBy before limit: an unordered limit re-executes per action
    # and can pick DIFFERENT rows for the union job vs the collect
    # below (the assertion would KeyError on correct code)
    bad = emb.orderBy("vec_id").limit(3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.when(F.col("vec_id") % 3 == 0, F.col("embedding"))
        .when(F.col("vec_id") % 3 == 1, F.lit(None).cast("array<float>"))
        .otherwise(F.slice("embedding", 1, 5))
        .alias("embedding"),
    )
    out = {
        r.vec_id: (r.cluster_id, r.d2)
        for r in kmeans_assign_blas(
            emb.select("vec_id", "embedding").unionByName(bad),
            "embedding",
            cents,
            ("vec_id",),
            dist_col="d2",
        ).collect()
    }
    for r in bad.collect():
        cid, d2 = out[r.vec_id]
        if r.embedding is None or len(r.embedding) != 64:
            assert cid is None and d2 is None
        else:
            assert cid is not None and d2 is not None


@pytest.mark.slow  # r15: excluded from the default (driver-budget) run; see pytest.ini
def test_kmeans_fit_array_merge_parity_large_k(spark):
    """VERDICT r13 #1: kmeans_fit's partial merge is one array-row per
    (partition, cluster) — k rows through the Exchange and k collected
    Rows, not k·d scalars. Gate: the fit matches single-machine numpy
    Lloyd's from the same deterministic seeds at k ∈ {8, 256, 4096}
    (4096 = the SemDeDup deployment cap, queries/similarity.py), with
    every vector accounted for and empty clusters keeping their seed."""
    from mobility_etl_spark.operators.linalg import _gram_d2, kmeans_fit

    n, dim, iters = 5000, 16, 2
    base = spark.range(n).select(
        F.concat(F.lit("v"), F.col("id")).alias("vec_id"),
        F.expr(
            "transform(sequence(1, 16), "
            "i -> sin(CAST(id * 16 + i AS DOUBLE)))"
        ).alias("embedding"),
    )
    rows = (
        base.withColumn("__h", F.xxhash64("vec_id"))
        .orderBy("__h", "vec_id")
        .collect()
    )
    x = np.stack([r.embedding for r in rows]).astype(np.float64)
    for k in (8, 256, 4096):
        ref = x[:k].copy()  # same seeds: k smallest hashes
        for _ in range(iters):
            a = _gram_d2(x, ref).argmin(axis=1)
            sums = np.zeros((k, dim))
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=k)
            ne = cnt > 0
            ref[ne] = sums[ne] / cnt[ne, None]
        cents, counts = kmeans_fit(
            base.repartition(7), "embedding", dim, k=k, iters=iters
        )
        assert cents.shape == (k, dim)
        assert np.allclose(cents, ref, atol=1e-8), f"k={k} diverged"
        assert int(counts.sum()) == n, f"k={k} lost vectors"
