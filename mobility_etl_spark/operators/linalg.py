"""Distributed dense linear algebra over embedding columns.

The pattern that scales: per-partition BLAS on Arrow batches, merging
tiny d×d partials — never a shuffle of the vectors themselves. A Gram
matrix (Xᵀ X) over N vectors of dimension d shuffles exactly
``partitions × d(d+1)/2`` scalar rows regardless of N; covariance,
PCA-by-eigendecomposition (d×d on the driver), and whitening all
derive from it. This is the standard map-reduce factorization of
covariance computation — the d×d result is a *control* structure, like
IVF centroids (operators/similarity.py), not data.

The exact explode-based formulation (queries/similarity.py:
``vector_gram_matrix``) is the DuckDB-checkable baseline: per-row
double products summed as DECIMAL so partial-aggregation order can't
change a bit. The BLAS path here is gated against it to ~1e-9 relative
error in tests/test_linalg.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Upper-triangle Gram matrix via partition-local ``numpy`` ``XᵀX``.

    One mapInPandas pass: each Arrow batch is stacked into an (n, d)
    float64 matrix and multiplied locally; a partition emits d(d+1)/2
    partial rows however many vectors it held. The merge is a tiny
    groupBy-sum on (i, j). Also emits per-partition row counts under
    (i=-1, j=-1) so downstream covariance/mean normalization needs no
    second pass.
    """
    import numpy as np
    import pandas as pd

    iu = None  # built lazily inside workers

    def partials(batches):
        nonlocal iu
        g = np.zeros((dim, dim))
        n = 0
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g += x.T @ x
            n += x.shape[0]
        if n == 0:
            return
        ii, jj = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": np.concatenate([ii + 1, [-1]]),
                "j": np.concatenate([jj + 1, [-1]]),
                "s": np.concatenate([g[ii, jj], [float(n)]]),
            }
        )

    return df.select(vec_col).mapInPandas(partials, "i int, j int, s double")


def pca_fit(
    df: DataFrame, vec_col: str, dim: int, k: int
) -> tuple["object", "object"]:
    """Fit a k-component PCA from one distributed pass + an O(d³)
    driver-side eigendecomposition.

    The distributed part ships only the Gram partials (plus per-index
    sums for centering) — d(d+1)/2 + d + 1 scalars per partition; the
    d×d eigenproblem is a *control* computation like k-means centroids
    (operators/similarity.py:ivf), never data-scale. Eigenvector sign
    is fixed (largest-|component| coordinate made positive) so the fit
    is deterministic. Returns (components [k×d], explained_var [k]).
    """
    import numpy as np
    import pandas as pd

    def partials(batches):
        g = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g += x.T @ x
            s += x.sum(axis=0)
            n += x.shape[0]
        if n == 0:
            return
        ii, jj = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": np.concatenate([ii + 1, np.zeros(dim, int), [-1]]),
                "j": np.concatenate([jj + 1, np.arange(1, dim + 1), [-1]]),
                "s": np.concatenate([g[ii, jj], s, [float(n)]]),
            }
        )

    merged = (
        df.select(vec_col)
        .mapInPandas(partials, "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    g = np.zeros((dim, dim))
    mu_sum = np.zeros(dim)
    n = 0.0
    for r in merged:
        if r.i == -1:
            n = r.s
        elif r.i == 0:
            mu_sum[r.j - 1] = r.s
        else:
            g[r.i - 1, r.j - 1] = r.s
            g[r.j - 1, r.i - 1] = r.s
    mu = mu_sum / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1.0)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    # Deterministic sign: the max-|x| coordinate of each component > 0.
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps, evals[order]


def pca_project(
    df: DataFrame, vec_col: str, components, key_cols: tuple[str, ...]
) -> DataFrame:
    """Project vectors onto fitted components, JVM-side: each component
    is a broadcast array literal and the dot product is
    ``aggregate(zip_with(...))`` inside whole-stage codegen — no Python
    in the per-row path, no shuffle at all (narrow map)."""
    out = df.select(*key_cols)
    proj_cols = []
    for ci, comp in enumerate(components):
        arr = F.array(*[F.lit(float(c)) for c in comp])
        proj_cols.append(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), arr, lambda x, c: x.cast("double") * c
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias(f"pc{ci + 1}")
        )
    return df.select(*key_cols, *proj_cols)


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int = 8,
    iters: int = 5,
    key_col: str = "vec_id",
):
    """Lloyd's k-means, factored for scale like every iterative
    operator here (pagerank, connected components): the k×d centroid
    set is *control state* that lives driver-side and broadcasts into
    each pass; the data never shuffles at all. Per iteration, one
    mapInPandas pass assigns each vector to its nearest centroid and
    emits ONE row per (partition, cluster): ``(cid, sum array<double>,
    count)`` — k array-rows per partition, not k·d scalar rows
    (VERDICT r13 #1: at the SemDeDup deployment cap k=4096, d=64 the
    scalar form pushed ~262k rows per partition per iteration through
    the Exchange and collected ~262k Rows on the driver; the array
    form shuffles k rows and collects exactly k — ~2 MB at the cap).
    The merge is a grouped elementwise-sum ``applyInPandas`` (k
    groups); the driver recomputes means (an O(k·d) update) and
    loops. Seeding is deterministic and layout-invariant: the k rows
    with the smallest ``xxhash64(key)``.

    Returns (centroids ndarray [k×d], counts ndarray [k]). Empty
    clusters keep their previous centroid. tests/test_linalg.py gates
    parity with single-machine numpy Lloyd's and monotone inertia,
    plus scalar-vs-array merge parity at k ∈ {8, 256, 4096}.
    """
    import numpy as np
    import pandas as pd

    seeds = (
        df.select(key_col, vec_col)
        .withColumn("__h", F.xxhash64(key_col))
        .orderBy("__h", key_col)
        .limit(k)
        .collect()
    )
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seeds])
    counts = np.zeros(k)

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "cid": [int(pdf["cid"].iloc[0])],
                "s": [np.stack(pdf["s"].to_numpy()).sum(axis=0)],
                "n": [float(pdf["n"].sum())],
            }
        )

    for _ in range(iters):
        c_b = cents.copy()

        def partials(batches, c_b=c_b):
            sums = np.zeros((k, dim))
            cnt = np.zeros(k)
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                a = _gram_d2(x, c_b).argmin(axis=1)
                np.add.at(sums, a, x)
                cnt += np.bincount(a, minlength=k)
                seen = True
            if not seen:
                return  # empty partition: contribute nothing
            yield pd.DataFrame(
                {"cid": np.arange(k), "s": list(sums), "n": cnt}
            )

        merged = (
            df.select(vec_col)
            .mapInPandas(partials, "cid int, s array<double>, n double")
            .groupBy("cid")
            .applyInPandas(merge, "cid int, s array<double>, n double")
            .collect()
        )
        sums = np.zeros((k, dim))
        counts = np.zeros(k)
        for r in merged:
            sums[r.cid] = np.asarray(r.s, dtype=np.float64)
            counts[r.cid] = r.n
        nonempty = counts > 0
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cents, counts


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    centroids,
    key_cols: tuple[str, ...],
    dist_col: str | None = None,
) -> DataFrame:
    """Tag each vector with its nearest fitted centroid — pure codegen:
    the k distances are broadcast-literal zip_with folds and the argmin
    is array_position of the array minimum; narrow map, no shuffle, no
    Python. ``dist_col`` optionally emits the squared distance to the
    winning centroid (the SemDeDup representative-selection input)."""
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(c)) for c in cent]),
                    lambda x, c: (x.cast("double") - c)
                    * (x.cast("double") - c),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for cent in centroids
        ]
    )
    cols = [
        *key_cols,
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias(
            "cluster_id"
        ),
    ]
    if dist_col is not None:
        cols.append(F.array_min(dists).alias(dist_col))
    return df.select(*cols)


def _gram_d2(x, cents):
    """All-pairs squared distances via the gram form
    ``||x||² − 2xCᵀ + ||c||²`` — ONE spelling shared by kmeans_fit's
    per-iteration assignment and kmeans_assign_blas (r13 review). NOT
    the broadcast difference ``((x[:,None,:] − C)²).sum(2)``: that
    materializes an (n × k × d) tensor — 1.3 GB per 10k-row batch at
    k=256, d=64, measured 45 s/fit at 400k vectors (r13) — where the
    gram is one BLAS call and an (n × k) matrix. Rounding differs in
    the last bits (can be tiny-negative for near-identical points via
    cancellation — callers use it for argmin/ordering, where that is
    harmless); the fit parity gate is allclose(1e-8) + argmin equality
    on margin-separated data (tests/test_linalg.py)."""
    import numpy as np

    return (
        (x * x).sum(axis=1)[:, None]
        - 2.0 * (x @ np.ascontiguousarray(cents).T)
        + (cents * cents).sum(axis=1)[None, :]
    )


def kmeans_assign_blas(
    df: DataFrame,
    vec_col: str,
    centroids,
    key_cols: tuple[str, ...],
    dist_col: str | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """BLAS twin of :func:`kmeans_assign` for LARGE k. The codegen form
    expands k zip_with folds into ~k·d scalar expressions per row —
    fine at k ≤ 16, but at k = 256, d = 64 that is ~16k expressions,
    past whole-stage-codegen's practical limits (measured 72 s incl.
    its follow-up join at 400k vectors, r13). Here one Arrow-batched
    ``mapInPandas`` pass computes all k distances as a single
    ``||x||² − 2xCᵀ + ||c||²`` gram; argmin's first-minimum tie-break
    matches the codegen form's ``array_position(array_min)``.

    ``keep_cols`` pass extra columns (e.g. the vector itself) through
    the same pass — the SemDeDup caller previously re-JOINED the
    corpus on the key to get its embeddings back, a full wide-row
    shuffle join this parameter deletes.

    Float caveats: gram-form rounding differs from the sequential
    fold in the last bits (exact ties may split differently — callers
    gating decision-equality must recompute over THIS assignment), and
    ``dist_col`` can be a tiny negative for near-identical points
    (cancellation); it is an ORDERING key (centrality), where that is
    harmless. Still map-only: no shuffle, centroids ride the closure
    (k·d ≤ ~4096·64 float64 = 2 MB, under the task-binary budget)."""
    import numpy as np
    import pandas as pd

    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    d = cents.shape[1]
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_cols = list(dict.fromkeys([*key_cols, *keep_cols]))
    schema = ", ".join(
        [f"{c} {fields[c]}" for c in out_cols]
        + ["cluster_id int"]
        + ([f"{dist_col} double"] if dist_col else [])
    )
    in_cols = list(dict.fromkeys([*out_cols, vec_col]))

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # null/ragged vectors get a NULL cluster_id/dist — the
            # codegen twin's behavior (zip_with/aggregate propagate
            # null); np.stack on them would crash the whole stage
            ok = np.fromiter(
                (
                    v is not None and len(v) == d
                    for v in pdf[vec_col]
                ),
                dtype=bool,
                count=len(pdf),
            )
            cid_f = np.full(len(pdf), np.nan)
            d2_f = np.full(len(pdf), np.nan)
            if ok.any():
                x = np.stack(
                    [
                        np.asarray(v, dtype=np.float64)
                        for v in pdf[vec_col][ok]
                    ]
                )
                d2 = _gram_d2(x, cents)
                cid = d2.argmin(axis=1)
                idx = np.nonzero(ok)[0]
                cid_f[idx] = cid
                d2_f[idx] = d2[np.arange(len(cid)), cid]
            out = pdf[out_cols].copy()
            out["cluster_id"] = pd.Series(cid_f).astype("Int32")
            if dist_col:
                out[dist_col] = pd.array(
                    [None if not o else v for o, v in zip(ok, d2_f)],
                    dtype="Float64",
                )
            yield out

    return df.select(*in_cols).mapInPandas(assign, schema)


def gram_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Merged upper-triangle Gram matrix: (i, j, s) with 1 ≤ i ≤ j ≤ d,
    plus the row count at (-1, -1). Shuffle volume is O(partitions·d²),
    independent of corpus size."""
    return (
        gram_matrix_partials(df, vec_col, dim)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )


def kmeans_fixedpoint(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 8,
    iters: int = 4,
    quant: int = 10**6,
) -> tuple[DataFrame, list[list[int]]]:
    """Lloyd's k-means in scaled-integer (fixed-point) arithmetic:
    returns ``(assignments DataFrame (key, cluster_id), centroids)``
    with every quantity a BIGINT — fully deterministic on any
    partitioning, any engine.

    Same determinism move as pagerank_fixedpoint: float Lloyd's is
    order-of-addition dependent (partial-sum merge order wobbles the
    means in the last ulps, which can FLIP a borderline assignment),
    so two cluster layouts of the same data can genuinely disagree.
    Quantizing components to ``floor(x*quant)`` BIGINTs makes every
    distance and every centroid sum exact and commutative:

    * seeds   = the ``k`` lowest-``key_col`` quantized vectors;
    * assign  = argmin of integer squared distance, ties to the
      lowest cluster_id (folded into one scalar key dist*k + cid);
    * update  = per-component integer mean, DIV truncating toward
      zero (Spark ``div`` == DuckDB ``//`` semantics — checked on
      negatives); an empty cluster becomes the zero vector.

    Which is what lets queries/similarity.py register a strict DuckDB
    recursive-CTE oracle for the clustering family instead of a
    rows-only check. Plan shape per iteration: one broadcast
    (k centroids as a literal-free tiny DF), one narrow argmin agg,
    one posexplode sum — the k·(d+1)-scalars-per-partition merge of
    kmeans_fit, now in exact integers; centroids are bounded
    control-plane state (k×d ints collected per round).
    """
    spark = df.sparkSession
    vq = df.select(
        F.col(key_col).alias("key"),
        F.expr(
            f"transform({vec_col}, x -> "
            f"CAST(FLOOR(CAST(x AS DOUBLE) * {quant}.0) AS BIGINT))"
        ).alias("vq"),
    ).localCheckpoint(eager=True)
    first = vq.first()
    if first is None:
        raise ValueError("kmeans_fixedpoint: empty input DataFrame")
    dim = len(first["vq"])
    cents: list[list[int]] = [
        list(r["vq"]) for r in vq.orderBy("key").limit(k).collect()
    ]
    if len(cents) < k:
        # explicit contract, not a cryptic IndexError: the k lowest-key
        # seeds ARE the semantics (and the oracle's LIMIT k would
        # silently under-seed) — callers must pass >= k vectors
        raise ValueError(
            f"kmeans_fixedpoint: needs >= k={k} rows, got {len(cents)}"
        )

    def _assign(cdf: DataFrame) -> DataFrame:
        dist = F.expr(
            "aggregate(zip_with(vq, cent, (a, b) -> (a - b) * (a - b)), "
            "0L, (acc, v) -> acc + v)"
        )
        return (
            vq.crossJoin(F.broadcast(cdf))
            .select("key", "vq", (dist * k + F.col("cluster_id")).alias("dk"))
            .groupBy("key", "vq")
            .agg(F.min("dk").alias("dk"))
            .select(
                "key",
                "vq",
                F.expr(f"CAST(dk % {k} AS INT)").alias("cluster_id"),
                # integer squared distance to the winning centroid —
                # the deterministic centrality key SemDeDup needs
                F.expr(f"dk div {k}").alias("d2_fp"),
            )
        )

    def _cents_df(c: list[list[int]]) -> DataFrame:
        return spark.createDataFrame(
            [(j, c[j]) for j in range(k)], "cluster_id int, cent array<bigint>"
        )

    def _truncdiv(s: int, n: int) -> int:
        q = abs(s) // n
        return q if s >= 0 else -q

    for _ in range(iters):
        assigned = _assign(_cents_df(cents))
        sums = (
            assigned.select("cluster_id", F.posexplode("vq").alias("i", "x"))
            .groupBy("cluster_id", "i")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = [[0] * dim for _ in range(k)]
        for r in sums:
            new[r["cluster_id"]][r["i"]] = _truncdiv(int(r["s"]), int(r["n"]))
        cents = new

    final = _assign(_cents_df(cents)).select("key", "cluster_id", "d2_fp")
    return final, cents


def power_iteration_fixedpoint(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    iters: int = 8,
    quant: int = 10**6,
    shift: int = 1 << 20,
) -> DataFrame:
    """Top-eigenvector power iteration of the corpus Gram matrix in
    scaled-integer arithmetic: returns ``(dim_i, v_fp)`` — the
    unnormalized integer eigenvector iterate after ``iters`` rounds.

    The third member of the fixed-point family (pagerank_fixedpoint,
    kmeans_fixedpoint): float power iteration wobbles in the last
    ulps with summation order, so the dominant direction of 100 TB of
    embeddings is not reproducible run-to-run; integer arithmetic
    makes it bit-identical on any partitioning, any engine.

    Distribution shape: the ONLY data-scale work is the Gram
    accumulation — components quantized to ``floor(x*quant)`` BIGINTs,
    per-vector outer products exploded and summed (associative integer
    sums; one shuffle of d^2 cells) — after which A is d x d
    control-plane state and the iteration is driver arithmetic (same
    bounded-state posture as kmeans_fit's k x (d+1) merge). Overflow
    discipline: Gram sums accumulate in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) — exact to ~1e38 of accumulated mass (far past
    any real corpus; with ANSI off Spark returns NULL past that
    rather than wrapping, and the null-check below turns it into an
    explicit overflow error instead of a silent wrong answer) — then
    A is truncating-divided by the corpus-ADAPTIVE divisor
    ``max|A| * d // 2^42 + 1`` (so |a'| <= 2^42/d) and each iterate is
    renormalized by ``max|w| // shift + 1`` (so |v| <= 2^20): every
    per-iteration sum stays <= 2^62, inside BIGINT, for any n.
    """
    spark = df.sparkSession
    # the self-join keys on the REAL row key, never a generated id:
    # monotonically_increasing_id() is plan-position-dependent and can
    # differ between the two sides of a self-join (each side may
    # rescan), silently pairing elements of DIFFERENT vectors
    elems = df.select(
        F.col(key_col).alias("rid"),
        F.posexplode(
            F.expr(
                f"transform({vec_col}, x -> "
                f"CAST(FLOOR(CAST(x AS DOUBLE) * {quant}.0) AS BIGINT))"
            )
        ).alias("i", "x"),
    )
    b = elems.select(
        F.col("rid"), F.col("i").alias("j"), F.col("x").alias("y")
    )
    # Gram sums accumulate in DECIMAL(38,0): a BIGINT sum of n per-row
    # products (each <= quant^2 * |x|^2 ~ 1e14) wraps SILENTLY (ANSI
    # off) past n ~ 1e5 vectors — decimal is exact to 1e38, matching
    # DuckDB's HUGEINT accumulation on the oracle side.
    gram_rows = (
        elems.join(b, "rid")
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias(
                "aa"
            )
        )
        .collect()
    )

    def _truncdiv(a: int, n: int) -> int:
        q = abs(a) // n
        return q if a >= 0 else -q

    # DECIMAL(38,0) SUM returns NULL on overflow with ANSI off — fail
    # loudly (int(None) would raise a bare TypeError) rather than let
    # a >1e38 accumulation masquerade as data.
    if any(r["aa"] is None for r in gram_rows):
        raise OverflowError(
            "power_iteration_fixedpoint: Gram accumulation overflowed "
            "DECIMAL(38,0) (~1e38) — reduce `quant` or pre-aggregate "
            "in two levels before the final sum"
        )
    d = 1 + max(r["i"] for r in gram_rows)
    A = [[0] * d for _ in range(d)]
    for r in gram_rows:
        A[r["i"]][r["j"]] = int(r["aa"])
    # Corpus-size-adaptive divisor keeps the ORACLE's per-iteration
    # BIGINT sums safe at ANY n: |a'| <= 2^42/d, so |Σ_j a'v_j| <=
    # d * (2^42/d) * 2^20 = 2^62. Deterministic integer arithmetic —
    # the oracle computes the identical divisor from MAX(ABS(a)).
    max_a = max((abs(x) for row in A for x in row), default=0)
    adiv = (max_a * d) // (1 << 42) + 1
    A = [[_truncdiv(x, adiv) for x in row] for row in A]

    v = [1] * d
    for _ in range(iters):
        w = [sum(A[i][j] * v[j] for j in range(d)) for i in range(d)]
        den = max(abs(x) for x in w) // shift + 1
        v = [_truncdiv(x, den) for x in w]
    # 1-based dim index, matching the oracle's generate_series(1, d)
    return spark.createDataFrame(
        [(i + 1, v[i]) for i in range(d)], "dim_i int, v_fp long"
    )
