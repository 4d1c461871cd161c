"""Vector similarity search (SURVEY.md §2.C N3/N6).

Two paths over ``embeddings.embedding: array<float>``:

* **Brute-force top-k** (the correctness baseline): broadcast the
  (small) query set against all candidates, cosine via
  ``zip_with`` + decimal-quantized ``aggregate`` (engine-exact, see
  functions/compat.py rationale), rank with a per-query window. Scales
  linearly in candidates — right up to ~10^7·dim per executor-second;
  past that, use the LSH path.
* **Random-hyperplane LSH** (the 100 TB path): deterministic
  pseudo-random hyperplanes derived from xxhash64(plane, dim) — no
  stored model, any executor regenerates the same planes — sign-bit
  signatures, candidates = same band bucket, exact re-rank within the
  bucket. Recall vs brute force is asserted in tests
  (SURVEY.md §7 hard-part 6: approx ops get recall gates, not
  hash-equality).

All scoring/re-rank math is built-in expressions (no pyspark.ml). The
one Python touchpoint is the banded-LSH signature pass, which defaults
to a vectorized Arrow pandas UDF (one BLAS matmul per batch) because
interpreted higher-order lambdas cost ~100× more CPU for the same
buckets — the pure-expression form survives as `signature="expr"` and
is parity-gated against the Arrow form in tests/test_similarity.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Decimal type for quantized dot-product folds (see compat.DEC note).


def _dot_expr(a: str, b: str) -> F.Column:
    """Engine-exact dot product of two float arrays as double.

    Per-term double product FLOORED to 1e-6 fixed point (BIGINT) before
    the fold, so the sum is associative (integer addition) and
    identical in Spark and DuckDB — same determinism as the previous
    DECIMAL(27,6) quantization but ~10× cheaper: long adds inside
    codegen instead of a BigDecimal allocation per element (measured
    on the near-dup benches, tools/bench_pipeline.py).

    r14 note (measured, left as the HOF form): higher-order functions
    with lambdas are CodegenFallback in Spark 4, so this evaluates
    interpreted — but an unrolled ``FLOOR(a[0]*b[0]*1e6) + …`` chain
    A/B'd 6× SLOWER still (2M-row microbench: HOF 2.3 s vs unrolled
    14.4 s — the 64-deep nullable Add tree defeats codegen worse than
    the fallback does). The quadratic-pair consumers bypass this
    expression entirely (near_dup_pairs scores per-bucket in numpy);
    the remaining call sites are bounded/capped paths where the HOF
    cost is immaterial.
    """
    return F.expr(
        f"""
        CAST(aggregate(
            zip_with({a}, {b}, (x, y) -> FLOOR(CAST(x AS DOUBLE)
                                               * CAST(y AS DOUBLE)
                                               * 1000000.0D)),
            CAST(0 AS BIGINT),
            (acc, v) -> acc + v
        ) AS DOUBLE) / 1000000.0
        """
    )


def _sq_norm_expr(a: str) -> F.Column:
    return F.expr(
        f"""
        CAST(aggregate(
            {a},
            CAST(0 AS BIGINT),
            (acc, x) -> acc + FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                    * 1000000.0D)
        ) AS DOUBLE) / 1000000.0
        """
    )


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    The query side is broadcast (queries are few; candidates are the
    100 TB side), so the candidate scan is shuffle-free; ranking
    shuffles only (query, candidate, score) triples. Ties broken by
    neighbor id for determinism.
    """
    q = queries.select(
        F.col(key_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = candidates.select(
        F.col(key_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            # 1e-6 FLOOR quantization (tie-mode-free — exact-oracle, r11)
            (
                F.floor(
                    _dot_expr("__qvec", "__cvec")
                    / F.sqrt(
                        _sq_norm_expr("__qvec") * _sq_norm_expr("__cvec")
                    )
                    * 1000000.0
                )
                / 1000000.0
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplane_signatures(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
) -> DataFrame:
    """Sign-bit LSH signature: bit p = (v · h_p) >= 0.

    Hyperplane components are the PORTABLE md5-derived pseudo-gaussians
    (``_PLANE_SQL`` — the same quantizer family as the banded near-dup
    path, r11) and the sign fold is 1e-6 fixed point, so a DuckDB
    oracle derives bit-identical signatures. Deterministic, regenerated
    per-partition, nothing to broadcast or store. Output: key + one
    BIGINT signature.
    """
    plane = _PLANE_SQL.format(p="p", i="i")
    # NULL vector -> NULL signature (not sig 0): the ELSE-0 branch used
    # to collapse every null embedding into band-0 buckets, colliding
    # them with real vectors and emitting null-scored neighbors — the
    # same fix _sig_col carries for the near-dup family
    sig_bits = F.expr(
        f"""
        CASE WHEN {vec_col} IS NULL THEN CAST(NULL AS BIGINT) ELSE
        aggregate(
            transform(sequence(0, {num_planes - 1}), p ->
                CASE WHEN aggregate(
                    zip_with({vec_col},
                             transform(sequence(0, size({vec_col}) - 1),
                                       i -> {plane}),
                             (x, h) -> FLOOR(CAST(x AS DOUBLE) * h
                                             * 1000000.0D)),
                    CAST(0 AS BIGINT), (acc, v) -> acc + v) >= 0
                THEN 1L ELSE 0L END),
            0L, (acc, bit) -> acc * 2 + bit
        ) END
        """
    )
    return df.select(F.col(key_col), F.col(vec_col), sig_bits.alias("lsh_sig"))


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates limited to vectors sharing ≥1 LSH
    band with the query, exact cosine re-rank inside the bucket.

    Multi-probe via banding: the signature splits into ``bands`` bands;
    a shared band ⇒ candidate. At scale this replaces the full scan
    with a bucket equi join whose fan-in is |bucket|, and the exact
    re-rank touches only candidates.
    """
    if num_planes % bands:
        raise ValueError(
            f"lsh_topk: bands={bands} must divide num_planes="
            f"{num_planes} — truncating would silently drop "
            f"{num_planes % bands} planes from the banding geometry"
        )
    bits_per_band = num_planes // bands
    mask = (1 << bits_per_band) - 1

    def banded(df: DataFrame, side: str) -> DataFrame:
        sigs = hyperplane_signatures(df, key_col, vec_col, num_planes)
        return sigs.select(
            F.col(key_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"__{side}vec"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}),"
                    f" b -> struct(b AS band,"
                    f" shiftright(lsh_sig, b * {bits_per_band}) & {mask} AS bucket))"
                )
            ).alias("bb"),
        ).select(
            f"{side}_id", f"__{side}vec", F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )

    qb = banded(queries, "query")
    cb = banded(candidates, "neighbor")
    pairs = (
        F.broadcast(qb)
        .join(cb, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "__queryvec", "neighbor_id", "__neighborvec")
        .distinct()
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        # 1e-6 FLOOR quantization (tie-mode-free — exact-oracle, r11)
        (
            F.floor(
                _dot_expr("__queryvec", "__neighborvec")
                / F.sqrt(
                    _sq_norm_expr("__queryvec")
                    * _sq_norm_expr("__neighborvec")
                )
                * 1000000.0
            )
            / 1000000.0
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its ``nprobe``
    nearest centroid cells by cosine.

    Centroids are a tiny broadcast side (K ≪ N; at 100 TB K ~ 2^12
    while N ~ 2^33), so assignment is a shuffle-free map over the
    candidate scan plus one window per vector over K scored cells.
    Output: (key, vec, cell, probe_rank).
    """
    cents = centroids.select(
        F.col(key_col).alias("cell"), F.col(vec_col).alias("__centvec")
    )
    scored = F.broadcast(cents).join(
        df.select(F.col(key_col), F.col(vec_col)), how="cross"
    ).select(
        key_col,
        vec_col,
        "cell",
        (
            _dot_expr(vec_col, "__centvec")
            / F.sqrt(_sq_norm_expr(vec_col) * _sq_norm_expr("__centvec"))
        ).alias("__cscore"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col("__cscore").desc(), F.col("cell")
    )
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(key_col, vec_col, "cell", "probe_rank")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """IVF approximate top-k: the inverted-file ANN layout as a Spark
    join. Candidates are partitioned once into centroid cells
    (nprobe=1); each query probes its ``nprobe`` nearest cells and
    exact-re-ranks only vectors in those cells.

    At 100 TB the cell assignment is the *stored layout* (write
    candidates partitioned/bucketed by `cell`), so a query's probe is
    partition-pruned I/O, not a scan: cost ~ nprobe/K of the corpus.
    """
    cand_cells = ivf_assign(candidates, centroids, key_col, vec_col, nprobe=1).select(
        F.col(key_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        "cell",
    )
    query_cells = ivf_assign(queries, centroids, key_col, vec_col, nprobe=nprobe).select(
        F.col(key_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        "cell",
    )
    scored = (
        F.broadcast(query_cells)
        .join(cand_cells, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            # 1e-6 FLOOR quantization (tie-mode-free — exact-oracle, r11)
            (
                F.floor(
                    _dot_expr("__qvec", "__cvec")
                    / F.sqrt(
                        _sq_norm_expr("__qvec") * _sq_norm_expr("__cvec")
                    )
                    * 1000000.0
                )
                / 1000000.0
            ).alias("cos_sim"),
        )
        .distinct()  # a pair may meet in several probed cells
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def near_dup_probe(
    increment: DataFrame,
    corpus: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 160,
    bands: int = 16,
    signature: str = "arrow",
) -> DataFrame:
    """Incremental near-dup: probe a NEW batch against an existing
    corpus without re-running the corpus self-join — the shape every
    continuously-ingesting pipeline actually needs (the self-join
    variants re-score O(corpus²) bucket collisions on every run; this
    scores only increment×corpus collisions, so daily cost tracks the
    increment).

    Same banded signatures on both sides (deterministic hyperplanes —
    an executor bucketing the increment today gets bit-identical
    buckets to the corpus indexed last month), equi-join on
    (band, bucket), exact in-bucket re-rank. Output: (inc_id, corp_id,
    cos_sim) for every corpus row within ``threshold`` of an increment
    row. At scale the corpus side's (id, band, bucket) index is
    precomputed once and persisted; only the increment is signed per
    run.
    """
    inc = increment.select(
        F.col(key_col).alias("inc_id"),
        F.col(vec_col).alias("__ivec"),
        _sq_norm_expr(vec_col).alias("__in2"),
        F.posexplode(
            _sig_col(increment, vec_col, num_planes, bands, signature)
        ).alias("band", "bucket"),
    )
    corp = corpus.select(
        F.col(key_col).alias("corp_id"),
        F.col(vec_col).alias("__cvec"),
        _sq_norm_expr(vec_col).alias("__cn2"),
        F.posexplode(
            _sig_col(corpus, vec_col, num_planes, bands, signature)
        ).alias("band", "bucket"),
    )
    candidates = inc.join(corp, ["band", "bucket"]).select(
        "inc_id",
        "corp_id",
        # 1e-6 FLOOR quantization — identical to near_dup_pairs (r11),
        # so stream-vs-batch replay parity compares identical scores;
        # norms pre-projected once per row, not re-folded per pair
        (
            F.floor(
                _dot_expr("__ivec", "__cvec")
                / F.sqrt(F.col("__in2") * F.col("__cn2"))
                * 1000000.0
            )
            / 1000000.0
        ).alias("cos_sim"),
    )
    return (
        candidates.groupBy("inc_id", "corp_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_near_dup_pairs_exact(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold).

    Exact all-pairs — the ORACLE BASELINE ONLY, O(n²) in candidates
    (plans as a nested-loop theta join). Production callers use
    ``near_dup_pairs`` (banded LSH prefilter + exact in-bucket
    re-rank), whose recall is gated against this function in
    tests/test_similarity.py.

    ``key_col`` must be an integral type: the vectorized scorer emits
    ``a_id long, b_id long`` (ADVICE r14 — the r13 expression path
    accepted any orderable key; callers with string doc ids should
    hash or dense-rank them to longs first, which the 100 TB paths do
    anyway for shuffle width).
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    key_type = df.schema[key_col].dataType
    if not isinstance(key_type, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"cosine_near_dup_pairs_exact: key_col {key_col!r} has type "
            f"{key_type.simpleString()} — the vectorized scorer requires "
            "an integral key (hash/dense-rank string ids to longs first)"
        )
    # r14 (guide §4.2): the theta self-join (BroadcastNestedLoopJoin)
    # evaluated the CodegenFallback HOF dot interpreted per pair —
    # ~n²/2 × (dim) interpreted ops. The bounded slice now scores all
    # pairs in ONE vectorized numpy pass (the near_dup_pairs scorer:
    # identical 1e-6 fixed-point arithmetic, bit-identical output —
    # oracle-exact and twin-gated). The single-group applyInPandas is
    # the right shape HERE because this function is the deliberately
    # row-capped oracle baseline; production paths stay bucketed.
    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(key_col).alias("__id"), F.col(vec_col).alias("__vec"))
        .groupBy(F.lit(1).alias("__g"))
        .applyInPandas(
            lambda _k, pdf: _pair_scorer(float(threshold))(pdf),
            "a_id long, b_id long, cos_sim double",
        )
    )


#: The sign-LSH plane component h(p, i), PORTABLE form (r11): the
#: 60-bit md5 hash of "p,i" mapped into [-1, 1] — the minhash/kmv
#: re-key move, so a DuckDB oracle derives bit-identical hyperplanes.
_PLANE_SQL = (
    "((CAST(conv(substring(md5(concat(CAST({p} AS STRING), ',', "
    "CAST({i} AS STRING))), 1, 15), 16, 10) AS BIGINT) % 10001) "
    "/ 5000.0) - 1.0"
)


def _band_buckets_expr(vec_col: str, num_planes: int, bands: int) -> F.Column:
    """array<struct<band,bucket>> of banded sign-LSH buckets for a vector.

    Per-band bucket computed directly (not via one packed signature:
    160 planes don't fit a BIGINT — each band's fold stays < 2^bits).
    Hyperplanes are deterministic PORTABLE md5-seeded pseudo-gaussians
    and the sign fold is 1e-6 fixed point (integer sum — associative,
    so Spark, numpy and DuckDB agree bit for bit), which is what lets
    the near-dup faces register exact DuckDB oracles (r11) instead of
    rows-only checks: the oracle rebuilds identical planes, identical
    signs, identical buckets.
    """
    bits_per_band = num_planes // bands
    plane = _PLANE_SQL.format(p="p", i="i")
    return F.expr(
        f"""
        transform(sequence(0, {bands - 1}), b -> struct(b AS band,
            aggregate(
                transform(sequence(b * {bits_per_band},
                                   b * {bits_per_band} + {bits_per_band - 1}),
                          p ->
                    CASE WHEN aggregate(
                        zip_with({vec_col},
                                 transform(sequence(0, size({vec_col}) - 1),
                                           i -> {plane}),
                                 (x, h) -> FLOOR(CAST(x AS DOUBLE) * h
                                                 * 1000000.0D)),
                        CAST(0 AS BIGINT), (acc, v) -> acc + v) >= 0
                    THEN 1L ELSE 0L END),
                0L, (acc, bit) -> acc * 2 + bit) AS bucket))
        """
    )


#: Hyperplane matrices, cached per (num_planes, dim) for the session.
_HPLANES: dict = {}


def _hyperplanes(spark, num_planes: int, dim: int):
    """The EXACT hyperplane values `_band_buckets_expr` derives per
    row — the portable md5 form (``_PLANE_SQL``) — computed ONCE as
    a (num_planes × dim) numpy matrix via a control-plane Spark query
    (10k scalar rows, not data), so the vectorized signature path
    below produces bit-identical buckets to the expression path
    (parity-gated in tests/test_similarity.py)."""
    import numpy as np

    key = (num_planes, dim)
    if key not in _HPLANES:
        plane = _PLANE_SQL.format(
            p=f"CAST(id div {dim} AS INT)", i=f"CAST(id % {dim} AS INT)"
        )
        rows = (
            spark.range(num_planes * dim)
            .selectExpr(
                f"CAST(id div {dim} AS INT) AS p",
                f"CAST(id % {dim} AS INT) AS i",
                f"{plane} AS h",
            )
            .collect()
        )
        H = np.zeros((num_planes, dim))
        for r in rows:
            H[r.p, r.i] = r.h
        _HPLANES[key] = H
    return _HPLANES[key]


def band_buckets_arrow(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    num_planes: int,
    bands: int,
) -> DataFrame:
    """(key, band, bucket) rows via a vectorized Arrow signature pass.

    The expression path (`_band_buckets_expr`) re-derives every
    hyperplane component PER ROW inside interpreted higher-order
    lambdas — ~num_planes×dim xxhash64 evaluations per vector, which
    measured ~5 ms/row at 160×64. Here the hyperplane matrix is built
    once (same values, see `_hyperplanes`) and each Arrow batch does
    ONE BLAS matmul (n×dim @ dim×planes) + bit-packing — same buckets,
    ~100× less signature CPU, still embarrassingly parallel and
    shuffle-free. A sign can only differ between the two paths if
    |dot| is within float-summation ulp of zero (never observed;
    parity-tested on the real corpus).
    """
    return df.select(
        F.col(key_col),
        F.posexplode(
            _sig_col(df, vec_col, num_planes, bands, "arrow")
        ).alias("band", "bucket"),
    )


def _sig_col(
    df: DataFrame,
    vec_col: str,
    num_planes: int,
    bands: int,
    signature: str,
    dim: int | None = None,
) -> F.Column:
    """Per-band bucket array (length = bands, index = band id) as a
    scalar column — 'arrow' (vectorized pandas UDF, the default) or
    'expr' (pure built-in expressions, zero Python; ~100× more
    signature CPU, kept as the no-Python fallback and parity
    baseline)."""
    if signature == "expr":
        # null vector -> null signature (not all-zero buckets, which
        # would needlessly bucket every null row together); posexplode
        # of a null array emits nothing, so null rows simply produce no
        # candidates — identical to the arrow path's None signatures.
        return F.when(
            F.col(vec_col).isNotNull(),
            F.transform(
                _band_buckets_expr(vec_col, num_planes, bands),
                lambda s: s["bucket"],
            ),
        )
    import numpy as np

    bits_per_band = num_planes // bands
    # The arrow path needs the vector dim up front to build the
    # hyperplane matrix; the schema records only element type, not
    # length, so probe one NON-NULL row (a null first row is a
    # partition-order accident and must not route the whole frame down
    # a different path). An ALL-EMPTY frame (e.g. an empty daily
    # increment in near_dup_probe) has no row to probe — short-circuit
    # to the expression path, which derives planes per-row and needs no
    # dim: on zero rows it costs nothing and yields the same (empty,
    # correctly-typed) result instead of a TypeError.
    if dim is None:
        first = (
            df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        )
        if first is None or first[0] is None:
            return _sig_col(df, vec_col, num_planes, bands, "expr")
        dim = len(first[0])
    H = _hyperplanes(df.sparkSession, num_planes, dim).T

    @F.pandas_udf("array<long>")
    def buckets(col: pd.Series) -> pd.Series:
        # null vectors signature to None (matching the expr path's null
        # buckets) instead of crashing np.vstack mid-frame
        mask = col.notna().to_numpy()
        out_py: list = [None] * len(col)
        if mask.any():
            V = np.vstack(col[mask].to_numpy()).astype(np.float64)
            # 1e-6 fixed-point sign fold, per plane: floor((x*h)*1e6)
            # summed — the SAME integers the expression path and the
            # DuckDB oracles compute, so signs (hence buckets) are
            # bit-identical across all three engines. Stays vectorized
            # (one elementwise pass per plane); every term < 2^53 so
            # the float64 sum is exact.
            bits = np.empty((len(V), H.shape[1]), dtype=bool)
            for p in range(H.shape[1]):
                bits[:, p] = (
                    np.floor((V * H[:, p]) * 1e6).sum(axis=1) >= 0
                )
            out = np.zeros((len(V), bands), dtype=np.int64)
            for b in range(bands):
                for j in range(bits_per_band):
                    out[:, b] = out[:, b] * 2 + bits[:, b * bits_per_band + j]
            it = iter(out)
            for i, ok in enumerate(mask):
                if ok:
                    out_py[i] = next(it)
        return pd.Series(out_py)

    return buckets(F.col(vec_col))


def _pair_scorer(thr: float):
    """Vectorized exact-cosine scorer over one group's ``(__id,
    __vec)`` rows: every a_id < b_id pair at or above ``thr``, with
    the repo's shared 1e-6 fixed-point quantization — per-term
    FLOOR((x·y)·1e6) as int64, summed (order-free integer addition),
    CAST→double /1e6, divided by sqrt of the identically-quantized
    norms, floor-quantized to 1e-6. Every step is an IEEE-double op
    numpy executes bit-identically to the JVM expression path
    (np.sqrt and Math.sqrt are both correctly rounded; float32→
    float64 widening is exact; int64 sums are order-free). Rows whose
    vector contains a non-finite element are dropped by the finite
    mask — identical to the expression path, where a null/NaN term
    nulls the dot and the score filter drops the pair. Rows whose
    QUANTIZED norm is zero (every |x_i| < 1e-3) are likewise dropped
    (ADVICE r14): the expression path's non-ANSI divide-by-zero
    yields NULL and the filter drops the pair, whereas numpy's x/0
    would emit ±inf/NaN — masking them out keeps the two paths
    decision-identical on degenerate vectors."""
    import numpy as np
    import pandas as pd

    def _score_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                "a_id": pd.Series([], dtype="int64"),
                "b_id": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        ids = pdf["__id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        M = np.vstack(
            [
                np.asarray(v, dtype=np.float64)
                for v in pdf["__vec"].to_numpy()[order]
            ]
        )
        finite = np.isfinite(M).all(axis=1)
        if not finite.all():
            ids, M = ids[finite], M[finite]
        n = len(ids)
        if n < 2:
            return empty
        # norms: FLOOR((x·x)·1e6) summed as int64 → double/1e6 — the
        # exact doubles _sq_norm_expr produces
        q2 = (
            np.floor((M * M) * 1e6)
            .astype(np.int64)
            .sum(axis=1)
            .astype(np.float64)
            / 1e6
        )
        # zero-quantized-norm rows: the expression path scores their
        # pairs NULL (non-ANSI x/0) and drops them; mask them out so
        # numpy never divides by zero (ADVICE r14)
        pos = q2 > 0.0
        if not pos.all():
            ids, M, q2 = ids[pos], M[pos], q2[pos]
            n = len(ids)
            if n < 2:
                return empty
        out_a: list = []
        out_b: list = []
        out_c: list = []
        # BLAS prefilter (r14, guide §8 — decide with a cheap proxy,
        # compute the expensive exact form on survivors only): the
        # quantized dot can only sit BELOW the true dot (every
        # per-term floor subtracts), so q ≤ dgemm_dot + ε_sum where
        # ε_sum is the gemm's reordering error (~1e-11 here; 1e-6 —
        # one full quantization unit — is an overwhelming upper
        # bound). Hence cos_q ≥ thr implies
        # (dgemm_dot + 1e-6)/denom ≥ thr, and a plain gram (one DGEMM
        # — ~10x the throughput and ~1/d the memory traffic of the
        # per-term floor tensor) selects a candidate superset; the
        # IDENTICAL fixed-point arithmetic then scores only those
        # pairs, so emitted rows are byte-for-byte unchanged (the
        # idonly-twin identity gate and the DuckDB oracles re-prove
        # it). Chunk the gram's a-axis to ~32 MB per slab.
        chunk = max(1, 4_000_000 // n)
        for s in range(0, n - 1, chunk):
            e = min(s + chunk, n - 1)
            denom = np.sqrt(q2[s:e, None] * q2[None, s:])
            G = (M[s:e] @ M[s:].T + 1e-6) / denom
            ii, jj = np.nonzero(G >= thr)
            keep = jj > ii  # strict upper triangle: a_id < b_id
            ii, jj = ii[keep] + s, jj[keep] + s
            if not len(ii):
                continue
            # exact fixed-point re-score on the candidate pairs only
            q = (
                np.floor((M[ii] * M[jj]) * 1e6)
                .astype(np.int64)
                .sum(axis=1)
                .astype(np.float64)
                / 1e6
            )
            cos = (
                np.floor((q / np.sqrt(q2[ii] * q2[jj])) * 1e6) / 1e6
            )
            ok = cos >= thr
            if ok.any():
                out_a.append(ids[ii[ok]])
                out_b.append(ids[jj[ok]])
                out_c.append(cos[ok])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "a_id": np.concatenate(out_a).astype(np.int64),
                "b_id": np.concatenate(out_b).astype(np.int64),
                "cos_sim": np.concatenate(out_c),
            }
        )

    return _score_bucket


def near_dup_pairs(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 160,
    bands: int = 16,
    signature: str = "arrow",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded LSH — the
    default (100 TB) path; same output contract as
    ``cosine_near_dup_pairs_exact`` minus the misses LSH allows.

    Plan shape (r14; guide §8, §4.2 — decide with small rows, hand
    whole batches to vectorized native code): signature map (no
    shuffle; vectorized Arrow by default, see :func:`_sig_col`) →
    explode bands → ONE exchange grouping the exploded ``(id, vec,
    band, bucket)`` rows by (band, bucket) → per-bucket exact cosine
    over all in-bucket pairs in vectorized numpy (applyInPandas) →
    a scalar pair dedup over only the rows that already passed the
    threshold. Until r14 the in-bucket re-rank was a (band, bucket)
    self equi-join + a per-pair fixed-point dot expression; both
    measured as the scale walls (sf1-equivalent, 40k vectors, 18.3M
    collisions): the HOF dot is CodegenFallback in Spark 4 (~20 s of
    the 33 s face just evaluating it pair-at-a-time), and the dedup
    exchange carried EVERY collision — ~n²/128 rows on a
    near-orthogonal corpus, since a random pair agrees per plane with
    p = 1 − arccos(0)/π = 0.5 and collides in ≥1 of 16 bands with
    ≈ 16/2¹⁰. The grouped scorer moves bands×corpus rows (not pairs)
    across the Python boundary once, computes the IDENTICAL
    order-free fixed-point arithmetic on whole matrices, and returns
    only survivors, so both former walls are gone; the threshold
    filter inside the scorer is sound because a pair scores the same
    cos_sim in every band it collides in (same two vectors, same
    quantized expression — a pushdown no optimizer can prove).
    For vectors wide enough that bands×dim dominates the exploded
    exchange (≳1k dims), :func:`near_dup_pairs_idonly` buckets ids
    only and fetches vectors once per surviving pair.

    Exactness: per-term FLOOR((x·y)·1e6) as int64, summed (order-free
    integer addition), CAST→double /1e6, divided by sqrt of the
    identically-quantized norms, floor-quantized to 1e-6 — every step
    an IEEE-double op numpy executes bit-identically to the JVM
    expression path (np.sqrt and Math.sqrt are both correctly
    rounded; float32→float64 widening is exact; int64 sums are
    order-free). tests/test_similarity.py asserts output identity
    against :func:`near_dup_pairs_idonly`, which still scores through
    the pure-expression path — a cross-engine replay of the same
    claim the DuckDB oracles make. Rows whose vector contains a null
    element (→ null dot under zip_with) or a NaN are dropped by the
    scorer's finite mask — no corpus or face produces either; whole
    null vectors never reach it (null signature → posexplode emits
    nothing).

    Default geometry: 16 bands × 10 bits. For cos ≥ 0.9 the per-plane
    agreement is p = 1 − arccos(0.9)/π ≈ 0.856, so a band matches with
    p¹⁰ ≈ 0.21 and ≥1 of 16 bands with ≈ 0.978 — while uniform buckets
    prune candidate pairs by ~2¹⁰/16 ≈ 64×. Banding CANNOT prune at low
    thresholds (cos 0.2 ⇒ p ≈ 0.56: any geometry with usable recall
    inspects ~all pairs) — loose-pair mining stays on the exact path
    over a bounded slice.
    """
    sig = _sig_col(df, vec_col, num_planes, bands, signature)
    exploded = df.select(
        F.col(key_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.posexplode(sig).alias("band", "bucket"),
    )

    candidates = exploded.groupBy("band", "bucket").applyInPandas(
        _pair_scorer(float(threshold)),
        "a_id long, b_id long, cos_sim double",
    )
    return (
        candidates.groupBy("a_id", "b_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def near_dup_pairs_idonly(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 160,
    bands: int = 16,
    signature: str = "arrow",
) -> DataFrame:
    """:func:`near_dup_pairs` for WIDE vectors: the bucket join carries
    only (id, band, bucket) triples — never embeddings — then each
    surviving candidate pair fetches its two vectors exactly once for
    the exact re-rank.

    Identical output to ``near_dup_pairs`` (same hyperplanes, same
    candidate set, same scoring; asserted in tests/test_similarity.py).
    The tradeoff is shuffle SHAPE, not result:

    * ``near_dup_pairs``:   1 bucket join shuffling bands×dim floats
      per row + a scalar dedup — fewest stages, best when dim is small
      (bands×dim ≈ 16×64 floats here is nothing).
    * this variant: bucket join shuffles 24-byte triples, then a
      distinct on id pairs, then two hash joins against the vector
      table to fetch embeddings. Three shuffles, but the big one is
      scalar — at dim ≳1k (16 bands × 4 KB/vector = 64 KB/row exploded)
      this is the only shape that survives; candidate pairs after LSH
      pruning are ≪ rows×bands, so the fetch joins move less data than
      the exploded bucket join would.
    """
    sig = _sig_col(df, vec_col, num_planes, bands, signature)
    ids = df.select(
        F.col(key_col).alias("__id"),
        F.posexplode(sig).alias("band", "bucket"),
    )

    cand = (
        ids.select(F.col("__id").alias("a_id"), "band", "bucket")
        .join(ids.select(F.col("__id").alias("b_id"), "band", "bucket"), ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    vecs = df.select(F.col(key_col).alias("__vid"), F.col(vec_col).alias("__vec"))
    return (
        cand.join(vecs.select(F.col("__vid").alias("a_id"), F.col("__vec").alias("__avec")), "a_id")
        .join(vecs.select(F.col("__vid").alias("b_id"), F.col("__vec").alias("__bvec")), "b_id")
        .select(
            "a_id",
            "b_id",
            # 1e-6 FLOOR quantization, not round: floor has no
            # half-tie mode for engines to disagree on, which is what
            # lets the near-dup faces' DuckDB oracles match the score
            # bit for bit (r11)
            (
                F.floor(
                    _dot_expr("__avec", "__bvec")
                    / F.sqrt(
                        _sq_norm_expr("__avec") * _sq_norm_expr("__bvec")
                    )
                    * 1000000.0
                )
                / 1000000.0
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_store(
    candidates: DataFrame,
    centroids: DataFrame,
    path: str,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF layout ivf_topk's docstring promises: the
    corpus written PARTITIONED BY its nearest-centroid cell, so a
    probe is partition-pruned I/O instead of a scan. One assignment
    pass (broadcast centroids, shuffle-free), one partitioned write —
    the build half of the vector-index lifecycle; rebuild on centroid
    drift is the same two steps."""
    ivf_assign(candidates, centroids, key_col, vec_col, nprobe=1).select(
        F.col(key_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        "cell",
    ).write.partitionBy("cell").mode("overwrite").parquet(path)


def ivf_topk_from_store(
    spark,
    queries: DataFrame,
    store_path: str,
    centroids: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """IVF probe against the STORED layout (``ivf_store``): queries
    join the cell-partitioned table on ``cell`` with the query side
    broadcast, so Spark's dynamic partition pruning restricts the scan
    to the probed cells — cost ~ nprobe/K of the corpus AS I/O, not
    just as compute (plan-gated in tests/test_similarity.py, results
    gated byte-identical to the in-memory ``ivf_topk``)."""
    cand_cells = spark.read.parquet(store_path)
    query_cells = ivf_assign(
        queries, centroids, key_col, vec_col, nprobe=nprobe
    ).select(
        F.col(key_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        "cell",
    )
    scored = (
        cand_cells.join(F.broadcast(query_cells), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            # 1e-6 FLOOR quantization (tie-mode-free — exact-oracle, r11)
            (
                F.floor(
                    _dot_expr("__qvec", "cvec")
                    / F.sqrt(
                        _sq_norm_expr("__qvec") * _sq_norm_expr("cvec")
                    )
                    * 1000000.0
                )
                / 1000000.0
            ).alias("cos_sim"),
        )
        .distinct()  # a pair may meet in several probed cells
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def exact_probe_blas(
    increment: DataFrame,
    corpus: DataFrame,
    threshold: float,
    key_col: str = "doc_id",
    vec_col: str = "embedding",
    precollected: tuple | None = None,
) -> DataFrame:
    """EXACT cosine probe of a bounded increment against a large
    corpus, distributed AND vectorized: the increment (a micro-batch —
    bounded by construction) is collected once and shipped in the
    task closure as one normalized numpy matrix; each CORPUS partition
    then computes a single BLAS gram (chunk × incrementᵀ) inside
    Arrow-batched ``mapInPandas`` and emits only the (inc_id, corp_id,
    ge-threshold) hits. No shuffle at all: a map-only pass over the
    corpus — the right 100 TB shape for an exact-witness probe, and
    the vectorized replacement for a per-pair ``zip_with`` crossJoin
    (the same interpreted-fold-vs-BLAS gap the batch capstone measured
    at 25 s → ms, SCALING.md).

    Decision-identical to the expression form wherever decisions are
    margin-protected (the capstone gates margins ≥ 2.4e-5 vs ~1e-13
    float noise); parity is gated in tests/test_similarity.py.
    Returns (inc_id, corp_id) — corp rows within ``threshold`` cosine
    of an increment row, every (corp < inc) orientation decision left
    to the caller.

    ``precollected`` — an already-materialized ``(ids, normalized
    float64 matrix)`` pair as returned by :func:`_collect_normalized`
    (or ``(None, None)`` for an empty increment) — skips this
    function's own collect: a caller probing the same increment
    several ways per micro-batch (the streaming capstone probes the
    stored index AND intra-batch) collects ONCE instead of
    re-executing the increment's join per probe (r13 profile)."""
    inc_ids, inc_m = (
        precollected
        if precollected is not None
        else _collect_normalized(increment, key_col, vec_col)
    )
    if inc_ids is None:
        return (
            corpus.sparkSession.createDataFrame(
                [], "inc_id long, corp_id long"
            )
        )
    return _blas_probe_plan(
        corpus, inc_ids, inc_m, threshold, key_col, vec_col
    )


def _collect_normalized(increment: DataFrame, key_col: str, vec_col: str):
    """Collect a bounded increment once into (int64 ids, row-normalized
    float64 matrix); (None, None) when empty."""
    inc_rows = increment.select(key_col, vec_col).collect()
    if not inc_rows:
        return None, None
    return normalize_pairs(
        [r[key_col] for r in inc_rows], [r[vec_col] for r in inc_rows]
    )


def normalize_pairs(ids, vecs):
    """(int64 ids, row-normalized float64 matrix) from already-local
    id/vector sequences — ONE spelling of the increment normalization
    shared by :func:`_collect_normalized` and callers that collected
    the rows themselves (the streaming capstone collects its batch
    once and feeds every probe — r13)."""
    import numpy as np

    inc_ids = np.array(list(ids), dtype=np.int64)
    inc_m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    # zero-norm guard: dividing by 0 NaN-poisons the row and every
    # comparison against it is silently False — an all-zero embedding
    # would pass admission unchecked. Norm 1 keeps the row all-zero:
    # it matches nothing, deterministically, with no NaN.
    nrm = np.linalg.norm(inc_m, axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0
    inc_m /= nrm
    return inc_ids, inc_m


#: Broadcast handles for per-batch probe query state, released by
#: :func:`release_probe_state`. The probe ships its increment matrix
#: (and per-file masks) as a Spark BROADCAST variable — one
#: torrent-distributed send per EXECUTOR — never in the task closure,
#: which is re-serialized into EVERY task (the r11 driver log showed
#: 11.4 MiB task binaries from closure-shipping; Spark's guidance is
#: ≤ 1 MiB). Handles accumulate here because the returned DataFrame
#: is lazy: the streaming capstone releases the PREVIOUS batch's
#: state at the top of each micro-batch. The list is BOUNDED at
#: _PROBE_BC_CAP: a batch caller that never calls
#: release_probe_state (the bench loop builds each probe query
#: several times per session) evicts the oldest handle FIFO —
#: ``unpersist`` is always safe, it only drops executor copies and
#: Spark re-broadcasts from the driver on next use — and dropping
#: our strong reference restores the GC → ContextCleaner path for
#: the broadcast itself once the caller's DataFrame dies.
_PROBE_BROADCASTS: list = []
_PROBE_BC_CAP = 8


def _track_probe_broadcast(bc) -> None:
    while len(_PROBE_BROADCASTS) >= _PROBE_BC_CAP:
        old = _PROBE_BROADCASTS.pop(0)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # context stopped — nothing to release
    _PROBE_BROADCASTS.append(bc)


def release_probe_state() -> None:
    """Unpersist broadcast query state from COMPLETED probe batches
    (executors drop their torrent blocks; safe once the probe
    DataFrames of those batches have been fully consumed)."""
    while _PROBE_BROADCASTS:
        bc = _PROBE_BROADCASTS.pop()
        try:
            bc.unpersist(blocking=False)
        except Exception:
            pass  # context already stopped — nothing to release


def _make_blas_probe(bc, threshold: float, key_col: str, vec_col: str):
    """Build the mapInPandas probe fn CLOSING OVER ONLY the broadcast
    handle + scalars — the closure stays O(100 bytes) no matter how
    large the increment is (gated in tests/test_similarity.py)."""
    import numpy as np

    def probe(batches):
        inc_ids, inc_m = bc.value  # executor-local, fetched once
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            nrm = np.linalg.norm(m, axis=1, keepdims=True)
            nrm[nrm == 0.0] = 1.0  # zero vector stays zero, no NaN
            m /= nrm
            sims = m @ inc_m.T  # |chunk| x |increment| gram, one BLAS call
            ci, ii = np.nonzero(sims >= threshold)
            yield pd.DataFrame(
                {
                    "inc_id": inc_ids[ii],
                    "corp_id": pdf[key_col].values[ci],
                }
            )

    return probe


def _blas_probe_plan(
    corpus: DataFrame,
    inc_ids,
    inc_m,
    threshold: float,
    key_col: str,
    vec_col: str,
) -> DataFrame:
    """The map-only BLAS probe core shared by :func:`exact_probe_blas`
    and :func:`exact_probe_blas_pruned`: one (chunk × incrementᵀ) gram
    per Arrow batch of the corpus, emitting only ge-threshold hits.
    The increment matrix rides a broadcast variable (see
    _PROBE_BROADCASTS), not the task closure."""
    bc = corpus.sparkSession.sparkContext.broadcast((inc_ids, inc_m))
    _track_probe_broadcast(bc)
    return corpus.select(key_col, vec_col).mapInPandas(
        _make_blas_probe(bc, threshold, key_col, vec_col),
        "inc_id long, corp_id long",
    )


# ------------------------------------------------------- pruned probe
#
# The exactness-preserving scale path for the streaming capstone's
# semantic-admission stage (VERDICT r10 #1): the embedding index is
# stored CLUSTERED by a fixed coarse quantizer (cell) with each file's
# [cell span, min cosine-to-centroid] recorded in the snapshot
# MANIFEST (operators/snapshots.py stats_cols) — so a micro-batch
# probe prunes whole files by a sound angular bound BEFORE Spark opens
# a footer, and the surviving files still run the byte-identical BLAS
# probe. For unit vectors q, x and x's normalized centroid ĉ the
# spherical triangle inequality gives
#
#     angle(q, x) >= angle(q, ĉ) - angle(ĉ, x)
#  => cos(q, x)  <= cos(max(0, α - θ_file)),   θ_file = arccos(min ccos)
#
# so a file whose bound is below the admission threshold τ provably
# contains no witness and skipping it cannot change any decision —
# the oracle hash is unchanged by construction, on ANY data. How MUCH
# is skipped depends on the corpus geometry: clusterable embeddings
# (real document/embedding corpora) skip most files
# (tests/test_similarity.py gates > 50% on a mixture fixture);
# isotropic vectors (the synthetic sf tables — measured in
# SCALING.md r11) admit no exact pruning at τ = 0.47 by any method,
# and the bound then degenerates to a full probe with only a
# (K·d)-flop planning overhead.

#: Conservative slack on the pruning bound: the bound math is float64
#: (error ~1e-15); decisions in the capstone are margin-gated at
#: >= 2.4e-5. 1e-6 sits safely between.
_PRUNE_EPS = 1e-6

#: Running prune-effectiveness counters (driver-side, observability
#: only — correctness never depends on them): every
#: :func:`exact_probe_blas_pruned` call adds its file-level counts
#: (``files_*`` — the I/O metric: a file is read iff ANY query group
#: reaches it) and its (query, file) pair counts (``qf_*`` — the FLOP
#: metric: each surviving file is probed only against the query
#: groups whose bound reaches it). Tests and the SCALING.md stress
#: harness reset + read them.
PROBE_PRUNE_STATS = {
    "files_total": 0,
    "files_kept": 0,
    "qf_total": 0,
    "qf_kept": 0,
}


def train_kmeans_centroids(
    emb: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_n: int = 1024,
    iters: int = 8,
):
    """Deterministic spherical-ish k-means coarse quantizer: sample =
    first ``sample_n`` vectors by key order (reproducible across
    micro-batch boundaries and replays — the same move as ivf
    centroids' orderBy(vec_id).limit(16)), Lloyd iterations in float64
    numpy with first-max argmax tie-breaks and keep-old-on-empty
    clusters. Returns a row-normalized (n_cells × d) float64 matrix.

    Centroid QUALITY only affects pruning rate, never correctness —
    the angular bound in :func:`prune_probe_files` is sound for any
    fixed centroid set."""
    import numpy as np

    rows = (
        emb.select(key_col, vec_col)
        .orderBy(key_col)
        .limit(sample_n)
        .collect()
    )
    m = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0  # zero sample vector must not NaN a centroid
    m /= nrm
    k = min(n_cells, len(m))
    cents = m[:k].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                mean = members.mean(axis=0)
                norm = np.linalg.norm(mean)
                if norm > 0:
                    cents[c] = mean / norm
    return cents


def assign_cells(
    df: DataFrame,
    centroids,
    key_col: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse-quantize each vector against the closure-shipped centroid
    matrix: adds ``cell`` (argmax-cosine centroid id) and ``ccos``
    (float64 cosine to that centroid — the per-row radius datum whose
    per-file MIN the manifest records). Map-only Arrow pass, one BLAS
    gram per batch; no shuffle."""
    import numpy as np

    cents = np.ascontiguousarray(centroids, dtype=np.float64)

    def tag(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            nrm = np.linalg.norm(m, axis=1, keepdims=True)
            nrm[nrm == 0.0] = 1.0  # zero vector stays zero, no NaN
            m /= nrm
            sims = m @ cents.T
            cell = np.argmax(sims, axis=1)
            out = pdf[[key_col, vec_col]].copy()
            out["cell"] = cell.astype(np.int32)
            out["ccos"] = sims[np.arange(len(m)), cell]
            yield out

    return df.select(key_col, vec_col).mapInPandas(
        tag,
        f"{key_col} long, {vec_col} array<float>, cell int, ccos double",
    )


def _load_manifest(table_path: str, version: int) -> dict:
    import json

    from mobility_etl_spark.operators.snapshots import _snap_dir

    return json.loads(
        (_snap_dir(table_path) / f"v{version}.manifest.json").read_text()
    )


def _prune_files_from_stats(
    files: list[str], stats: dict, inc_m, cents, tau: float
) -> list[str]:
    """The angular-bound file filter over preloaded manifest stats:
    keep every file whose bound can reach ``tau`` for SOME row of
    ``inc_m`` — plus, conservatively, any file without usable stats or
    with out-of-range cells (the no-centroid fallback appends)."""
    import numpy as np

    qc = inc_m @ cents.T  # (b × K)
    # smallest angle from ANY increment row to each centroid
    alpha = np.arccos(np.clip(qc.max(axis=0), -1.0, 1.0))
    kept = []
    for f in files:
        st = stats.get(f, {})
        if st.get("_rows") == 0:
            continue  # provably empty (range-partitioner slack files)
        cell_span, ccos_span = st.get("cell"), st.get("ccos")
        if cell_span is None or ccos_span is None:
            kept.append(f)  # no stats: may contain anything
            continue
        lo, hi = int(cell_span[0]), int(cell_span[1])
        if lo < 0 or hi >= len(cents):
            kept.append(f)  # cells outside the quantizer: keep
            continue
        theta = np.arccos(np.clip(float(ccos_span[0]), -1.0, 1.0))
        a_min = float(alpha[lo : hi + 1].min())
        bound = np.cos(max(0.0, a_min - theta))
        if bound >= tau - _PRUNE_EPS:
            kept.append(f)
    return kept


def prune_probe_files(
    table_path: str,
    version: int,
    inc_m,
    centroids,
    tau: float,
) -> tuple[list[str], list[str]]:
    """Manifest-level file pruning for an exact threshold probe:
    returns ``(kept_files, all_files)`` for snapshot ``version`` of
    ``table_path`` under the union-over-increment angular bound. Pure
    footer/manifest metadata: no data file is opened."""
    import numpy as np

    manifest = _load_manifest(table_path, version)
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    kept = _prune_files_from_stats(
        manifest["files"], manifest.get("stats", {}), inc_m, cents, tau
    )
    return kept, manifest["files"]


def exact_probe_blas_pruned(
    spark,
    increment: DataFrame,
    table_path: str,
    version: int,
    centroids,
    threshold: float,
    key_col: str = "doc_id",
    vec_col: str = "embedding",
    precollected: tuple | None = None,
) -> DataFrame:
    """:func:`exact_probe_blas` against a SNAPSHOT-TABLE corpus with
    manifest-level cluster pruning: collect the increment once, skip
    every data file the angular bound proves witness-free (see module
    note — decisions are unchanged on any data), scan only survivors.
    Pruning is PER QUERY CELL, not per batch: increment rows are
    grouped by their own quantizer cell, each group prunes files
    independently, and a surviving file is probed only against the
    groups whose bound reaches it (per-file query masks ride the
    probe's BROADCAST variable, routed executor-side by
    input_file_name). So a
    diverse micro-batch — which REACHES every cluster somewhere and
    would defeat a whole-batch union bound — still skips the
    (query, file) pairs that can't interact: I/O cost is the union of
    reachable files, FLOP cost the sum of reachable pairs. At 100 TB
    with clusterable embeddings this is the admission path's story:
    the stored-IVF layout plus manifest stats make the probe's cost
    proportional to the CANDIDATE cluster pairs, not the index.

    ``precollected`` as in :func:`exact_probe_blas`: skip the collect
    when the caller already materialized the increment once."""
    import pathlib

    import numpy as np

    inc_ids, inc_m = (
        precollected
        if precollected is not None
        else _collect_normalized(increment, key_col, vec_col)
    )
    if inc_ids is None:
        return spark.createDataFrame([], "inc_id long, corp_id long")
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    manifest = _load_manifest(table_path, version)
    files, stats = manifest["files"], manifest.get("stats", {})
    qcell = np.argmax(inc_m @ cents.T, axis=1)
    file_to_qidx: dict[str, list] = {}
    for g in np.unique(qcell):
        gidx = np.nonzero(qcell == g)[0]
        for f in _prune_files_from_stats(
            files, stats, inc_m[gidx], cents, threshold
        ):
            file_to_qidx.setdefault(f, []).append(gidx)
    masks = {
        f: np.concatenate(parts) for f, parts in file_to_qidx.items()
    }
    # input_file_name() yields an absolute URI; manifest entries are
    # table-RELATIVE (and NESTED under a cell/hive layout, e.g.
    # "cell=3/part-....parquet"). Routing used to join the two on the
    # file BASENAME, which silently missed every nested key (qidx None
    # -> every row skipped -> the probe admitted duplicates with no
    # error) — and basenames are NOT unique either: one partitionBy
    # write reuses the same part-file name in every partition dir. So
    # the lookup strips the table root from the URI to recover the
    # exact relative path (basename fallback only when the root
    # marker is absent, e.g. a relocated/symlinked mount).
    import os as _os

    _root_marker = _os.path.abspath(table_path).rstrip("/") + "/"
    PROBE_PRUNE_STATS["files_total"] += len(files)
    PROBE_PRUNE_STATS["files_kept"] += len(masks)
    PROBE_PRUNE_STATS["qf_total"] += len(inc_ids) * len(files)
    PROBE_PRUNE_STATS["qf_kept"] += sum(len(m) for m in masks.values())
    if not masks:
        return spark.createDataFrame([], "inc_id long, corp_id long")
    root = pathlib.Path(table_path)
    corpus = spark.read.parquet(
        *(str(root / f) for f in sorted(masks))
    ).withColumn("__file", F.input_file_name())
    # The increment matrix + per-file query masks ride a BROADCAST
    # variable — one torrent send per executor — not the task closure
    # (the r11 driver log showed 11.4 MiB per-task binaries from
    # closure-shipping at capstone batch sizes; see _PROBE_BROADCASTS
    # for the release protocol).
    bc = spark.sparkContext.broadcast((inc_ids, inc_m, masks))
    _track_probe_broadcast(bc)
    return corpus.select(key_col, vec_col, "__file").mapInPandas(
        _make_pruned_probe(bc, threshold, key_col, vec_col, _root_marker),
        "inc_id long, corp_id long",
    )


def _make_pruned_probe(
    bc, threshold: float, key_col: str, vec_col: str, root_marker: str
):
    """mapInPandas fn for the pruned probe: closes over the broadcast
    handle + scalars only (closure size gated in tests). Per corpus
    file group, probes just the query rows whose bound reaches that
    file (the broadcast per-file masks)."""
    import numpy as np

    def _rel_of(fname: str) -> str:
        rel = str(fname).split(root_marker, 1)
        return rel[1] if len(rel) == 2 else str(fname).rsplit("/", 1)[-1]

    def probe(batches):
        inc_ids, inc_m, masks = bc.value  # executor-local
        for pdf in batches:
            if not len(pdf):
                continue
            for fname, sub in pdf.groupby("__file", sort=False):
                qidx = masks.get(_rel_of(fname))
                if qidx is None or not len(sub):
                    continue
                m = np.stack(
                    [np.asarray(x, dtype=np.float64) for x in sub[vec_col]]
                )
                nrm = np.linalg.norm(m, axis=1, keepdims=True)
                nrm[nrm == 0.0] = 1.0  # zero vector stays zero, no NaN
                m /= nrm
                sims = m @ inc_m[qidx].T
                ci, ii = np.nonzero(sims >= threshold)
                yield pd.DataFrame(
                    {
                        "inc_id": inc_ids[qidx][ii],
                        "corp_id": sub[key_col].values[ci],
                    }
                )

    return probe
