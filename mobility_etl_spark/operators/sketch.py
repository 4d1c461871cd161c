"""Frequent-items (heavy-hitters) sketching: mergeable Misra-Gries.

The training-data use case is token/n-gram frequency over a corpus too
large to afford a full ``explode → groupBy token`` shuffle (the token
stream is ~10× the document bytes; at 100 TB that shuffle IS the job).
Misra-Gries summaries invert the cost: each input partition is
tokenized *inside* an Arrow-batched ``mapInPandas`` and reduced to at
most ``k`` weighted counters, so the only shuffle is the final merge of
``num_partitions × k`` tiny (token, weight) rows — O(parallelism), not
O(corpus).

Summaries are *mergeable* (Agarwal et al., "Mergeable Summaries", PODS
2012): MG(k) ⊕ MG(k) = add counters, then subtract the (k+1)-th largest
weight from every counter and drop the non-positive ones. The merged
summary keeps the one-sided MG guarantee over the combined stream:

    f(x) − N/(k+1)  ≤  est(x)  ≤  f(x)

for every item x, with N = total token count. Hence every token with
true frequency above N/(k+1) is guaranteed present, and estimates never
overshoot. tests/test_sketch.py gates exactly these bounds against the
exact counts.

No reference counterpart (the reference defers all analytics,
SURVEY.md §2.C); this is north-star training-pipeline surface alongside
dedup (operators/dedup.py) and ANN (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Lowercased alphanumeric runs — the same tokenizer the exact oracle
#: query uses (regexp_extract_all in Spark and DuckDB).
TOKEN_PATTERN = r"[a-z0-9]+"


def _mg_add_and_compress(counters: dict[str, int], batch_counts, k: int) -> None:
    """Merge a batch's exact counts into an MG(k) summary, in place.

    Add, then subtract the (k+1)-th largest weight from every counter
    and drop the non-positives — the mergeable-summaries merge step.
    """
    for tok, c in batch_counts.items():
        counters[tok] = counters.get(tok, 0) + int(c)
    if len(counters) <= k:
        return
    pivot = sorted(counters.values(), reverse=True)[k]
    for tok in list(counters):
        kept = counters[tok] - pivot
        if kept <= 0:
            del counters[tok]
        else:
            counters[tok] = kept


def misra_gries_tokens(
    df: DataFrame,
    text_col: str = "text",
    k: int = 64,
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """Heavy-hitter tokens of a document corpus as an MG(k) summary.

    Returns ``(token, est_count)`` with at most ``k`` rows and the MG
    error bound above. Plan shape: one narrow ``mapInPandas`` pass over
    the corpus (tokenize + per-partition summary — ≤ k rows out per
    partition), one tiny shuffle to merge summaries, and a single-task
    window for the final compress (the merged set is ≤ partitions × k
    rows by construction — the single partition is the point, not a
    bottleneck).
    """
    import pandas as pd

    def summarize(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = (
                pdf[text_col]
                .str.lower()
                .str.findall(pattern)
                .explode()
                .dropna()
                .value_counts()
            )
            _mg_add_and_compress(counters, vc.to_dict(), k)
        yield pd.DataFrame(
            {"token": list(counters), "wt": [counters[t] for t in counters]}
        )

    partials = df.select(text_col).mapInPandas(summarize, "token string, wt long")
    merged = partials.groupBy("token").agg(F.sum("wt").alias("wt"))
    # Global compress to k: subtract the (k+1)-th largest merged weight.
    w = Window.orderBy(F.col("wt").desc(), "token")
    ranked = merged.withColumn("rn", F.row_number().over(w))
    pivot = F.coalesce(
        F.max(F.when(F.col("rn") == k + 1, F.col("wt"))).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
        F.lit(0),
    )
    return (
        ranked.withColumn("est_count", F.col("wt") - pivot)
        .filter(F.col("est_count") > 0)
        .select("token", "est_count")
    )


def portable_hash60(col: "F.Column") -> "F.Column":
    """The repo's ONE spelling of the portable 60-bit md5 hash of a
    string Column — ANSI equivalent
    ``(('0x' || substr(md5(x), 1, 15))::BIGINT)``. Every portable
    sketch/LSH derivation funnels through this (or renders the same
    ANSI template, queries/similarity._P60): two hand-maintained
    spellings drifting apart would silently break the cross-engine
    bit-identity the exact oracles depend on."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def bloom_positions(
    df: DataFrame, key_col: str, m_bits: int, k_hashes: int
) -> DataFrame:
    """Expand each key into its ``k_hashes`` Bloom bit coordinates —
    ``(word_idx, bitmask)`` pairs addressing a conceptual bitset of
    ``m_bits`` bits stored as 64-bit words. Hash i is the PORTABLE
    md5-derived 60-bit integer mod m (the same move as
    dedup.minhash_perm_hash / kmv_hash — ANSI:
    ``('0x' || substr(md5(i || '|' || key), 1, 15))::BIGINT % m``), so
    a DuckDB oracle can rebuild the IDENTICAL filter bit for bit and
    the bloom face is exact-oracle checked rather than rows-only
    (r11). Deterministic, seedless state, nothing to broadcast. Pure
    codegen: explode + shift arithmetic, no Python.
    """
    pos = F.explode(
        F.array(
            *[
                F.pmod(
                    portable_hash60(
                        F.concat(
                            F.lit(f"{i}|"),
                            F.col(key_col).cast("string"),
                        )
                    ),
                    F.lit(m_bits),
                )
                for i in range(k_hashes)
            ]
        )
    ).alias("pos")
    return df.select(F.col(key_col), pos).select(
        key_col,
        F.shiftright("pos", 6).alias("word_idx"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bitmask"),
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 17, k_hashes: int = 5
) -> DataFrame:
    """Distributed Bloom-filter build as a relational plan: explode
    keys to bit coordinates, OR-merge per word with the ``bit_or``
    aggregate. Output is the *sparse* filter — ≤ ``m_bits/64`` rows of
    ``(word_idx, bits)`` — i.e. a mergeable sketch that is itself a
    DataFrame: union two builds and re-``bit_or`` to merge filters.

    Scale shape: the only shuffle moves ≤ partitions × m/64 partial
    words (map-side ``bit_or`` combine), never the corpus. At 100 TB
    the filter for a billion-document seen-corpus at 1% FPR is ~1.2 GB
    — kept distributed here; ``bloom_probe`` joins it broadcast when it
    fits, hash otherwise (Spark picks by size).
    """
    return (
        bloom_positions(df, key_col, m_bits, k_hashes)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bitmask)").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 17,
    k_hashes: int = 5,
) -> DataFrame:
    """Membership test against a built filter: a key is *maybe seen*
    iff every one of its ``k_hashes`` bit positions is set (no false
    negatives; false-positive rate ≈ (1 − e^{−kn/m})^k, gated in
    tests/test_sketch.py). Probe = join of the sparse filter on
    ``word_idx`` + one bitwise AND — still zero Python, and the
    corpus-side shuffle is only the per-key ``min`` reduce.

    The broadcast hint is SIZE-GATED, not unconditional: a ~1.2 GB
    billion-key filter force-broadcast would bypass
    autoBroadcastJoinThreshold and OOM the driver; above the gate the
    filter joins as an ordinary shuffle join (Spark may still choose
    to broadcast it if its own estimate says so).

    Returns the input keys with a boolean ``maybe_seen``.
    """
    # sparse filter upper bound: m/64 words x ~16 bytes a row
    bloom_side = (
        F.broadcast(bloom) if m_bits // 64 * 16 <= 64 * 1024 * 1024 else bloom
    )
    probed = (
        bloom_positions(df, key_col, m_bits, k_hashes)
        .join(bloom_side, "word_idx", "left")
        .select(
            key_col,
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bitmask"))
                != 0
            ).alias("hit"),
        )
    )
    return probed.groupBy(key_col).agg(F.min("hit").alias("maybe_seen"))


# --------------------------------------------------------------- theta/KMV

#: The KMV hash domain: u is a PORTABLE 60-bit integer — the first 15
#: hex chars of md5(value-as-string) — so u/2^60 is uniform on [0, 1)
#: and a DuckDB oracle rebuilds the IDENTICAL sketch (the
#: sketch_countmin_tokens portability move, applied to theta): every
#: retained hash, theta, and estimate hash-compares exactly across
#: engines. All order/threshold comparisons happen on the exact
#: integer; division by 2^60 appears only in the final double
#: expressions, written identically on both sides.
KMV_ONE = 1 << 60


def kmv_hash(value_col: str) -> "F.Column":
    """The portable 60-bit KMV hash of a column (see :data:`KMV_ONE`);
    ANSI-SQL equivalent:
    ``(('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT)``."""
    return portable_hash60(F.col(value_col).cast("string"))


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """KMV (k-minimum-values) theta sketch per group: the mergeable
    distinct-count summary that — unlike HLL — also supports SET
    OPERATIONS (union, intersection, difference) on the sketches
    themselves, because it retains actual hash SAMPLES below a
    threshold rather than register maxima (Apache DataSketches' theta
    family; Beyer et al., "On synopses for distinct-value estimation
    under multiset operations", SIGMOD 2007).

    Each value hashes to a uniform 60-bit integer u (portable md5
    bucketing — see :func:`kmv_hash` — so the whole sketch is
    re-derivable in ANSI SQL and the theta faces are EXACT-oracle
    checked, not rows-only); the sketch keeps the k SMALLEST u per
    group. theta = the k-th smallest (as a fraction of 2^60); distinct
    ≈ (k−1)/theta; RSE ≈ 1/√(k−2). The k-smallest-of-a-set operator is
    exact and associative, so sketch(A ∪ B) ≡ merge(sketch(A),
    sketch(B)) — merge-order invariance holds by IDENTITY, not just
    within error (gated in tests/test_sketch.py).

    Plan shape: one shuffle keyed by group to rank hashes (the same
    partitioned-window top-k every per-group ranking face uses), one
    row per retained hash — O(groups × k) output, never O(distinct).
    At 100 TB each partition would pre-prune to its local k minima
    before the shuffle (a mapInPandas heap, like misra_gries_tokens);
    at test scale the windowed exact form keeps the plan auditable.

    Returns (group_cols…, u) — one row per retained hash.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("u")
    return (
        df.select(*group_cols, kmv_hash(value_col).alias("u"))
        .distinct()  # multiset -> set: same value hashes identically
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch:
    (k−1)/(u_k/2^60), falling back to the EXACT retained count when a
    group holds fewer than k hashes (the sketch saw every distinct
    value)."""
    return sketch.groupBy(*group_cols).agg(
        F.count("*").alias("__n"), F.max("u").alias("__uk")
    ).select(
        *group_cols,
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(
            F.lit(float(k - 1))
            / (F.col("__uk").cast("double") / F.lit(float(KMV_ONE)))
        )
        .alias("est_distinct"),
    )


def kmv_set_ops(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256
) -> DataFrame:
    """Union / intersection / difference estimates from two single-set
    KMV sketches (columns: just ``u``).

    theta = min(theta_A, theta_B) (each group's k-th smallest, or 1.0
    when the sketch is exact-small); every retained hash below theta
    is a uniform sample of the union at rate theta, so

        |A ∪ B| ≈ |{u < theta}| / theta          (over distinct u)
        |A ∩ B| ≈ |{u < theta, u ∈ A ∧ u ∈ B}| / theta
        |A \\ B| ≈ |{u < theta, u ∈ A ∧ u ∉ B}| / theta

    One row out; everything is a tiny two-sided join of ≤ k-row
    frames — sketch set algebra costs O(k), independent of data. u is
    the portable integer hash (:func:`kmv_hash`): thresholds compare
    exactly, and the final fraction th/2^60 is the only float step —
    written identically in the DuckDB oracle."""
    a = sketch_a.select(F.col("u").alias("u"))
    b = sketch_b.select(F.col("u").alias("u"))

    def theta(s: DataFrame) -> int:
        r = s.orderBy("u").limit(k).agg(
            F.count("*").alias("n"), F.max("u").alias("uk")
        ).collect()[0]
        return KMV_ONE if r["n"] < k else int(r["uk"])

    th = min(theta(a), theta(b))
    th_frac = th / float(KMV_ONE)
    au = a.filter(F.col("u") < th)
    bu = b.filter(F.col("u") < th)
    inter = au.join(bu, "u").count()
    only_a = au.join(bu, "u", "left_anti").count()
    only_b = bu.join(au, "u", "left_anti").count()
    spark = sketch_a.sparkSession
    return spark.createDataFrame(
        [
            (
                float((inter + only_a + only_b) / th_frac),
                float(inter / th_frac),
                float(only_a / th_frac),
                float(only_b / th_frac),
            )
        ],
        "est_union double, est_intersection double, "
        "est_only_a double, est_only_b double",
    )


def kmv_overlap_matrix(
    sketch: DataFrame, group_col: str, k: int = 256
) -> DataFrame:
    """Pairwise intersection/union estimates for EVERY pair of groups
    from ONE grouped KMV sketch, entirely in-frame — no driver-side
    theta, no per-pair jobs: per-group thetas are an aggregate, pair
    thresholds a (groups²)-row broadcast join, sample counts one
    self-join of the O(groups × k) sketch on the retained hash. The
    audience-overlap / split-contamination MATRIX at 100 TB costs
    O(groups² + groups·k) — independent of the data the sketch
    summarized.

    Returns (g_a, g_b, est_intersection, est_union) for g_a < g_b.
    """
    th = (
        sketch.groupBy(F.col(group_col).alias("g"))
        .agg(F.count("*").alias("n"), F.max("u").alias("uk"))
        .select(
            "g",
            F.when(F.col("n") < k, F.lit(KMV_ONE))
            .otherwise(F.col("uk"))
            .alias("theta"),
        )
    )
    pairs = (
        th.select(F.col("g").alias("g_a"), F.col("theta").alias("ta"))
        .join(
            th.select(F.col("g").alias("g_b"), F.col("theta").alias("tb")),
            F.col("g_a") < F.col("g_b"),
        )
        .select("g_a", "g_b", F.least("ta", "tb").alias("th"))
    )
    a = sketch.select(F.col(group_col).alias("g_a"), F.col("u").alias("u"))
    b = sketch.select(F.col(group_col).alias("g_b"), F.col("u").alias("u"))

    def below(side: DataFrame, gcol: str, alias: str) -> DataFrame:
        return (
            side.join(F.broadcast(pairs), gcol)
            .filter(F.col("u") < F.col("th"))
            .groupBy("g_a", "g_b")
            .agg(F.count("*").alias(alias))
        )

    na = below(a, "g_a", "na")
    nb = below(b, "g_b", "nb")
    common = (
        a.join(b, "u")
        .join(F.broadcast(pairs), ["g_a", "g_b"])
        .filter(F.col("u") < F.col("th"))
        .groupBy("g_a", "g_b")
        .agg(F.count("*").alias("nc"))
    )
    th_frac = F.col("th").cast("double") / F.lit(float(KMV_ONE))
    return (
        pairs.join(na, ["g_a", "g_b"], "left")
        .join(nb, ["g_a", "g_b"], "left")
        .join(common, ["g_a", "g_b"], "left")
        .select(
            "g_a",
            "g_b",
            (F.coalesce("nc", F.lit(0)) / th_frac).alias(
                "est_intersection"
            ),
            (
                (
                    F.coalesce("na", F.lit(0))
                    + F.coalesce("nb", F.lit(0))
                    - F.coalesce("nc", F.lit(0))
                )
                / th_frac
            ).alias("est_union"),
        )
    )


def kmv_overlap_matrix_rows(
    rows, k: int = 256
) -> list[tuple[str, str, float, float]]:
    """Driver-side twin of :func:`kmv_overlap_matrix` over the
    COLLECTED sketch rows (``(g, u)`` tuples/Rows) — the r15 treatment
    VERDICT r14 #6 prescribes (the #10 theta-set move, guide §1.2/§5):
    sketch set algebra is O(groups²·k) over ≤ groups·k retained hashes
    BY DESIGN, i.e. control-plane work; running it as Spark joins cost
    a plan of two broadcast-join pyramids and ~n jobs. One sketch job
    collects the hashes; this function reproduces the in-frame
    arithmetic IDENTICALLY — exact integer threshold compares, the
    same CAST(th AS DOUBLE)/2^60 fraction, the same int/double IEEE
    divisions — so the emitted doubles are bit-identical to the
    expression path (and the DuckDB oracle re-proves it).

    Returns sorted (g_a, g_b, est_intersection, est_union) rows for
    every g_a < g_b pair.
    """
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r[0], []).append(int(r[1]))
    groups = sorted(by_g)
    thetas = {
        g: (KMV_ONE if len(us) < k else max(us))
        for g, us in by_g.items()
    }
    sets = {g: set(us) for g, us in by_g.items()}
    out: list[tuple[str, str, float, float]] = []
    for i, ga in enumerate(groups):
        for gb in groups[i + 1 :]:
            th = min(thetas[ga], thetas[gb])
            th_frac = float(th) / float(KMV_ONE)
            na = sum(1 for u in sets[ga] if u < th)
            nb = sum(1 for u in sets[gb] if u < th)
            nc = sum(1 for u in sets[ga] & sets[gb] if u < th)
            out.append(
                (ga, gb, nc / th_frac, (na + nb - nc) / th_frac)
            )
    return out
