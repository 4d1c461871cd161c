"""Deduplication operators (SURVEY.md §2.C N1–N2).

Engine-native generalization of the reference's hash-based change
detection (R5/R6, reference dags/warsaw-gtfs.py:41-71): the reference
dedups whole feed zips by SHA-256; a training-data pipeline needs the
same idea per-document and per-*near*-duplicate cluster.

100 TB design rules applied here:
  * exact dedup shuffles 16-byte digests, never payloads (hash first,
    group on the digest, keep min-key representative);
  * MinHash signatures are built from xxhash64 (JVM built-in, 64-bit,
    seeded) over exploded shingles — one shuffle to aggregate
    signatures, one to bucket bands; candidate verification joins only
    candidate pairs, not the full cross product;
  * SimHash packs to a single BIGINT per doc — near-dup lookup becomes
    a bucket join on (simhash >> k) prefixes or hamming check on pairs.

Everything is DataFrame built-ins (explode / xxhash64 / groupBy /
bit ops) — no Python in the hot path, no pyspark.ml dependency, fully
deterministic (so results are reproducible across runs and clusters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Row cap for broadcasting the LSH candidate list (and its key set)
#: into the exact-Jaccard verify (r15, VERDICT r14 #7): candidate
#: pairs are two longs (~16 B framed ≈ 64 MB built at the default cap)
#: — far under the driver/executor broadcast budget — while anything
#: past it degrades gracefully to a shuffled semi-join instead of
#: risking a driver OOM on a pathological bucket explosion.
_CAND_BROADCAST_ROWS = int(
    os.environ.get("MINHASH_CAND_BROADCAST_ROWS", "4000000")
)


def exact_dedup(
    df: DataFrame, content_col: str, key_col: str, keep: str = "min"
) -> DataFrame:
    """Exact content dedup: one representative row per distinct content.

    Hash-first (md5 here; sha2 for adversarial settings), group by the
    digest, keep the min/max key — deterministic, and the shuffle
    carries digests + keys only. (dropDuplicates([content_col]) would
    shuffle whole payloads and pick an arbitrary survivor.)
    """
    agg = F.min(key_col) if keep == "min" else F.max(key_col)
    reps = (
        df.select(F.md5(F.col(content_col)).alias("__digest"), F.col(key_col))
        .groupBy("__digest")
        .agg(agg.alias(key_col), F.count("*").alias("n_copies"))
    )
    return reps.join(df, key_col).drop("__digest")


def shingles(df: DataFrame, text_col: str, key_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (key, shingle) rows.

    Built with slice/transform over the token array, then explode —
    one generated row per shingle, no Python.
    """
    # zip_with over n shifted slices, not an index lambda: a lambda
    # body that slices `split(text)` re-runs the regex split per index
    # (O(n_tokens²) chars per doc — see corpus_prep's measured case);
    # here the split hoists to once per row. concat_ws skips padded
    # nulls, so short-doc semantics (all tokens joined) are identical
    # to the old slice form.
    toks = F.split(F.col(text_col), r"\s+")
    m = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    grams = F.slice(toks, 1, m)
    for k in range(2, n + 1):
        grams = F.zip_with(
            grams, F.slice(toks, k, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return (
        df.select(F.col(key_col), F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def minhash_perm_hash(i: int, shingle_col) -> "F.Column":
    """The i-th MinHash permutation hash of a shingle: a PORTABLE
    md5-derived 60-bit integer (first 15 hex chars of md5("{i}|" ||
    shingle)) — the same portability move as operators/sketch.py:
    kmv_hash, so a DuckDB oracle can rebuild the identical signatures
    and the minhash face is exact-oracle checked rather than
    rows-only. ANSI equivalent:
    ``('0x' || substr(md5('{i}|' || shingle), 1, 15))::BIGINT``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}|"), shingle_col)), 1, 15
            ),
            16,
            10,
        )
        .cast("bigint")
    )


def minhash_signatures(
    shingle_df: DataFrame, key_col: str, num_perm: int = 32,
    with_count: bool = False,
) -> DataFrame:
    """MinHash signature per key: array of num_perm minima of seeded
    portable hashes (:func:`minhash_perm_hash`) over the shingle set.
    One aggregation shuffle; signature size is num_perm*8 bytes
    regardless of document size.

    ``with_count=True`` additionally emits ``n_shingles`` from the
    SAME aggregation pass (r14, guide §2.4): a caller that needs both
    the signatures and the per-key shingle-set sizes (the LSH →
    exact-Jaccard verify chain) otherwise runs the whole shingle DAG —
    split, n zip_with slices, explode, array_distinct — twice through
    two separate exchanges keyed identically."""
    mins = [
        F.min(minhash_perm_hash(i, F.col("shingle"))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    if with_count:
        mins.append(F.count("*").alias("n_shingles"))
    sig = shingle_df.groupBy(key_col).agg(*mins)
    cols = [
        F.col(key_col),
        F.array(*[f"h{i}" for i in range(num_perm)]).alias("signature"),
    ]
    if with_count:
        cols.append(F.col("n_shingles"))
    return sig.select(*cols)


def lsh_candidate_pairs(
    sig_df: DataFrame, key_col: str, num_perm: int = 32, bands: int = 8
) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing ≥1 band bucket.

    Explode each signature into `bands` band-hashes, self-join on
    (band, band_hash) with key< key to order pairs, distinct. The
    band hash is md5 over the band's minima joined with '|' — portable
    (a DuckDB oracle buckets identically) and still a fixed-width join
    key (32 chars vs xxhash64's 8 bytes; at 100 TB substring it to 16
    if the shuffle width matters — the bucketing stays sound).
    """
    rows_per_band = num_perm // bands
    banded = sig_df.select(
        F.col(key_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> md5(array_join(transform("
                f"slice(signature, b * {rows_per_band} + 1, {rows_per_band}),"
                f" x -> cast(x as string)), '|')))"
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
        )
        .select(
            F.col(f"a.{key_col}").alias("key_a"), F.col(f"b.{key_col}").alias("key_b")
        )
        .distinct()
    )


def jaccard_pairs(
    shingle_df: DataFrame,
    key_col: str,
    candidates: DataFrame | None = None,
    min_jaccard: float = 0.0,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard similarity for document pairs from shingle sets.

    With ``candidates`` (key_a/key_b), verifies only those pairs (the
    LSH path); without, scores every co-shingled pair (the small-N /
    oracle path). Intersection counts come from a self-join on the
    shingle; union = |A| + |B| − |A∩B|; all integer arithmetic until
    the final division, so the score is engine-exact.

    ``sizes`` (key, n_shingles) lets a caller that already aggregated
    the shingle sets (e.g. minhash_signatures(with_count=True)) skip
    this function's own size pass — one fewer execution of the
    shingle DAG (r14, guide §2.4).
    """
    if sizes is None:
        sizes = shingle_df.groupBy(key_col).agg(
            F.count("*").alias("n_shingles")
        )
    else:
        sizes = sizes.select(key_col, "n_shingles")
    verify_side = shingle_df
    cand = None
    if candidates is not None:
        # r15 (VERDICT r14 #4/#7, guide §3.2/§2.3): materialize the
        # candidate list ONCE (localCheckpoint — it now feeds two
        # consumers, and the checkpoint gives an exact row count for
        # the broadcast size gate), then semi-join BOTH sides of the
        # co-shingle self-join down to candidate-involved keys BEFORE
        # the join. The r14 form filtered pairs only BELOW the
        # self-join, so a hot shingle (a stop-word trigram at 100 TB)
        # still enumerated every co-shingled pair inside the join —
        # quadratic in the hot shingle's doc frequency. Pre-filtering
        # the sides bounds the join to candidate keys; the pair-level
        # semi-join after it still drops candidate-key pairs that are
        # not themselves candidates, so surviving pairs are identical.
        # The broadcasts are SIZE-GATED (r14's was unconditional): a
        # pathological candidate explosion past the row threshold
        # degrades to a shuffled semi-join instead of OOMing the
        # driver (gated in tests/test_dedup.py).
        cand = candidates.select("key_a", "key_b").localCheckpoint(
            eager=True
        )
        n_cand = cand.count()  # O(1) job over checkpointed blocks
        small = n_cand <= _CAND_BROADCAST_ROWS
        cand_keys = (
            cand.select(F.col("key_a").alias(key_col))
            .union(cand.select(F.col("key_b").alias(key_col)))
            .distinct()
        )
        if small:
            cand_keys = F.broadcast(cand_keys)
        verify_side = shingle_df.join(cand_keys, key_col, "left_semi")
    a = verify_side.alias("a")
    b = verify_side.alias("b")
    pairs = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col(f"a.{key_col}") < F.col(f"b.{key_col}")),
    ).select(
        F.col(f"a.{key_col}").alias("key_a"),
        F.col(f"b.{key_col}").alias("key_b"),
    )
    if cand is not None:
        # the pair-identity filter still lands BELOW the pair-count
        # shuffle (r14, guide §3.2): only candidate pairs are counted
        pairs = pairs.join(
            F.broadcast(cand) if small else cand,
            ["key_a", "key_b"],
            "left_semi",
        )
    inter = pairs.groupBy("key_a", "key_b").agg(
        F.count("*").alias("n_common")
    )
    scored = (
        inter.join(
            sizes.select(F.col(key_col).alias("key_a"), F.col("n_shingles").alias("n_a")),
            "key_a",
        )
        .join(
            sizes.select(F.col(key_col).alias("key_b"), F.col("n_shingles").alias("n_b")),
            "key_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
    )
    return scored.filter(F.col("jaccard") >= min_jaccard).select(
        "key_a", "key_b", "n_common", "n_a", "n_b", "jaccard"
    )


def simhash(df: DataFrame, text_col: str, key_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document from whitespace tokens.

    Classic bit-voting: each distinct token votes ±1 on every bit of
    its hash; the signature bit is 1 where the vote sum is positive.
    Expressed as explode → per-bit conditional sums → bit reassembly;
    one aggregation shuffle, output one BIGINT pair per doc.

    The 64 bit-source bits come from TWO portable 32-bit hashes (first
    8 md5 hex chars of 'lo|'||token and 'hi|'||token) instead of one
    xxhash64 — the same portability move as minhash_perm_hash, so a
    DuckDB oracle rebuilds the identical signatures and simhash_docs
    is exact-oracle checked rather than rows-only. All-integer voting
    → cross-engine exact.
    """
    toks = df.select(
        F.col(key_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), r"\s+"))).alias("tok"),
    ).filter(F.length("tok") > 0)

    def _half(salt: str) -> "F.Column":
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt + "|"), F.col("tok"))), 1, 8
                ),
                16,
                10,
            )
            .cast("bigint")
        )

    hashed = toks.select(
        key_col, _half("lo").alias("hlo"), _half("hi").alias("hhi")
    )
    votes = [
        F.sum(
            F.when(
                F.shiftright(
                    F.col("hlo" if i < 32 else "hhi"), i % 32
                ).bitwiseAND(F.lit(1))
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    voted = hashed.groupBy(key_col).agg(*votes)
    # reassemble: sum of 2^i for positive-vote bits; use two 32-bit
    # halves to stay in BIGINT range without sign trouble on bit 63
    lo = sum(
        [
            F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(32)
        ],
        start=F.lit(0),
    )
    hi = sum(
        [
            F.when(F.col(f"v{i}") > 0, F.lit(1 << (i - 32))).otherwise(F.lit(0))
            for i in range(32, bits)
        ],
        start=F.lit(0),
    )
    return voted.select(
        key_col,
        (lo.cast("long")).alias("simhash_lo"),
        (hi.cast("long")).alias("simhash_hi"),
    )


def hamming_distance(col_a, col_b) -> F.Column:
    """Hamming distance between two 32-bit halves via bit_count(xor)."""
    return F.bit_count(F.expr(f"{col_a} ^ {col_b}"))
