"""Frequent-items queries over ``documents`` (north-star N-surface:
corpus token statistics for training-data curation).

``token_heavy_hitters`` is the exact two-pass baseline (explode +
groupBy — the shape whose shuffle cost motivates the sketch) and is
hash-checked against DuckDB. ``token_heavy_hitters_mg`` is the
single-pass mergeable Misra-Gries summary (operators/sketch.py) —
rows-only at the driver (summary contents are merge-order dependent);
its frequency guarantees are gated in tests/test_sketch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.sketch import misra_gries_tokens
from mobility_etl_spark.registry import register

#: A token is a heavy hitter when it carries more than 1/200 of all
#: token occurrences — SF-relative, so the query is scale-free.
HH_DENOM = 200


@register(
    "token_heavy_hitters",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents
    ),
    tot AS (SELECT COUNT(*) AS total FROM tok)
    SELECT token, COUNT(*) AS n_occurrences
    FROM tok, tot
    GROUP BY token, total
    HAVING COUNT(*) * {HH_DENOM} >= total
    """,
    tags=("N5", "E13", "E23"),
)
def token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters: tokens carrying ≥ 1/200 of all token
    occurrences. The explode → groupBy(token) shuffle is the exact
    baseline the MG sketch replaces at scale; the relative threshold
    rides along as a broadcast scalar, not a driver round-trip."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("token")
    )
    total = tok.agg(F.count("*").alias("total"))
    return (
        tok.groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * HH_DENOM >= F.col("total"))
        .select("token", "n_occurrences")
    )


@register("token_heavy_hitters_mg", oracle=None, tags=("N5", "E39"))
def token_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass Misra-Gries heavy hitters (k=64): tokenization and
    summarization fused into one mapInPandas scan, shuffling only
    partitions × k counter rows. Rows-only driver check; the MG bounds
    (no overestimate, presence above N/(k+1), underestimate ≤ N/(k+1))
    are gated against the exact counts in tests/test_sketch.py."""
    docs = load_table(spark, sf_dir, "documents")
    return misra_gries_tokens(docs, "text", k=64)


#: Bloom sizing: ~6 bits per seen key with 4 hashes → theoretical FPR
#: ≈ (1 − e^{−4/6})^4 ≈ 5.6%, scale-free because m grows with n.
BLOOM_BITS_PER_KEY = 6
BLOOM_K = 4


@register(
    "sketch_bloom_filter_dedup",
    oracle=f"""
    WITH seen AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0),
    m AS (
        SELECT CAST(
            POWER(2, GREATEST(
                8,
                CAST(FLOOR(LOG2(COUNT(*) * {BLOOM_BITS_PER_KEY}.0))
                     AS INT) + 1)) AS BIGINT) AS m_bits
        FROM seen
    ),
    pos_seen AS (
        SELECT DISTINCT
            (('0x' || substr(md5(CAST(i AS VARCHAR) || '|'
                             || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % (SELECT m_bits FROM m)) AS pos
        FROM seen, UNNEST(generate_series(0, {BLOOM_K - 1})) AS g(i)
    ),
    words AS (
        SELECT pos // 64 AS word_idx,
               bit_or(CASE WHEN pos % 64 = 63 THEN -9223372036854775807 - 1
                      ELSE 1::BIGINT << CAST(pos % 64 AS INT) END)
                   AS bits
        FROM pos_seen GROUP BY pos // 64
    ),
    probe AS (
        SELECT d.doc_id,
               bool_and(
                   COALESCE(w.bits, 0)
                   & (CASE WHEN p.pos % 64 = 63 THEN -9223372036854775807 - 1
                      ELSE 1::BIGINT << CAST(p.pos % 64 AS INT) END)
                   <> 0
               ) AS maybe_seen
        FROM documents d,
        LATERAL (
            SELECT (('0x' || substr(md5(CAST(g.i AS VARCHAR) || '|'
                       || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % (SELECT m_bits FROM m)) AS pos
            FROM UNNEST(generate_series(0, {BLOOM_K - 1})) AS g(i)
        ) p
        LEFT JOIN words w ON w.word_idx = p.pos // 64
        GROUP BY d.doc_id
    )
    SELECT (doc_id % 3 <> 0) AS truly_seen, maybe_seen,
           COUNT(*) AS n_docs
    FROM probe GROUP BY 1, 2
    """,
    tags=("N1", "E26"),
)
def sketch_bloom_filter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup via a distributed Bloom filter
    (operators/sketch.py:bloom_build/bloom_probe): the already-ingested
    corpus (docs with ``doc_id % 3 != 0``) is folded into a sparse
    bitset DataFrame with a ``bit_or`` aggregate — the only shuffle is
    ≤ partitions × m/64 partial words — and the incoming batch (all
    docs) probes it with a broadcast join + bitwise AND. No false
    negatives by construction; FPR is sized scale-free at ~6 bits/key
    (gated in tests/test_sketch.py). EXACT-oracle checked since r11:
    the bit positions are portable md5-derived 60-bit hashes (the
    minhash/kmv re-key move), so DuckDB rebuilds the identical filter
    — same words, same false positives — and the driver's hash
    equality covers the sketch itself, not just its shape."""
    from mobility_etl_spark.operators.sketch import bloom_build, bloom_probe

    docs = load_table(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") % 3 != 0)
    n_seen = seen.count()  # control scalar: sizes the filter, like
    # the convergence sums in operators/components.py
    m_bits = 1 << max(8, (n_seen * BLOOM_BITS_PER_KEY).bit_length())
    bloom = bloom_build(seen, "doc_id", m_bits, BLOOM_K)
    probed = bloom_probe(docs, bloom, "doc_id", m_bits, BLOOM_K)
    return (
        probed.withColumn("truly_seen", F.col("doc_id") % 3 != 0)
        .groupBy("truly_seen", "maybe_seen")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("truly_seen", "maybe_seen")
    )


#: Counter budget for the VERIFIED Misra-Gries face. The mergeable-MG
#: presence guarantee (Agarwal et al., "Mergeable Summaries"): after
#: arbitrary merges of MG(k) summaries, any token with true count
#: > N/(k+1) is present. With k=256 counters and the HH threshold at
#: N/200, every true heavy hitter (count*200 >= N => count > N/257)
#: is guaranteed a candidate — so the exact recount below provably
#: reconstructs the exact answer, never misses.
MG_VERIFIED_K = 256


@register(
    "token_hh_mg_verified",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents
    ),
    tot AS (SELECT COUNT(*) AS total FROM tok)
    SELECT token, COUNT(*) AS n_occurrences
    FROM tok, tot
    GROUP BY token, total
    HAVING COUNT(*) * {HH_DENOM} >= total
    """,
    tags=("N5", "N8", "E39"),
)
def token_hh_mg_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries candidates + exact recount = EXACT heavy hitters in
    two passes with a bounded shuffle: pass 1 is the single-scan
    MG({MG_VERIFIED_K}) summary (<= partitions x k counter rows
    shuffled — the sketch is the scale mechanism); pass 2 recounts
    ONLY the <= k candidate tokens (broadcast semi-join prunes the
    explode->groupBy shuffle to candidate rows) and applies the exact
    threshold. Because MG's presence guarantee makes the candidate
    set a provable superset of the true heavy hitters (see
    MG_VERIFIED_K above), the output is deterministic and EXACT — the
    candidate-verify pattern that turns an approximate sketch into an
    exact answer at a fraction of the exact baseline's shuffle. Hence
    a strict DuckDB oracle (the plain exact HH query), upgrading the
    MG family from rows-only: token_heavy_hitters_mg exposes the raw
    merge-order-dependent summary; this face proves the summary is
    USED correctly."""
    docs = load_table(spark, sf_dir, "documents")
    cands = misra_gries_tokens(docs, "text", k=MG_VERIFIED_K).select("token")
    tok = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("token")
    )
    total = tok.agg(F.count("*").alias("total"))
    return (
        tok.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * HH_DENOM >= F.col("total"))
        .select("token", "n_occurrences")
    )
