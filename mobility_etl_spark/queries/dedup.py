"""Deduplication queries (SURVEY.md §2.C N1–N2) over ``documents``.

Exact and n-gram-Jaccard dedup are oracle-checked (pure relational
algebra in both engines). MinHash-LSH and SimHash use xxhash64 (no
DuckDB equivalent) → rows-only driver check; their quality is gated in
tests/test_dedup.py against the exact Jaccard ground truth (recall,
hamming-vs-similarity monotonicity) per SURVEY.md §7 hard-part 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.components import connected_components
from mobility_etl_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
)
from mobility_etl_spark.registry import register

#: Pairwise queries bound the left/right sets to this many docs so the
#: candidate space stays quadratic-in-a-constant at every SF. NOT a
#: silent cap: the full-corpus path is the LSH variant, which prunes
#: via banding instead of an id range.
PAIR_SCOPE = 300


@register(
    "dedup_exact_docs",
    oracle="""
    WITH reps AS (
        SELECT md5(text) AS digest,
               MIN(doc_id) AS doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
    )
    SELECT r.doc_id, r.n_copies, d.lang, d.source, d.n_chars
    FROM reps r JOIN documents d ON r.doc_id = d.doc_id
    """,
    tags=("N1",),
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup, digest-first (R5/R6 generalized): one
    min-doc_id representative per distinct text; shuffles md5 digests,
    not document payloads."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").select(
        "doc_id", "n_copies", "lang", "source", "n_chars"
    )


@register(
    "dedup_stats_per_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dupes
    FROM documents
    GROUP BY source
    """,
    tags=("N1", "E14"),
)
def dedup_stats_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup audit: per-source document vs distinct-content counts."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_dupes"),
    )


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH scoped AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < {PAIR_SCOPE}
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]) AS shingle
        FROM scoped, UNNEST(generate_series(1, greatest(len(toks) - 2, 1))) AS g(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS key_a, b.doc_id AS key_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT key_a, key_b, n_common,
           sa.n_shingles AS n_a, sb.n_shingles AS n_b,
           n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = key_a
    JOIN sizes sb ON sb.doc_id = key_b
    WHERE n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) >= 0.2
    """,
    tags=("N2",),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (similarity ≥ 0.2) on
    a bounded id range (see PAIR_SCOPE) — the ground truth the LSH
    variants are measured against; all-integer arithmetic until the
    final division, so scores are engine-exact."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < PAIR_SCOPE)
    sh = shingles(docs, "text", "doc_id", n=3)
    return jaccard_pairs(sh, "doc_id", min_jaccard=0.2)


_MH_PERMS, _MH_BANDS = 32, 8
_MH_R = _MH_PERMS // _MH_BANDS

#: One MIN-of-portable-hash column per permutation (mirrors
#: operators/dedup.py:minhash_perm_hash exactly).
_MH_SIG_COLS = ",\n               ".join(
    f"MIN(CAST(('0x' || substr(md5('{i}|' || shingle), 1, 15)) AS BIGINT))"
    f" AS h{i}"
    for i in range(_MH_PERMS)
)
#: One SELECT per band: band hash = md5 of the band's minima joined
#: with '|' (mirrors lsh_candidate_pairs' array_join form — BIGINT
#: casts to the same plain-digit string in both engines).
_MH_BANDED = "\n        UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, md5("
    + " || '|' || ".join(
        f"CAST(h{b * _MH_R + j} AS VARCHAR)" for j in range(_MH_R)
    )
    + ") AS band_hash FROM sig"
    for b in range(_MH_BANDS)
)


@register(
    "minhash_near_dup",
    oracle=f"""
    WITH scoped AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < {PAIR_SCOPE}
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]) AS shingle
        FROM scoped, UNNEST(generate_series(1, greatest(len(toks) - 2, 1))) AS g(i)
    ),
    sig AS (
        SELECT doc_id, {_MH_SIG_COLS}
        FROM sh GROUP BY doc_id
    ),
    banded AS (
        {_MH_BANDED}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.key_a, c.key_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.key_a
        JOIN sh b ON b.doc_id = c.key_b AND b.shingle = a.shingle
        GROUP BY c.key_a, c.key_b
    )
    SELECT key_a, key_b, n_common,
           sa.n_shingles AS n_a, sb.n_shingles AS n_b,
           n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = key_a
    JOIN sizes sb ON sb.doc_id = key_b
    WHERE n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE) >= 0.2
    """,
    tags=("N2",),
)
def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms) + 8-band LSH candidates, exact-Jaccard verified
    at ≥ 0.2 — the 100 TB near-dup path: signatures are 256 bytes/doc,
    banding turns the pair space into bucket joins. EXACT-oracle
    checked since r10: permutation hashes are portable md5-derived
    60-bit integers and band hashes md5 over the joined minima
    (operators/dedup.py:minhash_perm_hash — the theta/countmin
    portability move), so DuckDB rebuilds the identical signatures,
    buckets, candidates, and verified pairs. Recall vs
    ``ngram_jaccard_pairs`` remains asserted in tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < PAIR_SCOPE)
    sh = shingles(docs, "text", "doc_id", n=3)
    # r14 (guide §2.4): ONE keyed aggregation yields signatures AND
    # shingle-set sizes (was two identical exchanges over two full
    # runs of the shingle DAG); the exact-Jaccard verify then
    # semi-joins the broadcast candidate list BELOW its pair count.
    # r15 (VERDICT r14 #4/#7): the verify additionally prefilters
    # BOTH co-shingle self-join sides to candidate-involved keys and
    # size-gates the candidate broadcasts — see
    # operators/dedup.py:jaccard_pairs. Signatures, buckets,
    # candidates, and verified pairs are byte-identical — the md5
    # permutation hashes are untouched.
    sigs = minhash_signatures(sh, "doc_id", num_perm=32, with_count=True)
    cands = lsh_candidate_pairs(sigs, "doc_id", num_perm=32, bands=8)
    return jaccard_pairs(
        sh, "doc_id", candidates=cands, min_jaccard=0.2, sizes=sigs
    )


#: SimHash oracle pieces — mirror operators/dedup.py:simhash exactly.
_SH_HALF = {
    "lo": "CAST(('0x' || substr(md5('lo|' || tok), 1, 8)) AS BIGINT)",
    "hi": "CAST(('0x' || substr(md5('hi|' || tok), 1, 8)) AS BIGINT)",
}
_SH_VOTES = ",\n               ".join(
    f"SUM(CASE WHEN (h{'lo' if i < 32 else 'hi'} >> {i % 32}) & 1 = 1"
    f" THEN 1 ELSE -1 END) AS v{i}"
    for i in range(64)
)
_SH_LO = " + ".join(
    f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(32)
)
_SH_HI = " + ".join(
    f"(CASE WHEN v{i} > 0 THEN {1 << (i - 32)} ELSE 0 END)"
    for i in range(32, 64)
)


@register(
    "simhash_docs",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, tok
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE doc_id < {PAIR_SCOPE}
        ) WHERE len(tok) > 0
    ),
    h AS (
        SELECT doc_id,
               {_SH_HALF["lo"]} AS hlo,
               {_SH_HALF["hi"]} AS hhi
        FROM tok
    ),
    v AS (
        SELECT doc_id,
               {_SH_VOTES}
        FROM h GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({_SH_LO} AS BIGINT) AS simhash_lo,
           CAST({_SH_HI} AS BIGINT) AS simhash_hi
    FROM v
    """,
    tags=("N2",),
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (two 32-bit halves packed as longs):
    near-dup lookup becomes hamming distance on one BIGINT pair.
    EXACT-oracle checked since r10: the bit sources are two portable
    md5-derived 32-bit hashes (operators/dedup.py:simhash), so DuckDB
    replays the full bit-voting and the packed signatures match
    bit-for-bit; hamming≈similarity monotonicity remains asserted in
    tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < PAIR_SCOPE)
    return simhash(docs, "text", "doc_id")


@register(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE scoped AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < {PAIR_SCOPE}
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]) AS shingle
        FROM scoped, UNNEST(generate_series(1, greatest(len(toks) - 2, 1))) AS g(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS key_a, b.doc_id AS key_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    edges AS (
        SELECT key_a, key_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = key_a
        JOIN sizes sb ON sb.doc_id = key_b
        WHERE n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE)
              >= 0.2
    ),
    sym AS (
        SELECT key_a AS src, key_b AS dst FROM edges
        UNION ALL
        SELECT key_b AS src, key_a AS dst FROM edges
    ),
    reach(node, lab) AS (
        SELECT doc_id, doc_id FROM scoped
        UNION
        SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.node
    )
    SELECT node AS doc_id,
           MIN(lab) AS component,
           (node = MIN(lab)) AS keep
    FROM reach
    GROUP BY node
    """,
    tags=("N1", "N2"),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: connected components over the
    exact-Jaccard ≥ 0.2 pair graph (operators/components.py, iterative
    min-label propagation with per-round lineage truncation), each doc
    labeled with its cluster's canonical id and a keep flag — the
    representative-selection step of corpus dedup. Proven against a
    DuckDB recursive-CTE transitive closure of the same edge set."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < PAIR_SCOPE)
    sh = shingles(docs, "text", "doc_id", n=3)
    edges = jaccard_pairs(sh, "doc_id", min_jaccard=0.2).select("key_a", "key_b")
    comp = connected_components(
        docs.select("doc_id"), edges, "doc_id", "key_a", "key_b"
    )
    return comp.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )
