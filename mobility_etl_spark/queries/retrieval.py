"""Retrieval + corpus-hygiene pack for the training-data pipeline:
hybrid (sparse+dense) RAG retrieval, n-gram benchmark decontamination,
quality-weighted sampling, temperature-flattened mixture resampling,
and leakage-free group-aware splits.

These close the retrieval end of the corpus-preparation story
(SURVEY.md §2.C N5/N6/N7): BM25 and cosine ANN exist as separate faces
(queries/corpus_prep.py, operators/similarity.py); production RAG and
eval-decontamination pipelines compose them, and the compositions have
their own semantics worth gating (rank fusion, strict n-gram overlap,
per-group determinism). Every query here has an exact DuckDB oracle —
scores use the established 1e-9 fixed-point / rounded-cosine patterns
so cross-engine float behavior can't flip a hash bit.

All names sort after "minhash_near_dup" (driver-window rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import DEC
from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.sampling import hash_bucket, sql_hash_bucket
from mobility_etl_spark.operators.similarity import brute_force_topk
from mobility_etl_spark.queries.corpus_prep import bm25_scores
from mobility_etl_spark.registry import register

# Single source of truth for BM25 parameters: the Spark leg calls
# corpus_prep.bm25_scores with its defaults, so the oracle MUST
# interpolate the same constants — re-declaring them here would let the
# two sides silently desynchronize.
from mobility_etl_spark.queries.corpus_prep import _B, _BM25_TERMS as _TERMS, _K1

_RRF_K = 60
_LIST_N = 100
_FUSE_K = 20

_BM25_SQL = f"""
    t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               SUM(len(toks)) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM t
    ),
    terms AS (SELECT unnest(['{_TERMS[0]}', '{_TERMS[1]}',
                             '{_TERMS[2]}']) AS term),
    dft AS (
        SELECT term, COUNT(*) AS df_t
        FROM terms, t
        WHERE list_contains(toks, term)
        GROUP BY term
    ),
    sparse AS (
        SELECT doc_id,
               CAST(SUM(CAST(FLOOR(
                 ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                 * (tf * ({_K1} + 1.0))
                 / (tf + {_K1} * (1.0 - {_B} + {_B} * dl / avgdl))
                 * 1000000000.0) AS BIGINT)) AS BIGINT) AS score_fx
        FROM (
            SELECT t.doc_id, len(t.toks) AS dl,
                   CAST(len(list_filter(t.toks, x -> x = dft.term))
                        AS DOUBLE) AS tf,
                   dft.term, dft.df_t
            FROM t CROSS JOIN dft
        ) x CROSS JOIN stats
        WHERE tf > 0
        GROUP BY doc_id
    ),
    sparse_ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score_fx DESC, doc_id) AS rank_s
        FROM sparse
        QUALIFY rank_s <= {_LIST_N}
    )
"""

_DENSE_SQL = f"""
    q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    dense AS (
        SELECT c.vec_id AS doc_id,
               round(
                 (CAST((SELECT SUM(CAST(FLOOR(CAST(q.embedding[i] AS DOUBLE)
                                        * CAST(c.embedding[i] AS DOUBLE)
                                        * 1000000.0) AS BIGINT))
                       FROM UNNEST(generate_series(1, len(q.embedding)))
                           AS g(i)) AS DOUBLE) / 1000000.0)
                 / sqrt(
                     (CAST((SELECT SUM(CAST(FLOOR(CAST(q.embedding[i] AS DOUBLE)
                                        * CAST(q.embedding[i] AS DOUBLE)
                                        * 1000000.0) AS BIGINT))
                       FROM UNNEST(generate_series(1, len(q.embedding)))
                           AS g(i)) AS DOUBLE) / 1000000.0)
                     *
                     (CAST((SELECT SUM(CAST(FLOOR(CAST(c.embedding[i] AS DOUBLE)
                                        * CAST(c.embedding[i] AS DOUBLE)
                                        * 1000000.0) AS BIGINT))
                       FROM UNNEST(generate_series(1, len(c.embedding)))
                           AS g(i)) AS DOUBLE) / 1000000.0)
                   ),
                 6) AS cos_sim
        FROM q, embeddings c
        WHERE c.vec_id != 0
    ),
    dense_ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rank_d
        FROM dense
        QUALIFY rank_d <= {_LIST_N}
    )
"""


@register(
    "rag_hybrid_retrieval",
    oracle=f"""
    WITH {_BM25_SQL},
    {_DENSE_SQL},
    fused AS (
        SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
               COALESCE(CAST(FLOOR(1000000000.0
                   / ({_RRF_K} + s.rank_s)) AS BIGINT), 0)
             + COALESCE(CAST(FLOOR(1000000000.0
                   / ({_RRF_K} + d.rank_d)) AS BIGINT), 0) AS rrf_fx
        FROM sparse_ranked s FULL OUTER JOIN dense_ranked d
          ON s.doc_id = d.doc_id
    )
    SELECT doc_id, rrf_fx,
           ROW_NUMBER() OVER (ORDER BY rrf_fx DESC, doc_id) AS fused_rank
    FROM fused
    QUALIFY fused_rank <= {_FUSE_K}
    """,
    tags=("N5", "N6", "N3"),
)
def rag_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid RAG retrieval: BM25 top-100 (sparse) and cosine top-100
    against query vector 0 (dense), fused by reciprocal-rank fusion
    (k=60) into a final top-20 — the standard two-tower retrieval
    layout. Ranks are exact integers (deterministic tiebreaks), so the
    fusion score floor(1e9/(60+rank)) is hash-exact cross-engine.
    Scale: both legs are broadcast-query scans over the corpus with
    TakeOrderedAndProject top-k; the fusion UNIONS the two ≤100-row
    contribution lists and collapses them with one tiny hash
    aggregation (no full-outer join) — negligible either way. At 100 TB
    the legs swap in the LSH/IVF
    operators (same (doc_id, rank) contract), fusion unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    sparse_top = (
        bm25_scores(docs, _TERMS)
        .orderBy(F.col("score_fx").desc(), "doc_id")
        .limit(_LIST_N)
    )
    ws = Window.orderBy(F.col("score_fx").desc(), "doc_id")
    sparse_ranked = sparse_top.select(
        "doc_id", F.row_number().over(ws).alias("rank_s")
    )

    dense_ranked = (
        brute_force_topk(emb.filter(F.col("vec_id") == 0), emb, k=_LIST_N)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("rank_d"))
    )

    # Union-of-contributions instead of a full-outer join: each leg
    # emits floor(1e9/(k+rank)) for its docs and a groupBy sums them —
    # identical semantics (a missing leg contributes 0) but the plan is
    # one tiny hash aggregation instead of a sort-merge full-outer.
    rrf = lambda r: F.floor(F.lit(1000000000.0) / (_RRF_K + r)).cast("bigint")  # noqa: E731
    contribs = sparse_ranked.select(
        "doc_id", rrf(F.col("rank_s")).alias("c")
    ).unionByName(dense_ranked.select("doc_id", rrf(F.col("rank_d")).alias("c")))
    fused = contribs.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("rrf_fx"))
    topk = fused.orderBy(F.col("rrf_fx").desc(), "doc_id").limit(_FUSE_K)
    wf = Window.orderBy(F.col("rrf_fx").desc(), "doc_id")
    return topk.withColumn("fused_rank", F.row_number().over(wf))


_NGRAM_N = 3
_EVAL_MOD, _EVAL_LT = 100, 3


@register(
    "text_decontaminate_ngram",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    g AS (
        SELECT doc_id, array_to_string(toks[i:i+{_NGRAM_N - 1}], ' ') AS ng
        FROM t, LATERAL (SELECT unnest(
            generate_series(1, len(toks) - {_NGRAM_N - 1})) AS i)
    ),
    eval_grams AS (
        SELECT DISTINCT ng FROM g WHERE doc_id % {_EVAL_MOD} < {_EVAL_LT}
    ),
    train_grams AS (
        SELECT DISTINCT doc_id, ng FROM g
        WHERE doc_id % {_EVAL_MOD} >= {_EVAL_LT}
    )
    SELECT tg.doc_id, COUNT(*) AS n_shared_ngrams
    FROM train_grams tg JOIN eval_grams e USING (ng)
    GROUP BY tg.doc_id
    """,
    tags=("N5", "N1"),
)
def text_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by strict {_NGRAM_N}-gram overlap: any
    train doc sharing a token {_NGRAM_N}-gram with the eval split
    (doc_id % {_EVAL_MOD} < {_EVAL_LT}) is flagged with its distinct
    shared-shingle count — the pretraining hygiene step that
    ``text_contamination_check`` (whole-doc containment) can't express
    at span granularity. Shingles come from a higher-order
    transform/slice over the token array (no explode of duplicates —
    DISTINCT per doc first), and the flagging is an equi-join on the
    shingle string: the same bucketed-join shape as MinHash LSH, so at
    100 TB the eval side (benchmarks, ~MBs) broadcasts and the corpus
    side never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # Shingles via zip_with over shifted slices (split hoists to once
    # per row — never reference a derived column inside an index
    # lambda; see SCALING.md). Short docs are guarded: with size < N
    # the slice length m ≤ 0 would throw, but CASE short-circuits so a
    # doc under N tokens simply has no shingles (mirrors the oracle's
    # empty generate_series).
    m = F.size(toks) - _NGRAM_N + 1  # ≥ 1 inside the guarded branch
    shifted = F.slice(toks, 1, m)
    for k in range(2, _NGRAM_N + 1):
        shifted = F.zip_with(
            shifted, F.slice(toks, k, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    ngrams = F.when(F.size(toks) >= _NGRAM_N, shifted).otherwise(
        F.array().cast("array<string>")
    )
    g = docs.select(
        "doc_id", F.explode(F.array_distinct(ngrams)).alias("ng")
    )
    eval_grams = (
        g.filter(F.col("doc_id") % _EVAL_MOD < _EVAL_LT).select("ng").distinct()
    )
    train_grams = g.filter(F.col("doc_id") % _EVAL_MOD >= _EVAL_LT)
    return (
        train_grams.join(F.broadcast(eval_grams), "ng")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


@register(
    "weighted_sample_docs",
    oracle=f"""
    WITH rated AS (
        SELECT doc_id, lang, n_chars,
               LEAST(1000, GREATEST(0,
                   CAST(FLOOR(1000.0 * (n_chars - 100) / 300.0) AS BIGINT)))
                   AS keep_permille
        FROM documents
    )
    SELECT doc_id, lang, n_chars, keep_permille
    FROM rated
    WHERE {sql_hash_bucket("doc_id", 1000)} < keep_permille
    """,
    tags=("N7", "N5"),
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: each doc's keep
    probability scales with its quality proxy (here length: permille =
    clamp(⌊1000·(n_chars−100)/300⌋)), and membership is decided by the
    portable hash (operators/sampling.py) against that per-row
    threshold — Bernoulli sampling with per-row rates that is a pure
    function of (doc_id, n_chars): reproducible across runs, engines
    and partitionings (hence exactly oracle-checkable), unlike
    rand()-based weighted sampling. Pure map-side filter: zero
    shuffles at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    permille = F.least(
        F.lit(1000),
        F.greatest(
            F.lit(0),
            F.floor(1000.0 * (F.col("n_chars") - 100) / 300.0).cast("bigint"),
        ),
    )
    return (
        docs.withColumn("keep_permille", permille)
        .filter(hash_bucket("doc_id", 1000) < F.col("keep_permille"))
        .select("doc_id", "lang", "n_chars", "keep_permille")
    )


@register(
    "resample_temperature_mixture",
    oracle=f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_orig FROM documents GROUP BY source
    ),
    z AS (
        SELECT CAST(SUM(CAST(sqrt(CAST(n_orig AS DOUBLE))
                             AS DECIMAL(20,6))) AS DOUBLE) AS zsum
        FROM counts
    ),
    probs AS (
        SELECT source, n_orig,
               sqrt(CAST(n_orig AS DOUBLE)) / zsum AS p
        FROM counts CROSS JOIN z
    ),
    capacity AS (
        SELECT MIN(n_orig / p) AS t FROM probs
    ),
    rates AS (
        SELECT source, n_orig,
               CAST(FLOOR(1000.0 * t * p / n_orig) AS BIGINT)
                   AS keep_permille
        FROM probs CROSS JOIN capacity
    )
    SELECT r.source, r.n_orig, r.keep_permille,
           COUNT(d.doc_id) AS n_sampled
    FROM rates r
    LEFT JOIN documents d
      ON d.source = r.source
     AND {sql_hash_bucket("d.doc_id", 1000)} < r.keep_permille
    GROUP BY r.source, r.n_orig, r.keep_permille
    """,
    tags=("N7", "N5"),
)
def resample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture (T=2): target share per
    source ∝ n^(1/T) = √n, normalized — the standard up/down-weighting
    that keeps head sources from drowning the tail without fixed
    hand-set weights (contrast ``resample_lang_mixture``, which takes
    an explicit target). Capacity T = min(n_s/p_s) maximizes kept
    rows; each source keeps a ⌊1000·T·p_s/n_s⌋‰ portable-hash sample.
    The normalizer Σ√n accumulates in DECIMAL so the only
    order-sensitive float sum is exact; every other term is a
    bit-identical scalar expression. The fact side never shuffles —
    rates (|sources| rows) broadcast onto the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_orig"))
    z = counts.agg(
        F.sum(F.sqrt(F.col("n_orig").cast("double")).cast(DEC))
        .cast("double")
        .alias("zsum")
    )
    probs = counts.crossJoin(F.broadcast(z)).select(
        "source",
        "n_orig",
        (F.sqrt(F.col("n_orig").cast("double")) / F.col("zsum")).alias("p"),
    )
    capacity = probs.agg(F.min(F.col("n_orig") / F.col("p")).alias("t"))
    rates = probs.crossJoin(F.broadcast(capacity)).select(
        "source",
        "n_orig",
        F.floor(1000.0 * F.col("t") * F.col("p") / F.col("n_orig"))
        .cast("bigint")
        .alias("keep_permille"),
    )
    sampled = docs.join(F.broadcast(rates), "source").filter(
        hash_bucket("doc_id", 1000) < F.col("keep_permille")
    )
    sample_counts = sampled.groupBy("source").agg(
        F.count("*").alias("n_sampled")
    )
    # LEFT join mirrors the oracle: a zero-sample source still emits
    # a row with n_sampled = 0 (the resample_lang_mixture fix).
    return rates.join(F.broadcast(sample_counts), "source", "left").select(
        "source",
        "n_orig",
        "keep_permille",
        F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
    )


@register(
    "training_group_split",
    oracle=f"""
    WITH tagged AS (
        SELECT source,
               CASE WHEN {sql_hash_bucket(
                   "TRY_CAST(SUBSTR(source, 4) AS BIGINT)", 100)} < 80
                    THEN 'train' ELSE 'test' END AS split,
               doc_id
        FROM documents
    )
    SELECT source, split, COUNT(*) AS n_docs,
           COUNT(DISTINCT doc_id) AS n_distinct_docs
    FROM tagged
    GROUP BY source, split
    """,
    tags=("N7",),
)
def training_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free group-aware split: the train/test decision hashes
    the GROUP key (source), not the row key, so every doc from one
    source lands in the same split — the required discipline when rows
    within a group are correlated (near-duplicate crawls, same-author
    docs) and a row-level split would leak across the boundary.
    Emitted per (source, split) so the oracle equality itself proves
    no group straddles. Same zero-shuffle posture as hash_split:
    membership is a map-side pure function of the group key."""
    docs = load_table(spark, sf_dir, "documents")
    # substr(source, 4) (no length cap) + try_cast: a numeric suffix of
    # any length hashes identically on both engines, and a non-numeric
    # source degrades to NULL → 'test' instead of an engine-dependent
    # crash (mirrors the oracle's TRY_CAST).
    src_num = F.expr("try_cast(substr(source, 4) AS BIGINT)")
    split = F.when(hash_bucket(src_num, 100) < 80, F.lit("train")).otherwise(
        F.lit("test")
    )
    return (
        docs.select("source", split.alias("split"), "doc_id")
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("doc_id").alias("n_distinct_docs"),
        )
    )


_PHRASE = ("table", "scan")


@register(
    "phrase_search_positional",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents
    ),
    hits AS (
        SELECT doc_id, source,
               len(list_filter(generate_series(1, len(toks) - 1),
                   i -> toks[i] = '{_PHRASE[0]}'
                        AND toks[i + 1] = '{_PHRASE[1]}')) AS n_occurrences
        FROM t
    )
    SELECT doc_id, source, n_occurrences
    FROM hits WHERE n_occurrences > 0
    """,
    tags=("N6", "E27"),
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query ("table scan") answered from a
    POSITIONAL INVERTED INDEX — the sparse-retrieval twin of the dense
    ANN faces, and the structure BM25 lacks (bag-of-words cannot see
    adjacency). Build: posexplode tokens to (token, pos) postings —
    at scale this index is built once, partitioned by token, and
    reused across queries. Query: fetch the two terms' postings and
    equi-join on (doc, pos+1) — adjacency becomes a JOIN KEY, so the
    phrase test is hash-joinable, never a scan — then count matches
    per document. The oracle instead scans each document's token array
    directly (lambda over positions), so the equality proves the
    classic IR contract: index lookup ≡ full scan."""
    docs = load_table(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    )
    first = postings.filter(F.col("token") == _PHRASE[0]).select(
        "doc_id", "source", F.col("pos").alias("p0")
    )
    second = postings.filter(F.col("token") == _PHRASE[1]).select(
        F.col("doc_id").alias("doc_id2"), (F.col("pos") - 1).alias("p1")
    )
    hits = first.join(
        second,
        (F.col("doc_id") == F.col("doc_id2")) & (F.col("p0") == F.col("p1")),
    )
    return hits.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_occurrences")
    )
