"""Second text-quality pack (N5): per-document token entropy and
out-of-vocabulary rate — the remaining standard corpus-filter signals
(low entropy ⇒ repetitive boilerplate; high OOV vs the corpus's own
head vocabulary ⇒ noise/OCR junk). Names sort past "m"
(driver-window rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register

_DOC_SCOPE = 200
_VOCAB_K = 200


@register(
    "text_token_entropy",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id < {_DOC_SCOPE}
    ),
    counts AS (
        SELECT doc_id, token, COUNT(*) AS cnt
        FROM tok GROUP BY doc_id, token
    ),
    totals AS (
        SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id
    )
    SELECT c.doc_id,
           t.n_tokens,
           COUNT(*) AS n_distinct,
           CAST(SUM(CAST(FLOOR(
               -(c.cnt / CAST(t.n_tokens AS DOUBLE))
               * ln(c.cnt / CAST(t.n_tokens AS DOUBLE))
               * 1000000000.0) AS BIGINT)) AS BIGINT) AS entropy_fx
    FROM counts c JOIN totals t USING (doc_id)
    GROUP BY c.doc_id, t.n_tokens
    """,
    tags=("N5", "E13"),
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution, 1e-9
    fixed-point: each (doc, token) term −p·ln p floors to a BIGINT
    before the per-doc sum, so the result is order-free and immune to
    cross-engine libm/decimal differences (the unigram-logprob
    technique). Low entropy flags template/boilerplate docs a
    dedup pass misses. One token shuffle; at 100 TB identical shape
    to any token-level aggregation."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _DOC_SCOPE
    )
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    counts = tok.groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    totals = tok.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    p = F.col("cnt") / F.col("n_tokens").cast("double")
    term_fx = F.floor(-p * F.log(p) * 1e9).cast("long")
    return (
        counts.join(totals, "doc_id")
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.count("*").alias("n_distinct"),
            F.sum(term_fx).cast("bigint").alias("entropy_fx"),
        )
        .select("doc_id", "n_tokens", "n_distinct", "entropy_fx")
    )


@register(
    "text_oov_rate",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    vocab AS (
        SELECT token FROM (
            SELECT token, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token)
                     AS rn
            FROM tok GROUP BY token
        ) WHERE rn <= {_VOCAB_K}
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov,
           SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM tok t LEFT JOIN vocab v ON v.token = t.token
    WHERE t.doc_id < {_DOC_SCOPE}
    GROUP BY t.doc_id
    """,
    tags=("N5", "N8"),
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-{_VOCAB_K} head vocabulary (count-desc, token-asc tie-break —
    fully deterministic): the junk detector that pairs with the
    heavy-hitters sketch (at web scale the exact vocab aggregate is
    replaced by token_heavy_hitters_mg's Misra-Gries summary; the
    broadcast probe below is unchanged). Vocabulary is broadcast —
    the document side never shuffles for the membership probe. The
    top-K head is taken with ``orderBy().limit(K)`` →
    TakeOrderedAndProject (per-partition heaps of K, driver merge of
    K·partitions), NOT a row_number window over the full distinct-token
    aggregate — a web-scale vocabulary is 10^7-10^8 tokens and must
    never sort through one task (same pattern as text_bm25_topk)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(_VOCAB_K)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    scoped = tok.filter(F.col("doc_id") < _DOC_SCOPE)
    joined = scoped.join(F.broadcast(vocab), "token", "left")
    n_oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            n_oov.alias("n_oov"),
            (n_oov / F.count("*").cast("double")).alias("oov_rate"),
        )
    )


@register(
    "text_index_incremental",
    oracle="""
    WITH v2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN text || ' zzupdated' ELSE text END AS text
        FROM documents WHERE doc_id % 11 != 0
    ),
    tok AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM v2
    ),
    postings AS (
        SELECT token, doc_id, COUNT(*) AS tf
        FROM tok WHERE LENGTH(token) > 0
        GROUP BY token, doc_id
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tf) AS BIGINT) AS sum_tf
    FROM postings
    GROUP BY token
    HAVING COUNT(*) >= 20
    """,
    tags=("N5", "N16", "E13"),
)
def text_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental inverted-index maintenance — the IVM loop every
    search/RAG corpus runs nightly: starting from the v1 index, apply
    DELETES (docs leaving the corpus), UPDATES (changed text), and
    INSERTS (new docs) as a DELTA — retract the affected docs'
    postings with ONE anti-join keyed on doc_id, tokenize ONLY the
    changed/new docs, and union the fresh postings in. The v1 corpus
    is never re-tokenized: per-night cost tracks the delta, which is
    the entire point at 100 TB (re-indexing the corpus nightly is a
    full scan + full shuffle; the delta path is |delta| work plus one
    index-sized anti-join that a table format turns into file-level
    deletes). The DuckDB oracle builds the v2 index FROM SCRATCH, so
    the hash equality is the incremental-equals-rebuild proof.
    Deterministic churn: deletes = doc_id % 11 == 0, updates append a
    sentinel token to doc_id % 3 == 0, inserts = the % 13 == 0 docs
    held out of v1."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def postings(df: DataFrame) -> DataFrame:
        tok = df.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        ).filter(F.length("token") > 0)
        return tok.groupBy("token", "doc_id").agg(
            F.count("*").cast("long").alias("tf")
        )

    v1 = docs.filter(F.col("doc_id") % 13 != 0)
    postings_v1 = postings(v1)

    v2_text = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" zzupdated"))
    ).otherwise(F.col("text"))
    deleted = F.col("doc_id") % 11 == 0
    updated = (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 13 != 0)
    inserted = (F.col("doc_id") % 13 == 0) & (F.col("doc_id") % 11 != 0)

    retract_keys = docs.filter(deleted | updated | inserted).select("doc_id")
    delta_docs = docs.filter((updated | inserted) & ~deleted).select(
        "doc_id", v2_text.alias("text")
    )
    incr = postings_v1.join(
        F.broadcast(retract_keys), "doc_id", "left_anti"
    ).unionByName(postings(delta_docs))
    return (
        incr.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tf").cast("long").alias("sum_tf"),
        )
        .filter(F.col("n_docs") >= 20)
    )
