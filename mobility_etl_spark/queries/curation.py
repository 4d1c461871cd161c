"""The end-to-end corpus-curation pipeline as ONE query — the workflow
a training-data user actually runs, composed from operators that are
each individually oracle-proven elsewhere:

    quality filter → exact dedup → near-dup cluster survivors →
    deterministic train/test split → per-(lang, split) corpus stats

Every stage is SQL-expressible, so the WHOLE pipeline hash-checks
against a single DuckDB CTE chain — proving not just each operator but
their composition (representative selection feeding the split, the
split feeding the stats) with one value-level equality.

Scale posture: the same code path at 100 TB swaps the exact-Jaccard
pair stage for the banded-LSH candidate stage
(operators/dedup.py:lsh_candidate_pairs — same downstream component /
survivor / split code); the exact stage here is bounded to the
PAIR_SCOPE slice exactly like dedup_cluster_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.components import connected_components
from mobility_etl_spark.operators.dedup import jaccard_pairs, shingles
from mobility_etl_spark.operators.sampling import hash_split, sql_hash_bucket
from mobility_etl_spark.queries.dedup import PAIR_SCOPE
from mobility_etl_spark.registry import register

#: Quality floor: minimum characters and whitespace-delimited tokens.
MIN_CHARS = 60
MIN_TOKENS = 8


@register(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH RECURSIVE quality AS (
        SELECT doc_id, lang, text
        FROM documents
        WHERE doc_id < {PAIR_SCOPE}
          AND n_chars >= {MIN_CHARS}
          AND len(string_split(text, ' ')) >= {MIN_TOKENS}
    ),
    exact_reps AS (
        SELECT MIN(doc_id) AS doc_id
        FROM quality
        GROUP BY md5(text)
    ),
    survivors0 AS (
        SELECT q.doc_id, q.lang, q.text
        FROM quality q JOIN exact_reps r ON r.doc_id = q.doc_id
    ),
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM survivors0
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS key_a, b.doc_id AS key_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT key_a, key_b FROM inter
        JOIN sizes sa ON sa.doc_id = key_a
        JOIN sizes sb ON sb.doc_id = key_b
        WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.2
    ),
    sym AS (
        SELECT key_a AS src, key_b AS dst FROM edges
        UNION ALL SELECT key_b, key_a FROM edges
    ),
    reach(node, lab) AS (
        SELECT doc_id, doc_id FROM survivors0
        UNION
        SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.node
    ),
    comps AS (
        SELECT node AS doc_id, MIN(lab) AS component FROM reach GROUP BY node
    ),
    curated AS (
        SELECT s.doc_id, s.lang, s.text
        FROM survivors0 s JOIN comps c ON c.doc_id = s.doc_id
        WHERE c.doc_id = c.component
    ),
    split AS (
        SELECT lang,
               CASE WHEN {sql_hash_bucket("doc_id", 100)} < 80
                    THEN 'train' ELSE 'test' END AS split,
               len(string_split(text, ' ')) AS n_tokens
        FROM curated
    )
    SELECT lang, split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM split
    GROUP BY lang, split
    """,
    tags=("N1", "N2", "N5", "N7", "E13"),
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter, dedup (exact then near-dup clusters), split, and
    summarize the corpus in one composed plan. Token counting uses the
    whitespace convention (split on ' ') so both engines count
    identically; near-dup edges are exact 3-shingle Jaccard ≥ 0.2 on
    the PAIR_SCOPE slice (the LSH candidate generator is the drop-in
    replacement at full scale)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < PAIR_SCOPE)
        & (F.col("n_chars") >= MIN_CHARS)
        & (F.size(F.split(F.col("text"), " ")) >= MIN_TOKENS)
    )
    exact_reps = docs.groupBy(F.md5("text").alias("digest")).agg(
        F.min("doc_id").alias("doc_id")
    )
    survivors = docs.join(
        exact_reps.select("doc_id"), "doc_id", "left_semi"
    ).select("doc_id", "lang", "text")

    sh = shingles(survivors, "text", "doc_id", n=3)
    edges = jaccard_pairs(sh, "doc_id", min_jaccard=0.2).select(
        "key_a", "key_b"
    )
    comps = connected_components(
        survivors.select("doc_id"), edges, "doc_id", "key_a", "key_b"
    )
    curated = survivors.join(
        comps.filter(F.col("doc_id") == F.col("component")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    tagged = hash_split(curated, "doc_id", train_pct=80)
    return (
        tagged.withColumn("n_tokens", F.size(F.split(F.col("text"), " ")))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
    )
