"""Text-analysis queries (SURVEY.md §2.C N5) over ``documents``.

Language-ID, quality scoring, token counting, and fingerprinting — the
text half of a training-data pipeline. Everything is built-in
expression work (split / higher-order list ops / regexp / md5), fully
SQL-expressible, so every query here is oracle-checked. At 100 TB each
is a single narrow projection over the corpus — no shuffle at all
except the final per-language rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register

#: Tiny English function-word list for the stopword-ratio heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


def _sql_stoplist() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS)


def _tokens() -> F.Column:
    return F.split(F.col("text"), " ")


@register(
    "text_quality_docs",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           lang,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS distinct_ratio,
           len(list_filter(toks, x -> x IN ({_sql_stoplist()}))) AS n_stopwords,
           len(list_filter(toks, x -> x IN ({_sql_stoplist()})))
             / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
             AS total_token_chars,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
             / len(toks) AS avg_token_len
    FROM t
    """,
    tags=("N5",),
)
def text_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics per document: token counts, type/token ratio,
    stopword ratio, mean token length — all integer arithmetic until
    final divisions (engine-exact); higher-order array functions, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    toks = _tokens()
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    total_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x).cast("bigint")
    )
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct / n_tokens.cast("double")).alias("distinct_ratio"),
        n_stop.alias("n_stopwords"),
        (n_stop / n_tokens.cast("double")).alias("stopword_ratio"),
        total_chars.alias("total_token_chars"),
        (total_chars.cast("double") / n_tokens).alias("avg_token_len"),
    )


@register(
    "lang_id_heuristic",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '),
                               x -> x IN ({_sql_stoplist()})))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
        FROM documents
    ),
    pred AS (
        SELECT doc_id, lang, stop_ratio,
               CASE WHEN stop_ratio >= 0.05 THEN 'en' ELSE 'other' END AS pred_lang
        FROM scored
    )
    SELECT lang,
           pred_lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct
    FROM pred
    GROUP BY lang, pred_lang
    """,
    tags=("N5",),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (function-word-hit-rate thresholding — the
    n-gram-profile approach of Cavnar & Trenkle reduced to its stopword
    core) + its confusion-matrix audit against the labeled ``lang``."""
    docs = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    toks = _tokens()
    stop_ratio = F.size(
        F.filter(toks, lambda x: F.array_contains(stop_arr, x))
    ) / F.size(toks).cast("double")
    pred = F.when(stop_ratio >= 0.05, "en").otherwise("other")
    return (
        docs.select("doc_id", "lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0)
            ).cast("bigint").alias("n_correct"),
        )
    )


@register(
    "token_count_regex",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_bpe_ish_tokens,
           length(text) - length(replace(text, ' ', '')) + 1 AS n_ws_tokens_check
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("N5", "E23"),
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (alpha runs | digit runs), plus a subtraction-based cross-check."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).alias(
            "n_bpe_ish_tokens"
        ),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
            + 1
        ).alias("n_ws_tokens_check"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                               ' ')) AS vocab_fingerprint,
           md5(text) AS exact_fingerprint
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("N5", "E26"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact (md5 of text) and bag-of-vocab
    (md5 of the sorted distinct token set — invariant to word order,
    the cheap winnowing-style near-dup prefilter)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    vocab = F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    return docs.select(
        "doc_id",
        F.md5(vocab).alias("vocab_fingerprint"),
        F.md5("text").alias("exact_fingerprint"),
    )
