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


#: Tiny signed sentiment lexicon (the broadcast-join sentiment pattern,
#: SURVEY.md §2.C N5 / PAPERS.md EDBT-2016 reference). Scores are ints
#: so per-doc sums are exact in both engines.
SENTIMENT_LEXICON: tuple[tuple[str, int], ...] = (
    # demo lexicon aligned to the synthetic corpus vocabulary (the
    # driver's documents are query-plan prose); swap for AFINN/VADER
    # weights on natural text — the operator is the broadcast join,
    # not the word list.
    ("fast", 2), ("small", 1), ("clean", 2), ("fresh", 1), ("good", 2),
    ("slow", -2), ("big", -1), ("dup", -2), ("stale", -1), ("skew", -2),
    ("spill", -2), ("bad", -2),
)


@register(
    "text_tfidf",
    oracle="""
    WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
    n AS (SELECT COUNT(*) AS n_docs FROM sub),
    tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM sub
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM tok WHERE length(term) >= 4
        GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    WHERE tf.tf >= 2
    """,
    tags=("N5", "E27", "E23"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with smoothed idf = ln((N+1)/(df+1)) over ≥4-char terms;
    rows with tf ≥ 2. Two shuffles at scale (doc-term agg, term df) —
    the df side is a term-keyed dimension that broadcasts back. The
    single IEEE ln keeps both engines bit-identical; the oracle
    recomputes the full pipeline independently."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.length("term") >= 4)
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # tiny control scalar (bounded subset)
    return (
        tf.join(F.broadcast(df), "term")
        .filter(F.col("tf") >= 2)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )


@register(
    "text_sentiment_lexicon",
    oracle=f"""
    WITH lex(term, score) AS (VALUES
        {", ".join(f"('{w}', {s})" for w, s in SENTIMENT_LEXICON)}
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents WHERE doc_id < 300
    )
    SELECT tok.doc_id,
           CAST(SUM(lex.score) AS BIGINT) AS sentiment_score,
           COUNT(*) AS n_sentiment_tokens
    FROM tok JOIN lex USING (term)
    GROUP BY tok.doc_id
    """,
    tags=("N5", "E9"),
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-join sentiment (the Spark-sentiment pattern, PAPERS.md
    EDBT 2016): tokens equi-join a broadcast signed lexicon; per-doc
    integer score sums are exact. At 100 TB the lexicon is KBs — the
    corpus never shuffles for the join, only for the per-doc rollup."""
    lex = spark.createDataFrame(
        list(SENTIMENT_LEXICON), "term string, score int"
    )
    tok = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
    )
    return (
        tok.join(F.broadcast(lex), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("score").cast("bigint").alias("sentiment_score"),
            F.count("*").alias("n_sentiment_tokens"),
        )
    )


@register(
    "text_bigrams",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '),
                           t -> length(t) >= 3 AND t NOT IN ({_sql_stoplist()}))
                   AS ts
        FROM documents WHERE doc_id < 300
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(ts) - 1),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS bigram
        FROM tok
    )
    SELECT bigram, COUNT(*) AS n
    FROM bg
    GROUP BY bigram
    HAVING COUNT(*) >= 3
    """,
    tags=("N5", "E27", "E23"),
)
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-filtered bigram counts (the NGram stage of SURVEY §2.C
    N5) via higher-order array ops — zip_with over offset slices builds
    bigrams without exploding unigrams first; one shuffle for the
    global count."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = docs.select(
        F.filter(
            F.split(F.lower("text"), " "),
            lambda t: (F.length(t) >= 3) & ~F.array_contains(stop, t),
        ).alias("ts")
    )
    bigrams = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.expr("slice(ts, 2, greatest(size(ts) - 1, 0))"),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
    )


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents
    ),
    vocab AS (
        SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
    ),
    tot AS (SELECT COUNT(*) AS n FROM tok),
    scored AS (
        SELECT t.doc_id,
               CAST(FLOOR(ln(v.cnt / CAST(tot.n AS DOUBLE)) * 1000000000.0)
                    AS BIGINT) AS lp_fx
        FROM tok t JOIN vocab v ON v.token = t.token CROSS JOIN tot
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(lp_fx) AS BIGINT) AS sum_logprob_fx
    FROM scored
    GROUP BY doc_id
    """,
    tags=("N5", "E13", "E23"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score — the perplexity proxy
    used for corpus filtering: each document's summed log p(token)
    under the corpus's own unigram distribution (rare-token-heavy ⇒
    very negative ⇒ junk/OCR noise candidates). Per-token ln is a
    single IEEE op on an identical quotient, and the per-doc sum is
    1e-9 fixed-point BIGINT (order-free, tie-free), so the whole
    scorer hash-matches the oracle. Scale shape: the vocab aggregate
    is the token shuffle once; the scoring join is vocab-sized
    (broadcastable — at web scale, the Misra-Gries top-k +
    tail-smoothing variant replaces the exact vocab)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("token"),
    )
    vocab = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    total = tok.agg(F.count("*").alias("n"))
    lp_fx = F.floor(
        F.log(F.col("cnt") / F.col("n").cast("double")) * 1e9
    ).cast("long")
    return (
        tok.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(lp_fx).cast("bigint").alias("sum_logprob_fx"),
        )
    )


@register(
    "text_contamination_check",
    oracle=f"""
    WITH split AS (
        SELECT doc_id, text,
               CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000000007
                         % 100 < 80
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
    ),
    toks AS (
        SELECT doc_id, split, string_split(text, ' ') AS t FROM split
    ),
    grams AS (
        SELECT DISTINCT doc_id, split,
               md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                   || ' ' || t[i+4]) AS g
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t) - 4, 1))) AS s(i)
        WHERE len(t) >= 5
    ),
    test_grams AS (
        SELECT DISTINCT g FROM grams WHERE split = 'test'
    ),
    overlap AS (
        SELECT tr.doc_id,
               COUNT(DISTINCT tr.g) AS n_grams,
               COUNT(DISTINCT te.g) AS n_contaminated
        FROM grams tr LEFT JOIN test_grams te ON te.g = tr.g
        WHERE tr.split = 'train'
        GROUP BY tr.doc_id
    )
    SELECT doc_id, n_grams, n_contaminated
    FROM overlap
    WHERE n_contaminated > 0
    """,
    tags=("N2", "N5", "N7"),
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection — the eval-hygiene pass every
    training corpus needs: 5-gram fingerprints of TRAIN documents that
    also appear in any TEST document (split = the reproducible hash
    split, so the check is stable across runs). Ships md5 digests of
    grams, never gram text; the digest set is the join key, so at
    100 TB this is a digest⋈digest equi-join after two dedups —
    exactly the exact-dedup shape (N1) applied across splits."""
    from mobility_etl_spark.operators.sampling import hash_split

    docs = hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = docs.select(
        "doc_id", "split", F.split("text", " ").alias("t")
    ).filter(F.size("t") >= 5)
    grams = toks.select(
        "doc_id",
        "split",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 5),
                lambda i: F.md5(
                    F.concat_ws(
                        " ",
                        F.element_at(F.col("t"), i + 1),
                        F.element_at(F.col("t"), i + 2),
                        F.element_at(F.col("t"), i + 3),
                        F.element_at(F.col("t"), i + 4),
                        F.element_at(F.col("t"), i + 5),
                    )
                ),
            )
        ).alias("g"),
    ).distinct()
    test_grams = grams.filter(F.col("split") == "test").select("g").distinct()
    train = grams.filter(F.col("split") == "train")
    return (
        train.join(test_grams.withColumn("hit", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_grams"),
            F.countDistinct(F.when(F.col("hit") == 1, F.col("g"))).alias(
                "n_contaminated"
            ),
        )
        .filter(F.col("n_contaminated") > 0)
    )
