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


#: Kneser-Ney discount: an exact binary fraction, so both engines'
#: probability expressions round identically.
_KN_D = 0.75


@register(
    "text_kn_bigram_logprob",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS l
        FROM documents
    ),
    bigrams AS (
        SELECT t.doc_id,
               list_extract(t.l, g.i) AS w1,
               list_extract(t.l, g.i + 1) AS w2
        FROM toks t
        JOIN generate_series(1, 400) AS g(i) ON g.i < len(t.l)
        WHERE LENGTH(list_extract(t.l, g.i)) > 0
          AND LENGTH(list_extract(t.l, g.i + 1)) > 0
    ),
    train AS (SELECT w1, w2 FROM bigrams WHERE doc_id % 5 != 0),
    c12 AS (
        SELECT w1, w2, COUNT(*) AS c FROM train GROUP BY w1, w2
    ),
    c1 AS (
        SELECT w1, SUM(c) AS c1, COUNT(*) AS n1fw
        FROM c12 GROUP BY w1
    ),
    cont AS (
        SELECT w2, COUNT(*) AS contw FROM c12 GROUP BY w2
    ),
    nbb AS (SELECT COUNT(*) AS nbb FROM c12),
    eval_bg AS (
        SELECT doc_id, w1, w2 FROM bigrams
        WHERE doc_id % 5 = 0 AND doc_id < 50
    ),
    scored AS (
        SELECT e.doc_id,
               CASE WHEN c1.c1 IS NOT NULL AND cont.contw IS NOT NULL
                    THEN CAST(FLOOR(-1000000000.0 * ln(
                        GREATEST(CAST(COALESCE(c12.c, 0) AS DOUBLE)
                                 - {_KN_D}, 0.0)
                          / CAST(c1.c1 AS DOUBLE)
                        + ({_KN_D} * CAST(c1.n1fw AS DOUBLE)
                           / CAST(c1.c1 AS DOUBLE))
                          * (CAST(cont.contw AS DOUBLE)
                             / CAST(nbb.nbb AS DOUBLE))
                    )) AS BIGINT)
                    ELSE NULL END AS nll_fx
        FROM eval_bg e
        LEFT JOIN c1 ON c1.w1 = e.w1
        LEFT JOIN cont ON cont.w2 = e.w2
        LEFT JOIN c12 ON c12.w1 = e.w1 AND c12.w2 = e.w2
        CROSS JOIN nbb
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(COUNT(nll_fx) AS BIGINT) AS n_scored,
           CAST(COUNT(*) - COUNT(nll_fx) AS BIGINT) AS n_oov,
           CAST(SUM(nll_fx) AS BIGINT) AS nll_sum_fx
    FROM scored GROUP BY doc_id
    """,
    tags=("N5", "N16", "E13"),
)
def text_kn_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram language-model scoring (d=0.75)
    — the LM-quality filter one rung above unigram logprob
    (text_unigram_logprob): held-out documents (doc_id % 5 == 0) score
    under a model whose counts come ONLY from the train split, with
    the KN continuation distribution (how many distinct contexts a
    word completes) replacing raw unigram frequency for the backoff
    mass. All model quantities are integer counts from two groupBys
    over the train bigram stream; the probability is the identical
    double expression on both engines (the discount is a binary
    fraction), and each bigram's -ln P floors to 1e-9 fixed point
    BEFORE the per-doc sum, so the reduction is an order-free integer
    sum (the entropy/PSI technique). Bigrams never cross document
    boundaries; eval bigrams with an unseen context or zero
    continuation count are reported as n_oov, not silently smoothed.
    At 100 TB: the model tables are vocabulary-sized aggregates
    broadcast onto the eval stream."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("l")
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(sequence(0, size(l) - 2), "
                "i -> struct(l[i] AS w1, l[i + 1] AS w2)), "
                "p -> length(p.w1) > 0 AND length(p.w2) > 0)"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    train = bigrams.filter(F.col("doc_id") % 5 != 0)
    # r14 (guide §5, §3.3): c12 feeds the |bigrams| count job AND all
    # three broadcast model tables — unmaterialized, the train-side
    # explode + aggregation executed four times (once per consumer).
    # The table is vocabulary-sized by design (distinct train
    # bigrams — the docstring's 100 TB posture), so one
    # localCheckpoint is the correct materialization at any scale.
    c12 = (
        train.groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count("*").alias("n1fw")
    )
    cont = c12.groupBy("w2").agg(F.count("*").alias("contw"))
    nbb = c12.count()  # control-plane scalar: |distinct bigrams|
    ev = bigrams.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 50)
    )
    d = F.lit(_KN_D)
    p = (
        F.greatest(
            F.coalesce(F.col("c"), F.lit(0)).cast("double") - d, F.lit(0.0)
        )
        / F.col("c1").cast("double")
        + (d * F.col("n1fw").cast("double") / F.col("c1").cast("double"))
        * (F.col("contw").cast("double") / F.lit(float(nbb)))
    )
    scored = (
        ev.join(F.broadcast(c1), "w1", "left")
        .join(F.broadcast(cont), "w2", "left")
        .join(F.broadcast(c12), ["w1", "w2"], "left")
        .select(
            "doc_id",
            F.when(
                F.col("c1").isNotNull() & F.col("contw").isNotNull(),
                F.floor(-1000000000.0 * F.log(p)).cast("bigint"),
            ).alias("nll_fx"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.count("nll_fx").cast("bigint").alias("n_scored"),
        (F.count("*") - F.count("nll_fx")).cast("bigint").alias("n_oov"),
        F.sum("nll_fx").cast("bigint").alias("nll_sum_fx"),
    )


@register(
    "text_augment_dropout",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l
        FROM documents WHERE doc_id < {_DOC_SCOPE}
    ),
    pos AS (
        SELECT t.doc_id, g.i, list_extract(t.l, g.i) AS token,
               ((doc_id * 100003 + g.i) % 1000003) * 2654435761
                   % 1000000007 % 100 AS h
        FROM toks t
        JOIN generate_series(1, 400) AS g(i) ON g.i <= len(t.l)
        WHERE LENGTH(list_extract(t.l, g.i)) > 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN h < 15 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           string_agg(CASE WHEN h >= 15 AND i <= 12 THEN token END, ' '
                      ORDER BY i) AS augmented_head
    FROM pos GROUP BY doc_id
    """,
    tags=("N5", "N16", "E38"),
)
def text_augment_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic word-dropout augmentation (EDA-style, p=0.15):
    each (doc, position) decides via the portable integer hash whether
    its token survives — a pure function of the data, so the
    'random' augmentation is exactly replayable across runs, engines
    and epochs (key the hash on (doc, pos, epoch) for fresh draws per
    epoch), and therefore exactly oracle-checkable, unlike RNG-based
    augmentation. Output per doc: token/drop counts over the whole doc
    plus the augmented text reassembled from the first 12 positions
    (order-preserving string_agg — both engines aggregate in explicit
    position order). Map-only except the per-doc aggregation; at
    100 TB this is a pure corpus-prep pass."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _DOC_SCOPE
    )
    pos = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("i0", "token"),
        )
        .filter(F.length("token") > 0)
        .select(
            "doc_id",
            (F.col("i0") + 1).alias("i"),
            "token",
            (
                ((F.col("doc_id") * 100003 + F.col("i0") + 1) % 1000003)
                * F.lit(2654435761)
                % 1000000007
                % 100
            ).alias("h"),
        )
    )
    kept_head = F.when(
        (F.col("h") >= 15) & (F.col("i") <= 12), F.col("token")
    )
    return pos.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("h") < 15, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
        F.concat_ws(
            " ",
            F.array_compact(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("i", kept_head.alias("t")))
                    ),
                    lambda s: s["t"],
                )
            ),
        ).alias("augmented_head"),
    )


@register(
    "text_corpus_datacard",
    oracle="""
    WITH d AS (
        SELECT doc_id, lang, n_chars, text,
               md5(text) AS digest,
               len(string_split(text, ' ')) AS n_toks
        FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique_texts,
           CAST(COUNT(*) - COUNT(DISTINCT digest) AS BIGINT)
               AS n_exact_dups,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars,
           CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(CASE WHEN n_toks < 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_short_docs
    FROM d
    """,
    tags=("N5", "N16", "E13"),
)
def text_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DATACARD — the one-row datasheet every dataset
    release ships with (docs, language spread, exact duplicate rate,
    char/token volume, length quantiles, short-doc count) — computed
    in ONE scan: every signal is an aggregate over the same projected
    row, so Spark plans a single pass with partial+final aggregation
    (the multi-metric profile pattern; contrast with issuing ten
    separate queries, ten scans). Exact-dup accounting reuses the
    digest-first discipline (distinct over md5, never text);
    quantiles are exact discrete percentiles. Everything hash-exact
    cross-engine. At 100 TB this is the release-gate job run on every
    corpus snapshot."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        "n_chars",
        F.md5("text").alias("digest"),
        F.size(F.split("text", " ")).alias("n_toks"),
    )
    d.createOrReplaceTempView("__datacard_d")
    return spark.sql(
        """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                  CAST(COUNT(DISTINCT digest) AS BIGINT)
                      AS n_unique_texts,
                  CAST(COUNT(*) - COUNT(DISTINCT digest) AS BIGINT)
                      AS n_exact_dups,
                  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                  CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
                  CAST(percentile_disc(0.5) WITHIN GROUP
                       (ORDER BY n_chars) AS BIGINT) AS p50_chars,
                  CAST(percentile_disc(0.99) WITHIN GROUP
                       (ORDER BY n_chars) AS BIGINT) AS p99_chars,
                  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
                  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
                  CAST(SUM(CASE WHEN n_toks < 20 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_short_docs
           FROM __datacard_d"""
    )
