"""Round-5 curation/eval faces: duplicated-span detection (the
substring-level dedup pass of an LLM data pipeline), URL
canonicalization + dedup (the crawl-frontier hygiene operator), a
ranking-quality evaluation (nDCG/MRR/recall — the metric layer over
the retrieval stack), and a distributed Pareto-frontier (skyline)
query.

``span_dedup_ngram_docs`` is the Lee-et-al.-style "deduplicating
training data" pass at token-span granularity: instead of dropping
whole near-duplicate documents (operators/dedup.py), it finds the
REGIONS of each document whose 8-token windows recur anywhere in the
corpus and coalesces overlapping hits into maximal spans — the
operator behind "remove repeated boilerplate but keep the document".

All names sort after "minhash_near_dup" (driver-window rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register

#: Span-dedup window width in tokens (Lee et al. use 50 BPE tokens at
#: corpus scale; 8 whitespace tokens keeps the sf0.01 fixture dense).
SPAN_W = 8


@register(
    "span_dedup_ngram_docs",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    pos AS (
        SELECT t.doc_id, CAST(u.i AS BIGINT) AS pos,
               md5(array_to_string(t.toks[u.i:u.i+{SPAN_W - 1}], ' ')) AS sh
        FROM t, LATERAL unnest(range(1, len(t.toks) - {SPAN_W - 2})) u(i)
        WHERE len(t.toks) >= {SPAN_W}
    ),
    dpos AS (
        SELECT doc_id, pos FROM pos
        WHERE sh IN (SELECT sh FROM pos GROUP BY sh HAVING COUNT(*) >= 2)
    ),
    flags AS (
        SELECT doc_id, pos,
               CASE WHEN pos - LAG(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos) <= {SPAN_W}
                    THEN 0 ELSE 1 END AS brk
        FROM dpos
    ),
    spans AS (
        SELECT doc_id, pos,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS span_id
        FROM flags
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {SPAN_W - 1} AS span_end,
           MAX(pos) + {SPAN_W} - MIN(pos) AS span_len,
           COUNT(*) AS n_windows
    FROM spans GROUP BY doc_id, span_id
    """,
    tags=("N2", "N12"),
)
def span_dedup_ngram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span detection: every maximal token span whose
    8-token windows each occur >= 2 times corpus-wide. Three stages,
    each in its natural Spark shape: (1) window extraction is a
    map-only explode of per-doc position structs (the token array is
    split once per doc, windows are md5-digested immediately so the
    shuffle carries 32-byte digests, never token text); (2) the
    duplicate set is one digest-keyed groupBy + left-semi join back —
    digests-before-payloads, the same 100 TB posture as
    operators/dedup.py; (3) span coalescing is a per-doc
    gaps-and-islands window (break when start positions gap by more
    than the window width, i.e. at least one token between hits is
    covered by no duplicated window). Output: one row per maximal
    duplicated span with its token extent."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= SPAN_W)
    )
    pos = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {SPAN_W - 1}),"
                    f" i -> struct(CAST(i AS BIGINT) AS pos,"
                    f" md5(concat_ws(' ', slice(toks, i, {SPAN_W}))) AS sh))"
                )
            ).alias("w"),
        )
        .select("doc_id", "w.pos", "w.sh")
        # r14 note (measured, deliberately left as-is): the window
        # table feeds BOTH the duplicate-digest aggregate and the
        # semi-join's probe side, so the split+md5 extraction runs
        # twice. Two single-execution variants were A/B'd at sf0.1
        # AND the sf10-equivalent (500k docs): localCheckpoint (1.9
        # vs 3.3 s at sf0.1 — but 34.6 vs 18.5 s at sf10) and a
        # shared hash-repartition exchange (2.6 s / 29.8 s). Both
        # LOSE at scale because the digest table (~48 B x n_windows)
        # is ~10x the corpus text bytes: re-scanning the corpus is
        # cheaper than moving or materializing the digests. The
        # double-extraction + map-side-count + broadcast shape IS the
        # 100 TB plan; see OPTIMIZATION_r14.md counter-measurements.
    )

    dup = pos.groupBy("sh").count().filter(F.col("count") >= 2).select("sh")
    dpos = pos.join(dup, "sh", "left_semi").select("doc_id", "pos")

    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = dpos.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) <= SPAN_W, F.lit(0))
        .otherwise(F.lit(1)),
    ).withColumn(
        "span_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (SPAN_W - 1)).alias("span_end"),
            (F.max("pos") + SPAN_W - F.min("pos")).alias("span_len"),
            F.count("*").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "span_len", "n_windows")
    )


def _raw_url_sql(cast_str: str) -> str:
    """The deterministic raw-URL generator, rendered once and shared
    verbatim by both engines (``cast_str`` is the only dialect
    difference: STRING vs VARCHAR). Mixes the real-world mess the
    normalizer must handle: upper/lower-case schemes and hosts,
    explicit default ports, trailing slashes, tracking params,
    unsorted query strings, fragments."""

    def s(e: str) -> str:
        return f"CAST({e} AS {cast_str})"

    return (
        "CASE o_orderkey % 3 WHEN 0 THEN 'https' WHEN 1 THEN 'HTTPS'"
        " ELSE 'http' END || '://' ||"
        " CASE o_orderkey % 4 WHEN 0 THEN 'Shop.Example.COM'"
        " WHEN 1 THEN 'shop.example.com' WHEN 2 THEN 'SHOP.example.com'"
        " ELSE 'cdn.example.com' END ||"
        " CASE WHEN o_orderkey % 5 = 0 THEN"
        " CASE WHEN o_orderkey % 3 != 2 THEN ':443' ELSE ':80' END"
        " ELSE '' END ||"
        f" '/p/' || {s('o_orderkey % 37')} ||"
        " CASE WHEN o_orderkey % 6 = 0 THEN '/' ELSE '' END ||"
        " CASE o_orderkey % 4"
        f" WHEN 0 THEN '?utm_source=mail&id=' || {s('o_orderkey % 23')}"
        f" WHEN 1 THEN '?id=' || {s('o_orderkey % 23')} || '&utm_campaign=x'"
        f" WHEN 2 THEN '?b=2&a=1&id=' || {s('o_orderkey % 23')}"
        " ELSE '' END ||"
        " CASE WHEN o_orderkey % 7 = 0 THEN '#frag' ELSE '' END"
    )


def url_canonical(url_col: str) -> F.Column:
    """Canonical form of a URL column — the single source the face and
    every test reuse (idempotence is gated over an adversarial grammar
    in tests/test_round5_faces.py): lower-cased scheme and host,
    default port stripped (443 for https, 80 for http), trailing
    slashes collapsed (bare root becomes '/'), fragment dropped,
    tracking params (utm_*/ref=) removed, surviving query params
    sorted. Pure codegen string expressions."""
    scheme = F.lower(
        F.regexp_extract(url_col, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.lower(
        F.regexp_extract(url_col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    path = F.regexp_extract(
        url_col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    host_n = (
        F.when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .otherwise(hostport)
    )
    path_stripped = F.regexp_replace(path, r"/+$", "")
    path_n = F.when(path_stripped == "", F.lit("/")).otherwise(path_stripped)
    q_sorted = F.expr(
        f"array_join(array_sort(filter(split("
        f"regexp_extract({url_col}, '[?]([^#]*)', 1), '&'),"
        " p -> p != '' AND substr(p, 1, 4) != 'utm_'"
        " AND substr(p, 1, 4) != 'ref=')), '&')"
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host_n,
        path_n,
        F.when(q_sorted == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), q_sorted)
        ),
    )


@register(
    "url_normalize_dedup",
    oracle=f"""
    WITH raw AS (
        SELECT o_orderkey, {_raw_url_sql('VARCHAR')} AS url FROM orders
    ),
    parts AS (
        SELECT o_orderkey, url,
               lower(COALESCE(regexp_extract(
                   url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme,
               lower(COALESCE(regexp_extract(
                   url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ''))
                   AS hostport,
               COALESCE(regexp_extract(
                   url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '')
                   AS path,
               COALESCE(regexp_extract(url, '[?]([^#]*)', 1), '') AS query
        FROM raw
    ),
    norm AS (
        SELECT o_orderkey,
               scheme || '://' ||
               CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                    WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
                    ELSE hostport END ||
               CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
                    ELSE regexp_replace(path, '/+$', '') END ||
               CASE WHEN COALESCE(array_to_string(list_sort(list_filter(
                        string_split(query, '&'),
                        p -> p != '' AND substr(p, 1, 4) != 'utm_'
                             AND substr(p, 1, 4) != 'ref=')), '&'), '') = ''
                    THEN ''
                    ELSE '?' || array_to_string(list_sort(list_filter(
                        string_split(query, '&'),
                        p -> p != '' AND substr(p, 1, 4) != 'utm_'
                             AND substr(p, 1, 4) != 'ref=')), '&')
               END AS canonical_url
        FROM parts
    )
    SELECT canonical_url,
           COUNT(*) AS n_raw,
           MIN(o_orderkey) AS first_key
    FROM norm GROUP BY canonical_url
    """,
    tags=("N1", "N12", "E23"),
)
def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the crawl-pipeline operator that
    collapses scheme/host case, explicit default ports, trailing
    slashes, tracking parameters (utm_*/ref=) and fragments, then
    sorts the surviving query params so equivalent URLs collide. The
    raw URLs are generated closed-form from orders (both engines run
    the SAME generator expression), so the face is self-contained and
    exactly hash-checkable. Normalization is pure string expressions
    (regexp extract/replace + higher-order filter/sort on the split
    query) — whole-stage-codegen'd JVM work, zero Python; the dedup is
    one groupBy on the canonical string. At 100 TB this is the classic
    map-then-aggregate: normalization never shuffles, the single
    exchange carries canonical URLs."""
    raw = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(_raw_url_sql("STRING")).alias("url")
    )
    return (
        raw.select("o_orderkey", url_canonical("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_raw"),
            F.min("o_orderkey").alias("first_key"),
        )
    )


#: Evaluation cut-off (nDCG@K, MRR@K, recall@K).
_EVAL_K = 10
#: Number of synthetic queries (one evaluation group each).
_N_QUERIES = 5


@register(
    "ndcg_eval_retrieval",
    oracle=f"""
    WITH queries AS (
        SELECT CAST(i AS BIGINT) AS q
        FROM generate_series(0, {_N_QUERIES - 1}) s(i)
    ),
    scored AS (
        SELECT q, doc_id,
               CASE abs((doc_id % 7) - q) WHEN 0 THEN 3 WHEN 1 THEN 2
                    WHEN 2 THEN 1 ELSE 0 END AS rel,
               ('0x' || substr(md5(CAST(q AS VARCHAR) || ':' ||
                   CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS score
        FROM queries, documents
    ),
    ranked AS (
        SELECT q, doc_id, rel,
               ROW_NUMBER() OVER (PARTITION BY q
                   ORDER BY score DESC, doc_id) AS rnk,
               ROW_NUMBER() OVER (PARTITION BY q
                   ORDER BY rel DESC, doc_id) AS irnk
        FROM scored
    )
    SELECT q,
           CAST(SUM(CASE WHEN rnk <= {_EVAL_K} THEN CAST(FLOOR(
               ((1 << rel) - 1) / log2(rnk + 1) * 1e9) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS dcg_fx,
           CAST(SUM(CASE WHEN irnk <= {_EVAL_K} THEN CAST(FLOOR(
               ((1 << rel) - 1) / log2(irnk + 1) * 1e9) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS idcg_fx,
           COALESCE(CAST(FLOOR(1e9 / MIN(CASE WHEN rel > 0
               AND rnk <= {_EVAL_K} THEN rnk END)) AS BIGINT), 0) AS mrr_fx,
           CAST(SUM(CASE WHEN rel > 0 AND rnk <= {_EVAL_K} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_rel_topk,
           CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel_total
    FROM ranked GROUP BY q
    """,
    tags=("N6", "N12"),
)
def ndcg_eval_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation — per-query nDCG@10 components
    (DCG/IDCG in 1e-9 fixed point so the float log2 terms sum as exact
    integers), MRR@10 and recall@10 counts — over a deterministic
    (query × document) relevance grid with a portable md5-derived
    system ranking. This is the metric layer every retrieval stack
    (text_bm25_topk, rag_hybrid_retrieval, ann_*) is tuned against;
    the face pins its math cross-engine. Shape at scale: queries are a
    broadcast dimension, scoring is map-side, and each metric is one
    window + one aggregation partitioned by query — the same plan as
    any top-k-per-group. Gains use (2^rel - 1); ranks tie-break on
    doc_id so both engines order identically."""
    queries = spark.range(_N_QUERIES).select(F.col("id").alias("q"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    scored = F.broadcast(queries).crossJoin(docs).select(
        "q",
        "doc_id",
        F.expr(
            "CASE abs((doc_id % 7) - q) WHEN 0 THEN 3 WHEN 1 THEN 2"
            " WHEN 2 THEN 1 ELSE 0 END"
        ).alias("rel"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("q").cast("string"),
                        F.lit(":"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("score"),
    )
    wq = Window.partitionBy("q")
    ranked = scored.select(
        "q",
        "doc_id",
        "rel",
        F.row_number()
        .over(wq.orderBy(F.col("score").desc(), F.col("doc_id")))
        .alias("rnk"),
        F.row_number()
        .over(wq.orderBy(F.col("rel").desc(), F.col("doc_id")))
        .alias("irnk"),
    )
    gain = F.expr("(1 << rel) - 1")
    dcg_term = F.floor(gain / F.log2(F.col("rnk") + 1) * 1e9).cast("long")
    idcg_term = F.floor(gain / F.log2(F.col("irnk") + 1) * 1e9).cast("long")
    return ranked.groupBy("q").agg(
        F.sum(
            F.when(F.col("rnk") <= _EVAL_K, dcg_term).otherwise(F.lit(0))
        ).alias("dcg_fx"),
        F.sum(
            F.when(F.col("irnk") <= _EVAL_K, idcg_term).otherwise(F.lit(0))
        ).alias("idcg_fx"),
        F.coalesce(
            F.floor(
                1e9
                / F.min(
                    F.when(
                        (F.col("rel") > 0) & (F.col("rnk") <= _EVAL_K),
                        F.col("rnk"),
                    )
                )
            ).cast("long"),
            F.lit(0),
        ).alias("mrr_fx"),
        F.sum(
            F.when(
                (F.col("rel") > 0) & (F.col("rnk") <= _EVAL_K), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("n_rel_topk"),
        F.sum(F.when(F.col("rel") > 0, F.lit(1)).otherwise(F.lit(0))).alias(
            "n_rel_total"
        ),
    )


#: Coarse price bucket width for the segmented prefix-max (dollars).
_SKY_BUCKET = 100.0


@register(
    "pareto_frontier_parts",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    tags=("E10", "E21"),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline): parts not dominated on (minimize
    retailprice, maximize size). The oracle is the quadratic NOT
    EXISTS definition — a genuinely independent formulation; the Spark
    plan is the scalable sweep: (1) collapse to one row per distinct
    price with the max size at that price (ties handled exactly:
    equal-price domination needs a strictly larger size, strictly
    cheaper domination needs only >=); (2) segmented prefix-max — a
    per-bucket max, a cumulative max over the TINY bucket table
    (control-plane-sized single-partition window), and a per-bucket
    prefix window — gives each price the best size among all strictly
    cheaper prices without any global single-partition pass over the
    data; (3) join back and keep rows that beat both checks. At 100 TB
    the only data-scale shuffles are the two groupBys and the
    price-bucket window; nothing is quadratic."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    prices = parts.groupBy("p_retailprice").agg(
        F.max("p_size").alias("grp_max")
    )
    bucketed = prices.withColumn(
        "bkt", F.floor(F.col("p_retailprice") / _SKY_BUCKET).cast("long")
    )
    # Tiny table: one row per price bucket; the global cumulative max
    # over it is control-plane-sized by construction.
    bucket_max = bucketed.groupBy("bkt").agg(
        F.max("grp_max").alias("bkt_max")
    )
    wb = (
        Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bucket_max.withColumn("carry_max", F.max("bkt_max").over(wb)).select(
        "bkt", "carry_max"
    )
    wp = (
        Window.partitionBy("bkt")
        .orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = (
        bucketed.join(F.broadcast(carry), "bkt")
        .withColumn("in_bkt_max", F.max("grp_max").over(wp))
        .withColumn(
            "cheaper_max", F.greatest(
                F.coalesce(F.col("carry_max"), F.lit(-(1 << 31))),
                F.coalesce(F.col("in_bkt_max"), F.lit(-(1 << 31))),
            )
        )
        .select("p_retailprice", "grp_max", "cheaper_max")
    )
    return (
        parts.join(swept, "p_retailprice")
        .filter(
            (F.col("p_size") > F.col("cheaper_max"))
            & (F.col("p_size") == F.col("grp_max"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


#: Fractional repeat factors per source (the "epochs" of each corpus
#: slice in the training mixture).
_REPEAT_PERMILLE = {"src0": 2300, "src1": 1000, "src2": 1700, "src3": 500}


@register(
    "resample_upsample_repeat",
    oracle=f"""
    WITH rates(source, permille) AS (
        VALUES {", ".join(f"('{s}', {p})" for s, p in sorted(_REPEAT_PERMILLE.items()))}
    ),
    base AS (
        SELECT d.doc_id, d.source, r.permille,
               (({{h}}) < r.permille % 1000) AS extra
        FROM documents d JOIN rates r ON d.source = r.source
    ),
    copies AS (
        SELECT doc_id, source,
               CAST(permille // 1000 + CASE WHEN extra THEN 1 ELSE 0 END
                   AS BIGINT) AS n_copies
        FROM base
    )
    SELECT doc_id, source, CAST(u.i AS BIGINT) AS copy_id
    FROM copies, LATERAL UNNEST(range(0, n_copies)) u(i)
    """.format(
        h="((doc_id % 1000003) * 2654435761) % 1000000007 % 1000"
    ),
    tags=("N7", "N12"),
)
def resample_upsample_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch corpus repetition — the pretraining-mixture op
    "repeat this slice 2.3 epochs": every doc of a source emits
    floor(epochs) copies, plus one more for the deterministic
    hash-selected fraction (the SAME portable integer hash family as
    operators/sampling.py, so membership in the fractional epoch is a
    pure function of doc_id — reproducible across runs, layouts and
    engines, and consistent with every other sampling face). Spark
    side: broadcast the 4-row rate table, compute n_copies as a pure
    projection, explode a generated sequence — map-only (no shuffle at
    all; plan-gated map-only in the signature canary). The oracle
    replays the identical arithmetic with a LATERAL range. copy_id is
    emitted so downstream packing/sharding can decorrelate repeats
    (mix (doc_id, copy_id), not doc_id)."""
    from mobility_etl_spark.operators.sampling import hash_bucket

    rates = spark.createDataFrame(
        sorted(_REPEAT_PERMILLE.items()), "source string, permille int"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    n_copies = (
        (F.col("permille") / 1000).cast("long")
        + F.when(
            hash_bucket(F.col("doc_id"), 1000) < F.col("permille") % 1000,
            F.lit(1),
        ).otherwise(F.lit(0))
    ).alias("n_copies")
    return (
        docs.join(F.broadcast(rates), "source")
        .select("doc_id", "source", n_copies)
        # sequence(0, -1) would DESCEND, not be empty — zero-copy docs
        # must drop before the explode.
        .filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.expr("sequence(0, n_copies - 1)")).alias("copy_id"),
        )
    )
