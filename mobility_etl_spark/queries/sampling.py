"""Reproducible sampling queries over ``documents`` (SURVEY.md §2.C).

Training-data pipelines live and die on deterministic subsetting:
train/test splits, fractional corpus samples, and per-class balancing
must be pure functions of record keys so that re-runs, re-partitions,
and incremental rebuilds select identical rows at 100 TB. These
queries drive operators/sampling.py's integer-arithmetic hash, which is
engine-portable — so unlike RNG-based ``df.sample``, every one is
exactly oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import davg
from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.sampling import (
    balanced_sample,
    hash_sample,
    hash_split,
    sql_hash_bucket,
)
from mobility_etl_spark.registry import register

_BUCKET100 = sql_hash_bucket("doc_id", 100)
_BUCKET1000 = sql_hash_bucket("doc_id", 1000)
_BUCKETBIG = sql_hash_bucket("doc_id", 1000000007)


@register(
    "hash_split_train_test",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, n_chars,
               CASE WHEN {_BUCKET100} < 80 THEN 'train' ELSE 'test' END
                   AS split
        FROM documents
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(20,6))) AS DOUBLE)
               / COUNT(n_chars) AS avg_chars
    FROM h GROUP BY split
    """,
    tags=("N5", "N1"),
)
def hash_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 train/test split as a pure function of doc_id: stable
    across runs, partitionings, and cluster sizes — the property RNG
    sampling cannot give an incremental 100 TB pipeline. Narrow until
    the 2-group aggregate; nothing but the final agg shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", train_pct=80)
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), davg("n_chars", "avg_chars"))
    )


@register(
    "hash_sample_quarter",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_BUCKET1000} < 250
    """,
    tags=("N5", "N1"),
)
def hash_sample_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% corpus sample by key hash. A pure per-row
    filter: no shuffle, no RNG state, and the same rows survive when
    the corpus is re-read with any split layout."""
    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", permille=250).select(
        "doc_id", "lang", "source"
    )


@register(
    "balanced_label_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY {_BUCKETBIG}, doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, lang, rn FROM ranked WHERE rn <= 40
    """,
    tags=("N5", "E17"),
)
def balanced_label_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsample: at most 40 docs per language, chosen
    by hash order (file order is layout-dependent; hash order is not).
    One shuffle on the label; per-class window state is bounded by k.
    This is the class-rebalancing primitive for skewed corpora (en
    dominates the driver table ~3:1)."""
    docs = load_table(spark, sf_dir, "documents")
    return balanced_sample(docs, label="lang", key="doc_id", k=40).select(
        "doc_id", "lang", "rn"
    )


_EPOCHS = (1, 2)
_SHUF_KEY = {
    e: sql_hash_bucket(f"(doc_id + {e} * 7919)", 1000000007)
    for e in _EPOCHS
}


@register(
    "training_epoch_shuffle",
    oracle="\n    UNION ALL\n".join(
        f"""
    SELECT CAST({e} AS BIGINT) AS epoch, doc_id,
           ROW_NUMBER() OVER (ORDER BY {_SHUF_KEY[e]}, doc_id) AS rank
    FROM documents"""
        for e in _EPOCHS
    ),
    tags=("N7", "E17"),
)
def training_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle order — the data-loader
    contract for multi-epoch training: each epoch's permutation is a
    pure function of (doc_id, epoch) via the portable integer hash, so
    every worker, restart, and engine derives the identical order with
    zero coordination, and distinct epochs get materially different
    permutations. The global rank is computed by
    ``operators/sampling.bucketed_global_rank`` over the hash key
    (near-uniform, so range buckets are balanced by construction) —
    NOT a single-partition row_number window, which is how a naive
    epoch shuffle dies at 100 TB; the oracle's literal global
    ROW_NUMBER proves the bucketed form exact. Epoch count is a tiny
    constant (the loop unrolls as a union), never a data axis."""
    from mobility_etl_spark.operators.sampling import (
        bucketed_global_rank,
        hash_bucket,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = None
    for e in _EPOCHS:
        keyed = docs.withColumn(
            "skey", hash_bucket(F.col("doc_id") + e * 7919, 1000000007)
        )
        ranked, _n = bucketed_global_rank(keyed, "skey", "doc_id", "rank")
        part = ranked.select(
            F.lit(e).cast("long").alias("epoch"), "doc_id", "rank"
        )
        out = part if out is None else out.unionAll(part)
    return out


_WRS_K = 100


@register(
    "weighted_reservoir_topk",
    oracle=f"""
    WITH rated AS (
        SELECT doc_id,
               CAST(1 + n_chars AS DOUBLE) AS w,
               ({sql_hash_bucket("doc_id", 1000000007)} + 1)
                   / 1000000008.0 AS u
        FROM documents
    ),
    keyed AS (
        SELECT doc_id,
               CAST(FLOOR(-1000000000.0 * ln(u) / w) AS BIGINT) AS key_fx
        FROM rated
    )
    SELECT doc_id, key_fx
    FROM keyed
    ORDER BY key_fx ASC, doc_id ASC
    LIMIT {_WRS_K}
    """,
    tags=("N7", "N16", "E21"),
)
def weighted_reservoir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic — the
    Efraimidis-Spirakis one-pass reservoir as a pure function of the
    data: each record draws u from the portable integer hash (uniform
    in (0,1], layout/engine/run-invariant — no RNG state) and takes
    key = -ln(u)/w (the exponential-race form of u^(1/w): the k
    SMALLEST keys are exactly a weight-proportional sample without
    replacement). Selection is ``orderBy(key).limit(k)`` →
    TakeOrderedAndProject: per-partition heaps of k, driver merge —
    the reservoir shape at any scale, never a global sort. Keys floor
    to 1e-9 fixed point (the ln is the identical double expression on
    both engines) so the face is hash-exact; inclusion-probability
    monotonicity vs weight is gated in tests alongside the plan
    shape. Complements weighted_sample_docs (independent Bernoulli,
    expected-size) with the fixed-size-k contract a training-mix
    builder actually wants."""
    from mobility_etl_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    u = (hash_bucket("doc_id", 1000000007) + 1) / F.lit(1000000008.0)
    w = (1 + F.col("n_chars")).cast("double")
    keyed = docs.select(
        "doc_id",
        F.floor(-1000000000.0 * F.log(u) / w).cast("bigint").alias("key_fx"),
    )
    return keyed.orderBy("key_fx", "doc_id").limit(_WRS_K)


_QUOTA_N = 200


@register(
    "stratified_quota_sample",
    oracle=f"""
    WITH strata AS (
        SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang
    ),
    tot AS (SELECT SUM(n_s) AS n FROM strata),
    alloc AS (
        SELECT lang, n_s,
               ({_QUOTA_N} * n_s) // CAST(n AS BIGINT) AS base,
               ({_QUOTA_N} * n_s) % CAST(n AS BIGINT) AS rem
        FROM strata CROSS JOIN tot
    ),
    quota AS (
        SELECT lang, n_s,
               base + CASE WHEN ROW_NUMBER() OVER (
                   ORDER BY rem DESC, lang) <=
                   {_QUOTA_N} - (SELECT SUM(base) FROM alloc)
                   THEN 1 ELSE 0 END AS quota
        FROM alloc
    ),
    ranked AS (
        SELECT d.doc_id, d.lang, q.quota,
               ROW_NUMBER() OVER (PARTITION BY d.lang
                   ORDER BY {sql_hash_bucket("d.doc_id", 1000000007)},
                            d.doc_id) AS rn
        FROM documents d JOIN quota q USING (lang)
    )
    SELECT doc_id, lang, CAST(quota AS BIGINT) AS quota
    FROM ranked WHERE rn <= quota
    """,
    tags=("N7", "E13", "E17"),
)
def stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional stratified sampling: a FIXED total of
    {_QUOTA_N} docs allocated across language strata by the
    largest-remainder (Hamilton) method — quotas sum to exactly N, no
    stratum over- or under-allocated by more than 1 vs its exact
    proportional share — then selected within each stratum in
    deterministic portable-hash order (a pure function of the data:
    re-runs, engines and layouts agree row-for-row, which is why the
    face is hash-exact). The quota computation is a window over ONE
    ROW PER STRATUM (control-plane-sized at any corpus scale); the
    per-stratum rank partitions by stratum. This is the fixed-budget
    complement to balanced_label_sample's cap-k contract and
    weighted_reservoir_topk's weight-race contract."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    from mobility_etl_spark.operators.sampling import hash_bucket

    strata = docs.groupBy("lang").agg(F.count("*").alias("n_s"))
    n = docs.count()  # control-plane scalar
    alloc = strata.select(
        "lang",
        "n_s",
        (F.lit(_QUOTA_N) * F.col("n_s") / n).cast("long").alias("base"),
        ((F.lit(_QUOTA_N) * F.col("n_s")) % n).alias("rem"),
    )
    total_base = alloc.agg(F.sum("base")).first()[0]  # control-plane
    leftovers = _QUOTA_N - int(total_base)
    wq = Window.orderBy(F.col("rem").desc(), "lang")  # one row per stratum
    quota = alloc.select(
        "lang",
        (
            F.col("base")
            + F.when(F.row_number().over(wq) <= leftovers, 1).otherwise(0)
        ).cast("long").alias("quota"),
    )
    wr = Window.partitionBy("lang").orderBy(
        hash_bucket("doc_id", 1000000007), F.col("doc_id")
    )
    return (
        docs.join(F.broadcast(quota), "lang")
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang", "quota")
    )
