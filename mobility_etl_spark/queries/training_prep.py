"""Dataloader-facing training-prep faces: deterministic epoch
sharding (operators/sharding.py) and the JSONL export surface — the
step where the curated corpus leaves the lake and meets the trainer.

The sharding oracle re-derives the exact mix arithmetic in SQL, so the
"global shuffle" is proven to be the pure function it claims to be:
same inputs → same shard membership and same in-shard order, in two
unrelated engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.sampling import sql_hash_bucket
from mobility_etl_spark.operators.sharding import (
    _EPOCH_PRIME,
    _KNUTH,
    _KNUTH2,
    assign_shards,
    shard_manifest,
    sql_mix,
)
from mobility_etl_spark.registry import register

#: Per-process export cache: sf_dir -> JSONL artifact dir (the export
#: side effect runs once per process, not once per builder call).
_JSONL_CACHE: dict[str, str] = {}

_N_SHARDS = 16
_EPOCH = 1


@register(
    "shard_assignment_docs",
    oracle=f"""
    SELECT doc_id,
           {sql_mix("doc_id", _KNUTH, _EPOCH)} % {_N_SHARDS} AS shard_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY {sql_mix("doc_id", _KNUTH, _EPOCH)} % {_N_SHARDS}
               ORDER BY {sql_mix("doc_id", _KNUTH2, _EPOCH)}, doc_id
           ) AS INTEGER) AS epoch_pos
    FROM documents
    """,
    tags=("N7", "N12"),
)
def shard_assignment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-1 global shuffle of the documents corpus
    into {n} dataloader shards: ``shard_id`` is worker ownership,
    ``epoch_pos`` the read order within the shard — both pure functions
    of (doc_id, epoch), so training is reproducible and resumable with
    zero coordination state. One projection + one per-shard window
    (single shuffle over n_shards partitions; each sort run is
    corpus/n_shards rows — executor-sized at any scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return assign_shards(docs, "doc_id", _N_SHARDS, epoch=_EPOCH).select(
        "doc_id", "shard_id", "epoch_pos"
    )


@register(
    "shard_manifest_docs",
    oracle=f"""
    WITH sharded AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               {sql_mix("doc_id", _KNUTH, _EPOCH)} % {_N_SHARDS} AS shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY
                       {sql_mix("doc_id", _KNUTH, _EPOCH)} % {_N_SHARDS}
                   ORDER BY {sql_mix("doc_id", _KNUTH2, _EPOCH)}, doc_id
               ) AS INTEGER) AS epoch_pos
        FROM documents
    )
    SELECT shard_id,
           COUNT(*) AS n_rows,
           MIN(epoch_pos) AS first_pos,
           MAX(epoch_pos) AS last_pos,
           CAST(SUM(n_tokens) AS BIGINT) AS total_size
    FROM sharded
    GROUP BY shard_id
    """,
    tags=("N7", "N12"),
)
def shard_manifest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-shard index a trainer reads instead of scanning data:
    row count, contiguous position range (first_pos=1, last_pos=n_rows
    — the resumability contract), and the token payload per worker.
    The oracle recomputes the whole shuffle independently, so manifest
    totals are proven against the assignment itself."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    sharded = assign_shards(docs, "doc_id", _N_SHARDS, epoch=_EPOCH)
    return shard_manifest(sharded, size_col="n_tokens")


@register(
    "training_jsonl_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, length(text) AS n_chars
    FROM documents
    """,
    tags=("E3", "N12", "R10"),
)
def training_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export surface: the corpus written as JSON-lines (the
    interchange format every training stack ingests) and read back
    with an explicit schema — the returned frame must hash-match the
    parquet original, proving the export is lossless including text
    payloads (quoting/escaping round-trips). Format conversion on copy
    is the reference's R10 (dags/warsaw-gtfs.py:61-71, CSV→parquet);
    this is the same face pointed at the trainer."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    # export once per (process, sf_dir); later builder invocations
    # reuse the artifact (review finding: one tempdir per call)
    out = _JSONL_CACHE.get(sf_dir)
    if out is None:
        out = tempfile.mkdtemp(prefix="jsonl_export_")
        docs.write.mode("overwrite").json(out)
        _JSONL_CACHE[sf_dir] = out
    back = spark.read.schema(
        "doc_id long, lang string, source string, text string"
    ).json(out)
    return back.select(
        "doc_id", "lang", "source", F.length("text").alias("n_chars")
    )


_K_FOLDS = 5


@register(
    "training_kfold_counts",
    oracle=f"""
    SELECT {sql_hash_bucket("doc_id", _K_FOLDS)} AS fold,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1
    """,
    tags=("N7", "N12"),
)
def training_kfold_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment (operators/sampling.py:
    kfold_assign): 5 deterministic folds over the corpus with per-fold
    document/token counts — the oracle re-derives membership from the
    portable hash, so fold boundaries are engine- and layout-
    independent (the property that lets a training stack and this
    engine agree on splits without shipping membership lists)."""
    from mobility_etl_spark.operators.sampling import kfold_assign

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    return (
        kfold_assign(docs, "doc_id", _K_FOLDS)
        .groupBy("fold")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
