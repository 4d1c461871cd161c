"""Ingest manifest: cross-run memoization as a table + anti-joins
(SURVEY.md §2.A R5–R8, §4 row 1).

The reference keeps one hash in a `latest-feed-hash` blob and
short-circuits the DAG when it matches (dags/warsaw-gtfs.py:60-71),
and skips a weather fetch when this hour's blob exists
(dags/warsaw-weather.py:26-28). Both collapse to ONE mechanism here:
an append-only manifest table `(source, object_key, content_sha256,
ingest_ts)` plus a left-anti join — hash change-detection is an
anti-join on `content_sha256`, the exists-guard is an anti-join on
`object_key`. 32-byte digests shuffle instead of payloads, so the
check costs the same at 100 TB as at 100 MB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.session import ensure_session_defaults
from mobility_etl_spark.sources.schemas import MANIFEST_SCHEMA


def empty_manifest(spark: SparkSession) -> DataFrame:
    """First-ever ingest: no prior state (reference passes when no
    hash blob exists, dags/warsaw-gtfs.py:66-67)."""
    return spark.createDataFrame([], MANIFEST_SCHEMA)


def load_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Read the manifest table; empty DataFrame if it doesn't exist yet."""
    ensure_session_defaults(spark)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception:
        return empty_manifest(spark)


def with_content_hash(
    df: DataFrame, cols: tuple[str, ...], out: str = "content_sha256"
) -> DataFrame:
    """R5: content digest per row — `sha2(concat_ws(...), 256)` of the
    named columns (the chunked-file SHA-256 of dags/warsaw-gtfs.py:41-47,
    vectorized). For binary blobs pass the `content` column alone."""
    return df.withColumn(out, F.sha2(F.concat_ws("\x1f", *cols), 256))


def changed_objects(incoming: DataFrame, manifest: DataFrame) -> DataFrame:
    """R6: keep only rows whose content hash the manifest has never
    seen — the feed-changed short-circuit as a set operation. The
    manifest side is projected to its digest column only (column
    pruning → a 32-byte-wide broadcast/shuffle)."""
    seen = manifest.select("content_sha256").distinct()
    return incoming.join(F.broadcast(seen), "content_sha256", "left_anti")


def unseen_partitions(incoming: DataFrame, manifest: DataFrame, source: str) -> DataFrame:
    """R8: keep only rows whose `object_key` (e.g. `dt/hour`) is not
    already landed for `source` — the exists-guard as an anti-join."""
    landed = (
        manifest.filter(F.col("source") == source)
        .select("object_key")
        .distinct()
    )
    return incoming.join(F.broadcast(landed), "object_key", "left_anti")


def record_ingest(
    spark: SparkSession,
    manifest_path: str,
    source: str,
    entries: DataFrame,
) -> None:
    """R7: append `(source, object_key, content_sha256, ingest_ts)`
    rows. Append-only — the reference's overwrite-latest semantics are
    recovered at read time as MAX(ingest_ts) per key, so history is
    never destroyed and concurrent writers never race on one blob."""
    (
        entries.select(
            F.lit(source).alias("source"),
            "object_key",
            "content_sha256",
            F.current_timestamp().alias("ingest_ts"),
        ).write.mode("append").parquet(manifest_path)
    )


def latest_per_key(manifest: DataFrame) -> DataFrame:
    """The reference's single-current-hash view (overwrite-latest,
    dags/warsaw-gtfs.py:79-80): last ingest_ts per (source, object_key)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source", "object_key")
        .orderBy(F.col("ingest_ts").desc())
    )
    return (
        manifest.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
