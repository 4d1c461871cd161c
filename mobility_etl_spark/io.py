"""Lake I/O: table loading, partitioned writes, explicit schemas.

The reference's only physical design is its Hive-style blob layout
(`%Y/%m/%d/...`, SURVEY.md §1.2; reference dags/warsaw-gtfs.py:90,
dags/warsaw-delays.py:194, dags/warsaw-weather.py:21). Here that
becomes first-class: Parquet + ``partitionBy("dt", "hour")`` columns so
Catalyst partition pruning works, and dynamic partition overwrite so
re-running an hour is idempotent (reference R8).

Driver test tables (/root/repo/TESTDATA.md) load through
:func:`load_table`, which hides one storage quirk: ``events.ts`` is
parquet TIMESTAMP(NANOS), unsupported natively by Spark's vectorized
reader — we read the raw int64 (``nanosAsLong``) and truncate to
microseconds with integer arithmetic, which is bit-for-bit what DuckDB
does when it coerces ns → its µs TIMESTAMP (the oracle side).
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.session import ensure_session_defaults

#: Driver-provided tables (TESTDATA.md): TPC-H-ish star schema + events
#: stream + documents/embeddings corpora.
DRIVER_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be broadcast in joins
#: (GTFS dims are KB–MB, SURVEY.md §2.C; TPC-H dims scale sub-linearly).
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table as a DataFrame with normalized types.

    ``events.ts`` arrives as int64 nanoseconds (see module docstring)
    and is converted to TIMESTAMP_NTZ at microsecond precision using
    integer division (truncation — matches DuckDB, no float rounding).
    """
    ensure_session_defaults(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several driver tables at once: ``load_tables(s, d, "orders", ...)``."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for ``spark.sql`` use."""
    for name in DRIVER_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("dt", "hour"),
    mode: str = "overwrite",
) -> None:
    """Write a Parquet table with the engine's standard partition layout.

    With ``partitionOverwriteMode=dynamic`` (session default) and
    ``mode="overwrite"``, only the partitions present in ``df`` are
    replaced — the Spark-native form of the reference's
    write-this-hour's-blob idempotency (R8/R12/R13).
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def with_time_partitions(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the standard ``dt``/``hour`` partition columns from a timestamp.

    Partition values derive from the *data* timestamp, never the wall
    clock — fixing the reference's parse-time `datetime.now()` skew bug
    (SURVEY.md §3.3; reference dags/warsaw-weather.py:21).
    """
    return df.withColumn("dt", F.to_date(ts_col)).withColumn(
        "hour", F.hour(ts_col)
    )


def read_incremental(
    spark: SparkSession,
    path: str,
    manifest_path: str,
    source: str,
    key_cols: tuple[str, ...],
) -> DataFrame:
    """Incremental scan (SURVEY.md §4: the one optimization the
    reference hand-rolls that Catalyst lacks — cross-run memoization —
    done at the API layer, not as a Catalyst rule): rows of ``path``
    whose content digest is not yet in the manifest for ``source``.

    Pair with :func:`mobility_etl_spark.sources.manifest.record_ingest`
    after the downstream write commits; the next call then skips
    everything already processed. Anti-join ships 32-byte digests only.
    """
    from mobility_etl_spark.sources.manifest import (
        changed_objects,
        load_manifest,
        with_content_hash,
    )

    ensure_session_defaults(spark)
    incoming = with_content_hash(spark.read.parquet(path), key_cols)
    manifest = load_manifest(spark, manifest_path).filter(
        F.col("source") == source
    )
    return changed_objects(incoming, manifest)


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: tuple[str, ...] = ("dt", "hour"),
) -> int:
    """Small-file compaction for an hourly-ingested lake table: rewrite
    each partition's many small files into ~``target_file_bytes``
    outputs (the reference's one-blob-per-hour layout accretes a file
    per micro-batch/run; small files poison scan planning at 100 TB —
    footer reads and task scheduling dominate).

    Rewrites in place with dynamic partition overwrite (idempotent;
    re-running compacts nothing new). Returns the number of files
    after compaction.
    """
    ensure_session_defaults(spark)
    df = spark.read.parquet(path)
    total_bytes = sum(
        f.stat().st_size
        for f in pathlib.Path(path).rglob("*.parquet")
    )
    n_files = max(1, total_bytes // target_file_bytes)
    (
        df.repartition(int(n_files), *[F.col(c) for c in partition_cols])
        .sortWithinPartitions(*partition_cols)
        .write.partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(path)
    )
    return sum(1 for _ in pathlib.Path(path).rglob("*.parquet"))
