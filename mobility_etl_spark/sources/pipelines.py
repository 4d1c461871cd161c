"""The reference's three pipelines as Spark bronze→silver jobs
(SURVEY.md §2.A R9–R16/R19, §7 step 3; one function per reference DAG).

Airflow still *schedules* these (BASELINE.md: "DataFrame ops with
Airflow orchestration") — each function below is one `@task` body; the
reference's per-task process boundaries and XCom handoffs collapse
into DataFrame lineage inside a single job (SURVEY.md §3.4).

All partition values derive from DATA timestamps, never the wall clock
— fixing the reference's parse-time `datetime.now()` skew bug
(dags/warsaw-weather.py:21, SURVEY.md §3.3). Storage rule: timestamps
in UTC; `dt`/`hour` partition columns derived in Europe/Warsaw
(SURVEY.md §7 hard-part 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.delays import parse_delay_seconds
from mobility_etl_spark.functions.gtfs_time import (
    gtfs_time_to_seconds,
    service_day_offset,
)
from mobility_etl_spark.sources import manifest as mf
from mobility_etl_spark.sources.readers import gtfs_tables_from_zip

#: Partition values render in the reference's operational timezone
#: (delays paths use Europe/Warsaw, dags/warsaw-delays.py:194) while the
#: stored timestamp stays UTC.
WARSAW = "Europe/Warsaw"


def _with_warsaw_partitions(df: DataFrame, ts_col: str) -> DataFrame:
    local = F.from_utc_timestamp(F.col(ts_col), WARSAW)
    return df.withColumn("dt", F.to_date(local)).withColumn("hour", F.hour(local))


# ---------------------------------------------------------------------------
# warsaw-gtfs (@daily): zip → change-detect → 8 typed silver tables
# ---------------------------------------------------------------------------


def gtfs_ingest(
    spark: SparkSession,
    zip_path: str,
    silver_root: str,
    manifest_path: str,
) -> dict[str, int]:
    """R1+R4–R7+R9–R11: the warsaw-gtfs DAG end-to-end.

    Change detection is per-archive: the zip's whole-file SHA-256
    (digest of `binaryFile.content` — the reference's chunked file
    hash, dags/warsaw-gtfs.py:41-47) anti-joined against the manifest;
    an unchanged feed writes nothing (the short-circuit,
    dags/warsaw-gtfs.py:60-71). The reference's 8-way `.expand()`
    fan-out (R9) is inherent parallelism here — each table is its own
    distributed write.

    Returns {table: rows_written}; empty dict = feed unchanged.
    """
    from mobility_etl_spark.sources.readers import read_binary_files

    archives = read_binary_files(spark, zip_path).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    manifest = mf.load_manifest(spark, manifest_path)
    fresh = mf.changed_objects(archives, manifest)
    fresh_paths = [r.path for r in fresh.select("path", "content_sha256").collect()]
    if not fresh_paths:
        return {}

    written: dict[str, int] = {}
    tables = gtfs_tables_from_zip(spark, zip_path)
    for name, df in tables.items():
        silver = gtfs_silver(name, df)
        silver.write.mode("overwrite").parquet(f"{silver_root}/{name}")
        written[name] = silver.count()

    mf.record_ingest(
        spark,
        manifest_path,
        source="gtfs",
        entries=fresh.select(F.col("path").alias("object_key"), "content_sha256"),
    )
    return written


def gtfs_silver(name: str, df: DataFrame) -> DataFrame:
    """Typed silver projections: GTFS string quirks → engine types.

    * `calendar_dates.date` (yyyyMMdd string) → DATE (E24).
    * `stop_times.arrival/departure_time` (clock strings that may
      exceed 24:00:00, SURVEY.md §7 hard-part 1) → seconds-since-
      midnight INT + service-day offset; never a TimestampType.
    """
    if name == "calendar_dates":
        return df.withColumn("date", F.to_date(F.col("date"), "yyyyMMdd"))
    if name == "feed_info":
        return df.withColumn(
            "feed_start_date", F.to_date("feed_start_date", "yyyyMMdd")
        ).withColumn("feed_end_date", F.to_date("feed_end_date", "yyyyMMdd"))
    if name == "stop_times":
        return (
            df.withColumn("arrival_s", gtfs_time_to_seconds("arrival_time"))
            .withColumn("departure_s", gtfs_time_to_seconds("departure_time"))
            .withColumn("service_day_offset", service_day_offset("arrival_s"))
        )
    return df


# ---------------------------------------------------------------------------
# scrape_warsaw_traffic_data (@hourly): scraped rows → typed silver
# ---------------------------------------------------------------------------


def delays_silver(raw: DataFrame) -> DataFrame:
    """R14–R15 + E13: raw 8-string-column scrape batch → typed silver.

    Input contract = the reference's hardcoded pandas columns
    (dags/warsaw-delays.py:182-186), snake_cased (DELAYS_RAW_SCHEMA).
    Adds `delay_s` via the total parser (NULL on garbage, never
    throws) and drops fully-empty rows (the scraper's non-empty guard,
    dags/warsaw-delays.py:156).
    """
    non_key = [c for c in raw.columns if c != "ingest_ts"]
    any_content = F.greatest(
        *[F.col(c).isNotNull() & (F.trim(F.col(c)) != "") for c in non_key]
    )
    return (
        raw.filter(any_content)
        .withColumn("delay_s", parse_delay_seconds("delay"))
        .withColumn("outside_flag", F.col("outside").isin("Tak", "Yes", "true", "1"))
    )


def delays_ingest(
    spark: SparkSession,
    raw: DataFrame,
    silver_path: str,
    manifest_path: str,
) -> int:
    """The scrape DAG's upload task, engine-native (R12+R16): typed
    silver, partitioned by Warsaw-local (dt, hour) derived from the
    scrape timestamp, written with dynamic partition overwrite so
    re-running an hour replaces exactly that hour (idempotent, R8).

    Hours already recorded in the manifest are skipped (the
    exists-guard) — re-scrapes of a landed hour are no-ops, not dupes.

    Returns rows written.
    """
    silver = _with_warsaw_partitions(delays_silver(raw), "ingest_ts")
    keyed = silver.withColumn(
        "object_key", F.concat_ws("/", F.col("dt").cast("string"), F.col("hour"))
    )
    manifest = mf.load_manifest(spark, manifest_path)
    fresh = mf.unseen_partitions(keyed, manifest, source="delays")
    n = fresh.count()
    if n == 0:
        return 0
    fresh.drop("object_key").write.partitionBy("dt", "hour").mode(
        "overwrite"
    ).parquet(silver_path)
    mf.record_ingest(
        spark,
        manifest_path,
        source="delays",
        entries=mf.with_content_hash(
            fresh.select("object_key").distinct(), ("object_key",)
        ),
    )
    return n


# ---------------------------------------------------------------------------
# warsaw-weather (@hourly): API payload → typed silver
# ---------------------------------------------------------------------------


def weather_silver(raw: DataFrame) -> DataFrame:
    """R2 typed: IMGW payload rows → typed observation facts with a
    proper UTC timestamp built from (meas_date, meas_hour) — the
    measurement time, not the fetch time (fixes dags/warsaw-weather.py:21)."""
    return raw.withColumn(
        "obs_ts",
        F.to_utc_timestamp(
            F.timestamp_seconds(
                F.unix_timestamp(F.col("meas_date").cast("timestamp"))
                + F.col("meas_hour") * 3600
            ),
            WARSAW,
        ),
    )


def weather_ingest(
    spark: SparkSession,
    raw: DataFrame,
    silver_path: str,
    manifest_path: str,
) -> int:
    """The weather DAG engine-native (R8+R13): typed silver partitioned
    by observation hour; already-landed hours skipped via the manifest
    exists-guard; dynamic partition overwrite keeps re-runs idempotent."""
    silver = _with_warsaw_partitions(weather_silver(raw), "obs_ts")
    keyed = silver.withColumn(
        "object_key", F.concat_ws("/", F.col("dt").cast("string"), F.col("hour"))
    )
    manifest = mf.load_manifest(spark, manifest_path)
    fresh = mf.unseen_partitions(keyed, manifest, source="weather")
    n = fresh.count()
    if n == 0:
        return 0
    fresh.drop("object_key").write.partitionBy("dt", "hour").mode(
        "overwrite"
    ).parquet(silver_path)
    mf.record_ingest(
        spark,
        manifest_path,
        source="weather",
        entries=mf.with_content_hash(
            fresh.select("object_key").distinct(), ("object_key",)
        ),
    )
    return n
