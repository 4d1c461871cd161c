"""SparkSession factory and session hygiene.

The reference resolves config at DAG *parse* time (an anti-pattern,
SURVEY.md §3.1: reference dags/warsaw-gtfs.py:27); here config is
resolved lazily at session-build time, and every runtime-settable
default can also be applied to an externally-provided session via
:func:`ensure_session_defaults` (the driver harness owns its own
SparkSession, so queries must self-normalize).

Scale posture (100 TB design rules, SURVEY.md §2.C): AQE on (runtime
re-planning, skew-join splitting, partition coalescing), Arrow on
(pandas-UDF boundary is vectorized), dynamic partition overwrite
(idempotent re-runs of a single (dt, hour) partition — reference
R8 semantics), session timezone pinned to UTC (store-UTC rule from
SURVEY.md §7 hard-part 2; Europe/Warsaw is a *presentation* concern
handled by from_utc_timestamp at the edge).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession

# Confs that are safe to (re)apply to a live session at runtime.
_RUNTIME_DEFAULTS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # /root/testdata parquet stores events.ts as TIMESTAMP(NANOS),
    # which Spark 4 otherwise refuses (PARQUET_TYPE_ILLEGAL); read the
    # raw int64 and convert explicitly (io.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive parquet timestamps (isAdjustedToUTC=false) -> TIMESTAMP_NTZ,
    # matching DuckDB's naive TIMESTAMP semantics for the oracle gate.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
}

# Static confs: only honored at session build time.
_BUILD_DEFAULTS: dict[str, str] = {
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


#: Sessions already carrying the runtime defaults (weakly referenced so
#: a collected session can never alias a new one). Every conf.set is a
#: py4j round trip; query entry points call this per table load, so
#: without the memo a 5-table query pays ~40 needless JVM round trips.
_DEFAULTS_APPLIED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an existing session (idempotent,
    memoized per session object).

    Called by every query entry point so behavior is identical whether
    the session came from :func:`get_spark` or from the driver harness.
    Re-asserting externally mutated confs is intentionally NOT done on
    every call — set confs through this module (or restart the session)
    rather than flipping them mid-flight.
    """
    if spark in _DEFAULTS_APPLIED:
        return spark
    for key, value in _RUNTIME_DEFAULTS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A conf may be static in some deployments; defaults are
            # best-effort there and correct-by-construction in ours.
            pass
    _DEFAULTS_APPLIED.add(spark)
    return spark


def get_spark(
    app_name: str = "mobility-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster leave it unset and let spark-submit decide.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(_BUILD_DEFAULTS)
    conf.update(_RUNTIME_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    return ensure_session_defaults(builder.getOrCreate())
