"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``mobility_etl_spark`` package; this module
just adapts its query registry (mobility_etl_spark/registry.py) to the
driver's three-function contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mobility_etl_spark.registry import load_all

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's destiny query shape (SURVEY.md §7 step 1): "mean
    delay per route per hour joined with that hour's context, worst
    routes first" — here: per (hour, event_type) average event value
    joined with the hour's total traffic, top rows by average value.
    """
    specs = load_all()
    from pyspark.sql import functions as F

    hourly = specs["hour_bucket_join"].builder(spark, SF0001)
    return hourly.orderBy(F.col("avg_value").desc(), "hour_ts", "event_type").limit(10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query; approximate
    / hash-algorithm-specific operators (LSH, simhash, HLL) are omitted
    and get the driver's rows-only check (their accuracy is asserted
    against exact brute-force in tests/)."""
    return {
        name: spec.oracle
        for name, spec in sorted(load_all().items())
        if spec.oracle is not None
    }
