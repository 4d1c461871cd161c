"""Domain parsers as oracle-checked queries (SURVEY.md §2.B E13/E23–E25,
§7 hard-parts 1 & 3).

The driver tables contain no scraped delay strings or GTFS clock
strings, so these queries SYNTHESIZE them deterministically from
integer columns (both engines build the identical string), then parse
them back with the engine's parsers — proving the parse logic itself
against the oracle's independent SQL implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.delays import parse_delay_seconds
from mobility_etl_spark.functions.gtfs_time import (
    gtfs_time_to_seconds,
    seconds_to_gtfs_time,
    service_day_offset,
    wall_clock_seconds,
)
from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register


@register(
    "delay_parse_seconds",
    oracle="""
    WITH synth AS (
        SELECT l_orderkey,
               l_linenumber,
               CASE WHEN l_orderkey % 2 = 1 THEN '-' ELSE '' END
                 || CAST(l_orderkey % 120 AS VARCHAR) || ' min '
                 || CAST((l_linenumber * 7) % 60 AS VARCHAR) || ' s' AS delay_str
        FROM lineitem
        WHERE l_orderkey < 500
    )
    SELECT l_orderkey,
           l_linenumber,
           delay_str,
           CAST((CASE WHEN l_orderkey % 2 = 1 THEN -1 ELSE 1 END)
                * ((l_orderkey % 120) * 60 + (l_linenumber * 7) % 60)
                AS INTEGER) AS delay_seconds
    FROM synth
    """,
    tags=("E13", "E23", "R17"),
)
def delay_parse_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scraped-Delay-string parser (reference column contract at
    dags/warsaw-delays.py:182): synthesize '[-]M min S s' strings, parse
    with functions/delays.py (regexp-only, codegen-friendly), check the
    parsed seconds against the oracle's direct arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    synth = li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat(
            F.when(F.col("l_orderkey") % 2 == 1, "-").otherwise(""),
            (F.col("l_orderkey") % 120).cast("string"),
            F.lit(" min "),
            ((F.col("l_linenumber") * 7) % 60).cast("string"),
            F.lit(" s"),
        ).alias("delay_str"),
    )
    return synth.withColumn("delay_seconds", parse_delay_seconds("delay_str"))


@register(
    "gtfs_time_parse",
    oracle="""
    WITH synth AS (
        SELECT o_orderkey,
               lpad(CAST(22 + o_orderkey % 7 AS VARCHAR), 2, '0') || ':'
                 || lpad(CAST(o_custkey % 60 AS VARCHAR), 2, '0') || ':'
                 || lpad(CAST(o_orderkey % 60 AS VARCHAR), 2, '0') AS arrival_time
        FROM orders
        WHERE o_orderkey < 500
    )
    SELECT o_orderkey,
           arrival_time,
           CAST(split_part(arrival_time, ':', 1) AS INTEGER) * 3600
             + CAST(split_part(arrival_time, ':', 2) AS INTEGER) * 60
             + CAST(split_part(arrival_time, ':', 3) AS INTEGER) AS svc_seconds,
           CAST(CAST(split_part(arrival_time, ':', 1) AS INTEGER) >= 24
                AS INTEGER) AS rolls_over,
           lpad(CAST((CAST(split_part(arrival_time, ':', 1) AS INTEGER) % 24)
                     AS VARCHAR), 2, '0')
             || substr(arrival_time, 3) AS wall_time
    FROM synth
    """,
    tags=("E24", "E25"),
)
def gtfs_time_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GTFS >24:00:00 times (SURVEY.md §7 hard-part 1): synthesize
    HH∈[22,28] clock strings, parse to seconds-since-midnight, derive
    service-day rollover and the folded wall-clock rendering."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    synth = orders.select(
        "o_orderkey",
        F.concat_ws(
            ":",
            F.lpad((22 + F.col("o_orderkey") % 7).cast("string"), 2, "0"),
            F.lpad((F.col("o_custkey") % 60).cast("string"), 2, "0"),
            F.lpad((F.col("o_orderkey") % 60).cast("string"), 2, "0"),
        ).alias("arrival_time"),
    )
    secs = gtfs_time_to_seconds("arrival_time")
    return synth.select(
        "o_orderkey",
        "arrival_time",
        secs.alias("svc_seconds"),
        service_day_offset(secs).alias("rolls_over"),
        seconds_to_gtfs_time(wall_clock_seconds(secs)).alias("wall_time"),
    )
