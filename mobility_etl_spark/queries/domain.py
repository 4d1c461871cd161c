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


@register(
    "gap_fill_daily_user_values",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
        FROM events
    ),
    spine AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        FROM bounds
    ),
    users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 50),
    daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS day_value
        FROM events WHERE user_id < 50
        GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT u.user_id,
           strftime(s.d, '%Y-%m-%d') AS dt,
           LAST_VALUE(daily.day_value IGNORE NULLS) OVER (
               PARTITION BY u.user_id ORDER BY s.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS day_value,
           daily.day_value IS NULL AS is_gap
    FROM users u
    CROSS JOIN spine s
    LEFT JOIN daily ON daily.user_id = u.user_id AND daily.d = s.d
    """,
    tags=("E11", "E19", "R13"),
)
def gap_fill_daily_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (operators/timeseries.py): sparse
    per-user daily totals resampled onto the full generated date
    spine, gaps forward-filled per user with the last true value and
    flagged is_gap (leading gaps stay NULL — nothing true to carry).
    The regular-grid precondition for the rollup/window/training ops,
    phrased as spine-join + ignorenulls window, never a UDF loop."""
    from mobility_etl_spark.operators.timeseries import date_spine, gap_fill_forward

    events = load_table(spark, sf_dir, "events")
    from mobility_etl_spark.functions.compat import dsum

    sub = events.filter(F.col("user_id") < 50)
    daily = sub.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(dsum(F.col("value"), "day_value"))
    spine = date_spine(events, "user_id", "ts").join(
        sub.select("user_id").distinct(), "user_id", "left_semi"
    )
    filled = gap_fill_forward(daily, "user_id", "d", ["day_value"], spine)
    return filled.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("dt"),
        "day_value",
        "is_gap",
    )
