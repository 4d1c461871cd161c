"""Sorts, limits, and set operations (SURVEY.md §2.B E20–E22).

Scope justification: ordered pagination output (reference
dags/warsaw-delays.py:86-92) → global sort + top-k; union of hourly
snapshot files into one fact table (§1.2 layout) → union/unionByName;
row-granularity change detection (R6) → EXCEPT.

Scale notes: `orderBy().limit(k)` compiles to TakeOrderedAndProject —
each partition keeps only k rows, the driver merges P×k, no global
sort materializes. Top-k keys are made deterministic with an explicit
tiebreaker, so the limit is stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import dsum, sql_dsum
from mobility_etl_spark.io import load_table, load_tables
from mobility_etl_spark.registry import register


@register(
    "topk_parts_by_revenue",
    oracle=f"""
    SELECT p_partkey,
           p_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey, p_name
    ORDER BY revenue DESC, p_partkey
    LIMIT 10
    """,
    tags=("E20", "E21", "E9"),
)
def topk_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 parts by revenue: broadcast dim join → agg →
    TakeOrderedAndProject; revenue is decimal-exact so the ordering
    (with p_partkey tiebreak) is identical in both engines."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_name")
        .agg(dsum(revenue, "revenue"), F.count("*").alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("p_partkey"))
        .limit(10)
    )


@register(
    "set_ops_users",
    oracle="""
    SELECT 'click_only' AS cohort, user_id
    FROM (SELECT user_id FROM events WHERE event_type = 'click'
          EXCEPT
          SELECT user_id FROM events WHERE event_type = 'purchase')
    UNION ALL
    SELECT 'click_and_purchase' AS cohort, user_id
    FROM (SELECT user_id FROM events WHERE event_type = 'click'
          INTERSECT
          SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
    tags=("E22",),
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT cohorts (row-granularity change detection, R6)."""
    events = load_table(spark, sf_dir, "events")
    clickers = events.filter(F.col("event_type") == "click").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    # subtract == EXCEPT DISTINCT (set semantics, like the SQL oracle);
    # exceptAll would keep multiplicity differences instead.
    click_only = clickers.subtract(buyers).select(
        F.lit("click_only").alias("cohort"), "user_id"
    )
    both = clickers.intersect(buyers).select(
        F.lit("click_and_purchase").alias("cohort"), "user_id"
    )
    return click_only.unionByName(both)


@register(
    "union_hours",
    oracle="""
    WITH unioned AS (
        SELECT event_id, event_type, value
        FROM events WHERE hour(ts) % 2 = 0
        UNION ALL BY NAME
        SELECT event_id, event_type
        FROM events WHERE hour(ts) % 2 = 1
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           COUNT(value) AS n_with_value
    FROM unioned
    GROUP BY event_type
    """,
    tags=("E22",),
)
def union_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): the union-of-hourly-files
    fact table (SURVEY.md §1.2) with schema drift between hours."""
    events = load_table(spark, sf_dir, "events")
    even = events.filter(F.hour("ts") % 2 == 0).select(
        "event_id", "event_type", "value"
    )
    odd = events.filter(F.hour("ts") % 2 == 1).select("event_id", "event_type")
    unioned = even.unionByName(odd, allowMissingColumns=True)
    return unioned.groupBy("event_type").agg(
        F.count("*").alias("n_rows"), F.count("value").alias("n_with_value")
    )
