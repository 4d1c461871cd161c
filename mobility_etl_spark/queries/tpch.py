"""TPC-H-shaped analytical queries over the driver's star schema
(SURVEY.md §5.6: "TPC-H-shaped queries ... as the regression suite").

The driver tables are TPC-H-ish subsets (FIXTURES.md §B), so the
classic query shapes port directly — each is registered with its exact
DuckDB oracle and exercises a distinct plan pattern worth gating at
100 TB: Q3 (two-fact join + top-k), Q10 (group on a wide key set),
Q12 (CASE-bucketed counts), Q14 (conditional aggregate ratio).

All monetary aggregates use the exact-decimal pattern
(functions/compat.py) so hashes match at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import dsum
from mobility_etl_spark.io import load_tables
from mobility_etl_spark.registry import register

_REVENUE = "l_extendedprice * (1.0 - l_discount)"


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM(CAST({_REVENUE} AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("E9", "E13", "E21"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer (broadcast) ⋈ orders ⋈
    lineitem, revenue per urgent order, top 10. The date filters push
    into both fact scans; only the grouped triples shuffle."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = "1995-03-15"
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > cutoff)
        .join(
            t["orders"].filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.expr(_REVENUE), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey,
           c.c_name,
           CAST(SUM(CAST({_REVENUE} AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
           n.n_name,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("E9", "E13", "E21"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking of customers who returned
    items; three broadcast dims around the lineitem fact, one shuffle
    for the per-customer rollup, TakeOrderedAndProject for the top 20."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.expr(_REVENUE), "revenue"),
            F.count("*").alias("n_items"),
        )
        .select("c_custkey", "c_name", "revenue", "n_name", "n_items")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q12_shipmode_buckets",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END)
                AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority
    """,
    tags=("E8", "E9", "E13"),
)
def q12_shipmode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-bucketed counts per priority over a
    date-bounded year of shipments — conditional aggregation stays a
    single pass; the year predicate prunes at the scan."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    high = F.when(F.col("l_quantity") >= 25, 1).otherwise(0)
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_share",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN CAST({_REVENUE} AS DECIMAL(20,6))
                         ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE)
               AS promo_revenue,
           CAST(SUM(CAST({_REVENUE} AS DECIMAL(20,6))) AS DOUBLE)
               AS total_revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    """,
    tags=("E8", "E9", "E13"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue vs total — conditional decimal
    sums in one pass over lineitem with the part dim broadcast. (The
    ratio itself is left to the caller: a division of two
    exactly-computed sums.)"""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    rev = F.expr(_REVENUE).cast("decimal(20,6)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(20,6)")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
            F.count("*").alias("n_lines"),
        )
    )
