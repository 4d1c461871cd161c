"""Projection / filter / conditional operators (SURVEY.md §2.B E6–E8).

Scope justification: the reference selects and skips columns while
scraping (checkbox-column skip, reference dags/warsaw-delays.py:141-142),
fixes an 8-column schema (:182), drops empty rows (:156), and
dispatches on cell type (chip/link/span/text, :144-154) — i.e.
projection, predicates, and conditional expressions. Here they are
first-class Catalyst operators: filters and column pruning reach the
parquet scan (PushedFilters / ReadSchema in .explain), so at 100 TB
the scan reads only matching row groups and referenced columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import dsum, sql_dsum
from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register


@register(
    "filter_predicates",
    oracle="""
    SELECT l_orderkey,
           l_linenumber AS line_no,
           l_quantity   AS qty,
           l_returnflag AS flag,
           l_linestatus AS status
    FROM lineitem
    WHERE (l_returnflag = 'A' OR l_linestatus LIKE 'O%')
      AND l_quantity BETWEEN 10 AND 20
      AND l_discount IS NOT NULL
      AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_suppkey IN (1, 2, 3, 4, 5)
    """,
    tags=("E6", "E7"),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality/range/IN/LIKE/NULL-check/boolean-combo predicates with
    projection + rename; all five predicates push down to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            ((F.col("l_returnflag") == "A") | F.col("l_linestatus").like("O%"))
            & F.col("l_quantity").between(10, 20)
            & F.col("l_discount").isNotNull()
            & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & F.col("l_suppkey").isin(1, 2, 3, 4, 5)
        )
        .select(
            "l_orderkey",
            F.col("l_linenumber").alias("line_no"),
            F.col("l_quantity").alias("qty"),
            F.col("l_returnflag").alias("flag"),
            F.col("l_linestatus").alias("status"),
        )
    )


@register(
    "conditional_bands",
    oracle=f"""
    SELECT CASE
             WHEN o_totalprice < 50000  THEN 'small'
             WHEN o_totalprice < 150000 THEN 'medium'
             WHEN o_totalprice < 300000 THEN 'large'
             ELSE 'jumbo'
           END AS price_band,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "total_value")}
    FROM orders
    GROUP BY 1
    """,
    tags=("E8", "E13"),
)
def conditional_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding (the scrape loop's cell-type dispatch,
    reference dags/warsaw-delays.py:144-154, as a vectorized expression)."""
    orders = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        orders.withColumn("price_band", band)
        .groupBy("price_band")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_value"))
    )
