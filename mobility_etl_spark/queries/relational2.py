"""Relational surface, part 2: window distribution functions,
UNPIVOT (wide→long reshape), and element-wise array aggregation
(SURVEY.md §2.B E17/E19/E27 extensions).

Each query is exactly oracle-checked; float-valued outputs are either
single IEEE divisions of exact integers (percent_rank/cume_dist) or
exact-decimal sums (centroids), so hashes match at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register


@register(
    "window_distribution_orders",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ntile(4) OVER w AS price_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           first_value(o_orderkey) OVER wf AS cheapest_key,
           last_value(o_orderkey) OVER wf AS priciest_key,
           nth_value(o_orderkey, 2) OVER wf AS second_key
    FROM orders
    WHERE o_orderkey < 3000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING)
    """,
    tags=("E17", "E19"),
)
def window_distribution_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-family window functions — ntile buckets,
    percent_rank/cume_dist (exact integer ratios → one IEEE division),
    and first/last/nth over an explicit full frame. The o_orderkey
    tiebreak makes the order total, so every engine agrees row-exactly.
    One shuffle on the partition key serves all eight functions."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(wf).alias("cheapest_key"),
        F.last("o_orderkey").over(wf).alias("priciest_key"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
    )


@register(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
           l_quantity AS metric_value
    FROM lineitem WHERE l_orderkey < 500
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 500
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey < 500
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax
    FROM lineitem WHERE l_orderkey < 500
    """,
    tags=("E15", "E22"),
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long, the inverse of pivot_qty_by_returnflag):
    four metric columns melt into (metric, metric_value) rows via the
    native ``DataFrame.unpivot`` — a zero-shuffle generate, not a
    4-way self-union scan (the oracle states the naive form; the
    engine reads the fact once)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    melted = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )
    return melted.withColumn("metric", F.regexp_replace("metric", "^l_", ""))


@register(
    "embedding_centroids_by_label",
    oracle="""
    SELECT label,
           CAST(i - 1 AS INTEGER) AS dim_idx,
           CAST(SUM(CAST(CAST(e AS DOUBLE) AS DECIMAL(20,6))) AS DOUBLE)
               / COUNT(*) AS centroid
    FROM (
        SELECT label,
               unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    )
    GROUP BY label, i
    """,
    tags=("E27", "N3"),
)
def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding space in long form
    (label, dim, mean): posexplode fans each vector into dimension
    rows, one groupBy computes exact decimal means — the class-
    prototype build used by IVF coarse quantizers (operators/
    similarity.py) and centroid-based dedup. At 100 TB the fan-out is
    64× rows but 1/64 width; the shuffle carries (label, dim) partial
    sums only."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim_idx", "e")
    )
    return exploded.groupBy("label", "dim_idx").agg(
        (
            F.sum(F.col("e").cast("double").cast("decimal(20,6)")).cast("double")
            / F.count("*")
        ).alias("centroid")
    )
