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


@register(
    "variant_json_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("E3", "E28"),
)
def variant_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` builds a
    binary variant once, ``variant_get`` extracts typed fields without
    re-parsing — the at-scale answer to string-JSON hot paths (parse
    cost paid once per row, pushdown-friendly binary encoding), vs the
    oracle's per-access json_extract."""
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "topk_per_group_parts",
    oracle="""
    WITH rev AS (
        SELECT p.p_brand, l.l_partkey,
               SUM(CAST(l_extendedprice * (1.0 - l_discount)
                        AS DECIMAL(20,6))) AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, l.l_partkey
    )
    SELECT p_brand, l_partkey,
           CAST(revenue AS DOUBLE) AS revenue,
           rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY revenue DESC, l_partkey) AS rk
        FROM rev
    )
    WHERE rk <= 3
    """,
    tags=("E17", "E21"),
)
def topk_per_group_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k PER GROUP (global top-k is TakeOrderedAndProject; per-group
    needs rank-then-filter): top-3 parts by revenue within each brand.
    Ranking happens on the exact DECIMAL revenue (double ordering could
    disagree across engines on ties); the rank filter runs on the
    already-aggregated per-(brand,part) rollup, never on raw lineitem."""
    t = {n: load_table(spark, sf_dir, n) for n in ("lineitem", "part")}
    rev = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
                    "decimal(20,6)"
                )
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("l_partkey")
    )
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "p_brand",
            "l_partkey",
            F.col("revenue").cast("double").alias("revenue"),
            "rk",
        )
    )


@register(
    "array_higher_order_embeddings",
    oracle="""
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           (len(list_filter(embedding, x -> x > 2.0)) > 0) AS has_large,
           (len(list_filter(embedding, x -> abs(x) >= 1e6)) = 0)
               AS all_bounded,
           list_max(embedding) AS v_max,
           list_min(embedding) AS v_min,
           CAST(embedding[1] AS DOUBLE) AS h1,
           CAST(embedding[2] AS DOUBLE) AS h2,
           CAST(embedding[3] AS DOUBLE) AS h3
    FROM embeddings
    WHERE vec_id < 200
    """,
    tags=("E27",),
)
def array_higher_order_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions on the embedding column — filter/
    exists/forall lambdas, array extrema, element access — all JVM
    codegen over the array without exploding (the fan-out-free path for
    per-vector feature checks at 100 TB). The head-of-vector slice is
    emitted as three scalar columns (h1..h3) rather than an array —
    array-typed output cells are not portable across result harnesses."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.exists(e, lambda x: x > 2.0).alias("has_large"),
        F.forall(e, lambda x: F.abs(x) < 1e6).alias("all_bounded"),
        F.array_max(e).alias("v_max"),
        F.array_min(e).alias("v_min"),
        F.element_at(e, 1).cast("double").alias("h1"),
        F.element_at(e, 2).cast("double").alias("h2"),
        F.element_at(e, 3).cast("double").alias("h3"),
    )


@register(
    "pipe_syntax_orders",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
               AS sum_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("E6", "E7", "E13"),
)
def pipe_syntax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark-4 ``|>`` operators): the same logical
    plan as the classic SELECT, written as a linear dataflow — the form
    that reads like the DataFrame chain it compiles to. Hash-checked
    against the classic formulation in the oracle, proving the two
    surfaces are one engine."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "pipe_orders_v"
    )
    return spark.sql("""
        FROM pipe_orders_v
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
                         AS sum_price
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, sum_price
    """)


@register(
    "nested_struct_array_lineitem",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS n_items,
           MIN(l_linenumber) AS first_line,
           MAX(l_extendedprice) AS max_price,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
               AS total_qty
    FROM lineitem
    WHERE l_orderkey < 2000
    GROUP BY l_orderkey
    """,
    tags=("E27", "E29", "E13"),
)
def nested_struct_array_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested data model: each order's lineitems are collected into a
    sorted array<struct> (the document form an order-events table would
    land as), then every output is computed by NAVIGATING the nested
    value — element_at for the head, transform + array_max for the
    extremum, a sequential fold for the total — and hash-checked
    against the oracle computing the same facts FLAT. Proves nested
    construction/navigation loses nothing vs relational aggregation;
    all lambda work is JVM codegen, no explode round-trip."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 2000
    )
    items = F.array_sort(
        F.collect_list(
            F.struct("l_linenumber", "l_quantity", "l_extendedprice")
        )
    )
    nested = li.groupBy("l_orderkey").agg(items.alias("items"))
    return nested.select(
        "l_orderkey",
        F.size("items").alias("n_items"),
        F.element_at("items", 1)["l_linenumber"].alias("first_line"),
        F.array_max(
            F.transform("items", lambda s: s["l_extendedprice"])
        ).alias("max_price"),
        F.aggregate(
            F.transform(
                "items", lambda s: F.floor(s["l_quantity"]).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("total_qty"),
    )
