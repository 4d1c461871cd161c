"""Group-by aggregation operators (SURVEY.md §2.B E13–E16).

The reference's destiny query is "mean delay per route per hour" over
the scraped table (reference dags/warsaw-delays.py:182); on the driver
tables the isomorph is TPC-H Q1-shaped pricing summaries. Partial →
final aggregation (map-side combine) is automatic in Spark
(HashAggregateExec, E16); the decimal-cast pattern in
functions/compat.py makes the result independent of partial-agg order,
so the same plan is hash-exact from local[32] to 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import davg, dsum, sql_davg, sql_dsum
from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("E13", "E16"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: count/sum/avg over two group keys
    (the "mean delay per Route per hour" shape of SURVEY.md §2.B E13)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_minmax_priority",
    oracle="""
    SELECT o_orderpriority,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("E13", "E14"),
)
def agg_minmax_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max (order-independent on doubles) + exact count-distinct."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@register(
    "count_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("E14",),
)
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct cardinality per key (distinct Vehicle No / Stop Name
    over the scraped table, SURVEY.md §2.B E14) — expand-then-aggregate
    plan in Spark, two-phase at scale."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "approx_count_distinct_users",
    oracle=None,  # HLL++ estimate: engine-specific, checked rows-only;
    # accuracy asserted vs exact count in tests/test_aggregates.py
    tags=("E14",),
)
def approx_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path for E14 —
    fixed-size sketch instead of an expand shuffle; rsd=0.01."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx"),
        F.count("*").alias("n_events"),
    )


@register(
    "rollup_lineitem",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS flag,
           COALESCE(l_linestatus, 'ALL') AS status,
           COUNT(*) AS n_items,
           {sql_dsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("E15",),
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the route×hour×day-style hierarchy (SURVEY.md §1.2
    partition scheme); subtotal rows' NULL keys coalesced to 'ALL' so
    both engines agree on representation."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), dsum("l_quantity", "sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "n_items",
            "sum_qty",
        )
    )


@register(
    "cube_orders",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           {sql_dsum("o_totalprice", "total_value")}
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    tags=("E15",),
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping sets in one pass (Expand + single shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_value"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_value",
        )
    )


@register(
    "grouping_sets_lineitem",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("E15",),
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit SQL GROUPING SETS (the third E15 form beside rollup and
    cube): per-(flag,status), per-flag, and grand-total rows in one
    pass — Spark expands to a single Expand+HashAggregate, one shuffle."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "pivot_qty_by_returnflag",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CAST(CASE WHEN l_returnflag = 'A' THEN l_quantity END
                         AS DECIMAL(20,6))) AS DOUBLE) AS qty_a,
           CAST(SUM(CAST(CASE WHEN l_returnflag = 'N' THEN l_quantity END
                         AS DECIMAL(20,6))) AS DOUBLE) AS qty_n,
           CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity END
                         AS DECIMAL(20,6))) AS DOUBLE) AS qty_r
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("E13", "E15"),
)
def pivot_qty_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide): quantity totals per linestatus x returnflag
    as columns. The pivot values are given EXPLICITLY - omitting them
    makes Spark run an extra distinct-collect job to discover them,
    which at 100 TB is a full extra scan. With values pinned this is
    one conditional aggregation, one shuffle, same plan shape as the
    CASE-WHEN oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(dsum("l_quantity", "q"))
    )
    return pivoted.select(
        "l_linestatus",
        F.col("A").alias("qty_a"),
        F.col("N").alias("qty_n"),
        F.col("R").alias("qty_r"),
    )


@register(
    "percentile_disc_events",
    oracle="""
    SELECT event_type,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
           percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("E13", "E14"),
)
def percentile_disc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p50/p90/p99 latency-style stats)
    per event type. percentile_disc returns an ACTUAL data value — no
    interpolation arithmetic — so Spark and DuckDB agree bit-for-bit
    (verified: identical on all groups at sf0.01). The exact form is
    the correctness anchor for approx_percentile at scale, where the
    full sort-per-group becomes too expensive."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("__pct_events")
    return spark.sql(
        """SELECT event_type,
                  percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
                  percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
                  percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
           FROM __pct_events GROUP BY event_type"""
    )


@register(
    "approx_percentile_events",
    oracle=None,  # sketch-specific values; error bound gated in tests
    tags=("E13", "E14"),
)
def approx_percentile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the scale path
    for percentile_disc_events: mergeable per-partition sketches, one
    pass, no per-group sort. accuracy=10000 bounds rank error at
    1/10000 of the group; tests/test_functions.py gates the result
    against the exact discrete percentiles at sf0.001. One sketch pass
    computes all three ranks; the result array is unpacked to scalar
    columns at the output edge (array cells are not harness-portable)."""
    events = load_table(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.5, 0.9, 0.99], 10000)
    return events.groupBy("event_type").agg(
        F.element_at(pcts, 1).alias("p50_approx"),
        F.element_at(pcts, 2).alias("p90_approx"),
        F.element_at(pcts, 3).alias("p99_approx"),
    )


@register(
    "regression_slope_events",
    oracle="""
    WITH t AS (
        SELECT event_type,
               CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x,
               value AS y
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE) AS sum_x,
           CAST(SUM(CAST(y AS DECIMAL(20,6))) AS DOUBLE) AS sum_y,
           (COUNT(*) * CAST(SUM(CAST(x * y AS DECIMAL(20,6))) AS DOUBLE)
              - CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE)
                * CAST(SUM(CAST(y AS DECIMAL(20,6))) AS DOUBLE))
           / (COUNT(*) * CAST(SUM(CAST(x * x AS DECIMAL(20,6))) AS DOUBLE)
              - CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE)
                * CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE))
               AS slope
    FROM t GROUP BY event_type
    """,
    tags=("E13",),
)
def regression_slope_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate (REGR_SLOPE analog): slope of value
    vs hour-of-day per event type, from the closed-form moment sums.
    The built-in regr_slope accumulates doubles (order-dependent, so
    cross-engine hashes diverge); here every moment (Σx, Σy, Σxy, Σx²)
    is an exact decimal sum and the slope is pure scalar arithmetic on
    the finalized doubles — one pass, mergeable partials, bit-stable
    at any parallelism."""
    events = load_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    y = F.col("value")
    t = events.select("event_type", x.alias("x"), y.alias("y"))
    agg = t.groupBy("event_type").agg(
        F.count("*").alias("n"),
        dsum(F.col("x"), "sum_x"),
        dsum(F.col("y"), "sum_y"),
        dsum(F.col("x") * F.col("y"), "sum_xy"),
        dsum(F.col("x") * F.col("x"), "sum_xx"),
    )
    return agg.select(
        "event_type",
        "n",
        "sum_x",
        "sum_y",
        (
            (F.col("n") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y"))
            / (F.col("n") * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x"))
        ).alias("slope"),
    )


@register("hll_rollup_users", oracle=None, tags=("E14", "E13"))
def hll_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup: per-(event_type, day) HLL
    sketches (Datasketches `hll_sketch_agg`) union-merged upward to
    per-event_type distinct users — the incremental-pipeline form of
    COUNT(DISTINCT): daily sketch partials persist once and re-merge in
    O(sketch bytes) forever, where exact distinct would re-shuffle all
    history per refresh. Rows-only driver check (the estimate is
    sketch-defined, not SQL-reproducible); tests/test_functions.py
    gates the merged estimate within HLL error of exact and asserts
    merge-order invariance."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("dt")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        )
    )


@register(
    "percentile_cont_events",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50c,
           quantile_cont(value, 0.9) AS p90c,
           quantile_cont(value, 0.99) AS p99c
    FROM events GROUP BY event_type
    """,
    tags=("E13",),
)
def percentile_cont_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (continuous) percentiles — the companion to
    percentile_disc_events: the p-th quantile interpolates linearly
    between the two straddling order statistics. Safe to hash-check:
    the interpolation is lo + (hi−lo)·frac, a fixed three-op IEEE
    sequence both engines evaluate identically on the same two data
    values (and frac is exact for these group sizes)."""
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("__pctc_events")
    return spark.sql(
        """SELECT event_type,
                  percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS p50c,
                  percentile_cont(0.9) WITHIN GROUP (ORDER BY value) AS p90c,
                  percentile_cont(0.99) WITHIN GROUP (ORDER BY value) AS p99c
           FROM __pctc_events GROUP BY event_type"""
    )
