"""TPC-H regression pack, part 2 (SURVEY.md §5.6).

Adds the classic shapes the first pack (queries/tpch.py) did not cover,
each gating a distinct plan pattern that matters at 100 TB:

- Q5: multi-dim star with a *cross-fact* equality (customer nation ==
  supplier nation) — the join that silently becomes a cartesian feeder
  if mis-ordered.
- Q6: pure scan-side predicate aggregation — the canonical pushdown
  gate (no join, no shuffle beyond one partial->final agg).
- Q7: nation-pair volume by year — symmetric disjunctive join filter.
- Q13: outer-join distribution — a two-level aggregation where the
  NULL-preserving left join is the semantics under test.
- Q15: top-revenue supplier via window-max over an aggregate (the
  scalar-subquery-on-view shape).
- Q16: NOT-IN exclusion + count-distinct over a broadcast dim.
- Q19: OR-of-ANDs disjunctive predicate spanning both join sides.

All monetary aggregates use the exact-decimal pattern
(functions/compat.py) so hashes match DuckDB at any parallelism.
Reference scope justification: the GTFS star schema implies exactly
these join/agg shapes (SURVEY.md §2.B, dags/warsaw-gtfs.py:30-39).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import dsum
from mobility_etl_spark.io import load_tables
from mobility_etl_spark.registry import register

_REVENUE = "l_extendedprice * (1.0 - l_discount)"


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM(CAST({_REVENUE} AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    tags=("E9", "E13"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the customer and the
    supplier share a nation, restricted to one region-year. The
    c_nationkey == s_nationkey predicate rides the supplier broadcast
    join (no extra shuffle); region/nation collapse into the broadcast
    side before touching the fact."""
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    asia_nations = (
        t["nation"]
        .join(
            t["region"].filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.expr(_REVENUE), "revenue"), F.count("*").alias("n_lines"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(20,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.02 AND l_discount <= 0.06
      AND l_quantity < 24
    """,
    tags=("E7", "E13"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical predicate-pushdown aggregate — no
    join, every filter eligible for parquet row-group skipping, a
    single partial->final agg. The plan gate for 'filters reach the
    scan' lives in tests/test_plans.py."""
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CAST({_REVENUE} AS DECIMAL(20,6))) AS DOUBLE) AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_12')
        OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_11'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, ship_year
    """,
    tags=("E9", "E13", "E24"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair, both
    directions, by year. The disjunctive nation-pair predicate is
    applied after the two broadcast nation joins; Catalyst pushes the
    per-side IN('NATION_1','NATION_2') residuals into the broadcast
    builds."""
    t = load_tables(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = ("NATION_11", "NATION_12")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            (F.col("supp_nation").isin(*pair))
            & (F.col("cust_nation").isin(*pair))
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dsum(F.expr(_REVENUE), "volume"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("E10", "E13"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders — a
    NULL-preserving left outer join (customers with zero matching
    orders must survive as c_count=0) under a join-side filter, then a
    second aggregation over the first's output. COUNT(col) vs
    COUNT(*) semantics is exactly what's under test."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST({_REVENUE} AS DECIMAL(20,6))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-07-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("E10", "E13", "E17"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum half-year revenue
    — a scalar subquery over an aggregated view. The scalar max is a
    one-row global aggregate broadcast-crossJoined back onto the
    per-supplier rollup (partial+final agg, never a single-partition
    window — the rollup is bounded by |suppliers| but the plan should
    not depend on that); the equality compares exact decimals so ties
    behave identically to the oracle."""
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.expr(_REVENUE).cast("decimal(20,6)")).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    best = revenue.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_revenue")
    )
    return (
        F.broadcast(best)
        .join(t["supplier"], F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("E7", "E10", "E14"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part bucket with a
    NOT IN supplier exclusion. NOT IN over a non-nullable key column
    is rewritten as a broadcast left-anti join (the null-safe BNLJ trap
    doesn't apply: s_suppkey is a PK); part is broadcast after its
    brand/type/size filters collapse it."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    excluded = t["supplier"].filter(F.col("s_acctbal") < 2000.0).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST({_REVENUE} AS DECIMAL(20,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    tags=("E7", "E8", "E9"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs spanning both join sides. Catalyst
    extracts the common join key and pushes per-side disjunction
    residuals (brand/size → part scan, quantity envelope → lineitem
    scan) while the mixed residual evaluates post-join — the pattern
    that keeps a disjunctive filter from forcing a cartesian product."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & sz.between(1, 15) & q.between(1, 21))
        | ((b == "Brand#23") & sz.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#34") & sz.between(1, 35) & q.between(20, 40))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(dsum(F.expr(_REVENUE), "revenue"), F.count("*").alias("n_lines"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH sup_order AS (
        SELECT l.l_orderkey,
               l.l_suppkey,
               MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey, l.l_suppkey
    ),
    order_stats AS (
        SELECT l_orderkey,
               COUNT(*) AS n_supp,
               SUM(is_late) AS n_late
        FROM sup_order
        GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM sup_order so
    JOIN order_stats os ON os.l_orderkey = so.l_orderkey
    JOIN supplier s ON s.s_suppkey = so.l_suppkey
    WHERE so.is_late = 1 AND os.n_supp > 1 AND os.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    tags=("E9", "E10", "E13", "E17"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: suppliers who kept a finished multi-supplier
    order waiting — they shipped late while every co-supplier on the
    order shipped on time. The driver schema has no commit/receipt
    dates (TESTDATA.md), so "late" is re-keyed as l_shipdate more than
    60 days after o_orderdate; the exists / not-exists double
    self-join shape of the original is preserved.

    Spark-first plan: instead of the literal EXISTS + NOT EXISTS
    correlated self-joins (two extra passes over lineitem), the
    per-order evidence is computed once — lineitem ⋈ orders shuffles
    on orderkey, and that one partitioning is reused by BOTH the
    (orderkey, suppkey) aggregate and the per-order window counts
    (HashPartitioning(orderkey) satisfies both clustered
    distributions, so no further Exchange until the final tiny s_name
    aggregate). A supplier "waits" iff its order has >1 supplier and
    exactly 1 late one: itself.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    lo = t["lineitem"].join(
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    sup_order = (
        lo.groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        sup_order.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
    )
    return (
        waiting.join(
            F.broadcast(t["supplier"]),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
