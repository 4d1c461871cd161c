"""TPC-H regression pack, part 3 — the last classic shapes.

The testdata lacks ``partsupp`` and lineitem commit/receipt dates, so
Q2/Q9/Q20 are re-keyed on the part<->supplier link implied by
``DISTINCT (l_partkey, l_suppkey)`` (exactly the association partsupp
materializes) and Q21 is out of scope. Each query gates a distinct
plan pattern that matters at 100 TB:

- Q2: correlated per-group MIN (min-cost supplier) — window-min +
  filter instead of a rejoin, one shuffle not two.
- Q8: market share — two-level conditional aggregation over an
  8-table star; the CASE-inside-SUM numerator shares one scan with
  the denominator.
- Q9: product profit — per-row compound arithmetic fed into exact
  decimal sums, grouped by supplier nation x year.
- Q20: excess-share shipper — correlated threshold (supplier's share
  of a part's shipped quantity) phrased as all-decimal integer-scaled
  comparison so the boundary is exact cross-engine.

Reference scope justification: the GTFS star schema implies exactly
these join/agg shapes (SURVEY.md §2.B, dags/warsaw-gtfs.py:30-39).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import DEC, dsum
from mobility_etl_spark.io import load_tables
from mobility_etl_spark.registry import register

_REVENUE = "l_extendedprice * (1.0 - l_discount)"


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
        SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal, n.n_name
        FROM part p
        JOIN ps ON p.p_partkey = ps.l_partkey
        JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_size = 10 AND p.p_type = 'PROMO'
    )
    SELECT p_partkey, p_brand, s_name, s_acctbal, n_name
    FROM cand
    QUALIFY s_acctbal = MIN(s_acctbal) OVER (PARTITION BY p_partkey)
    """,
    tags=("E9", "E10", "E17"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the cheapest linked
    supplier (s_acctbal standing in for ps_supplycost; the link is the
    distinct part-supplier pairs observed in lineitem). The correlated
    scalar-MIN subquery is decorrelated to a window-min + filter —
    one hash-partition by p_partkey instead of agg + rejoin, and ties
    keep every minimal supplier exactly like the correlated form."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    ps = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    cand = (
        t["part"]
        .filter((F.col("p_size") == 10) & (F.col("p_type") == "PROMO"))
        .join(ps, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return cand.withColumn("__min_bal", F.min("s_acctbal").over(w)).filter(
        F.col("s_acctbal") == F.col("__min_bal")
    ).drop("__min_bal")


@register(
    "q8_market_share",
    oracle=f"""
    WITH volumes AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
               {_REVENUE} AS volume,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3'
                              THEN volume ELSE 0.0 END
                         AS DECIMAL(20,6))) AS DOUBLE) AS nation_volume,
           CAST(SUM(CAST(volume AS DECIMAL(20,6))) AS DOUBLE)
               AS total_volume,
           CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3'
                              THEN volume ELSE 0.0 END
                         AS DECIMAL(20,6))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(20,6))) AS DOUBLE)
               AS mkt_share
    FROM volumes
    GROUP BY o_year
    """,
    tags=("E8", "E9", "E13"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's revenue for a
    part type, by order year. Numerator and denominator are CASE'd
    sums over the SAME star-join scan (no second pass); the final
    share is a single double divide of the two exact-decimal totals.
    nation/region/supplier/customer-side dims all broadcast."""
    t = load_tables(
        spark, sf_dir,
        "part", "lineitem", "orders", "customer", "nation", "region", "supplier",
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.expr(_REVENUE).alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        0.0
    )
    out = vol.groupBy("o_year").agg(
        dsum(nation_vol, "nation_volume"),
        dsum(F.col("volume"), "total_volume"),
    )
    return out.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST({_REVENUE} - p.p_retailprice * l.l_quantity
                         AS DECIMAL(20,6))) AS DOUBLE) AS sum_profit,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    """,
    tags=("E9", "E13"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus cost, p_retailprice
    standing in for ps_supplycost) on one part-name family, by
    supplier nation and ship year. The per-row compound expression
    (two multiplies, one subtract) is written identically in both
    engines, then summed exactly as decimals — so the hash matches at
    any partition count."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    profit = F.expr(_REVENUE) - F.col("p_retailprice") * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").contains("gear"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(dsum(profit, "sum_profit"), F.count("*").alias("n_lines"))
    )


@register(
    "q20_excess_share_shippers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(20,6))) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
    )
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM shipped
        QUALIFY qty * 10 > SUM(qty) OVER (PARTITION BY l_partkey) * 3
    )
    """,
    tags=("E10", "E13", "E17"),
)
def q20_excess_share_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped more than 30% of a red
    part's 1996 volume. The correlated threshold ("share of this
    part's demand") is a window-sum over the grouped quantities; the
    comparison is integer-scaled decimal (qty*10 > total*3) so the
    boundary is exact in both engines. Qualifying keys reach supplier
    as a broadcast LEFT SEMI (IN semantics, no row duplication)."""
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").startswith("red"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    hot = (
        shipped.withColumn("__tot", F.sum("qty").over(w))
        .filter(F.col("qty") * 10 > F.col("__tot") * 3)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(hot, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )
