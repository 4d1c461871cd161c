"""TPC-H subquery-shaped analogs: Q4, Q11, Q17, Q18, Q22.

The flat pack (queries/tpch.py) covers join+agg+top-k shapes; this
module covers Catalyst's *subquery* planning surface — the shapes a
reference user's warehouse queries actually take once the star schema
exists:

- EXISTS            → left-semi join          (q4)
- global scalar sub → broadcast single row    (q11, q22)
- correlated agg    → per-key agg + join-back (q17)
- HAVING + join-back on the aggregate         (q18)
- NOT EXISTS        → left-anti join          (q22)

Scope justification: the reference's hash short-circuit
(reference dags/warsaw-gtfs.py:60-71) and exists-guard
(reference dags/warsaw-weather.py:26-28) are EXISTS / NOT-EXISTS
semantics over state tables; distributed, they become exactly these
semi/anti-join plans (SURVEY.md §2.B E10).

Scale notes per query are in the docstrings. All money/quantity
aggregates use the exact-decimal pattern (functions/compat.py) so
hashes match DuckDB at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import davg, dsum
from mobility_etl_spark.io import load_tables
from mobility_etl_spark.registry import register

_REVENUE = "l_extendedprice * (1.0 - l_discount)"
_DSUM_REV = f"CAST(SUM(CAST({_REVENUE} AS DECIMAL(20,6))) AS DOUBLE)"


@register(
    "q4_order_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
    tags=("E10", "E13"),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a date window having at least one
    returned lineitem, counted per priority. EXISTS compiles to a
    left-semi join — the probe side never duplicates, so the agg input
    is at most |orders| rows regardless of lineitem fan-out. The date
    filter pushes into the orders scan; the returnflag filter into the
    lineitem scan."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        orders.join(
            returned,
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q11_part_revenue_share",
    oracle=f"""
    WITH pr AS (
        SELECT l_partkey, {_DSUM_REV} AS revenue
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, revenue
    FROM pr
    WHERE revenue > (SELECT 0.0005 * {_DSUM_REV} FROM lineitem)
    """,
    tags=("E13", "E14"),
)
def q11_part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a fixed fraction of
    total revenue. The scalar subquery is one aggregated row —
    broadcast it and compare map-side; only the per-part aggregation
    shuffles. Decimal sums are associative, so per-part totals and the
    grand total agree bit-for-bit with the oracle at any partition
    count."""
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    rev = li.groupBy("l_partkey").agg(dsum(F.expr(_REVENUE), "revenue"))
    total = li.agg(dsum(F.expr(_REVENUE), "total"))
    return (
        rev.join(F.broadcast(total))
        .filter(F.col("revenue") > 0.0005 * F.col("total"))
        .select("l_partkey", "revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
          SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(20,6)))
                             AS DOUBLE) / COUNT(l2.l_quantity))
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("E10", "E13"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-half-average-quantity
    lineitems of one brand. The correlated AVG decorrelates to a
    per-part aggregate joined back; filtering to the brand's partkeys
    FIRST (broadcast — one brand is ~1/25 of part) keeps both the agg
    and the join-back proportional to the brand's rows, not all of
    lineitem. The avg restricted to brand parts equals the correlated
    avg for those parts, so semantics are unchanged."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    brand_parts = (
        t["part"].filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    )
    li_b = t["lineitem"].join(
        F.broadcast(brand_parts),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    avg_q = li_b.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        davg("l_quantity", "avg_qty")
    )
    return (
        li_b.join(
            F.broadcast(avg_q), F.col("l_partkey") == F.col("ap_partkey")
        )
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(dsum("l_extendedprice", "s"))
        .select((F.col("s") / 7.0).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
                   AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) > 150.0
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    tags=("E9", "E13"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose lineitem quantity total clears a
    threshold, joined back to orders+customer. The HAVING survivor set
    is a small fraction of orders — broadcast IT against the facts so
    neither orders nor customer shuffles. (Never broadcast the
    pre-aggregation side: at 100 TB lineitem per-order groups are
    unbounded, the survivors are not.)"""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 150.0)
    )
    return (
        t["orders"]
        .join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


@register(
    "q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE)
               / COUNT(c_acctbal) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(20,6))) AS DOUBLE)
               AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    """,
    tags=("E10", "E13"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, aggregated per nation. Two subqueries, two plans: the
    global avg is a broadcast scalar; NOT EXISTS is a left-anti join
    against the date-filtered orders keys (the filter pushes to the
    orders scan, and only distinct custkeys matter — anti joins don't
    duplicate, so no pre-distinct is needed)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal", "a"))
    )
    recent = t["orders"].filter(F.col("o_orderdate") >= "2000-01-01")
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


@register(
    "recursive_tree_rollup",
    oracle="""
    WITH RECURSIVE tree(node, root, depth) AS (
        SELECT doc_id, doc_id, 0
        FROM documents WHERE doc_id >= 1 AND doc_id < 4
        UNION ALL
        SELECT d.doc_id, t.root, t.depth + 1
        FROM documents d
        JOIN tree t ON d.doc_id // 4 = t.node
        WHERE d.doc_id >= 4 AND d.doc_id < 256
    )
    SELECT root,
           COUNT(*) AS n_nodes,
           MAX(depth) AS max_depth,
           CAST(SUM(node) AS BIGINT) AS sum_ids
    FROM tree
    GROUP BY root
    """,
    tags=("E13", "E22"),
)
def recursive_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark-4 WITH RECURSIVE) walking a synthetic
    doc-id quad-tree (parent = id div 4) from its 3 roots and rolling
    up per-root subtree stats — the declarative fixpoint form. Spark
    supports UNION ALL recursion (terminating here because the
    hierarchy is a tree); cyclic closures (dedup clusters) stay on the
    iterative DataFrame fixpoint with lineage truncation
    (operators/components.py), which is also the 100 TB-preferred
    shape: each round is an explicit join the optimizer and AQE can
    re-plan, with checkpointing under engine control."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    view = "rc_docs_tree"
    docs.select("doc_id").createOrReplaceTempView(view)
    return spark.sql(f"""
        WITH RECURSIVE tree(node, root, depth) AS (
            SELECT doc_id, doc_id, 0
            FROM {view} WHERE doc_id >= 1 AND doc_id < 4
            UNION ALL
            SELECT d.doc_id, t.root, t.depth + 1
            FROM {view} d
            JOIN tree t ON d.doc_id DIV 4 = t.node
            WHERE d.doc_id >= 4 AND d.doc_id < 256
        )
        SELECT root,
               COUNT(*) AS n_nodes,
               MAX(depth) AS max_depth,
               CAST(SUM(node) AS BIGINT) AS sum_ids
        FROM tree
        GROUP BY root
    """)


@register(
    "subquery_lateral_topk",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_custkey, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    """,
    tags=("E10", "E21"),
)
def subquery_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    SQL-native top-N-per-group form (Spark 4 lateral join), vs the
    window-rank formulation already gated in `topk_per_group_parts`.
    Catalyst decorrelates this into the same window/partial-topk plan
    a hand-written rank filter gets; deterministic (acctbal, custkey)
    ordering makes the pick hash-exact. Verifies the engine's
    decorrelation path — at scale this matters because a naive
    per-outer-row re-execution would be a nested loop over the
    dimension."""
    tables = load_tables(spark, sf_dir, "nation", "customer")
    tables["nation"].createOrReplaceTempView("sq_lat_nation")
    tables["customer"].createOrReplaceTempView("sq_lat_customer")
    return spark.sql("""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM sq_lat_nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM sq_lat_customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
    """)
