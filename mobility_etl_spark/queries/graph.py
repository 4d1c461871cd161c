"""Graph queries: iterative fixpoint algorithms over edge lists.

Connected components (operators/components.py, registered in
queries/dedup.py) covers the undirected-closure case; this module
covers weighted importance — PageRank over the bipartite
part<->supplier graph implied by lineitem (the same association the
reference's GTFS star implies between routes and trips,
SURVEY.md §2.B). Iterative loops are the one non-SQL-expressible
class the driver checks rows-only; the numeric gate lives in
tests/test_graph.py against a NumPy power-iteration oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.pagerank import pagerank, pagerank_fixedpoint
from mobility_etl_spark.registry import register


@register(
    "pagerank_part_supplier",
    oracle=None,  # iterative fixpoint; NumPy parity gate in tests/test_graph.py
    tags=("N1", "E12"),
)
def pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on the bipartite part<->supplier graph (edges both
    directions, so mass flows between the two node classes and no
    node dangles). 8 iterations, damping 0.85 — enough to separate
    hub suppliers from the uniform prior. Rows-only: per-node double
    ranks are order-of-addition dependent; tests/test_graph.py pins
    them to a NumPy power iteration within 1e-9."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    fwd = pairs.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(edges, iters=8)


#: Fixed-point scale for the deterministic PageRank face: ranks are
#: BIGINTs in units of 1e-12 — see operators/pagerank.pagerank_fixedpoint.
_PR_SCALE = 10**12
_PR_ITERS = 8


@register(
    "pagerank_fixedpoint_exact",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    fwd AS (
        SELECT 'p' || l_partkey AS src, 's' || l_suppkey AS dst FROM pairs
    ),
    edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    params AS (SELECT COUNT(*) AS n FROM nodes),
    pr(it, node, r) AS (
        SELECT 0, node, CAST({_PR_SCALE} // n AS BIGINT)
        FROM nodes, params
        UNION ALL
        SELECT c.it + 1, c.dst, CAST(
            (15 * {_PR_SCALE} // (100 * (SELECT n FROM params)))
            + (85 * c.s) // 100 AS BIGINT)
        FROM (
            SELECT e.dst, p.it AS it, SUM(p.r // d.deg) AS s
            FROM pr p
            JOIN edges e ON e.src = p.node
            JOIN deg d ON d.src = p.node
            WHERE p.it < {_PR_ITERS}
            GROUP BY e.dst, p.it
        ) c
    )
    SELECT node, r AS rank_fp FROM pr WHERE it = {_PR_ITERS}
    ORDER BY node
    """,
    tags=("N17", "N9"),
)
def pagerank_fixedpoint_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank on the same bipartite part<->supplier graph as
    pagerank_part_supplier, but in scaled-integer fixed-point
    arithmetic (operators/pagerank.pagerank_fixedpoint): every
    contribution sum is exact and commutative, so the ranks are
    BIT-IDENTICAL on any partitioning, any executor count, any engine
    — the reproducibility property a training-data pipeline needs
    when a rank threshold decides what enters the corpus. That
    determinism is what upgrades the iterative-fixpoint family from
    rows-only to a STRICT DuckDB hash-match: the oracle replays all
    {_PR_ITERS} power iterations as a recursive CTE in the same
    integer semantics. (Bidirectional bipartite edges -> no dangling
    nodes; the operator's integer dangling path is covered in
    tests/test_graph.py.)"""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    fwd = pairs.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank_fixedpoint(edges, iters=_PR_ITERS, scale=_PR_SCALE).orderBy(
        "node"
    )
