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
from mobility_etl_spark.operators.pagerank import pagerank
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
