"""Spatial grid-join gates: completeness vs an exact all-pairs
baseline (the DuckDB oracle shares the grid structure, so it cannot
catch a pair the grid drops — this test can)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobility_etl_spark.operators.spatial import (
    grid_neighbor_pairs,
    haversine_m,
)
from mobility_etl_spark.queries.spatial import CELL_DEG, RADIUS_M, _stops


def _exact_pairs(spark, stops, radius_m):
    a = stops.select(
        F.col("stop_id").alias("key_a"),
        F.col("lat").alias("alat"),
        F.col("lon").alias("alon"),
    )
    b = stops.select(
        F.col("stop_id").alias("key_b"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
    )
    d = haversine_m(F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select(
            "key_a", "key_b", F.floor(d * 1e6).cast("long").alias("dist_fx")
        )
        .filter(F.col("dist_fx") <= int(radius_m * 1e6))
    )


def test_grid_join_matches_all_pairs_exactly(spark):
    stops = _stops(spark).localCheckpoint(eager=True)
    grid = {
        (r.key_a, r.key_b): r.dist_fx
        for r in grid_neighbor_pairs(
            stops, "stop_id", "lat", "lon", RADIUS_M, CELL_DEG
        ).collect()
    }
    exact = {
        (r.key_a, r.key_b): r.dist_fx
        for r in _exact_pairs(spark, stops, RADIUS_M).collect()
    }
    assert len(exact) > 100  # the field is dense enough to mean something
    assert grid == exact  # no missed pairs, no false pairs, same distances


def test_grid_join_no_cartesian_in_plan(spark):
    stops = _stops(spark)
    plan = grid_neighbor_pairs(
        stops, "stop_id", "lat", "lon", RADIUS_M, CELL_DEG
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
