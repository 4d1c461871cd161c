"""Spatial queries (operators/spatial.py): the proximity analyses the
reference's GTFS geometry columns exist for (stops.txt stop_lat /
stop_lon, reference dags/warsaw-gtfs.py:30; shapes.txt polylines).

The stop field is synthesized closed-form from ``spark.range`` (the
driver tables carry no coordinates), mirrored exactly by the oracle's
``generate_series`` — the streaming_pyds_weather pattern. Names sort
past "m" (driver-window rule, VERDICT r02 #3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mobility_etl_spark.operators.spatial import (
    grid_neighbor_pairs,
    sql_haversine_m,
)
from mobility_etl_spark.registry import register

N_STOPS = 1000
RADIUS_M = 400.0
CELL_DEG = 0.01

#: Closed-form pseudo-Warsaw stop field: lat 52.1..52.3, lon 20.9..21.3.
_LAT = "52.1 + ((id * 7919) % 1000) / 5000.0"
_LON = "20.9 + ((id * 104729) % 1000) / 2500.0"


def _stops(spark: SparkSession) -> DataFrame:
    return spark.range(N_STOPS).select(
        F.col("id").alias("stop_id"),
        F.expr(_LAT).alias("lat"),
        F.expr(_LON).alias("lon"),
    )


@register(
    "spatial_grid_join",
    oracle=f"""
    WITH p AS (
        SELECT CAST(i AS BIGINT) AS id,
               52.1 + ((i * 7919) % 1000) / 5000.0 AS lat,
               20.9 + ((i * 104729) % 1000) / 2500.0 AS lon
        FROM generate_series(0, {N_STOPS - 1}) s(i)
    ),
    cells AS (
        SELECT id, lat, lon,
               CAST(FLOOR(lon / {CELL_DEG}) AS BIGINT) AS cx,
               CAST(FLOOR(lat / {CELL_DEG}) AS BIGINT) AS cy
        FROM p
    ),
    offs AS (
        SELECT a.dx, b.dy
        FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
             (SELECT unnest([-1, 0, 1]) AS dy) b
    )
    SELECT a.id AS key_a, b.id AS key_b,
           CAST(FLOOR(
               {sql_haversine_m("a.lat", "a.lon", "b.lat", "b.lon")}
               * 1000000.0) AS BIGINT) AS dist_fx
    FROM cells a
    CROSS JOIN offs
    JOIN cells b ON b.cx = a.cx + offs.dx AND b.cy = a.cy + offs.dy
               AND a.id < b.id
    WHERE CAST(FLOOR(
              {sql_haversine_m("a.lat", "a.lon", "b.lat", "b.lon")}
              * 1000000.0) AS BIGINT) <= {int(RADIUS_M * 1e6)}
    """,
    tags=("E11", "N6"),
)
def spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All stop pairs within {RADIUS_M:.0f} m via grid bucketing + 3×3
    neighbor fan-out + in-cell haversine refine — the distributed
    spatial join that replaces an O(n²) cross join with an equi-join
    on integer cell keys (fan-out 9, shuffle keys 16 bytes). Distances
    are 1e-6-meter fixed-point so JVM/libm trig ulp differences cannot
    break the hash. At 100 TB the same plan holds: cells are the
    shuffle key, density bounds the per-cell candidate count."""
    return grid_neighbor_pairs(
        _stops(spark), "stop_id", "lat", "lon", RADIUS_M, CELL_DEG
    )


_KNN_K = 3


@register(
    "spatial_knn_bounded",
    oracle=f"""
    WITH p AS (
        SELECT CAST(i AS BIGINT) AS id,
               52.1 + ((i * 7919) % 1000) / 5000.0 AS lat,
               20.9 + ((i * 104729) % 1000) / 2500.0 AS lon
        FROM generate_series(0, {N_STOPS - 1}) s(i)
    ),
    pairs AS (
        SELECT a.id AS src, b.id AS nbr,
               CAST(FLOOR(
                   {sql_haversine_m("a.lat", "a.lon", "b.lat", "b.lon")}
                   * 1000000.0) AS BIGINT) AS dist_fx
        FROM p a JOIN p b ON a.id != b.id
    ),
    ranked AS (
        SELECT src, nbr, dist_fx,
               ROW_NUMBER() OVER (PARTITION BY src
                   ORDER BY dist_fx, nbr) AS rnk
        FROM pairs WHERE dist_fx <= {int(RADIUS_M * 1e6)}
    )
    SELECT src, nbr, dist_fx, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {_KNN_K}
    """,
    tags=("E11", "N6"),
)
def spatial_knn_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-bounded k-nearest-neighbors (k={_KNN_K}, radius
    {RADIUS_M:.0f} m) — the geo analogue of a vector range+top-k
    query, and exactly what a grid join CAN answer provably: with
    cell size >= radius, every within-radius neighbor sits in the 3×3
    neighborhood, so ranking the grid join's candidates per source IS
    the exact bounded kNN (an unbounded kNN would need expanding-ring
    probes — semantics vector stores avoid for the same reason). The
    oracle is the quadratic all-pairs formulation. Spark side reuses
    grid_neighbor_pairs (equi-join on cell keys, never a cross join),
    symmetrizes the a<b pairs, and takes one row_number window per
    source with a deterministic (dist, neighbor-id) tie-break. At
    100 TB: candidates are cell-local, the final window partitions by
    source — both shuffles are on small integer keys."""
    pairs = grid_neighbor_pairs(
        _stops(spark), "stop_id", "lat", "lon", RADIUS_M, CELL_DEG
    )
    sym = pairs.select(
        F.col("key_a").alias("src"),
        F.col("key_b").alias("nbr"),
        "dist_fx",
    ).unionByName(
        pairs.select(
            F.col("key_b").alias("src"),
            F.col("key_a").alias("nbr"),
            "dist_fx",
        )
    )
    w = Window.partitionBy("src").orderBy("dist_fx", "nbr")
    return (
        sym.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _KNN_K)
        .select("src", "nbr", "dist_fx", "rnk")
    )
