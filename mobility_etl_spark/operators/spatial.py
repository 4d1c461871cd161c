"""Spatial grid join (the mobility-domain operator the reference's
data begs for: GTFS stops × stops / stops × stations proximity —
reference stops.txt carries stop_lat/stop_lon, dags/warsaw-gtfs.py:30).

Scale shape — the standard distributed spatial-join pattern:

1. **Grid bucketing**: each point hashes to an integer cell
   (floor(lat/cell), floor(lon/cell)) sized so the search radius never
   spans more than adjacent cells.
2. **Neighbor fan-out on ONE side**: the left side explodes to its
   3×3 neighborhood (9 rows), the right side stays single-cell; the
   equi-join on the cell key then sees every pair within radius
   exactly once — a shuffle join on small integer keys, NEVER a cross
   join. Fan-out factor 9 beats the O(n²) alternative by the ratio of
   table size to cell population.
3. **In-cell refine**: exact great-circle distance on the candidate
   pairs only; a<b dedup keeps each unordered pair once.

Distances are emitted 1e-6-meter fixed-point (floor) so results
hash-match across engines despite libm/JVM trig ulp differences —
the same technique as text_unigram_logprob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Earth mean radius in meters (IUGG), the constant DuckDB examples use.
EARTH_R = 6371008.8


def haversine_m(lat_a, lon_a, lat_b, lon_b) -> F.Column:
    """Great-circle distance in meters between two (deg, deg) points.

    Classic haversine: identical IEEE op sequence on both engines
    (radians → sin/cos → asin of the root), written once here and
    mirrored literally in SQL oracles.
    """
    rla, rlb = F.radians(lat_a), F.radians(lat_b)
    dlat = F.radians(lat_b) - F.radians(lat_a)
    dlon = F.radians(lon_b) - F.radians(lon_a)
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rla) * F.cos(rlb) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * EARTH_R) * F.asin(F.sqrt(h))


def sql_haversine_m(lat_a: str, lon_a: str, lat_b: str, lon_b: str) -> str:
    """Oracle-side rendering of :func:`haversine_m` (same op order)."""
    return (
        f"2.0 * {EARTH_R} * asin(sqrt("
        f"pow(sin((radians({lat_b}) - radians({lat_a})) / 2), 2)"
        f" + cos(radians({lat_a})) * cos(radians({lat_b}))"
        f" * pow(sin((radians({lon_b}) - radians({lon_a})) / 2), 2)))"
    )


def grid_neighbor_pairs(
    points: DataFrame,
    key_col: str,
    lat_col: str,
    lon_col: str,
    radius_m: float,
    cell_deg: float = 0.01,
) -> DataFrame:
    """All unordered point pairs within ``radius_m`` meters, via the
    grid join above. ``cell_deg`` must be ≥ the radius in degrees at
    the data's latitude (0.01° ≈ 1.1 km N-S; callers with a larger
    radius pass a larger cell). Output: (key_a, key_b, dist_fx) with
    key_a < key_b and dist_fx = floor(meters · 1e6) as BIGINT.
    """
    cx = F.floor(F.col(lon_col) / cell_deg).cast("long")
    cy = F.floor(F.col(lat_col) / cell_deg).cast("long")

    right = points.select(
        F.col(key_col).alias("key_b"),
        F.col(lat_col).alias("__blat"),
        F.col(lon_col).alias("__blon"),
        cx.alias("cx"),
        cy.alias("cy"),
    )
    offsets = F.expr(
        "explode(transform(sequence(0, 8),"
        " i -> struct(i div 3 - 1 AS dx, i % 3 - 1 AS dy)))"
    )
    left = points.select(
        F.col(key_col).alias("key_a"),
        F.col(lat_col).alias("__alat"),
        F.col(lon_col).alias("__alon"),
        cx.alias("__cx0"),
        cy.alias("__cy0"),
        offsets.alias("o"),
    ).select(
        "key_a",
        "__alat",
        "__alon",
        (F.col("__cx0") + F.col("o.dx")).alias("cx"),
        (F.col("__cy0") + F.col("o.dy")).alias("cy"),
    )
    dist = haversine_m(
        F.col("__alat"), F.col("__alon"), F.col("__blat"), F.col("__blon")
    )
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.floor(dist * 1e6).cast("long").alias("dist_fx"),
        )
        .filter(F.col("dist_fx") <= int(radius_m * 1e6))
    )
