"""Incremental rollup maintenance: keep an aggregate table fresh by
merging the delta's partial aggregates instead of recomputing from
the full history.

The reference re-lands every snapshot whole (overwrite-latest, R7);
at 100 TB a daily "mean delay per route per hour" rollup cannot
re-scan the lake. The standard fix: store MERGEABLE partials —
counts and exact decimal sums (never averages: a mean of means is
wrong under unequal group sizes) — then

    merged = reaggregate(base_partials ∪ delta_partials)

which touches only |base rollup| + |delta| rows. Derived measures
(avg = sum/n) are computed at read time from the partials. Because
the sums are exact decimals (functions/compat.py), merge order is
irrelevant and ``merge(base, delta) == full_recompute`` holds
bit-for-bit — which is exactly what the registered oracle query
checks against DuckDB's full recompute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import DEC


def partial_rollup(
    df: DataFrame, keys: list[str], value: Column | str
) -> DataFrame:
    """Mergeable partial aggregate: keys + n + exact decimal sum."""
    value = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(value.cast(DEC)).alias("sum_value"),
    )


def merge_rollups(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial rollups: union + re-sum (counts add, exact
    decimal sums add associatively — order never matters)."""
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
        )
    )


def finalize_rollup(rollup: DataFrame) -> DataFrame:
    """Read-time derived measures from the mergeable partials."""
    return rollup.select(
        *[c for c in rollup.columns if c not in ("n", "sum_value")],
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        (F.col("sum_value").cast("double") / F.col("n")).alias("avg_value"),
    )
