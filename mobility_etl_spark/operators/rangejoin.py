"""Bounded-interval (range) join: pair rows whose timestamps fall
within ± tolerance of each other (SURVEY.md §2.B E12 — the
delays-within-the-hour ⋈ weather-nearby shape that an exact-hour
equi join under-matches).

Spark has no native range join; a naive implementation is a cross
join with an |Δt| filter — O(n·m) and a broadcast-nested-loop plan
that cannot survive 100 TB. This operator uses the standard
bucketed-replication scheme instead:

1. bucket both sides by ``floor(ts / tolerance)``,
2. replicate the RIGHT side into its bucket and both neighbors
   (3× one side only — the smaller/probe side by convention),
3. equi-join on the bucket id (plus any extra equality keys), which
   Catalyst executes as a normal shuffled/broadcast hash join,
4. apply the exact ``|Δt| <= tolerance`` residual.

Every qualifying pair lands in exactly one bucket match (the three
replicas carry distinct bucket ids), so no dedup pass is needed. Cost
at scale: one shuffle of each side on ``(bucket, keys)`` with 3×
replication of the right side — linear, partition-prunable, and
skew-handled by AQE like any other equi join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Internal column names (prefixed to avoid user-column collisions).
_BUCKET = "__range_bucket"
_LUS = "__l_us"
_RUS = "__r_us"


def _epoch_us(col: Column) -> Column:
    """Microseconds since epoch for a TIMESTAMP/TIMESTAMP_NTZ column.

    The session timezone is UTC (session.py), so the NTZ→TZ cast is an
    identity reinterpretation and ``unix_micros`` is exact integer
    arithmetic — no float rounding (matches DuckDB ``epoch_us``).
    """
    return F.unix_micros(col.cast("timestamp"))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_us: int,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join rows with ``|left_ts - right_ts| <= tolerance_us``.

    ``on`` adds equality keys (joined alongside the time bucket).
    ``how`` may be ``"inner"`` or ``"left"`` (left keeps unmatched
    left rows with NULL right columns, exactly once each).
    Right-side column names must not collide with left's.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    on = list(on or [])
    lb = left.withColumn(_LUS, _epoch_us(F.col(left_ts))).withColumn(
        _BUCKET, F.expr(f"{_LUS} div {tolerance_us}")
    )
    rb = (
        right.withColumn(_RUS, _epoch_us(F.col(right_ts)))
        .withColumn("__b0", F.expr(f"{_RUS} div {tolerance_us}"))
        .withColumn(
            _BUCKET,
            F.explode(F.expr("array(__b0 - 1L, __b0, __b0 + 1L)")),
        )
        .drop("__b0")
    )
    cond = F.col(f"l.{_BUCKET}") == F.col(f"r.{_BUCKET}")
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    cond = cond & (
        F.abs(F.col(f"l.{_LUS}") - F.col(f"r.{_RUS}")) <= F.lit(tolerance_us)
    )
    joined = lb.alias("l").join(rb.alias("r"), cond, how)
    drop = [f"l.{_LUS}", f"l.{_BUCKET}", f"r.{_RUS}", f"r.{_BUCKET}"] + [
        f"r.{k}" for k in on
    ]
    for c in drop:
        joined = joined.drop(F.col(c))
    return joined
