"""Slowly-changing-dimension (type 2) builder: turn a stream of
per-key state observations into a validity-interval history.

The reference lands hourly state snapshots (delays per route,
dags/warsaw-delays.py:194; weather per station,
dags/warsaw-weather.py:21) and keeps only "latest" semantics via
overwrite (R7). The queryable form a warehouse needs is the SCD2
history: one row per (key, state-run) with ``valid_from``/``valid_to``
bounds — "what was route 175's delay state at 14:37?" becomes a range
lookup instead of a scan over raw snapshots.

Implementation is two window passes over ``(key, order)``:
1. ``lag(state)`` marks change points (first observation counts),
2. after dropping unchanged rows, ``lead(valid_from)`` closes each
   interval; the open interval (``valid_to IS NULL``) is current.

Scale: both windows share one hash-partitioning on the key, so the
whole build is a single shuffle; no state is held beyond one
partition's sort run. Ordering must be made total (pass a tiebreak
column) or runs at identical timestamps would be engine-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_observations(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse consecutive equal states per key into SCD2 intervals.

    Returns ``(key, state, valid_from, valid_to, is_current)`` where
    ``valid_to`` is the next state's start (NULL while current).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        df.withColumn("__prev_state", F.lag(state_col).over(w))
        .filter(
            F.col("__prev_state").isNull()
            | (F.col(state_col) != F.col("__prev_state"))
        )
        .drop("__prev_state")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
