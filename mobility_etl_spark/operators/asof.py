"""As-of (nearest-observation) join — SURVEY.md §2.B E12.

Why it exists: the reference stores weather hourly (reference
dags/warsaw-weather.py:21) while delays are stamped intra-hour
(dags/warsaw-delays.py:186); joining them on the exact hour loses
precision, so the real semantic is "most recent observation at or
before t per key". Spark has no asof-join primitive (pandas-on-Spark's
merge_asof exists but pins partitioning); DuckDB has ASOF JOIN, which
is the oracle.

Implementation — the union-tag trick, chosen for scale:

1. tag right rows 0, left rows 1; union by name,
2. one hash-partition shuffle on the key, sort within partitions by
   (ts, tag) so a right row at ts == left ts sorts first (inclusive
   `left.ts >= right.ts` semantics, matching DuckDB ASOF),
3. `last(value, ignorenulls=True)` over rows UNBOUNDED PRECEDING..CURRENT
   carries the latest right-side payload forward,
4. keep only left rows.

Cost: exactly ONE shuffle of (|L|+|R|) rows by key — the same price as
a plain equi join, no range-explosion, no per-key driver loop. Skewed
keys are handled by AQE; at 100 TB both sides usually arrive already
bucketed by key and the shuffle is elided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, latest right row with
    ``right_ts <= left_ts`` per ``on`` key (ties on ts: right wins, i.e.
    inclusive). Right should be unique per (on, right_ts); pre-aggregate
    if not, or the carried payload is the last within the duplicate ts.

    ``tolerance_s`` bounds STALENESS (pandas merge_asof's ``tolerance``
    semantics): a match older than ``tolerance_s`` seconds is treated
    as no match and the carried columns are NULL — the correctness
    guard for sensor/market feeds where an hours-old observation must
    not silently impute the present. Applied as a projection-time
    null-out AFTER the single-shuffle fill, so the plan is unchanged
    (both ts columns must be timestamps for the seconds arithmetic).

    Returns all left columns plus ``<payload>_asof`` columns (and
    ``<right_ts>_asof``), NULL when no prior observation exists.
    """
    carried = [right_ts, *payload_cols]
    right_types = dict(right.dtypes)
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__carry_{c}") for c in carried],
    )
    left_cols = left.columns
    tagged_left = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right_types[c]).alias(f"__carry_{c}") for c in carried],
    )
    unioned = tagged_left.unionByName(tagged_right, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"__carry_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in carried
        ],
    )
    out = filled.filter(F.col("__tag") == 1)
    if tolerance_s is not None:
        # Compare in MICROSECONDS on both sides (unix_micros), never in
        # second-truncated longs: a cast-to-long truncation can admit a
        # match up to ~1s staler than the budget whenever the sub-second
        # parts straddle a boundary, silently diverging from pandas
        # merge_asof ``tolerance`` semantics (and from any exact-epoch
        # oracle).  tolerance_s may be fractional; the product below is
        # computed in Python so 0.5 s -> 500_000 us exactly.
        within = (
            F.unix_micros(F.col(left_ts).cast("timestamp"))
            - F.unix_micros(F.col(f"{right_ts}{suffix}").cast("timestamp"))
            <= int(tolerance_s * 1_000_000)
        )
        out = out.select(
            *left_cols,
            "__ts",
            *[
                F.when(within, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in carried
            ],
        )
    return out.select(*left_cols, *[f"{c}{suffix}" for c in carried])
