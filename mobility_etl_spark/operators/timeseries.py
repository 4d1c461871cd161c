"""Time-series regularization: date-spine gap fill + forward fill.

Sensor/telemetry feeds (the reference's hourly weather and delay
snapshots, dags/warsaw-weather.py / warsaw-delays.py) skip intervals —
scrapes fail, vehicles go dark — but downstream consumers (rollups,
feature windows, model training) need a REGULAR grid. The engine-
native decomposition:

1. spine: one row per (entity x period) from a `sequence()` explode
   of the global [min, max] — generated, not scanned, so the spine
   costs |entities| x |periods| rows and zero input I/O;
2. grid: spine ⟕ observed periods (the nulls ARE the gaps, kept as
   an explicit ``is_gap`` flag — silently fabricated data is how
   training sets rot);
3. fill: ``last(value, ignorenulls)`` over an unbounded-preceding row
   window per entity — one shuffle on the entity key, which the
   grid join already established, so AQE coalesces the exchange.

Leading gaps (before an entity's first observation) stay NULL: there
is nothing true to carry forward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_forward(
    observed: DataFrame,
    entity_col: str,
    date_col: str,
    value_cols: list[str],
    spine: DataFrame,
) -> DataFrame:
    """Regularize ``observed`` (one row per entity x date with gaps)
    onto ``spine`` (columns: ``entity_col``, ``date_col`` — the full
    grid), forward-filling each of ``value_cols`` per entity in date
    order. Adds ``is_gap`` marking fabricated rows."""
    grid = spine.join(observed, [entity_col, date_col], "left")
    w = (
        Window.partitionBy(entity_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gap = F.col(value_cols[0]).isNull()
    return grid.select(
        entity_col,
        date_col,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        gap.alias("is_gap"),
    )


def date_spine(df: DataFrame, entity_col: str, ts_col: str) -> DataFrame:
    """Full (entity x day) grid spanning the GLOBAL [min, max] of
    ``ts_col``: a two-row agg cross-joined with the distinct entities,
    then a generated `sequence()` explode — no re-scan of the fact
    table beyond the bounds agg."""
    bounds = df.agg(
        F.to_date(F.min(ts_col)).alias("lo"), F.to_date(F.max(ts_col)).alias("hi")
    )
    entities = df.select(entity_col).distinct()
    return (
        entities.crossJoin(F.broadcast(bounds))
        .select(
            entity_col,
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d"),
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_cols: tuple[str, ...] = (),
    seq_col: str = "session_seq",
) -> DataFrame:
    """Assign stable session ids by the gaps-and-islands method.

    Adds ``seq_col``: a 1-based per-key session index that is a pure
    function of the data — a row starts a new session iff it is the
    key's first observation or follows the previous one by at least
    ``gap_seconds``. Downstream joins (attribution, per-session
    features) can key on (key, seq) across reruns and repartitionings.

    Ordering within a key is (ts, *order_cols); pass a unique
    tiebreaker (an event id) when timestamps can collide, otherwise
    session numbering is nondeterministic under ties.

    Scale: the lag window and the running sum share one hash
    partitioning on ``key_col`` — a single Exchange (plan-gated via
    the ``sessionize_events_ids`` face). Per-row state is O(1).
    """
    # marker name derives from seq_col so a caller column can never be
    # silently clobbered; collide explicitly instead of dropping data
    marker = f"__{seq_col}_boundary"
    if marker in df.columns or seq_col in df.columns:
        raise ValueError(
            f"sessionize: input already has a {seq_col!r}/{marker!r} column"
        )
    order = [ts_col, *order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    marks = df.withColumn(
        marker,
        F.when(
            gap.isNull() | (gap >= gap_seconds * 1_000_000), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    return marks.withColumn(
        seq_col,
        F.sum(marker).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop(marker)
