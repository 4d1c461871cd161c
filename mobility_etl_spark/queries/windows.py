"""Window-function operators (SURVEY.md §2.B E17–E19 + session windows).

Scope justification: "worst-delayed route per hour" and
latest-snapshot-per-key (the reference's overwrite-latest hash marker,
R7, reference dags/warsaw-gtfs.py:73-80) are ranking windows; delay
deltas between consecutive hourly snapshots (dags/warsaw-delays.py:194
cadence) are lag/lead; smoothing hourly series is a frame-spec moving
average. Every window here orders by a unique tiebreaker column so
results are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import DEC
from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register


@register(
    "window_rank_orders",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rk,
           DENSE_RANK() OVER w AS drk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    QUALIFY rn <= 3
    """,
    tags=("E17",),
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value: row_number/rank/dense_rank
    (latest-snapshot-per-key, the R7 overwrite-latest semantic)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_lag_events",
    oracle="""
    SELECT event_id,
           user_id,
           ts,
           value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           value - LAG(value) OVER w AS delta,
           FIRST_VALUE(event_type) OVER w AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("E18",),
)
def window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first per user ordered by time (delay deltas between
    consecutive snapshots). delta is per-row double arithmetic — exact."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.first("event_type").over(w).alias("first_type"),
    )


@register(
    "window_moving_avg",
    oracle=f"""
    SELECT event_id,
           user_id,
           ts,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER w AS DOUBLE)
             / COUNT(value) OVER w AS moving_avg_4
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tags=("E19",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec moving average over the last 4 observations per user
    (hourly-series smoothing, E19). Decimal-cast inside the frame sum so
    sliding-frame accumulation order can't perturb the result."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    moving = F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count(
        "value"
    ).over(w)
    return events.select(
        "event_id", "user_id", "ts", moving.alias("moving_avg_4")
    )


@register(
    "session_window_events",
    oracle="""
    WITH marks AS (
        SELECT user_id, ts, value,
               CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                      OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marks
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("E33",),
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user — per-vehicle delay episodes
    (SURVEY.md §2.B E33) via the built-in session_window, proven against
    a gaps-and-islands SQL oracle. Also used by the streaming variant
    (streaming/jobs.py) where state eviction is watermark-bounded."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sw"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "window_range_frame_events",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS hour_sum,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS hour_n
    FROM events WHERE user_id < 500
    """,
    tags=("E19", "E17"),
)
def window_range_frame_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (vs window_moving_avg's row frame): per
    user, the trailing-1-hour sum/count at every event — value-based
    frame bounds, so tied timestamps are peers and gaps shrink the
    frame, which a ROWS frame can't express. Spark's rangeBetween
    needs a numeric ordering key: epoch seconds, with [-3600, 0]
    inclusive == the oracle's INTERVAL form. One shuffle on user_id,
    no self-join — the naive equivalent is an O(n^2) range self-join."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 500)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("hour_sum"),
        F.count("*").over(w).alias("hour_n"),
    )


@register(
    "window_ignore_nulls_events",
    oracle="""
    WITH t AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_id % 3 = 0 THEN value END AS v
        FROM events WHERE event_id < 5000
    )
    SELECT event_id, user_id, v,
           lag(v IGNORE NULLS) OVER w AS prev_obs,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS carried
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("E18", "E19"),
)
def window_ignore_nulls_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation: lag to the previous NON-NULL
    observation and a running last-observation-carried-forward — the
    sparse-sensor shape (two of three readings missing) that plain
    lag/last_value cannot express without a second pass. Total
    ordering via the event_id tiebreak keeps both engines exact."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 5000
    )
    t = events.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 3 == 0, F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t.select(
        "event_id",
        "user_id",
        "v",
        F.expr("lag(v) IGNORE NULLS").over(w).alias("prev_obs"),
        F.last("v", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("carried"),
    )


@register(
    "window_rolling_median_events",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, ts,
               CAST(FLOOR(COALESCE(value, 0) * 1000000.0) AS BIGINT)
                   AS vfx
        FROM events
    )
    SELECT event_id, user_id,
           CAST(FLOOR(2 * median(vfx) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW
           )) AS BIGINT) AS med2_fx
    FROM base
    """,
    tags=("E19", "E13"),
)
def window_rolling_median_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over a trailing 6-row frame — Spark's window
    surface has no MEDIAN/PERCENTILE OVER, so the face closes it with
    sort_array(collect_list(...)) over the identical frame and exact
    middle-element selection; the oracle runs DuckDB's NATIVE windowed
    median. Exactness: the output is TWICE the median (sum of the two
    middle elements, or double the single middle), which is always an
    integer of fixed-point values — and 2·((a+b)/2) is exact in IEEE
    doubles (the /2 only decrements the exponent), so the native
    median side floors to the same BIGINT. Frame size is a constant,
    so the per-row array is O(1) and the plan is one window shuffle on
    the series key — the same cost envelope as any frame aggregate;
    an unbounded rolling median would need the two-heap pattern in
    applyInPandas instead."""
    base = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1e6)
        .cast("long")
        .alias("vfx"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-5, 0)
    )
    arr = F.sort_array(F.collect_list("vfx").over(w))
    n = F.size(arr)
    med2 = F.element_at(arr, ((n + 1) / 2).cast("int")) + F.element_at(
        arr, (n / 2).cast("int") + 1
    )
    return base.select(
        "event_id", "user_id", med2.alias("med2_fx")
    )
