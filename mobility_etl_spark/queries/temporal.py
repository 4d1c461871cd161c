"""Round-5 temporal faces: overlapping-interval coalescing (the
coverage/uptime-span operator), per-series linear interpolation (the
resampling step forward-fill can't express), and SQL's GROUPS window
frame re-expressed on Spark's window surface (which has no GROUPS
mode — the same surface-closure move as
window_distinct_rolling_users).

All names sort after "minhash_near_dup" (driver-window rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register


@register(
    "temporal_interval_coalesce",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
               CAST(FLOOR(epoch(ts)) AS BIGINT) + (event_id % 7 + 1) * 300 AS e
        FROM events
    ),
    flags AS (
        SELECT user_id, event_id, s, e,
               CASE WHEN s <= MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 0 ELSE 1 END AS brk
        FROM iv
    ),
    spans AS (
        SELECT user_id, s, e,
               SUM(brk) OVER (PARTITION BY user_id
                              ORDER BY s, e, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS span_id
        FROM flags
    )
    SELECT user_id,
           MIN(s) AS span_start_s,
           MAX(e) AS span_end_s,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM spans GROUP BY user_id, span_id
    """,
    tags=("E12", "E19", "N14"),
)
def temporal_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping/touching per-user time intervals into maximal
    covered spans — the operator behind uptime computation, session
    coverage, and on-call overlap audits. Each event opens an interval
    [ts, ts + (event_id%7+1)·5min]; a span breaks exactly where an
    interval starts after the running max end of all earlier intervals
    (cummax gaps-and-islands, the order-correct formulation that
    handles intervals NESTED inside earlier ones — a plain lag(e)
    comparison gets those wrong). All arithmetic is integer epoch
    seconds; the only shuffle is the per-user window partition, and
    span aggregation reuses the same partitioning. Deterministic
    tie-break (s, e, event_id) so both engines walk rows identically.
    """
    iv = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("s"),
        (
            F.unix_timestamp("ts")
            + (F.col("event_id") % 7 + 1) * 300
        ).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    flags = iv.withColumn(
        "brk",
        F.when(
            F.col("s")
            <= F.max("e").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    w2 = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    spans = flags.withColumn(
        "span_id",
        F.sum("brk").over(w2.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return spans.groupBy("user_id", "span_id").agg(
        F.min("s").alias("span_start_s"),
        F.max("e").alias("span_end_s"),
        F.count("*").alias("n_intervals"),
    ).select("user_id", "span_start_s", "span_end_s", "n_intervals")


@register(
    "timeseries_interpolate_linear",
    oracle="""
    WITH obs AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(FLOOR(COALESCE(value, 0) * 1000000.0)
                   AS BIGINT)) AS BIGINT) AS val_fx
        FROM events
        WHERE event_id % 3 != 0 AND user_id < 40
        GROUP BY user_id, CAST(ts AS DATE)
    ),
    spans AS (
        SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM obs GROUP BY user_id
    ),
    grid AS (
        SELECT s.user_id, CAST(u.d AS DATE) AS d
        FROM spans s, LATERAL UNNEST(generate_series(
            CAST(s.d0 AS TIMESTAMP), CAST(s.d1 AS TIMESTAMP),
            INTERVAL 1 DAY)) u(d)
    ),
    joined AS (
        SELECT g.user_id, g.d, o.val_fx FROM grid g
        LEFT JOIN obs o ON o.user_id = g.user_id AND o.d = g.d
    ),
    ctx AS (
        SELECT user_id, d, val_fx,
               LAST_VALUE(val_fx IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_fx,
               LAST_VALUE(CASE WHEN val_fx IS NOT NULL THEN d END
                   IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS prev_d,
               FIRST_VALUE(val_fx IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_fx,
               FIRST_VALUE(CASE WHEN val_fx IS NOT NULL THEN d END
                   IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS next_d
        FROM joined
    )
    SELECT user_id,
           strftime(d, '%Y-%m-%d') AS dt,
           CASE WHEN val_fx IS NOT NULL THEN val_fx
                ELSE prev_fx + CAST(FLOOR(
                    (next_fx - prev_fx)
                    * date_diff('day', prev_d, d)
                    / date_diff('day', prev_d, next_d)) AS BIGINT)
           END AS out_fx,
           CAST(CASE WHEN val_fx IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_interp
    FROM ctx
    """,
    tags=("E19", "N12"),
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing days in per-user daily series —
    the resampling step forward-fill (gap_fill_daily_user_values)
    cannot express: a gap day gets prev + (next-prev)·(elapsed/total),
    the straight line between its bracketing observations. The
    observation set is deterministically thinned (event_id % 3 != 0)
    so real gaps exist at every SF; the per-user grid spans that
    user's own [first, last] observed day, so every gap is bracketed
    and no extrapolation branch is needed. Values are 1e-6 fixed-point
    BIGINTs; the interpolated term is an exact integer product
    followed by one double division and a floor — bit-portable across
    engines. Plan shape: one groupBy, a per-user sequence() explode
    (map-side), a left join back, and two frame-bounded window passes
    over the same per-user partitioning — no global sorts, no UDFs."""
    obs = (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_id") % 3 != 0) & (F.col("user_id") < 40))
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1e6).cast(
                    "long"
                )
            ).alias("val_fx")
        )
    )
    spans = obs.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("d"),
    )
    joined = grid.join(obs, ["user_id", "d"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("val_fx").isNotNull(), F.col("d"))
    ctx = joined.select(
        "user_id",
        "d",
        "val_fx",
        F.last("val_fx", ignorenulls=True).over(wb).alias("prev_fx"),
        F.last(obs_d, ignorenulls=True).over(wb).alias("prev_d"),
        F.first("val_fx", ignorenulls=True).over(wf).alias("next_fx"),
        F.first(obs_d, ignorenulls=True).over(wf).alias("next_d"),
    )
    interp = F.col("prev_fx") + F.floor(
        (F.col("next_fx") - F.col("prev_fx"))
        * F.datediff("d", "prev_d")
        / F.datediff("next_d", "prev_d")
    ).cast("long")
    return ctx.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("dt"),
        F.when(F.col("val_fx").isNotNull(), F.col("val_fx"))
        .otherwise(interp)
        .alias("out_fx"),
        F.when(F.col("val_fx").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_interp"),
    )


@register(
    "window_groups_frame_events",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id,
               date_trunc('hour', ts) AS hb,
               CAST(FLOOR(COALESCE(value, 0) * 1000000.0) AS BIGINT)
                   AS val_fx
        FROM events
    ),
    grp AS (
        SELECT user_id, hb, CAST(SUM(val_fx) AS BIGINT) AS hsum
        FROM base GROUP BY user_id, hb
    ),
    ctx AS (
        SELECT user_id, hb,
               hsum
               + COALESCE(LAG(hsum) OVER (
                     PARTITION BY user_id ORDER BY hb), 0)
               + COALESCE(LEAD(hsum) OVER (
                     PARTITION BY user_id ORDER BY hb), 0) AS grp_sum_fx
        FROM grp
    )
    SELECT b.event_id, b.user_id,
           CAST(FLOOR(epoch(b.hb)) AS BIGINT) AS hour_s,
           c.grp_sum_fx
    FROM base b JOIN ctx c ON b.user_id = c.user_id AND b.hb = c.hb
    """,
    tags=("E19",),
)
def window_groups_frame_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL's GROUPS window frame (sum over the current hour's peer
    group plus one whole peer group either side) on an engine without
    GROUPS mode: Spark emulates it exactly with dense_rank over the
    order key followed by a RANGE frame of ±1 on that rank — peer
    groups become consecutive integers, so a rank range of 1 IS one
    peer group. The oracle derives the same semantics by a genuinely
    different route (per-group aggregation, then lag/lead neighbor
    sums joined back to the rows), so the equality is a real
    cross-formulation proof, not the same plan twice. Same per-user
    partitioning for both window passes (one shuffle); values are
    1e-6 fixed-point BIGINTs so group sums compare exactly."""
    base = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.date_trunc("hour", "ts").alias("hb"),
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1e6)
        .cast("long")
        .alias("val_fx"),
    )
    wr = Window.partitionBy("user_id").orderBy("hb")
    ranked = base.withColumn("dr", F.dense_rank().over(wr))
    wg = (
        Window.partitionBy("user_id")
        .orderBy("dr")
        .rangeBetween(-1, 1)
    )
    return ranked.select(
        "event_id",
        "user_id",
        F.unix_timestamp("hb").alias("hour_s"),
        F.sum("val_fx").over(wg).alias("grp_sum_fx"),
    )


@register(
    "temporal_overlap_join",
    oracle="""
    WITH a AS (
        SELECT user_id, event_id AS a_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS a_s,
               CAST(FLOOR(epoch(ts)) AS BIGINT) + 300 + (event_id % 240) * 60 AS a_e
        FROM events WHERE event_id % 7 = 1 AND ts IS NOT NULL
    ),
    b AS (
        SELECT user_id, event_id AS b_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS b_s,
               CAST(FLOOR(epoch(ts)) AS BIGINT) + 300 + (event_id % 240) * 60 AS b_e
        FROM events WHERE event_id % 7 = 2 AND ts IS NOT NULL
    )
    SELECT a.user_id, a_id, b_id,
           LEAST(a_e, b_e) - GREATEST(a_s, b_s) AS overlap_s
    FROM a JOIN b ON a.user_id = b.user_id
                 AND a_s <= b_e AND b_s <= a_e
    """,
    tags=("E11", "E12", "N15"),
)
def temporal_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval OVERLAP join per key — the temporal-join shape
    behind concurrency analysis (which sessions ran at the same
    time?), resource contention, and medication/episode overlap
    queries. A naive plan is a per-key theta join (every a×b pair per
    user tested); Spark would sort-merge on user_id and explode
    per-key pairs. The scale-correct plan used here is GRID BUCKETING:
    each interval (5 min - 4.3 h here) explodes to the 300-s grid cells it covers (cells
    are `sequence(s div 300, e div 300)` — complete for ANY duration,
    since an overlap instant t lies in a cell both sides cover), the
    join is a pure EQUI-join on (user_id, cell), and a distinct on
    (a_id, b_id) removes the ≤2-cell double matches before the exact
    overlap test re-verifies candidates. Candidate fan-in is bounded
    by per-cell density — the same argument as spatial_grid_join's
    3×3 proof, in one dimension. The oracle is DuckDB's literal theta
    join, so the hash equality PROVES the bucketed rewrite exact."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())

    def side(mod: int, tag: str) -> DataFrame:
        s = F.floor(F.unix_timestamp("ts")).cast("long")
        return ev.filter(F.col("event_id") % 7 == mod).select(
            "user_id",
            F.col("event_id").alias(f"{tag}_id"),
            s.alias(f"{tag}_s"),
            (s + 300 + (F.col("event_id") % 240) * 60).alias(f"{tag}_e"),
        )

    cells = lambda t: F.explode(
        F.sequence(
            F.col(f"{t}_s") - F.col(f"{t}_s") % 300,
            F.col(f"{t}_e") - F.col(f"{t}_e") % 300,
            F.lit(300),
        )
    ).alias("cell")
    a = side(1, "a").select("user_id", "a_id", "a_s", "a_e", cells("a"))
    b = side(2, "b").select("user_id", "b_id", "b_s", "b_e", cells("b"))
    return (
        a.join(b, ["user_id", "cell"])
        .filter(
            (F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e"))
        )
        .groupBy("user_id", "a_id", "b_id")
        .agg(
            (
                F.least(F.first("a_e"), F.first("b_e"))
                - F.greatest(F.first("a_s"), F.first("b_s"))
            ).alias("overlap_s")
        )
    )


_ASOF_TOL_S = 6 * 3600


@register(
    "temporal_asof_tolerance",
    oracle=f"""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, MAX(value) AS purchase_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ),
    matched AS (
        SELECT c.event_id, c.user_id, c.ts,
               p.ts AS ts_m, p.purchase_value AS v_m
        FROM clicks c
        LEFT JOIN purchases p
          ON p.user_id = c.user_id
         AND p.ts <= c.ts
         AND epoch_us(c.ts) - epoch_us(p.ts) <= CAST({_ASOF_TOL_S} AS BIGINT) * 1000000
        QUALIFY ROW_NUMBER() OVER (PARTITION BY c.event_id
                                   ORDER BY p.ts DESC NULLS LAST) = 1
    )
    SELECT event_id, user_id, ts,
           ts_m AS ts_asof,
           v_m AS purchase_value_asof,
           CASE WHEN ts_m IS NULL THEN 1 ELSE 0 END AS is_stale_or_cold
    FROM matched
    """,
    tags=("E12", "N15"),
)
def temporal_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas merge_asof ``tolerance``
    semantics): each click takes the user's most recent purchase AT OR
    BEFORE it — but only within a 6-hour staleness budget; anything
    older is NULLed, because a stale observation silently imputing the
    present is the classic sensor/market-data correctness bug. The
    single-shuffle union-tag as-of machinery is unchanged
    (operators/asof.py tolerance_s is a projection-time null-out, so
    the plan costs exactly what asof_join_events costs); the oracle is
    the literal bounded LEFT JOIN + QUALIFY, so the hash equality
    proves the cheap null-out equals the expensive interval-join
    definition. The staleness flag rides along for downstream
    cold-start accounting."""
    from mobility_etl_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload_cols=["purchase_value"],
        tolerance_s=_ASOF_TOL_S,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "ts_asof",
        "purchase_value_asof",
        F.when(F.col("ts_asof").isNull(), 1).otherwise(0).alias(
            "is_stale_or_cold"
        ),
    )
