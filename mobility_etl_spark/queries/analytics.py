"""Event/product analytics pack: sessionization with stable session
ids, cohort retention, ordered funnels, histograms, per-key outliers,
and table profiling.

These are the standard OLAP faces a mobility/event warehouse runs daily
on its ingested feeds (the reference's delay/weather events are exactly
this shape once landed — dags/warsaw-delays.py:189-204 stops at the
ingest boundary and defers all of this to "the query engine", which is
this package). Every query here is a pure DataFrame plan with an exact
DuckDB oracle; float aggregations use the DECIMAL(20,6) in-sum cast or
1e-6/1e-9 fixed-point flooring so cross-engine accumulation order can
never flip a hash bit.

Scale posture: each query is one keyed shuffle (user_id / event_type /
cohort) plus window functions over the same partitioning — the shapes
AQE handles well at 100 TB. Nothing collects; nothing is quadratic.
All names sort after "minhash_near_dup" (driver-window rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import DEC
from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register

#: Session gap (seconds) for gaps-and-islands sessionization.
_GAP_S = 1800


@register(
    "sessionize_events_ids",
    oracle=f"""
    WITH marks AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         >= {_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
        SELECT user_id, ts, event_id, value,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM marks
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS duration_s,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM tagged
    GROUP BY user_id, session_seq
    """,
    tags=("E33", "E18", "E19"),
)
def sessionize_events_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization that *assigns* stable session ids
    (gaps-and-islands: lag → gap mark → running sum), unlike
    ``session_window_events`` which only aggregates. The (user_id,
    session_seq) id is a pure function of the data, so downstream joins
    (attribution, funnel-within-session) can key on it across reruns.
    Plan: one shuffle on user_id shared by both windows and the final
    groupBy — Catalyst reuses the partitioning, so this is single-
    exchange despite three logical steps."""
    from mobility_etl_spark.operators.timeseries import sessionize

    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    tagged = sessionize(
        events, "user_id", "ts", gap_seconds=_GAP_S, order_cols=("event_id",)
    )
    return tagged.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.floor((F.max(us) - F.min(us)) / F.lit(1_000_000))
        .cast("bigint")
        .alias("duration_s"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )


@register(
    "retention_cohorts_events",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               strftime(MIN(CAST(date_trunc('week', ts) AS DATE)), '%Y-%m-%d')
                   AS cohort_week,
               MIN(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cohort_ts
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               f.cohort_week,
               (epoch_us(CAST(date_trunc('week', e.ts) AS TIMESTAMP))
                - epoch_us(f.cohort_ts)) // 604800000000 AS week_offset
        FROM events e JOIN firsts f USING (user_id)
    ),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS cohort_size
        FROM firsts GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_offset,
           COUNT(*) AS n_active,
           s.cohort_size,
           CAST(FLOOR(COUNT(*) * 1000000.0 / s.cohort_size) AS BIGINT)
               AS retention_ppm
    FROM activity a JOIN sizes s USING (cohort_week)
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    """,
    tags=("E13", "E24"),
)
def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by first-seen
    ISO week, then the share still active at each week offset.
    Retention emitted as ppm fixed-point (floor) so the ratio is
    hash-stable cross-engine. The cohort map (one row per user) is
    broadcast back onto events — at 100 TB the distinct-user side is
    orders of magnitude smaller than the event log, which is the join
    Spark's AQE will pick a broadcast for; the heavy side shuffles only
    for its own groupBy."""
    events = load_table(spark, sf_dir, "events")
    week_ts = F.date_trunc("week", F.col("ts"))
    firsts = events.groupBy("user_id").agg(F.min(week_ts).alias("cohort_ts"))
    firsts = firsts.withColumn(
        "cohort_week", F.date_format("cohort_ts", "yyyy-MM-dd")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                (F.unix_micros(week_ts) - F.unix_micros(F.col("cohort_ts")))
                / F.lit(604_800_000_000)
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        activity.join(sizes, "cohort_week")
        .groupBy("cohort_week", "week_offset", "cohort_size")
        .agg(F.count("*").alias("n_active"))
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.floor(F.col("n_active") * 1000000.0 / F.col("cohort_size"))
            .cast("bigint")
            .alias("retention_ppm"),
        )
    )


@register(
    "user_funnel_conversion",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS t_signup
               FROM events WHERE event_type = 'signup' GROUP BY user_id),
    v AS (SELECT e.user_id, MIN(e.ts) AS t_view
          FROM events e JOIN s USING (user_id)
          WHERE e.event_type = 'view' AND e.ts > s.t_signup
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > v.t_view
          GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM v) AS n_view_after,
           (SELECT COUNT(*) FROM p) AS n_purchase_after
    """,
    tags=("E13", "E10"),
)
def user_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → view → purchase: each stage counts users
    whose earliest qualifying event strictly follows their previous
    stage's earliest event (the standard strict-ordering funnel
    semantics — an unordered count-exists funnel would overcount).
    Implemented as successive min-ts aggregates + semi-style joins; the
    per-stage frames are one row per user, so every join after the
    first aggregate is broadcast-sized at any corpus scale."""
    events = load_table(spark, sf_dir, "events")
    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    v = (
        events.join(F.broadcast(s), "user_id")
        .filter((F.col("event_type") == "view") & (F.col("ts") > F.col("t_signup")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        events.join(F.broadcast(v), "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_view"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(F.broadcast(v.agg(F.count("*").alias("n_view_after"))))
        .crossJoin(F.broadcast(p.agg(F.count("*").alias("n_purchase_after"))))
    )


@register(
    "numeric_histogram_events",
    oracle="""
    SELECT event_type,
           CAST(LEAST(GREATEST(FLOOR(value / 25.0), 0), 19) AS BIGINT)
               AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type, bucket
    """,
    tags=("E13", "E25"),
)
def numeric_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 buckets of width 25, clamped) of the
    value column per event type — the profile/anomaly primitive behind
    dashboard sparklines. Pure map-side bucketing then one groupBy:
    partial aggregation compresses to ≤ types×20 rows per task before
    the shuffle, so network cost is constant in table size."""
    events = load_table(spark, sf_dir, "events")
    bucket = (
        F.least(F.greatest(F.floor(F.col("value") / 25.0), F.lit(0)), F.lit(19))
        .cast("bigint")
        .alias("bucket")
    )
    return events.groupBy("event_type", bucket).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
    )


@register(
    "outlier_zscore_events",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
                   / COUNT(*) AS mu,
               CAST(SUM(CAST(value * value AS DECIMAL(20,6))) AS DOUBLE)
                   / COUNT(*) AS m2
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CAST(FLOOR(((e.value - s.mu) / sqrt(s.m2 - s.mu * s.mu))
                * 1000000.0) AS BIGINT) AS zscore_fx
    FROM events e JOIN stats s USING (event_type)
    WHERE ABS(e.value - s.mu) > 2.0 * sqrt(s.m2 - s.mu * s.mu)
    """,
    tags=("E13", "N5"),
)
def outlier_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > 2): a two-pass
    aggregate-then-broadcast-join — the distributed pattern for any
    normalize-by-group-statistics step (feature scaling, anomaly
    flags). Moments accumulate in DECIMAL so mu/m2 are order-free;
    the emitted z-score floors at 1e-6 fixed point. The stats side is
    one row per event type — always broadcast, the fact side never
    shuffles (plan mirrors resample_lang_mixture's gate)."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        (F.sum(F.col("value").cast(DEC)).cast("double") / F.count("*")).alias("mu"),
        (
            F.sum((F.col("value") * F.col("value")).cast(DEC)).cast("double")
            / F.count("*")
        ).alias("m2"),
    )
    sigma = F.sqrt(F.col("m2") - F.col("mu") * F.col("mu"))
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.abs(F.col("value") - F.col("mu")) > 2.0 * sigma)
        .select(
            "event_id",
            "event_type",
            "value",
            F.floor(((F.col("value") - F.col("mu")) / sigma) * 1000000.0)
            .cast("bigint")
            .alias("zscore_fx"),
        )
    )


@register(
    "profile_table_stats",
    oracle="""
    SELECT 'o_orderkey' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_nonnull,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_repr,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_repr
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
    tags=("E13", "E14"),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile sweep (row/non-null/distinct counts, min/max) for
    a table's key columns — the data-quality summary a warehouse
    publishes per load (the counterpart of the reference's exists-guard
    checks, dags/warsaw-gtfs.py:60-71, promoted to per-column stats).
    All columns profile in ONE scan: a single multi-aggregate pass
    produces every column's stats as one row, then an unpivot-style
    stack reshapes to one row per column — no per-column re-scan, which
    at 100 TB is the difference between 1 job and N jobs."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("n_rows").alias("n_rows"),
                        F.col(f"{c}__nn").alias("n_nonnull"),
                        F.col(f"{c}__nd").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_repr"),
                        F.col(f"{c}__max").alias("max_repr"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*")


@register(
    "window_distinct_rolling_users",
    oracle="""
    SELECT event_id, event_type, ts,
           CAST(COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_users_50
    FROM events
    """,
    tags=("E19", "E14", "E29"),
)
def window_distinct_rolling_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DISTINCT count over a 50-row frame per event type — a
    window shape Spark's SQL surface doesn't accept directly
    (``COUNT(DISTINCT) OVER`` is unsupported), closed here with the
    engine's own primitives: ``size(collect_set(user_id))`` over the
    identical frame, which Catalyst executes as a bounded-state window
    buffer. The oracle runs the real COUNT(DISTINCT) window, so the
    workaround is proven semantics-identical. State per frame is ≤50
    keys — safe at any scale; one Exchange on event_type."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-49, Window.currentRow)
    )
    return events.select(
        "event_id",
        "event_type",
        "ts",
        F.size(F.collect_set("user_id").over(w))
        .cast("bigint")
        .alias("distinct_users_50"),
    )


@register(
    "user_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type AS src_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS dst_type
        FROM events
    ),
    counts AS (
        SELECT src_type, dst_type, COUNT(*) AS n
        FROM seq WHERE dst_type IS NOT NULL
        GROUP BY src_type, dst_type
    )
    SELECT src_type, dst_type,
           CAST(n AS BIGINT) AS n,
           CAST(FLOOR(n * 1000000000 / CAST(SUM(n) OVER (
               PARTITION BY src_type) AS BIGINT)) AS BIGINT) AS p_fx
    FROM counts
    """,
    tags=("E13", "E18"),
)
def user_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences — the behavioral model behind next-action prediction and
    anomaly scoring. Adjacency comes from one lead() window per user
    (the same (ts, event_id) tie-break both engines share); transition
    probabilities are exact rationals rendered as 1e-9 fixed point
    (integer numerator·1e9, one shared IEEE division, floor). Plan:
    one window shuffle on user_id, one aggregation on the (src, dst)
    pair — the row-count collapses from events to |types|² immediately
    after the window, so the second exchange is control-plane-sized
    at any corpus scale."""
    seq = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type")
        .over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        )
        .alias("dst_type"),
    )
    counts = (
        seq.filter(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count("*").alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("src_type"))
    return counts.select(
        "src_type",
        "dst_type",
        "n",
        F.floor(F.col("n") * F.lit(1_000_000_000) / tot)
        .cast("long")
        .alias("p_fx"),
    )


@register(
    "user_pattern_match_cep",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS s
        FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    g AS (SELECT * FROM ev WHERE event_type = 'signup'),
    p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
    cand AS (
        SELECT g.user_id, g.s AS signup_s, g.event_id AS gid,
               p.s AS purchase_s, p.event_id AS pid
        FROM g JOIN p ON p.user_id = g.user_id
         AND (p.s > g.s OR (p.s = g.s AND p.event_id > g.event_id))
         AND p.s <= g.s + 3600
        WHERE NOT EXISTS (
            SELECT 1 FROM g g2
            WHERE g2.user_id = g.user_id
              AND (g2.s > g.s OR (g2.s = g.s AND g2.event_id > g.event_id))
              AND (g2.s < p.s OR (g2.s = p.s AND g2.event_id < p.event_id))
        )
    )
    SELECT user_id, signup_s, purchase_s,
           purchase_s - signup_s AS latency_s
    FROM cand
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, gid
                               ORDER BY purchase_s, pid) = 1
    """,
    tags=("E18", "E33"),
)
def user_pattern_match_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match — SQL's MATCH_RECOGNIZE
    workload (neither engine has the clause) expressed two genuinely
    different ways: for every signup, the FIRST purchase by the same
    user within one hour with no newer signup in between (each
    purchase attributes to its LATEST preceding signup; each signup
    matches at most once). Spark runs the streaming-friendly
    single-pass shape: one per-user window carries the last-seen
    signup (ignorenulls last() over the (s, event_id) total order), a
    filter applies the time bound, and a rank-1 window picks the first
    purchase per signup — O(events) with one shuffle, the exact state
    layout a transformWithState CEP operator would keep. The oracle is
    the declarative join form: candidates by time-bounded
    tuple-ordered join, an intervening-signup NOT EXISTS, QUALIFY
    rn=1 — quadratic per user, correct by construction. Equality
    proves the window pass implements the pattern semantics."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_timestamp("ts").alias("s"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    tagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "s",
        F.last(
            F.when(F.col("event_type") == "signup", F.col("s")),
            ignorenulls=True,
        )
        .over(wb)
        .alias("sig_s"),
        F.last(
            F.when(F.col("event_type") == "signup", F.col("event_id")),
            ignorenulls=True,
        )
        .over(wb)
        .alias("sig_id"),
    )
    matches = tagged.filter(
        (F.col("event_type") == "purchase")
        & F.col("sig_s").isNotNull()
        & (F.col("s") - F.col("sig_s") <= 3600)
    )
    wr = Window.partitionBy("user_id", "sig_id").orderBy("s", "event_id")
    return (
        matches.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("sig_s").alias("signup_s"),
            F.col("s").alias("purchase_s"),
            (F.col("s") - F.col("sig_s")).alias("latency_s"),
        )
    )


@register(
    "outlier_mad_events",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(FLOOR(value * 1000000.0) AS BIGINT) AS vfx
        FROM events WHERE value IS NOT NULL
    ),
    med AS (
        SELECT event_type,
               CAST(MEDIAN(2 * vfx) AS BIGINT) AS med2
        FROM v GROUP BY event_type
    ),
    dev AS (
        SELECT v.event_type, v.vfx, med.med2,
               ABS(2 * v.vfx - med.med2) AS dev2
        FROM v JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               CAST(MEDIAN(2 * dev2) AS BIGINT) AS mad4
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(d.med2) AS med2_fx,
           MIN(mad.mad4) AS mad4_fx,
           CAST(SUM(CASE WHEN 20000 * d.dev2 > 44478 * mad.mad4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
    tags=("E13", "N15", "N16"),
)
def outlier_mad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: median / MAD instead
    of mean / stddev — the estimator that survives the very outliers
    it hunts (z-scores explode their own baseline on dirty data; see
    outlier_zscore_events for the contrast). Exactness discipline:
    values floor to 1e-6 fixed point, and both medians ride the
    2×-integer trick (window_rolling_median_events' proof) — the
    interpolated median of doubled integers is itself an exact
    integer — so med2 (scale 2), mad4 (scale 4) and the outlier rule
    |x−med| > 3·1.4826·MAD, cross-multiplied to the all-integer
    comparison 20000·dev2 > 44478·mad4, are hash-exact cross-engine
    with zero float comparisons. Plan: two aggregate-then-broadcast
    passes over one scan shape — the distributed two-pass
    group-statistics pattern at any scale."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    v = events.select(
        "event_type",
        F.floor(F.col("value") * 1000000.0).cast("long").alias("vfx"),
    )
    med = v.groupBy("event_type").agg(
        F.median(2 * F.col("vfx")).cast("long").alias("med2")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med2",
        F.abs(2 * F.col("vfx") - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy("event_type").agg(
        F.median(2 * F.col("dev2")).cast("long").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("med2").alias("med2_fx"),
            F.min("mad4").alias("mad4_fx"),
            F.sum(
                F.when(
                    20000 * F.col("dev2") > 44478 * F.col("mad4"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )
