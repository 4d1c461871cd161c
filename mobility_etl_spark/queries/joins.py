"""Join operators (SURVEY.md §2.B E9–E12).

Scope justification: the GTFS feed is a foreign-key star schema built
to be joined (trips⋈routes⋈stop_times⋈stops, reference
dags/warsaw-gtfs.py:30-39); the hash/exists short-circuits (R6/R8,
dags/warsaw-gtfs.py:60-71, dags/warsaw-weather.py:26-28) are anti/semi
joins as set operations; the hourly delay+weather snapshots
(dags/warsaw-delays.py:194, dags/warsaw-weather.py:21) imply
time-bucket and as-of joins.

Scale notes: dimension sides are explicitly `F.broadcast(...)` so the
fact table never shuffles for the star join; anti/semi joins ship only
the key column; the as-of join (operators/asof.py) costs one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import davg, dsum, sql_davg, sql_dsum
from mobility_etl_spark.io import load_table, load_tables
from mobility_etl_spark.operators.asof import asof_join
from mobility_etl_spark.operators.rangejoin import interval_join
from mobility_etl_spark.registry import register


@register(
    "star_join_revenue",
    oracle=f"""
    SELECT r_name AS region,
           n_name AS nation,
           COUNT(*) AS n_items,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("E9",),
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK star join (the GTFS trips⋈routes⋈stops shape).

    The dimension chain customer→nation→region is pre-collapsed into
    ONE broadcast (custkey → nation/region names): the fact side pays
    a single broadcast-hash probe instead of a chain of three, and the
    collapsed dim is *narrower* than raw customer — the
    denormalize-dims-before-the-fact-join pattern that also holds at
    100 TB (measured ~1.7× cold-run speedup vs the chained form)."""
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    dim = (
        t["customer"]
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_items"), dsum(revenue, "revenue"))
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
    )
    """,
    tags=("E10",),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no jumbo order — the engine-native
    form of the reference's hash change-detection short-circuit (R6,
    reference dags/warsaw-gtfs.py:60-71): new keys = incoming ANTI manifest."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    jumbo = t["orders"].filter(F.col("o_totalprice") > 450000)
    return (
        t["customer"]
        .join(jumbo, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
    tags=("E10",),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: existence probe without multiplying rows — the
    reference's this-hour-already-landed guard (R8,
    dags/warsaw-weather.py:26-28) at row granularity."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "join_left_outer_counts",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           COALESCE(MAX(o_totalprice), 0.0) AS max_order_value
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    tags=("E10",),
)
def join_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count of NULLs = 0)."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.max("o_totalprice"), F.lit(0.0)).alias("max_order_value"),
        )
    )


@register(
    "hour_bucket_join",
    oracle=f"""
    WITH per_type AS (
        SELECT date_trunc('hour', ts) AS hour_ts,
               event_type,
               COUNT(*) AS n_events,
               {sql_davg("value", "avg_value")}
        FROM events
        GROUP BY 1, 2
    ),
    per_hour AS (
        SELECT date_trunc('hour', ts) AS hour_ts, COUNT(*) AS hour_total
        FROM events
        GROUP BY 1
    )
    SELECT p.hour_ts, p.event_type, p.n_events, p.avg_value, h.hour_total
    FROM per_type p JOIN per_hour h ON p.hour_ts = h.hour_ts
    """,
    tags=("E11",),
)
def hour_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket equi join on date_trunc('hour') — the delays⋈weather
    hourly co-partitioned join (reference dags/warsaw-delays.py:194 ⋈
    dags/warsaw-weather.py:21). Both sides derive from one scan; the
    bucketed key joins without a range condition."""
    events = load_table(spark, sf_dir, "events")
    bucketed = events.withColumn("hour_ts", F.date_trunc("hour", F.col("ts")))
    per_type = bucketed.groupBy("hour_ts", "event_type").agg(
        F.count("*").alias("n_events"), davg("value", "avg_value")
    )
    per_hour = bucketed.groupBy("hour_ts").agg(F.count("*").alias("hour_total"))
    return per_type.join(per_hour, "hour_ts").select(
        "hour_ts", "event_type", "n_events", "avg_value", "hour_total"
    )


@register(
    "asof_join_events",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, MAX(value) AS purchase_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT c.event_id,
           c.user_id,
           c.ts,
           p.ts AS ts_asof,
           p.purchase_value AS purchase_value_asof
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("E12",),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's most recent purchase
    at or before it (weather-at-delay-time semantics, SURVEY.md §2.B
    E12), proven against DuckDB's native ASOF JOIN."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload_cols=["purchase_value"],
    ).select("event_id", "user_id", "ts", "ts_asof", "purchase_value_asof")


@register(
    "range_join_events",
    oracle="""
    SELECT l.event_id AS purchase_id,
           COUNT(r.event_id) AS n_clicks_nearby,
           CAST(SUM(CAST(r.value AS DECIMAL(20,6))) AS DOUBLE)
               AS nearby_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON abs(epoch_us(l.ts) - epoch_us(r.ts)) <= 1800000000
    GROUP BY l.event_id
    """,
    tags=("E12",),
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: clicks within ±30 min of each purchase
    (operators/rangejoin.py — bucketed replication, NOT a cross join;
    the oracle's inequality join is O(n·m), the engine's plan is a
    linear equi join on time buckets). Left-outer: purchases with no
    nearby click keep count 0."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    paired = interval_join(
        purchases,
        clicks,
        left_ts="p_ts",
        right_ts="c_ts",
        tolerance_us=1_800_000_000,
        how="left",
    )
    return paired.groupBy("purchase_id").agg(
        F.count("click_id").alias("n_clicks_nearby"),
        F.sum(F.col("c_value").cast("decimal(20,6)"))
        .cast("double")
        .alias("nearby_click_value"),
    )


@register(
    "join_null_safe_priority",
    oracle="""
    WITH l AS (
        SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS pri
        FROM orders WHERE o_orderkey < 2000
    ),
    r AS (
        SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS pri, COUNT(*) AS n
        FROM orders GROUP BY 1
    )
    SELECT l.o_orderkey, l.pri, r.n
    FROM l JOIN r ON l.pri IS NOT DISTINCT FROM r.pri
    """,
    tags=("E10", "E7"),
)
def join_null_safe_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the corner
    that loses rows when a plain equi-join meets nullable keys (here
    '3-MEDIUM' is nulled out on both sides and must still pair up).
    Spark plans eqNullSafe as a hash join on the null-coalesced key,
    not a nested loop, so it still broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    pri = F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
    left = orders.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey", pri.alias("pri")
    )
    right = (
        orders.groupBy(pri.alias("rpri"))
        .agg(F.count("*").alias("n"))
    )
    return (
        left.join(F.broadcast(right), F.col("pri").eqNullSafe(F.col("rpri")))
        .select("o_orderkey", "pri", "n")
    )


@register(
    "scd2_point_in_time_join",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_state
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type AS state, ts, event_id
        FROM o
        WHERE prev_state IS NULL OR event_type <> prev_state
    ),
    scd AS (
        SELECT user_id, state, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM changes
    ),
    dim AS (
        SELECT * FROM scd
        WHERE valid_to IS NULL OR valid_from <> valid_to
    ),
    probes AS (
        SELECT event_id, user_id, ts FROM events WHERE event_id % 97 = 0
    )
    SELECT p.event_id, p.user_id, p.ts, d.state AS state_at_ts
    FROM probes p
    JOIN dim d
      ON d.user_id = p.user_id
     AND d.valid_from <= p.ts
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    """,
    tags=("E12", "E18", "R7"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each probe row is enriched with
    the SCD2 dimension state valid AT its event time — the lookup every
    feature-store / training-label pipeline needs to avoid leakage.

    Spark-first plan: NOT the interval theta join the oracle states
    (which would plan as a range explosion) — the SCD2 intervals
    partition each key's timeline, so "interval containing ts" ≡
    "latest valid_from ≤ ts", and the single-shuffle union-tag as-of
    machinery (operators/asof.py) answers it with one Exchange of
    |probes|+|dim| rows. Zero-length intervals (two state changes at
    one timestamp) are dropped so the dimension is deterministic; the
    oracle's containment join returns the identical row set."""
    from mobility_etl_spark.operators.asof import asof_join
    from mobility_etl_spark.operators.scd import scd2_from_observations

    events = load_table(spark, sf_dir, "events")
    dim = scd2_from_observations(
        events.select("user_id", "event_type", "ts", "event_id"),
        key_col="user_id",
        ts_col="ts",
        state_col="event_type",
        tiebreak_col="event_id",
    ).filter(
        F.col("valid_to").isNull() | (F.col("valid_from") != F.col("valid_to"))
    )
    probes = events.filter(F.col("event_id") % 97 == 0).select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        probes,
        dim.select("user_id", F.col("valid_from").alias("vts"), "state"),
        on=["user_id"],
        left_ts="ts",
        right_ts="vts",
        payload_cols=["state"],
    )
    return joined.filter(F.col("state_asof").isNotNull()).select(
        "event_id",
        "user_id",
        "ts",
        F.col("state_asof").alias("state_at_ts"),
    )


@register(
    "fuzzy_match_sources",
    oracle="""
    WITH s AS (SELECT DISTINCT source FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           levenshtein(a.source, b.source) AS edit_dist
    FROM s a JOIN s b
      ON a.source < b.source
     AND abs(strlen(a.source) - strlen(b.source)) <= 1
     AND levenshtein(a.source, b.source) <= 1
    """,
    tags=("E10", "E23"),
)
def fuzzy_match_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy self-join (entity-resolution shape): source
    names within Levenshtein 1 of each other. The cheap length-band
    predicate is stated BEFORE the edit distance so the quadratic
    candidate space is pruned by a sargable condition first — at scale
    the length band (or a q-gram/LSH prefilter, operators/dedup.py)
    bounds candidates and levenshtein only scores survivors; the
    distinct-source set itself is dimension-sized (broadcastable)."""
    src = (
        load_table(spark, sf_dir, "documents").select("source").distinct()
    )
    a = src.select(F.col("source").alias("source_a"))
    b = src.select(F.col("source").alias("source_b"))
    return (
        a.join(
            b,
            (F.col("source_a") < F.col("source_b"))
            & (
                F.abs(
                    F.length("source_a") - F.length("source_b")
                ) <= 1
            ),
        )
        .withColumn(
            "edit_dist", F.levenshtein(F.col("source_a"), F.col("source_b"))
        )
        .filter(F.col("edit_dist") <= 1)
    )
