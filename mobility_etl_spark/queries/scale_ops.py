"""Scale-machinery faces (VERDICT r03 #6): oracle-checked queries for
operators that previously had only pytest gates — the salted skew
join, the compaction+vacuum invariant, and the SCD2 current-state
extract.

Each is a *row-identity* proof: the operator under test takes a
different physical path (salted keys, rewritten files, interval
collapse) but must produce values hash-identical to the straight
relational answer DuckDB computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import dsum, sql_dsum
from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.scale import salted_join
from mobility_etl_spark.operators.scd import scd2_from_observations
from mobility_etl_spark.registry import register

#: Per-process caches: (sf_dir) -> (artifact path, version). Snapshot
#: faces run real write/commit/compact side effects; these must happen
#: once per process, not once per builder invocation (review finding:
#: each call leaked a tempdir holding a full table copy).
_SNAP_CI_CACHE: dict[str, tuple[str, int]] = {}
_SNAP_PR_CACHE: dict[str, tuple[str, int]] = {}


@register(
    "salted_join_identity",
    oracle=f"""
    WITH dim AS (
        SELECT user_id, MIN(ts) AS first_seen
        FROM events GROUP BY user_id
    )
    SELECT e.user_id,
           COUNT(*) AS n_rows,
           {sql_dsum("e.value", "sum_value")},
           MIN(d.first_seen) AS first_seen
    FROM events e JOIN dim d USING (user_id)
    GROUP BY e.user_id
    """,
    tags=("N11", "E9"),
)
def salted_join_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-identity proof for the salted skew join
    (operators/scale.py:salted_join): events' user_id is pathologically
    skewed (a handful of users own the whole fact table), the classic
    straggler shape. The salted path spreads each hot key over
    ``n_salts`` tasks by joining on (key, salt) with the dim side
    exploded across salts — and must remain VALUE-identical to the
    plain join the oracle runs. Aggregating per user after the join
    hash-checks every fact row landed exactly once (a lost or
    duplicated salt bucket shifts n_rows/sum_value immediately)."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_seen"))
    )
    joined = salted_join(events, dim, on=["user_id"], n_salts=8)
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_rows"),
        dsum(F.col("value"), "sum_value"),
        F.min("first_seen").alias("first_seen"),
    )


@register(
    "snapshot_compact_invariant",
    oracle=f"""
    SELECT 'compacted' AS stage,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_dsum("value", "sum_value")}
    FROM events WHERE event_id < 800
    UNION ALL
    SELECT 'source' AS stage,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_dsum("value", "sum_value")}
    FROM events WHERE event_id < 800
    """,
    tags=("N11", "N13", "E5"),
)
def snapshot_compact_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction + vacuum preserve table content exactly: stage events
    (<800, 6 small files) → commit v1 → ``compact_snapshot`` rewrites
    them into one right-sized file as v2 → ``vacuum(keep_last=1)``
    reclaims v1's now-unreferenced originals. The surviving snapshot's
    aggregates must hash-match the source range (the oracle computes
    both rows from the raw table, so 'compacted' ≠ 'source' the moment
    compaction loses, duplicates, or corrupts a row). This is the
    operational loop a 100 TB lake runs continuously — small-file
    compaction behind readers' backs — with the manifest layer making
    it reader-atomic (tests/test_snapshots.py gates the concurrency
    side)."""
    import tempfile

    from mobility_etl_spark.functions.compat import dsum as _dsum
    from mobility_etl_spark.operators.snapshots import (
        commit_snapshot,
        compact_snapshot,
        read_snapshot,
        vacuum,
    )

    ev = load_table(spark, sf_dir, "events")
    # The write→commit→compact→vacuum side effects run ONCE per
    # (process, sf_dir); every later builder invocation (oracle check,
    # plan dump, warm-up) reuses the artifact instead of leaking a
    # fresh tempdir with a full table copy per call.
    cached = _SNAP_CI_CACHE.get(sf_dir)
    if cached is None:
        path = tempfile.mkdtemp(prefix="snap_ci_")
        ev.filter(F.col("event_id") < 800).repartition(6).write.mode(
            "overwrite"
        ).parquet(path)
        commit_snapshot(spark, path, note="initial")
        v2 = compact_snapshot(spark, path, target_file_bytes=1 << 30)
        vacuum(path, keep_last=1)  # v1's originals reclaimed; v2 intact
        _SNAP_CI_CACHE[sf_dir] = (path, v2)
    else:
        path, v2 = cached

    def agg(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            _dsum(F.col("value"), "sum_value"),
        ).select(
            F.lit(stage).alias("stage"), "n_rows", "n_users", "sum_value"
        )

    return agg(read_snapshot(spark, path, v2), "compacted").unionAll(
        agg(ev.filter(F.col("event_id") < 800), "source")
    )


@register(
    "scd2_current_state",
    oracle="""
    WITH changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER w AS prev_state
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        WHERE prev_state IS NULL OR event_type <> prev_state
    )
    SELECT user_id, event_type AS state, ts AS since
    FROM (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM changes
    )
    WHERE rn = 1
    """,
    tags=("E17", "E18", "R7"),
)
def scd2_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dimension-serving face of the SCD2 build (operators/scd.py):
    the ``is_current`` slice — per key, the state now and since when.
    This is the row the reference's overwrite-latest blob (R7,
    dags/warsaw-gtfs.py:73-80) stores as its ONLY state; here it falls
    out of the same single-shuffle interval build that also keeps full
    history, so "latest" and "as-of" reads share one pipeline. The
    oracle independently picks the last change-point per key."""
    events = load_table(spark, sf_dir, "events")
    history = scd2_from_observations(
        events.select("user_id", "event_type", "ts", "event_id"),
        key_col="user_id",
        ts_col="ts",
        state_col="event_type",
        tiebreak_col="event_id",
    )
    return history.filter(F.col("is_current")).select(
        "user_id", "state", F.col("valid_from").alias("since")
    )


@register(
    "skew_hot_keys_events",
    oracle="""
    WITH keyed AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN 0
                    ELSE user_id % 100 + 1 END AS k
        FROM events
    ),
    counts AS (SELECT k, COUNT(*) AS wt FROM keyed GROUP BY k),
    stats AS (SELECT SUM(wt) AS total, COUNT(*) AS n_keys FROM counts)
    SELECT '{' || k || '}' AS key, CAST(wt AS BIGINT) AS wt
    FROM counts, stats
    WHERE wt >= 8.0 * total / n_keys
    """,
    tags=("N8", "N11"),
)
def skew_hot_keys_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-diagnosis face (operators/scale.py:detect_hot_keys):
    a deliberately skewed key (half the fact table collapsed onto key
    0, the rest uniform) must be flagged by the Misra-Gries summary
    pass — one scan, shuffle O(partitions x k) counter rows, never a
    groupBy of the key space. With k=256 >= the <=101 distinct keys MG
    compresses nothing, so the estimates are exact and the oracle can
    recompute the detection set relationally. The hot key's count
    (~50% of rows) clears the 8x-uniform threshold by ~10x, so the
    approx_count_distinct in the uniform-share denominator cannot flip
    membership. Returned via createDataFrame because the operator's
    contract is a driver-side control-plane list (<= k rows) feeding
    salted_join. The uniform tail is user_id % 100 + 1 (disjoint from
    hot key 0), so the key space is ≤ 101 at EVERY scale factor — the
    k ≥ distinct-keys precondition for MG exactness holds by
    construction instead of by accident of the current testdata (at
    sf0.1 the raw user space outgrew k and the estimates stopped being
    exact — caught by the full-sweep gate at sf0.1)."""
    events = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id") % 100 + 1)
        .alias("skew_key")
    )
    from mobility_etl_spark.operators.scale import detect_hot_keys

    hot = detect_hot_keys(events, ("skew_key",), skew_factor=8.0, k=256)
    return spark.createDataFrame(
        [(k, int(w)) for k, w in hot] or [("__none__", 0)],
        "key string, wt long",
    ).filter(F.col("key") != "__none__")


@register(
    "snapshot_pruned_read",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_dsum("value", "sum_value")}
    FROM events WHERE event_id BETWEEN 2000 AND 5000
    """,
    tags=("N11", "N13", "E5"),
)
def snapshot_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level data skipping end-to-end: events written
    range-clustered (6 files with disjoint event_id spans), committed
    with per-file footer stats, then range-read through
    ``read_snapshot(where=...)`` — the plan covers only files whose
    committed [min,max] intersects the range (file-count reduction is
    gated in tests/test_snapshots.py; this query proves VALUES are
    unaffected by skipping). The Iceberg/Delta shape: at 100 TB the
    manifest prunes whole files before any footer is opened, a layer
    above parquet row-group pruning and orthogonal to partition
    pruning."""
    import tempfile

    from mobility_etl_spark.functions.compat import dsum as _dsum
    from mobility_etl_spark.operators.snapshots import (
        commit_snapshot,
        read_snapshot,
    )

    cached = _SNAP_PR_CACHE.get(sf_dir)
    if cached is None:
        path = tempfile.mkdtemp(prefix="snap_pr_")
        ev = load_table(spark, sf_dir, "events")
        ev.repartitionByRange(6, "event_id").write.mode("overwrite").parquet(
            path
        )
        v = commit_snapshot(
            spark, path, note="range", stats_cols=("event_id",)
        )
        _SNAP_PR_CACHE[sf_dir] = (path, v)
    else:
        path, v = cached
    lo, hi = 2000, 5000
    pruned = read_snapshot(spark, path, v, where=("event_id", lo, hi))
    return pruned.filter(F.col("event_id").between(lo, hi)).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        _dsum(F.col("value"), "sum_value"),
    )


@register(
    "privacy_k_anonymity_orders",
    oracle="""
    WITH quasi AS (
        SELECT o_orderpriority,
               o_orderstatus,
               CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS price_band,
               COUNT(*) AS grp_n
        FROM orders
        GROUP BY o_orderpriority, o_orderstatus,
                 CAST(FLOOR(o_totalprice / 50000) AS BIGINT)
    )
    SELECT CAST(k.k AS BIGINT) AS k,
           CAST(COUNT(*) FILTER (WHERE grp_n < k.k) AS BIGINT)
               AS n_violating_groups,
           CAST(COALESCE(SUM(grp_n) FILTER (WHERE grp_n < k.k), 0)
               AS BIGINT) AS n_exposed_rows,
           CAST(MIN(grp_n) AS BIGINT) AS min_group_size
    FROM quasi CROSS JOIN (VALUES (2), (5), (10)) AS k(k)
    GROUP BY k.k
    """,
    tags=("E13", "E15", "N16"),
)
def privacy_k_anonymity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple (priority,
    status, coarse price band): for each candidate k, how many
    equivalence classes are smaller than k and how many rows those
    classes expose — the release-gate query every privacy review runs
    before publishing a derived dataset, and the generalization-loop
    driver (if violations remain, coarsen a quasi-identifier and
    re-audit). One groupBy over the quasi tuple (the only shuffle —
    the class histogram is tiny and the k-grid is a 3-row broadcast
    cross join); at 100 TB identical shape to any low-cardinality
    audit aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    quasi = orders.groupBy(
        "o_orderpriority",
        "o_orderstatus",
        (F.col("o_totalprice") / 50000).cast("bigint").alias("price_band"),
    ).agg(F.count("*").alias("grp_n"))
    ks = spark.createDataFrame([(2,), (5,), (10,)], "k long")
    return (
        quasi.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("grp_n") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_groups"),
            F.coalesce(
                F.sum(
                    F.when(F.col("grp_n") < F.col("k"), F.col("grp_n"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_exposed_rows"),
            F.min("grp_n").cast("bigint").alias("min_group_size"),
        )
    )


@register(
    "skewjoin_aqe_identity",
    oracle=f"""
    WITH l AS (
        SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
                    ELSE l_orderkey END AS hk,
               l_extendedprice AS price
        FROM lineitem
    ), d AS (
        SELECT CASE WHEN o_orderkey = 1 THEN 0
                    ELSE o_orderkey END AS hk,
               o_custkey % 7 AS dim_tag
        FROM orders
    )
    SELECT l.hk % 97 AS hk_bucket,
           COUNT(*) AS n_rows,
           {sql_dsum("l.price", "sum_price")},
           CAST(SUM(d.dim_tag) AS BIGINT) AS sum_tag
    FROM l JOIN d USING (hk)
    GROUP BY l.hk % 97
    """,
    tags=("N11", "E9"),
)
def skewjoin_aqe_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-identity proof for the UNSALTED skew-join path — the one a
    100 TB deployment should trust AQE with (session.py turns
    ``spark.sql.adaptive.skewJoin.enabled`` on): 80% of lineitem is
    remapped onto one planted hot key and joined, without salting,
    against a unique-key orders dim; the per-bucket aggregate must stay
    value-identical to the straight relational answer DuckDB computes.
    Complements ``salted_join_identity`` (the manual-salt path for
    pathological skew): together they prove both skew strategies give
    the same answer, so the choice between them is purely a cost call.

    The ``repartition(16)`` stands in for the many-map scan any real
    multi-file input has: AQE can only split a skewed reduce partition
    at MAP-output granularity, and the single-row-group test parquet
    otherwise funnels the hot key through one map, making it
    unsplittable (found empirically; the plan-level proof that the
    split actually fires — ``SortMergeJoin(skew=true)`` — is
    tests/test_plans.py::test_aqe_skew_join_splits_planted_hot_key,
    which lowers the 256 MB skew threshold to test scale on a scratch
    session)."""
    li = load_table(spark, sf_dir, "lineitem").repartition(16)
    l = li.select(
        F.when(F.col("l_orderkey") % 10 < 8, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("hk"),
        F.col("l_extendedprice").alias("price"),
    )
    d = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") == 1, F.lit(0))
        .otherwise(F.col("o_orderkey"))
        .alias("hk"),
        (F.col("o_custkey") % 7).alias("dim_tag"),
    )
    return (
        l.join(d, "hk")
        .groupBy((F.col("hk") % 97).alias("hk_bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            dsum(F.col("price"), "sum_price"),
            F.sum("dim_tag").cast("bigint").alias("sum_tag"),
        )
    )
