"""Data-ops faces: table reconciliation (diff between two snapshots of
a table) and curriculum phase assignment for training runs.

``table_diff_orders`` is the anti-entropy primitive behind every
sync/backfill audit: given yesterday's and today's snapshot, emit the
key-level added/removed/changed sets. The two snapshots are derived
deterministically from the same parquet (a modulus subset with a
perturbed measure) so the face is self-contained and exactly
oracle-checkable; the operator shape — full outer join on the key,
column-wise comparison — is the real thing.

``training_curriculum_phases`` orders the corpus by a quality proxy
and splits it into 4 curriculum phases (easy → hard) with NTILE, the
standard staged-training schedule; per-phase stats double as the
boundary audit.

All names sort after "minhash_near_dup" (driver-window rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import DEC
from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register


@register(
    "table_diff_orders",
    oracle="""
    WITH old_snap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 89 = 0
                    THEN o_totalprice + 1.0 ELSE o_totalprice END
                   AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 97 != 0
    ),
    new_snap AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        WHERE o_orderkey % 101 != 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL
       OR n.o_orderkey IS NULL
       OR o.o_totalprice != n.o_totalprice
       OR o.o_orderstatus != n.o_orderstatus
    """,
    tags=("E10", "E22", "N13"),
)
def table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: key-level diff (added / removed /
    changed) between an 'old' and 'new' snapshot of orders — the audit
    query behind CDC validation, backfill verification, and replica
    anti-entropy. Full outer join on the key + column-wise comparison
    (never string-rendered hashes, so float formatting can't lie).
    Values compare the exact doubles both engines read from the same
    parquet. At 100 TB both sides shuffle once on the key — the
    minimal possible — and AQE handles the skew; column comparisons
    are codegen'd expressions."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    # Disjoint moduli make all three outcomes reachable: %97-only keys
    # are 'added' (new-only), %101-only keys are 'removed' (old-only),
    # %89 keys are 'changed' — a diff face whose 'removed' branch can
    # never fire would let a wrong join type pass the oracle gate.
    old_snap = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("old_price"),
        F.col("o_orderstatus").alias("old_status"),
    )
    new_snap = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey",
        F.col("o_totalprice").alias("new_price"),
        F.col("o_orderstatus").alias("new_status"),
    )
    joined = old_snap.join(new_snap, "o_orderkey", "outer")
    diff = joined.filter(
        F.col("old_price").isNull()
        | F.col("new_price").isNull()
        | (F.col("old_price") != F.col("new_price"))
        | (F.col("old_status") != F.col("new_status"))
    )
    return diff.select(
        "o_orderkey",
        F.when(F.col("old_price").isNull(), F.lit("added"))
        .when(F.col("new_price").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change_type"),
    )


@register(
    "training_curriculum_phases",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, n_chars,
               NTILE(4) OVER (ORDER BY n_chars, doc_id) AS phase
        FROM documents
    )
    SELECT phase,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(CAST(n_chars AS DECIMAL(20,6))) AS DOUBLE)
               / COUNT(*) AS avg_chars
    FROM ranked
    GROUP BY phase
    """,
    tags=("N7", "E17"),
)
def training_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assignment: corpus ordered easy→hard by a quality/
    difficulty proxy (doc length) and cut into 4 equal phases with
    NTILE — the schedule used by staged pretraining. Deterministic
    tiebreak (doc_id) makes phase membership a pure function of the
    data, so the per-phase stats (count, char range, mean) are
    hash-exact. The NTILE is computed by
    :func:`operators.sampling.partitioned_ntile` — range-bucketed
    global rank (two bounded control-plane collects) + the NTILE size
    formula as a map-only expression — so the plan's only Window is
    partitioned by range bucket and NOTHING funnels through one task
    at 100 TB. ``tests/test_sampling.py`` parity-gates this against
    the literal ``F.ntile`` window form and plan-gates the absence of
    unpartitioned WindowExec."""
    from mobility_etl_spark.operators.sampling import partitioned_ntile

    docs = load_table(spark, sf_dir, "documents")
    ranked = partitioned_ntile(
        docs.select("doc_id", "n_chars"), 4, "n_chars", "doc_id", col="phase"
    )
    return ranked.groupBy("phase").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (
            F.sum(F.col("n_chars").cast(DEC)).cast("double") / F.count("*")
        ).alias("avg_chars"),
    )


@register(
    "observed_metrics_orders",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
               AS sum_total,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_high,
           COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_null_cust
    FROM orders
    """,
    tags=("E13",),
)
def observed_metrics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`Dataset.observe()` — pipeline observability counters collected
    as a SIDE CHANNEL of a production action, zero extra passes: the
    named aggregates ride the same scan/codegen as the job (here a
    noop-sink write standing in for the real sink) and arrive via
    listener machinery, not a second query. THE mechanism for
    row-count / null-rate / domain-violation counters on a 100 TB
    job — a separate metrics query would double the scan cost, and at
    stream scale observe() is the only way to meter a running sink.
    The observed values are re-exposed as a one-row DataFrame (a
    driver-side handful of scalars — control plane, like every metrics
    registry) and hash-checked against the oracle recomputing the same
    aggregates relationally, proving the side channel reports EXACTLY
    what the engine computed."""
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("sum_total"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_high"),
        F.count_if(F.col("o_custkey").isNull()).alias("n_null_cust"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_total"], m["n_high"], m["n_null_cust"])],
        "n_rows bigint, sum_total double, n_high bigint, n_null_cust bigint",
    )


#: Per-process cache: sf_dir -> catalog root (two tables, two catalog
#: versions, built once per process).
_CATALOG_CACHE: dict[str, str] = {}


@register(
    "snapshot_catalog_read",
    oracle="""
    WITH v1 AS (
        SELECT CAST(1 AS BIGINT) AS catalog_version,
               CAST(COUNT(*) AS BIGINT) AS n_joined,
               CAST(SUM(e.event_id * m.mult) AS BIGINT) AS weighted_ids
        FROM (SELECT * FROM events WHERE event_id < 400) e
        JOIN (SELECT DISTINCT event_type,
                     CAST(1 AS BIGINT) AS mult FROM events) m
          ON e.event_type = m.event_type
    ),
    v2 AS (
        SELECT CAST(2 AS BIGINT) AS catalog_version,
               CAST(COUNT(*) AS BIGINT) AS n_joined,
               CAST(SUM(e.event_id * m.mult) AS BIGINT) AS weighted_ids
        FROM (SELECT * FROM events WHERE event_id < 800) e
        JOIN (SELECT DISTINCT event_type,
                     CAST(2 AS BIGINT) AS mult FROM events) m
          ON e.event_type = m.event_type
    )
    SELECT * FROM v1 UNION ALL SELECT * FROM v2
    """,
    tags=("N13", "E2"),
)
def snapshot_catalog_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table transactional reads through the catalog layer
    (operators/snapshots.py:commit_catalog): facts and a dimension
    evolve together — day 1 commits (facts<400, mult=1 dims) as
    catalog v1, day 2 commits (facts<800, mult=2 dims) as catalog v2 —
    and the face joins facts to dims resolving BOTH tables through
    each catalog version. The oracle recomputes both versions
    closed-form from the id ranges, so the equality proves the catalog
    pins a consistent (facts, dims) pair per version: a reader can
    never join day-2 facts against day-1 multipliers. This is the
    cross-table atomicity single-table snapshot manifests cannot give;
    the per-table gates (reader-atomic compaction, put-if-absent
    races) live in tests/test_snapshots.py."""
    import json
    import os
    import tempfile

    from mobility_etl_spark.operators.snapshots import (
        _data_files,
        commit_catalog,
        commit_snapshot,
        read_catalog_table,
    )

    cat = _CATALOG_CACHE.get(sf_dir)
    if cat is None:
        cat = tempfile.mkdtemp(prefix="snap_cat_")
        facts = os.path.join(cat, "facts")
        dims = os.path.join(cat, "dims")
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type"
        )
        types = ev.select("event_type").distinct()

        ev.filter(F.col("event_id") < 400).write.parquet(facts)
        f1 = commit_snapshot(spark, facts, note="facts day1")
        types.withColumn("mult", F.lit(1).cast("long")).write.parquet(dims)
        d1 = commit_snapshot(spark, dims, note="dims day1")
        commit_catalog(
            cat, {"facts": (facts, f1), "dims": (dims, d1)}, note="day1"
        )

        ev.filter(
            (F.col("event_id") >= 400) & (F.col("event_id") < 800)
        ).write.mode("append").parquet(facts)
        f2 = commit_snapshot(spark, facts, note="facts day2")
        types.withColumn("mult", F.lit(2).cast("long")).write.mode(
            "append"
        ).parquet(dims)
        # day-2 dims REPLACE day-1: commit only the new files
        with open(
            os.path.join(dims, "_snapshots", f"v{d1}.manifest.json")
        ) as fh:
            d1_files = set(json.load(fh)["files"])
        new_files = [f for f in _data_files(dims) if f not in d1_files]
        d2 = commit_snapshot(spark, dims, note="dims day2", files=new_files)
        commit_catalog(
            cat, {"facts": (facts, f2), "dims": (dims, d2)}, note="day2"
        )
        _CATALOG_CACHE[sf_dir] = cat

    def agg(cv: int) -> DataFrame:
        f = read_catalog_table(spark, cat, "facts", catalog_version=cv)
        d = read_catalog_table(spark, cat, "dims", catalog_version=cv)
        return (
            f.join(F.broadcast(d), "event_type")
            .agg(
                F.count("*").alias("n_joined"),
                F.sum(F.col("event_id") * F.col("mult")).alias(
                    "weighted_ids"
                ),
            )
            .select(
                F.lit(cv).cast("long").alias("catalog_version"),
                "n_joined",
                "weighted_ids",
            )
        )

    return agg(1).unionAll(agg(2))


#: Per-process cache: sf_dir -> catalog root for the concurrent-commit
#: face (the 8-writer race runs once per process).
_CONCURRENT_CAT_CACHE: dict[str, str] = {}


@register(
    "snapshot_catalog_concurrent",
    oracle="""
    SELECT CAST(o_orderkey % 8 AS BIGINT) AS writer_id,
           COUNT(*) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders WHERE o_orderkey < 4000
    GROUP BY o_orderkey % 8
    """,
    tags=("N13", "E2"),
)
def snapshot_catalog_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog commits under REAL multi-writer concurrency: 8
    thread-pool writers each land their own orders slice as an
    independent snapshot table, then race ``commit_catalog`` on one
    catalog root with zero external coordination. The put-if-absent
    protocol must linearize them — the face asserts versions came out
    contiguous 1..8 with all 8 writers present exactly once — and then
    reads EVERY writer's slice back through the catalog version that
    writer won. The output (writer_id, n_rows, sum_key) is a pure
    function of the data even though version assignment is a true
    race, which is exactly the point: concurrency decides only the
    ORDER of the log, never its contents. DuckDB recomputes the slices
    closed-form, so a lost/clobbered/torn commit breaks the hash.
    Thread-pool linearizability drills (racing snapshot commits,
    manifest integrity, no tmp leakage) live in tests/test_snapshots.py."""
    import os
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    from mobility_etl_spark.operators.snapshots import (
        catalog_log,
        commit_catalog,
        commit_snapshot,
        read_catalog_table,
    )

    n = 8
    cat = _CONCURRENT_CAT_CACHE.get(sf_dir)
    if cat is None:
        cat = tempfile.mkdtemp(prefix="snap_cat_race_")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") < 4000
        )

        def writer(i: int) -> int:
            # own table dir -> data writes are safe to run concurrently
            # (no shared _temporary staging); only the CATALOG commit
            # races, which is the protocol under drill
            t = os.path.join(cat, f"slice_{i}")
            orders.filter(F.col("o_orderkey") % n == i).select(
                "o_orderkey"
            ).write.parquet(t)
            sv = commit_snapshot(spark, t, note=f"slice {i}")
            return commit_catalog(
                cat, {"slice": (t, sv)}, note=f"writer-{i}"
            )

        with ThreadPoolExecutor(max_workers=n) as pool:
            versions = list(pool.map(writer, range(n)))
        if sorted(versions) != list(range(1, n + 1)):
            raise RuntimeError(
                f"catalog race lost a commit: versions {sorted(versions)}"
            )
        _CONCURRENT_CAT_CACHE[sf_dir] = cat

    notes = {e["version"]: e["note"] for e in catalog_log(cat)}
    if sorted(notes) != list(range(1, n + 1)) or len(set(notes.values())) != n:
        raise RuntimeError(f"catalog log not linearized: {notes}")
    out = None
    for cv, note in sorted(notes.items()):
        wid = int(note.rsplit("-", 1)[1])
        part = (
            read_catalog_table(spark, cat, "slice", catalog_version=cv)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("o_orderkey").alias("sum_key"),
            )
            .select(
                F.lit(wid).cast("long").alias("writer_id"),
                "n_rows",
                "sum_key",
            )
        )
        out = part if out is None else out.unionAll(part)
    return out
