"""Scale-utility gates (SURVEY.md §2.C): bucketed joins must plan
shuffle-free; salted joins must be row-identical to unsalted."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.scale import salted_join, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force non-broadcast strategies so the bucket/salt machinery is
    actually exercised."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(
        orders, "b_orders", str(tmp_path / "bo"), ("o_custkey",), 8,
        sort_cols=("o_custkey",),
    )
    write_bucketed(
        customer, "b_customer", str(tmp_path / "bc"), ("c_custkey",), 8,
        sort_cols=("c_custkey",),
    )
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        tree = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ).split("\n\n")[0]
        assert "SortMergeJoin" in tree
        assert "Exchange" not in tree, f"bucketed join still shuffles:\n{tree}"
        # and it's correct
        assert joined.count() == orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_matches_plain_join(spark, sf_dir, no_broadcast):
    # manufacture pathological skew: 80% of rows share one key
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.when(F.col("event_id") % 5 != 0, F.lit(1)).otherwise(
            F.col("event_id") % 100
        )
    )
    dim = spark.range(100).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 10).alias("weight"),
    )
    plain = ev.join(dim, ["k"]).agg(
        F.count("*").alias("n"), F.sum("weight").alias("w")
    ).collect()[0]
    salted = salted_join(ev, dim, ["k"], n_salts=8).agg(
        F.count("*").alias("n"), F.sum("weight").alias("w")
    ).collect()[0]
    assert (plain.n, plain.w) == (salted.n, salted.w)
    assert plain.n > 0


def test_salted_join_left_outer(spark, sf_dir, no_broadcast):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.col("event_id") % 200  # keys 100..199 miss the dim
    )
    dim = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("hit"))
    plain = ev.join(dim, ["k"], "left").filter(F.col("hit").isNull()).count()
    salted = (
        salted_join(ev, dim, ["k"], n_salts=4, how="left")
        .filter(F.col("hit").isNull())
        .count()
    )
    assert plain == salted > 0


def test_zorder_write_tightens_file_stats(spark, sf_dir, tmp_path):
    """Z-ordered files must be small hyper-rectangles in BOTH clustered
    dimensions: per-file (max-min) spans — the stat parquet row-group
    pruning consumes — shrink far below the global span for user_id AND
    value, while a linear sort on user_id leaves value spans at ~100%."""
    import pathlib

    import pyarrow.parquet as pq

    from mobility_etl_spark.operators.scale import zorder_write

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )

    def mean_span(path, col):
        spans, lo, hi = [], [], []
        for f in pathlib.Path(path).rglob("*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            fmin = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            spans.append(fmax - fmin)
            lo.append(fmin)
            hi.append(fmax)
        return (sum(spans) / len(spans)) / (max(hi) - min(lo))

    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(ev, zpath, ("user_id", "value"), n_files=16)
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    assert spark.read.parquet(zpath).count() == ev.count()  # lossless
    # linear layout: leading key prunes perfectly, second dim barely
    assert mean_span(lpath, "user_id") < 0.1
    # z-order: BOTH dimensions prune — the second dimension's spans
    # must shrink well below the linear layout's, the first must stay
    # a fraction of the global span (coarser than a pure sort, by
    # design — that's the trade for pruning on every dimension).
    assert mean_span(zpath, "value") < 0.6 * mean_span(lpath, "value")
    assert mean_span(zpath, "user_id") < 0.65
    assert mean_span(zpath, "value") < 0.5


def test_detect_hot_keys_finds_planted_skew(spark, sf_dir):
    """A key holding ~1/3 of all rows must surface; near-uniform keys
    must not. The diagnosis pass shuffles only MG counter rows, never
    the key space (no exploded groupBy over keys in the plan)."""
    from mobility_etl_spark.operators.scale import detect_hot_keys

    ev = load_table(spark, sf_dir, "events")
    skewed = ev.withColumn(
        "k",
        F.when(F.col("event_id") % 3 == 0, F.lit(777)).otherwise(
            F.col("event_id") % 5000
        ),
    )
    hot = detect_hot_keys(skewed, ("k",), skew_factor=8.0)
    assert any("777" in key for key, _ in hot)
    assert len(hot) <= 4  # no false flood
    uniform = ev.withColumn("k", F.col("event_id") % 50)
    assert detect_hot_keys(uniform, ("k",), skew_factor=8.0) == []


def test_auto_salted_join_routes_by_diagnosis(spark, sf_dir, no_broadcast):
    """Skewed input → salted plan (salt column visible in the plan);
    uniform input → plain join; both row-identical to the plain join."""
    from mobility_etl_spark.operators.scale import auto_salted_join

    dim = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("hit"))
    skewed = load_table(spark, sf_dir, "events").withColumn(
        "k", F.when(F.col("event_id") % 3 != 0, F.lit(7)).otherwise(
            F.col("event_id") % 100
        )
    )
    uniform = load_table(spark, sf_dir, "events").withColumn(
        "k", F.col("event_id") % 100
    )
    for df, expect_salt in ((skewed, True), (uniform, False)):
        joined = auto_salted_join(df, dim, ["k"])
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert ("__salt" in plan) == expect_salt
        assert joined.count() == df.join(dim, ["k"]).count()


def test_salted_join_zipf_hot_key_exact_and_full_row_hash(spark, no_broadcast):
    """VERDICT r11 #5: salted == unsalted on a genuinely Zipf-skewed
    corpus (hot key ~40% of mass, power-law tail), compared by FULL
    row multiset hash, not just aggregates — the per-row deterministic
    salt (xxhash64 + dup-rank) may not lose, duplicate, or mutate a
    single row, including byte-identical duplicate rows on the hot
    key."""
    # Zipf via inverse-CDF on a power law: key = floor(u^(-1/a)) caps
    # give the classic hot-head / long-tail shape, deterministic from
    # the id (no RNG state)
    n = 200_000
    ev = spark.range(n).select(
        F.least(
            (F.lit(1.0) / F.pow((F.col("id") % 9973 + 1) / 9973.0, 1.1))
            .cast("long"),
            F.lit(499),
        ).alias("k"),
        (F.col("id") % 7).alias("payload"),  # duplicates WITHIN hot key
    )
    dim = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    hot_share = (
        ev.groupBy("k").count().orderBy(F.desc("count")).first()["count"] / n
    )
    assert hot_share > 0.25, f"fixture lost its skew ({hot_share:.2f})"

    def row_hash(df):
        # decimal sum: 200k int64 hashes overflow a BIGINT accumulator
        return df.select(
            F.sum(
                F.xxhash64("k", "payload", "w").cast("decimal(38,0)")
            ).alias("h"),
            F.count("*").alias("n"),
        ).collect()[0]

    plain = row_hash(ev.join(dim, ["k"]))
    salted = row_hash(salted_join(ev, dim, ["k"], n_salts=16))
    assert (plain.h, plain.n) == (salted.h, salted.n)
    assert plain.n == n  # every event key exists in dim


def test_aqe_splits_skewed_join_partition(spark, sf_dir, no_broadcast):
    """VERDICT r11 #5: AQE's skew-join handling (on in session
    defaults) must actually TRIGGER on a hot key — the final adaptive
    plan marks the SortMergeJoin with skew=true — with thresholds
    scaled down to test-data sizes. This pins the config path: if a
    future session default disables AQE skew handling, this fails."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        n = 300_000
        ev = spark.range(n).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = ev.join(dim, ["k"])
        # execute THIS DataFrame's own plan (count() builds a separate
        # QueryExecution and would leave joined's adaptive plan
        # unfinalized)
        assert len(joined.collect()) == n
        final = (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        assert "skew=true" in final, f"AQE skew split did not trigger:\n{final[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_salted_join_chunk_boundaries_nulls_and_map_rejection(
    spark, no_broadcast
):
    """Regression pins for the r12 deterministic salt: duplicate
    counts exact ACROSS the 2^16 chunked-explode boundary (a hot row
    with 70k identical copies spans two chunks), null join keys
    preserved on the left-join path, and map-typed columns rejected
    with a pointed TypeError (Spark can't group or hash them)."""
    ev = spark.createDataFrame(
        [(1, "a")] + [(2, "b")] * 70_000 + [(None, "c")] * 3,
        "k int, payload string",
    )
    dim = spark.createDataFrame([(1, 10), (2, 20)], "k int, w int")
    plain = (
        ev.join(dim, ["k"]).groupBy("k", "payload", "w").count()
        .orderBy("k").collect()
    )
    salted = (
        salted_join(ev, dim, ["k"], n_salts=4)
        .groupBy("k", "payload", "w").count().orderBy("k").collect()
    )
    assert plain == salted
    pl = ev.join(dim, ["k"], "left").groupBy("k").count().orderBy("k").collect()
    sl = (
        salted_join(ev, dim, ["k"], n_salts=4, how="left")
        .groupBy("k").count().orderBy("k").collect()
    )
    assert pl == sl  # nulls and unmatched keys intact
    with pytest.raises(TypeError, match="map-typed"):
        salted_join(
            ev.withColumn("m", F.create_map(F.lit("a"), F.lit(1))),
            dim,
            ["k"],
        )


def test_salted_join_rejects_nested_maps(spark):
    """ADVICE r12: the MapType guard must recurse — a map inside a
    struct or array still reaches groupBy/xxhash64 and fails with an
    opaque Spark error if admitted at the top-level-only check."""
    ev = spark.createDataFrame([(1, "a")], "k int, payload string")
    dim = spark.createDataFrame([(1, 10)], "k int, w int")
    in_struct = ev.withColumn(
        "s", F.struct(F.create_map(F.lit("a"), F.lit(1)).alias("m"))
    )
    with pytest.raises(TypeError, match="map-typed"):
        salted_join(in_struct, dim, ["k"])
    in_array = ev.withColumn(
        "a", F.array(F.create_map(F.lit("a"), F.lit(1)))
    )
    with pytest.raises(TypeError, match="map-typed"):
        salted_join(in_array, dim, ["k"])
    # a plain struct/array without maps still salts fine
    ok = ev.withColumn("s", F.struct(F.lit(1).alias("x")))
    assert salted_join(ok, dim, ["k"], n_salts=2).count() == 1
