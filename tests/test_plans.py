"""Physical-plan shape gates (SURVEY.md §4: "verify, don't build").

Correctness says the answer is right; these tests say the PLAN is the
one that survives 100 TB: dimension joins must broadcast (no
sort-merge in star joins), filters and projections must reach the
parquet scan, top-k must plan as TakeOrderedAndProject, and hot
expressions must stay inside whole-stage codegen. A regression here is
a scale bug even when every value still matches the oracle.
"""

from __future__ import annotations

import pytest

from mobility_etl_spark.registry import load_all


def _plan(spark, name: str, sf_dir: str, mode: str = "formatted") -> str:
    spec = load_all()[name]
    df = spec.builder(spark, sf_dir)
    je = df._jdf.queryExecution()
    jvm = spark._jvm
    return je.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_star_join_all_broadcast(spark, sf_dir):
    plan = _plan(spark, "star_join_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "a dim join fell back to sort-merge"
    assert plan.count("BroadcastHashJoin") >= 4  # customer⋈nation⋈region + orders


def test_topk_plans_as_take_ordered(spark, sf_dir):
    plan = _plan(spark, "topk_parts_by_revenue", sf_dir)
    assert "TakeOrderedAndProject" in plan, "top-k must not global-sort"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, "filter_predicates", sf_dir)
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate, not an empty list
    assert "PushedFilters: []" not in plan.split("PushedFilters:", 1)[1][:200]


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, "topk_parts_by_revenue", sf_dir)
    # lineitem scan must read only the join/agg columns, never the full row
    read_schemas = [
        seg.split("\n", 1)[0]
        for seg in plan.split("ReadSchema: ")[1:]
    ]
    assert read_schemas, "no ReadSchema in plan"
    assert not any("l_comment" in s or "l_shipinstruct" in s for s in read_schemas)
    widest = max(read_schemas, key=len)
    assert widest.count(",") <= 8, f"scan reads too many columns: {widest}"


def test_agg_is_partial_then_final(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    # map-side combine: two HashAggregate levels around one Exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_whole_stage_codegen_covers_agg(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir, mode="codegen")
    # codegen explain lists generated subtrees even before AQE finalizes
    assert "WholeStageCodegen" in plan, "agg pipeline fell out of codegen"


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join (union + window) must shuffle once for the window
    sort — not once per side plus a join shuffle."""
    tree = _plan(spark, "asof_join_events", sf_dir).split("\n\n")[0]
    # Exchanges in the operator tree: one hashpartitioning for the
    # window + one inside the pre-agg of the observation side. A
    # join-based rewrite would add more.
    assert tree.count("Exchange") <= 2, tree
    assert "SortMergeJoin" not in tree


def test_broadcast_dims_in_anti_join(spark, sf_dir):
    plan = _plan(spark, "manifest_incremental", sf_dir)
    assert "BroadcastHashJoin LeftAnti" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    )


def test_sort_within_partitions_no_exchange(spark, sf_dir):
    """E20's physical half: sortWithinPartitions must not shuffle —
    it's the write-path ordering primitive (row-group clustering for
    better min/max pruning) and a global Exchange would defeat it."""
    from mobility_etl_spark.io import load_table

    df = load_table(spark, sf_dir, "lineitem").sortWithinPartitions("l_shipdate")
    tree = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    ).split("\n\n")[0]
    assert "Sort" in tree
    assert "Exchange" not in tree


def test_range_join_avoids_nested_loop(spark, sf_dir):
    """interval_join must plan as a hash join on time buckets — a
    BroadcastNestedLoopJoin/CartesianProduct here is the O(n·m) plan
    that dies at 100 TB (operators/rangejoin.py)."""
    plan = _plan(spark, "range_join_events", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """A partitioned fact joined to a filtered dim must prune
    partitions at runtime (DPP): the scan's PartitionFilters must
    carry a dynamicpruning subquery — at 100 TB this is the difference
    between scanning one day and scanning the lake."""
    import pyspark.sql.functions as F

    from mobility_etl_spark.io import load_table, with_time_partitions

    events = with_time_partitions(load_table(spark, "/root/testdata/sf0.001", "events"))
    root = str(tmp_path / "events_part")
    events.write.partitionBy("dt").mode("overwrite").parquet(root)
    fact = spark.read.parquet(root)
    dim = (
        events.select("dt", "user_id")
        .distinct()
        .filter(F.col("dt").isin("2024-01-05", "2024-01-06"))
    )
    joined = fact.join(F.broadcast(dim), "dt").groupBy("dt").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_cdc_merge_anti_join_broadcasts(spark, sf_dir):
    """cdc_merge_orders: the survivors anti-join must broadcast the
    feed's keys (digests-not-payloads) — a sort-merge anti here means
    the target lake gets shuffled to refresh a day-sized feed."""
    plan = _plan(spark, "cdc_merge_orders", sf_dir)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin LeftAnti" not in plan.replace("(", " ").replace(")", " ")


def test_gap_fill_single_shuffle_for_fill(spark, sf_dir):
    """gap_fill_daily_user_values: the forward-fill window must reuse
    the grid join's hash partitioning on user_id — the fill itself may
    not introduce a second full-data Exchange chain (spine generation
    and the bounds agg are tiny side plans)."""
    plan = _plan(spark, "gap_fill_daily_user_values", sf_dir)
    assert "Window" in plan
    # window sort is within partitions, never a global Sort+Exchange(range)
    assert "rangepartitioning" not in plan.lower()


def test_incremental_rollup_reuses_grouping(spark, sf_dir):
    """incremental_rollup_events: merge(base, delta) re-aggregates the
    union of partials — the plan must stay partial->final hash
    aggregation with no sort-based fallback."""
    plan = _plan(spark, "incremental_rollup_events", sf_dir)
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert "ObjectHashAggregate" not in plan


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime row-level filtering: a selective dimension filter on the
    build side must inject a bloom-filter semi-filter into the fact
    scan (might_contain over the join key) when the join can't
    broadcast — at 100 TB this drops most of the probe side's shuffle
    bytes before the Exchange. The conf knobs are thresholds, not
    switches: production sizes cross them naturally; the test lowers
    them to make local[32]-sized data qualify."""
    import pyspark.sql.functions as F

    from mobility_etl_spark.io import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        # parity: the filtered join returns exactly the unfiltered count
        n_bloom = joined.count()
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            saved[
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
            ],
        )
        assert (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
            == n_bloom
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_join_strategy_hints(spark, sf_dir):
    """Join-strategy hints are honored: SHUFFLE_HASH plans a
    ShuffledHashJoin (skips both sides' sorts — the medium⋈huge win
    when the build side's partitions fit executor memory), MERGE plans
    SortMergeJoin; results are row-identical. Hints matter at 100 TB
    because the optimizer's size estimates can be stale post-filter —
    this is the escape hatch."""
    import pyspark.sql.functions as F

    from mobility_etl_spark.io import load_table

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")

        def joined(hint):
            return li.join(
                orders.hint(hint),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )

        shj_plan = joined("shuffle_hash")._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin" in shj_plan
        assert "SortMergeJoin" not in shj_plan
        smj_plan = joined("merge")._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in smj_plan
        assert joined("shuffle_hash").count() == joined("merge").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bm25_topk_plans_as_take_ordered(spark, sf_dir):
    """BM25's global top-50 must plan as TakeOrderedAndProject (never a
    full sort of the scored corpus) and its df/avgdl lookups must all
    broadcast."""
    plan = _plan(spark, "text_bm25_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_mixture_resample_fact_side_broadcast_only(spark, sf_dir):
    """The mixture resampler's per-class rates must reach the corpus as
    a broadcast: the only Exchanges allowed are for the tiny aggregates
    themselves, never a repartition of the document side."""
    plan = _plan(spark, "resample_lang_mixture", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunking_is_map_only(spark, sf_dir):
    """Document chunking must not shuffle: scan → generate → project."""
    plan = _plan(spark, "text_chunk_windows", sf_dir, mode="simple")
    assert "Exchange" not in plan


def test_stock_scan_defaults_parallelize_realistic_layout(spark, tmp_path):
    """VERDICT r03 #5: bench.py's 1 MB maxPartitionBytes is
    measurement-harness tuning only. The ENGINE's own defaults must
    (a) contain no scan-split tuning, and (b) still parallelize a
    realistically-laid-out fact table — the sf0.1 lineitem bytes
    written as 16 files, what any distributed writer produces — across
    >= cores/2 scan tasks on a stock session. The driver's
    single-file/single-row-group testdata is the only shape that needs
    the bench override; engine speedups must not depend on it."""
    from mobility_etl_spark.session import _BUILD_DEFAULTS, _RUNTIME_DEFAULTS

    tuned = [
        k
        for k in (*_BUILD_DEFAULTS, *_RUNTIME_DEFAULTS)
        if "maxPartitionBytes" in k or "openCostInBytes" in k
    ]
    assert tuned == [], f"engine defaults carry scan tuning: {tuned}"
    assert (
        spark.conf.get("spark.sql.files.maxPartitionBytes")
        == str(128 * 1024 * 1024) + "b"
        or spark.conf.get("spark.sql.files.maxPartitionBytes")
        == str(128 * 1024 * 1024)
    )

    layout = str(tmp_path / "lineitem16")
    spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").repartition(
        16
    ).write.mode("overwrite").parquet(layout)
    cores = spark.sparkContext.defaultParallelism
    scan_parts = spark.read.parquet(layout).rdd.getNumPartitions()
    assert scan_parts >= cores // 2, (
        f"stock session scans 16-file lineitem with {scan_parts} tasks; "
        f"need >= {cores // 2} of {cores} cores busy"
    )


def test_outlier_zscore_fact_side_broadcast_only(spark, sf_dir):
    """Group-statistics normalization must broadcast the tiny stats
    side; the event table itself never shuffles (no SortMergeJoin, no
    repartition of the fact side)."""
    plan = _plan(spark, "outlier_zscore_events", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_map_only(spark, sf_dir):
    """Per-row weighted hash sampling is a pure filter: no Exchange."""
    plan = _plan(spark, "weighted_sample_docs", sf_dir, mode="simple")
    assert "Exchange" not in plan


def test_group_split_single_exchange(spark, sf_dir):
    """Group-aware split = map-side tag + one aggregation shuffle."""
    plan = _plan(spark, "training_group_split", sf_dir, mode="simple")
    assert plan.count("Exchange") <= 2  # partial/final agg exchange only
    assert "SortMergeJoin" not in plan


def test_sessionize_single_exchange(spark, sf_dir):
    """Both windows and the final groupBy share the user_id
    partitioning: Catalyst must plan exactly one shuffle."""
    plan = _plan(spark, "sessionize_events_ids", sf_dir, mode="simple")
    assert plan.count("Exchange") == 1, plan


def test_m4_single_exchange(spark, sf_dir):
    """M4's two rank windows + groupBy share (user_id, bucket)-compatible
    partitioning on user_id-derived keys — at most 2 Exchanges (window
    keys vs agg keys), never a per-window reshuffle."""
    plan = _plan(spark, "timeseries_m4_downsample", sf_dir, mode="simple")
    assert plan.count("Exchange") <= 2, plan


def test_decontaminate_eval_side_broadcasts(spark, sf_dir):
    """The benchmark shingle set must broadcast onto the corpus side."""
    plan = _plan(spark, "text_decontaminate_ngram", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Repo-wide global-window inventory (VERDICT r5 item 3)
# ---------------------------------------------------------------------------

#: Every registered face whose physical plan may contain a Window-family
#: node with an EMPTY partitionSpec. Each entry's window input is bounded
#: by construction (justification beside it); ANY other face acquiring an
#: unpartitioned window is a scale regression and fails the sweep below.
GLOBAL_WINDOW_ALLOWLIST = {
    # one row per price bucket (O(price_range / bucket)), curation2.py
    "pareto_frontier_parts",
    # rank windows run over the two <=100-row TakeOrderedAndProject
    # outputs and their <=200-row RRF union, retrieval.py
    "rag_hybrid_retrieval",
    # rank window over the orderBy().limit(50) head, corpus_prep.py
    "text_bm25_topk",
    # windows over O(shuffle_partitions * k) merged Misra-Gries
    # partials, operators/sketch.py
    "token_heavy_hitters_mg",
    # same bounded MG compress feeding the candidate set of the
    # exact-recount face (r11 session 2), queries/sketches.py
    "token_hh_mg_verified",
    # Hamilton-allocation leftover rank over ONE ROW PER STRATUM
    # (|languages|-bounded), queries/sampling.py
    "stratified_quota_sample",
}


@pytest.mark.slow  # r15: excluded from the default (driver-budget) run; see pytest.ini
def test_no_unbounded_global_windows(spark, sf_dir):
    """Walk EVERY registered query's physical plan (subqueries included)
    and assert the set of faces containing an unpartitioned
    Window-family node is EXACTLY the allowlist above — each of whose
    window inputs is provably bounded. This is the gate that keeps the
    round-5 defects (global NTILE in training_curriculum_phases, full
    vocab rank in text_oov_rate, q15's empty-frame window max) from
    coming back: all three now plan without any global window."""
    from mobility_etl_spark.registry import load_all
    from tools.audit_windows import unpartitioned_windows

    flagged: dict[str, list[str]] = {}
    for name, spec in sorted(load_all().items()):
        hits = unpartitioned_windows(spec.builder(spark, sf_dir))
        if hits:
            flagged[name] = hits
    unexpected = {n: h for n, h in flagged.items()
                  if n not in GLOBAL_WINDOW_ALLOWLIST}
    stale = GLOBAL_WINDOW_ALLOWLIST - flagged.keys()
    assert not unexpected, f"new unpartitioned global windows: {unexpected}"
    assert not stale, (
        f"allowlist entries no longer have global windows (prune them "
        f"so the inventory stays exact): {stale}"
    )


#: Source sites that construct a GLOBAL window (`Window.orderBy` with
#: no partitionBy). Each is bounded by construction; the plan-level
#: sweep above covers returned DataFrames, but SIDE computations
#: (collects inside a builder) never reach it — this textual tripwire
#: does. file -> expected count.
GLOBAL_WINDOW_SOURCE_SITES = {
    # O(partitions·k) merged Misra-Gries partials
    "operators/sketch.py": 1,
    # one row per skyline price bucket
    "queries/curation2.py": 1,
    # rank over the orderBy().limit(50) head
    "queries/corpus_prep.py": 1,
    # rank windows over two <=100-row TakeOrdered outputs + RRF union
    "queries/retrieval.py": 2,
    # Hamilton leftover rank over one row per stratum (|languages|)
    "queries/sampling.py": 1,
}


def test_global_window_source_sites_are_pinned():
    """Grep-level inventory of `Window.orderBy(` construction without
    partitionBy, covering code paths the physical-plan sweep cannot
    see (windows executed in builder-side collects — exactly how the
    temporal-split cutoff briefly reintroduced a single-partition
    rank). New sites must be justified here or rewritten with
    bucketed_global_rank / orderBy().limit(k)."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent / "mobility_etl_spark"
    found: dict[str, int] = {}
    for f in root.rglob("*.py"):
        n = 0
        for line in f.read_text().splitlines():
            if "Window.orderBy(" in line and "partitionBy" not in line:
                n += 1
        if n:
            found[str(f.relative_to(root))] = n
    assert found == GLOBAL_WINDOW_SOURCE_SITES, found


def test_aqe_skew_join_splits_planted_hot_key(spark):
    """The no-manual-salt story at 100 TB, demonstrated rather than
    asserted: AQE's skew-join rule must actually SPLIT a planted hot
    key (executedPlan carries the ``SortMergeJoin(skew=true)``
    annotation) — and the split run's values must equal the untouched
    session's answer for the same query.

    Runs the skewjoin_aqe_identity shape at sf0.1 on a SCRATCH session
    (``newSession`` shares the JVM but has its own SQLConf) with the
    256 MB skew threshold lowered to test scale — production keeps the
    defaults; only the magnitudes shrink here, not the mechanism. Two
    empirically-found preconditions, both documented in the face's
    docstring: the skewed side needs multiple MAP outputs (AQE splits
    at map granularity — hence the repartition(16) standing in for a
    real multi-file scan), and both join children must be bare
    shuffles (an agg between shuffle and join makes the rule skip)."""
    from mobility_etl_spark.registry import load_all

    sf01 = "/root/testdata/sf0.1"
    builder = load_all()["skewjoin_aqe_identity"].builder

    s2 = spark.newSession()
    for k, v in {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }.items():
        s2.conf.set(k, v)

    skewed = builder(s2, sf01)
    got = sorted(map(tuple, skewed.collect()))
    plan = skewed._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, "AQE did not split the planted hot key"

    want = sorted(map(tuple, builder(spark, sf01).collect()))
    assert got == want
