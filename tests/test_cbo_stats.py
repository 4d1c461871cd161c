"""Catalog statistics + cost-based optimization, executed.

At warehouse scale the optimizer's join decisions live or die on
table/column statistics: ANALYZE TABLE feeds rowCount/size and column
NDV/min/max into the catalog, CBO consumes them for cardinality
estimates and join reordering, and the broadcast-vs-shuffle decision
follows sizeInBytes. These tests pin the whole chain on managed
tables: stats land in the catalog, propagate into the optimized plan's
estimates, and a stats-visible small table broadcasts WITHOUT AQE's
runtime rescue (CBO sees it before execution)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table


@pytest.fixture()
def managed_tables(spark, sf_dir):
    """nation (tiny) + orders (larger) as managed catalog tables with
    unique names; dropped afterwards."""
    suffix = uuid.uuid4().hex[:8]
    nat, orders = f"nation_{suffix}", f"orders_{suffix}"
    load_table(spark, sf_dir, "nation").write.saveAsTable(nat)
    load_table(spark, sf_dir, "orders").write.saveAsTable(orders)
    try:
        yield nat, orders
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {nat}")
        spark.sql(f"DROP TABLE IF EXISTS {orders}")


def _row_count_stat(spark, df):
    """Optimizer's cardinality estimate for the plan (Option[BigInt])."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    return int(str(rc.get())) if rc.isDefined() else None


def test_analyze_populates_catalog_stats(spark, managed_tables):
    nat, orders = managed_tables
    spark.sql(f"ANALYZE TABLE {orders} COMPUTE STATISTICS")
    spark.sql(
        f"ANALYZE TABLE {orders} COMPUTE STATISTICS FOR COLUMNS o_custkey"
    )
    desc = {
        r.info_name: r.info_value
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {orders}").selectExpr(
            "col_name AS info_name", "data_type AS info_value"
        ).collect()
    }
    stats_line = desc.get("Statistics", "")
    assert "rows" in stats_line, f"no row stats in catalog: {stats_line!r}"
    col = spark.sql(f"DESCRIBE EXTENDED {orders} o_custkey").collect()
    col_info = {r.info_name: r.info_value for r in col}
    assert col_info.get("distinct_count") not in (None, "NULL"), col_info


def test_cbo_uses_stats_for_plan_estimates(spark, managed_tables):
    nat, orders = managed_tables
    spark.sql(f"ANALYZE TABLE {nat} COMPUTE STATISTICS")
    spark.sql(f"ANALYZE TABLE {orders} COMPUTE STATISTICS")
    old = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        n_exact = spark.table(orders).count()
        est = _row_count_stat(spark, spark.table(orders))
        assert est == n_exact, (
            "with ANALYZE stats + CBO, the optimizer's base-relation "
            f"cardinality must be exact: est={est} actual={n_exact}"
        )
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old)


def test_column_stats_flip_join_strategy_at_compile_time(spark, managed_tables):
    """The CAUSAL chain: a filtered relation's size estimate only
    shrinks when CBO has column stats to estimate the predicate's
    selectivity — without ANALYZE the filter inherits the full scan
    size and the self-join plans as SortMergeJoin; after
    ANALYZE ... FOR COLUMNS the estimate drops under the broadcast
    threshold and the SAME query compiles to BroadcastHashJoin. AQE is
    disabled for the probe, so this is the optimizer's decision from
    catalog stats alone, before any task runs — deleting the ANALYZE
    calls makes this test fail, unlike a bare small-table broadcast
    (file-size stats alone would produce that)."""
    nat, orders = managed_tables
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024))
    try:

        def probe():
            joined = spark.sql(
                f"""
                SELECT * FROM {orders} big
                JOIN (SELECT * FROM {orders} WHERE o_custkey < 10) small
                  ON big.o_orderkey = small.o_orderkey
                """
            )
            return joined._jdf.queryExecution().sparkPlan().toString()

        before = probe()
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before, (
            "precondition: without stats the filtered side must carry the "
            "full scan size and shuffle-join"
        )
        spark.sql(f"ANALYZE TABLE {orders} COMPUTE STATISTICS")
        spark.sql(
            f"ANALYZE TABLE {orders} COMPUTE STATISTICS "
            "FOR COLUMNS o_custkey, o_orderkey"
        )
        after = probe()
        assert "BroadcastHashJoin" in after and "SortMergeJoin" not in after, (
            "column stats must shrink the filtered estimate below the "
            "broadcast threshold at compile time"
        )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
