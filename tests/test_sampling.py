"""Gates for deterministic sampling (operators/sampling.py).

Oracle parity is covered by test_oracle_parity; here we gate the
*scale-critical properties*: layout-invariance (same rows regardless of
partitioning — the whole point vs RNG sampling), split totality, the
per-class cap, and the no-shuffle plan shape of the narrow ops.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.sampling import (
    balanced_sample,
    hash_bucket,
    hash_sample,
    hash_split,
)


def test_split_is_total_and_disjoint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, "doc_id")
    counts = dict(
        split.groupBy("split").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert set(counts) == {"train", "test"}
    assert sum(counts.values()) == docs.count()
    # hash buckets are near-uniform: 80/20 within a loose tolerance
    frac = counts["train"] / sum(counts.values())
    assert 0.70 < frac < 0.90, frac


def test_membership_is_layout_invariant(spark, sf_dir):
    """Re-partitioning the input must not change who lands in train —
    the property RNG-based sample() does NOT have."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = {r[0] for r in hash_split(docs, "doc_id").filter("split = 'train'").collect()}
    b = {
        r[0]
        for r in hash_split(docs.repartition(13, "doc_id"), "doc_id")
        .filter("split = 'train'")
        .collect()
    }
    assert a == b


def test_hash_sample_subset_of_split_universe(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sampled = hash_sample(docs, "doc_id", permille=250)
    n, total = sampled.count(), docs.count()
    assert 0.15 * total < n < 0.35 * total, (n, total)
    # idempotent: sampling the sample with the same permille is a no-op
    assert hash_sample(sampled, "doc_id", permille=250).count() == n


def test_balanced_sample_caps_every_class(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    k = 40
    per_class = (
        balanced_sample(docs, label="lang", key="doc_id", k=k)
        .groupBy("lang")
        .count()
        .collect()
    )
    assert per_class, "expected at least one language class"
    for row in per_class:
        assert row["count"] <= k
    # classes with >= k members are filled exactly to k
    sizes = dict(
        docs.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    got = {r["lang"]: r["count"] for r in per_class}
    for lang, size in sizes.items():
        assert got[lang] == min(size, k)


def test_narrow_ops_plan_without_exchange(spark, sf_dir):
    """hash_split / hash_sample are per-row expressions: their plans
    must contain no Exchange (at 100 TB a sampling pass that shuffles
    the corpus would dominate the job)."""
    docs = load_table(spark, sf_dir, "documents")
    for df in (hash_split(docs, "doc_id"), hash_sample(docs, "doc_id", 250)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_bucket_range_and_determinism(spark):
    df = spark.range(0, 5000).withColumn("b", hash_bucket("id", 100))
    mn, mx = df.agg(F.min("b"), F.max("b")).first()
    assert 0 <= mn and mx <= 99
    # same key -> same bucket across independent evaluations
    again = spark.range(0, 5000).withColumn("b", hash_bucket("id", 100))
    assert df.exceptAll(again).count() == 0


def test_partitioned_ntile_matches_window_ntile(spark, sf_dir):
    """Exact-semantics gate: the bucketed global-rank NTILE must agree
    row-for-row with the literal single-partition window form (which it
    replaced in training_curriculum_phases), across tile counts that
    exercise both the remainder (n % t != 0) and clean-division paths —
    and its plan's only Window must be partitioned (by range bucket)."""
    from pyspark.sql import Window

    from mobility_etl_spark.operators.sampling import partitioned_ntile
    from tools.audit_windows import unpartitioned_windows

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    for t in (4, 7):
        got = partitioned_ntile(docs, t, "n_chars", "doc_id", col="phase")
        ref = docs.select(
            "doc_id",
            "n_chars",
            F.ntile(t).over(Window.orderBy("n_chars", "doc_id")).alias("phase"),
        )
        assert got.exceptAll(ref).union(ref.exceptAll(got)).count() == 0
        assert unpartitioned_windows(got) == [], "global window leaked back"


def test_partitioned_ntile_skewed_and_tiny(spark):
    """Degenerate shapes: constant sort key (every row in one range
    bucket — correctness must not depend on bucket balance) and n <
    tiles (SQL NTILE gives each row its own tile)."""
    from pyspark.sql import Window

    from mobility_etl_spark.operators.sampling import partitioned_ntile

    const = spark.range(0, 97).select(
        F.col("id").alias("k"), F.lit(5).alias("v")
    )
    got = partitioned_ntile(const, 4, "v", "k", col="p")
    ref = const.select(
        "k", "v", F.ntile(4).over(Window.orderBy("v", "k")).alias("p")
    )
    assert got.exceptAll(ref).union(ref.exceptAll(got)).count() == 0

    tiny = spark.range(0, 3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    got = partitioned_ntile(tiny, 5, "v", "k", col="p")
    assert [r["p"] for r in got.orderBy("k").collect()] == [1, 2, 3]


@pytest.mark.slow  # r15: excluded from the default (driver-budget) run; see pytest.ini
def test_partitioned_ntile_fuzz_vs_window_form(spark):
    """Hypothesis fuzz of the flagship ranking operator: random value
    multisets (heavy ties included), random tile counts and bucket
    counts — the bucketed NTILE must equal the literal window NTILE on
    every draw. Catches boundary-placement bugs (duplicate quantiles,
    empty buckets, n < tiles) that fixed fixtures may miss."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window

    from mobility_etl_spark.operators.sampling import partitioned_ntile

    @given(
        vals=st.lists(
            st.integers(min_value=0, max_value=9), min_size=1, max_size=60
        ),
        t=st.integers(min_value=1, max_value=9),
        nb=st.sampled_from([2, 5, 32]),
    )
    @settings(max_examples=25, deadline=None)
    def check(vals, t, nb):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "k long, v long"
        )
        got = partitioned_ntile(df, t, "v", "k", col="p", num_buckets=nb)
        ref = df.select(
            "k", "v", F.ntile(t).over(Window.orderBy("v", "k")).alias("p")
        )
        assert got.exceptAll(ref).union(ref.exceptAll(got)).count() == 0

    check()


def test_bucketed_global_rank_rejects_null_order_keys(spark):
    """Guard (ADVICE r6): NULL order keys would land in bucket 0 while
    Spark windows sort NULLS FIRST and DuckDB ROW_NUMBER defaults
    NULLS LAST — a silent cross-engine divergence for any oracle-gated
    caller.  The operator now raises loudly (counted in the same job
    as the quantile pass, zero extra scans)."""
    import pytest
    from pyspark.sql import functions as F

    from mobility_etl_spark.operators.sampling import bucketed_global_rank

    df = spark.range(100).select(
        F.when(F.col("id") % 10 != 0, F.col("id")).alias("k"),
        F.col("id").alias("tb"),
    )
    with pytest.raises(ValueError, match="NULL"):
        bucketed_global_rank(df, "k", "tb")
    # non-null input still works
    ranked, total = bucketed_global_rank(
        df.filter(F.col("k").isNotNull()), "k", "tb"
    )
    assert total == 90
    got = [r["grank"] for r in ranked.orderBy("k").collect()]
    assert got == list(range(1, 91))
