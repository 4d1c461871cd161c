"""Gates for deterministic sampling (operators/sampling.py).

Oracle parity is covered by test_oracle_parity; here we gate the
*scale-critical properties*: layout-invariance (same rows regardless of
partitioning — the whole point vs RNG sampling), split totality, the
per-class cap, and the no-shuffle plan shape of the narrow ops.
"""

from __future__ import annotations

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
