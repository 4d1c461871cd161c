"""Dataloader sharding gates (operators/sharding.py): the properties a
trainer relies on — determinism, total coverage, contiguous in-shard
positions, epoch-to-epoch re-dealing, and shard balance."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.sharding import assign_shards, shard_manifest

N_SHARDS = 16


def _sharded(spark, sf_dir, epoch):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return assign_shards(docs, "doc_id", N_SHARDS, epoch=epoch)


def test_assignment_deterministic_and_total(spark, sf_dir):
    a = {(r.doc_id, r.shard_id, r.epoch_pos) for r in _sharded(spark, sf_dir, 0).collect()}
    b = {(r.doc_id, r.shard_id, r.epoch_pos) for r in _sharded(spark, sf_dir, 0).collect()}
    assert a == b  # pure function of (key, epoch)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(a) == n_docs  # every doc exactly once
    assert {s for _, s, _ in a} <= set(range(N_SHARDS))


def test_positions_contiguous_per_shard(spark, sf_dir):
    """epoch_pos must be exactly 1..n_rows per shard — the resumability
    contract (a trainer seeks to position k and reads forward)."""
    man = shard_manifest(_sharded(spark, sf_dir, 0)).collect()
    for r in man:
        assert r.first_pos == 1
        assert r.last_pos == r.n_rows


def test_epoch_changes_redeal_membership_and_order(spark, sf_dir):
    """A fresh deal, NOT a shard-label rotation: per-key label
    inequality alone is satisfied by shard(k, e+1) = shard(k, e) + c,
    which re-reads the same members in the same order under a new
    label (the review-caught affine-epoch bug). Gate the actual
    property: no epoch-1 shard may substantially coincide with ANY
    epoch-0 shard, and in-shard order must decorrelate."""
    e0 = {r.doc_id: (r.shard_id, r.epoch_pos) for r in _sharded(spark, sf_dir, 0).collect()}
    e1 = {r.doc_id: (r.shard_id, r.epoch_pos) for r in _sharded(spark, sf_dir, 1).collect()}
    assert set(e0) == set(e1)  # same corpus
    moved = sum(1 for k in e0 if e0[k][0] != e1[k][0])
    # a fresh deal moves ~(1 - 1/n_shards) of docs to a new shard
    assert moved / len(e0) > 0.8

    shards0: dict[int, set] = {}
    shards1: dict[int, set] = {}
    for k, (s, _) in e0.items():
        shards0.setdefault(s, set()).add(k)
    for k, (s, _) in e1.items():
        shards1.setdefault(s, set()).add(k)
    max_jaccard = max(
        len(a & b) / len(a | b)
        for a in shards0.values()
        for b in shards1.values()
    )
    # uniform re-deal expectation ~ 1/(2*n_shards - 1); a rotation is 1.0
    assert max_jaccard < 0.5, f"epoch deal looks like a rotation ({max_jaccard})"

    # order decorrelation inside the most-overlapping pair of shards
    common_pairs = [
        (a, b)
        for a in shards0.values()
        for b in shards1.values()
        if len(a & b) >= 10
    ]
    for a, b in common_pairs:
        common = sorted(a & b)
        r0 = {k: i for i, k in enumerate(sorted(common, key=lambda k: e0[k][1]))}
        r1 = {k: i for i, k in enumerate(sorted(common, key=lambda k: e1[k][1]))}
        n = len(common)
        d2 = sum((r0[k] - r1[k]) ** 2 for k in common)
        rho = 1 - 6 * d2 / (n * (n * n - 1))
        assert abs(rho) < 0.6, f"in-shard order persists across epochs (rho={rho})"


def test_shards_balanced(spark, sf_dir):
    counts = [r.n_rows for r in shard_manifest(_sharded(spark, sf_dir, 0)).collect()]
    assert len(counts) == N_SHARDS
    mean = sum(counts) / len(counts)
    assert max(counts) < 2 * mean  # no pathological hash clumping
    assert min(counts) > 0


def test_assignment_partitioning_invariant(spark, sf_dir):
    """The shuffle must not depend on input partitioning: 1-partition
    and 13-partition layouts of the same corpus produce identical
    assignments."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    one = {
        tuple(r)
        for r in assign_shards(docs.coalesce(1), "doc_id", N_SHARDS, 2).collect()
    }
    many = {
        tuple(r)
        for r in assign_shards(docs.repartition(13), "doc_id", N_SHARDS, 2).collect()
    }
    assert one == many
