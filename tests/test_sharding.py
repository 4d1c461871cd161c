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
    e0 = {r.doc_id: (r.shard_id, r.epoch_pos) for r in _sharded(spark, sf_dir, 0).collect()}
    e1 = {r.doc_id: (r.shard_id, r.epoch_pos) for r in _sharded(spark, sf_dir, 1).collect()}
    assert set(e0) == set(e1)  # same corpus
    moved = sum(1 for k in e0 if e0[k][0] != e1[k][0])
    # a fresh deal moves ~(1 - 1/n_shards) of docs to a new shard
    assert moved / len(e0) > 0.8


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
