"""Sequence-packing gates (operators/packing.py) — the rows-only
driver check's teeth: exactly-once coverage, capacity respected,
near-optimal bin count, and determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.packing import bin_stats, pack_sequences

CAPACITY = 512


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def packed(docs):
    return pack_sequences(
        docs, "doc_id", "n_tokens", capacity=CAPACITY, num_groups=8
    ).localCheckpoint(eager=True)


def test_every_doc_packed_exactly_once(docs, packed):
    n_docs = docs.count()
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs


def test_bins_respect_capacity_except_flagged_overflow(packed):
    stats = bin_stats(packed, "n_tokens", CAPACITY)
    bad = stats.filter(
        (F.col("fill_tokens") > CAPACITY) & ~F.col("has_overflow")
    ).count()
    assert bad == 0
    # an overflow bin is always a solo oversized doc, never a mix
    mixed = stats.filter(F.col("has_overflow") & (F.col("n_docs") > 1)).count()
    assert mixed == 0


def test_bin_count_near_lower_bound(docs, packed):
    """BFD per group must stay close to the global lower bound
    ceil(total_tokens / capacity): allow the theoretical BFD slack
    plus one partial bin per packing group."""
    total = docs.filter(F.col("n_tokens") <= CAPACITY).agg(
        F.sum("n_tokens")
    ).first()[0]
    lower = math.ceil(total / CAPACITY)
    n_bins = (
        bin_stats(packed, "n_tokens", CAPACITY)
        .filter(~F.col("has_overflow"))
        .count()
    )
    assert n_bins >= lower
    assert n_bins <= math.ceil(lower * 11 / 9) + 8, (
        f"{n_bins} bins vs lower bound {lower}: packing efficiency lost"
    )


def test_packing_deterministic(docs, packed):
    again = pack_sequences(
        docs.repartition(13), "doc_id", "n_tokens", capacity=CAPACITY, num_groups=8
    )
    first = {(r.doc_id): (r.pack_group, r.bin_id) for r in packed.collect()}
    second = {(r.doc_id): (r.pack_group, r.bin_id) for r in again.collect()}
    assert first == second, "packing depends on input partitioning"


def test_oversized_docs_flagged(spark):
    df = spark.createDataFrame(
        [(1, 700), (2, 100), (3, 500), (4, 20)], "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, "doc_id", "n_tokens", capacity=512, num_groups=2)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].overflow is True
    assert all(not rows[k].overflow for k in (2, 3, 4))
    # the oversized bin contains only doc 1
    solo_bin = rows[1].bin_id
    assert [k for k, r in rows.items() if r.bin_id == solo_bin] == [1]


def test_bin_ids_unique_across_groups(packed):
    """ADVICE r03: bin_id = group * stride + index must never collide
    across groups — (pack_group, local index) pairs and distinct
    bin_ids must be 1:1."""
    from mobility_etl_spark.operators.packing import _BIN_STRIDE

    n_pairs = (
        packed.select("pack_group", "bin_id").distinct().count()
    )
    n_ids = packed.select("bin_id").distinct().count()
    assert n_pairs == n_ids
    # every bin_id decodes back to its own group under the stride
    bad = packed.filter(
        (F.col("bin_id") - F.col("pack_group") * _BIN_STRIDE < 0)
        | (F.col("bin_id") - F.col("pack_group") * _BIN_STRIDE >= _BIN_STRIDE)
    ).count()
    assert bad == 0
