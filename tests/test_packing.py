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


def test_pretraining_full_semantic_margin_and_stage_activity():
    """Guards for the pipeline_pretraining_full capstone: (a) the
    semantic-dedup decision is margin-protected — no embedding pair's
    cosine lies within 1e-6 of τ=0.47 at ANY tested SF (measured gaps
    are ≥ 2.4e-5, seven orders of magnitude above the ~1e-13
    double-arithmetic engine noise), so no drop decision can flip; (b)
    every stage of the chain actually does work at sf0.01 (a stage
    silently degenerating to identity would keep the oracle green
    while proving nothing about composition)."""
    import duckdb
    import numpy as np

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        con = duckdb.connect()
        vecs = con.execute(
            f"SELECT embedding FROM '{sf}/embeddings.parquet' ORDER BY vec_id"
        ).fetchnumpy()["embedding"]
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cos = m @ m.T
        off = cos[np.triu_indices(len(m), k=1)]
        gap = np.abs(off - 0.47).min()
        assert gap > 1e-6, f"{sf}: pair within {gap} of tau"

    con = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    con.execute(
        f"CREATE VIEW documents AS FROM '{sf}/documents.parquet';"
        f"CREATE VIEW embeddings AS FROM '{sf}/embeddings.parquet'"
    )
    n = lambda q: con.execute(q).fetchone()[0]  # noqa: E731
    n_docs = n("SELECT COUNT(*) FROM documents")
    n_s1 = n(
        "SELECT COUNT(*) FROM documents "
        "WHERE len(string_split(text,' ')) BETWEEN 50 AND 2000"
    )
    assert 0 < n_s1 < n_docs  # quality gate prunes
    n_sem = n(
        """
        WITH s1 AS (SELECT doc_id FROM documents
                    WHERE len(string_split(text,' ')) BETWEEN 50 AND 2000),
        e AS (SELECT s.doc_id, CAST(embedding AS DOUBLE[]) AS v
              FROM s1 s JOIN embeddings emb ON emb.vec_id = s.doc_id)
        SELECT COUNT(DISTINCT b.doc_id) FROM e a JOIN e b
        ON a.doc_id < b.doc_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.47
        """
    )
    assert n_sem >= 1  # semantic dedup drops someone
    n_contam = n(
        """
        WITH g AS (
            SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS ng
            FROM (SELECT doc_id, string_split(text,' ') AS toks
                  FROM documents),
                 LATERAL (SELECT unnest(
                     generate_series(1, len(toks) - 4)) AS i)),
        ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 97 = 0)
        SELECT COUNT(DISTINCT g.doc_id) FROM g JOIN ev USING (ng)
        WHERE g.doc_id % 97 <> 0
        """
    )
    assert n_contam >= 1  # decontamination drops someone
    lo, hi = con.execute(
        """
        WITH s1 AS (SELECT doc_id, lang FROM documents
                    WHERE len(string_split(text,' ')) BETWEEN 50 AND 2000)
        SELECT MIN(c), MAX(c) FROM (
            SELECT COUNT(*) AS c FROM s1 GROUP BY lang)
        """
    ).fetchone()
    assert lo < hi  # mixture quota actually rebalances


def test_mixture_pack_curriculum_survives_100tb_doc_ids(spark):
    """r12 review: the stage 4-6 multiplicative hashes lacked the
    premod reduction and overflowed int64 (ANSI ArithmeticException)
    once doc_id passed ~3.47e9 — exactly the id range a 100 TB corpus
    reaches. With the (doc_id % 1000003) premod the pipeline must run
    clean on ids straddling that threshold; values at current SFs are
    unchanged (premod is the identity below 1000003, which the
    capstone oracles re-verify)."""
    from pyspark.sql import functions as F

    from mobility_etl_spark.queries.corpus_prep import (
        mixture_pack_curriculum,
    )

    s3 = spark.range(5_000_000_000, 5_000_000_400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        (F.col("id") % 400 + 60).cast("int").alias("n_tokens"),
    )
    out = mixture_pack_curriculum(spark, s3).collect()
    assert len(out) > 0
    assert sum(r.n_docs for r in out) > 0
