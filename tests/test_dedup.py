"""Quality gates for approximate dedup (SURVEY.md §7 hard-part 6):
approx results can't be hash-compared to an oracle, so they get recall
and monotonicity gates against the exact ground truth at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.operators.dedup import (
    exact_dedup,
    hamming_distance,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
)
from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import load_all


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)


def test_exact_dedup_idempotent(spark, docs):
    """f(f(x)) == f(x): dedup of a deduped corpus is the identity."""
    once = exact_dedup(docs, "text", "doc_id")
    twice = exact_dedup(once.drop("n_copies"), "text", "doc_id")
    assert once.count() == twice.count()
    assert twice.filter(F.col("n_copies") > 1).count() == 0


def test_exact_dedup_with_planted_duplicates(spark, docs):
    """Plant exact copies; dedup must collapse them to the min doc_id."""
    clones = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    corpus = docs.unionByName(clones)
    deduped = exact_dedup(corpus, "text", "doc_id")
    assert deduped.count() == docs.count()
    # survivors of the planted dupes must be the original (min) ids
    assert deduped.filter(F.col("doc_id") >= 100000).count() == 0
    assert deduped.filter(F.col("n_copies") == 2).count() == 5


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """LSH candidates must recover ≥90% of true Jaccard≥0.3 pairs and
    the verified output must be a subset of the exact pairs."""
    sh = shingles(docs, "text", "doc_id", n=3)
    truth = {
        (r["key_a"], r["key_b"])
        for r in jaccard_pairs(sh, "doc_id", min_jaccard=0.3).collect()
    }
    sigs = minhash_signatures(sh, "doc_id", num_perm=32)
    cands = lsh_candidate_pairs(sigs, "doc_id", num_perm=32, bands=8)
    verified = {
        (r["key_a"], r["key_b"])
        for r in jaccard_pairs(sh, "doc_id", candidates=cands, min_jaccard=0.3).collect()
    }
    assert verified <= truth
    if truth:
        recall = len(verified) / len(truth)
        assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9 ({len(truth)} true pairs)"


def test_simhash_near_for_similar_far_for_dissimilar(spark, docs):
    """Planted near-duplicates must have smaller hamming distance than
    the average unrelated pair."""
    # near-dup: copy docs, drop the last token
    mutated = docs.limit(20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ')").alias(
            "text"
        ),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    sh = simhash(corpus, "text", "doc_id")
    a = sh.alias("a")
    b = sh.alias("b")
    joined = a.join(b, F.col("a.doc_id") + 100000 == F.col("b.doc_id")).select(
        (
            hamming_distance("a.simhash_lo", "b.simhash_lo")
            + hamming_distance("a.simhash_hi", "b.simhash_hi")
        ).alias("d")
    )
    near_avg = joined.agg(F.avg("d")).first()[0]
    far = (
        a.join(b, F.col("a.doc_id") + 7 == F.col("b.doc_id"))
        .select(
            (
                hamming_distance("a.simhash_lo", "b.simhash_lo")
                + hamming_distance("a.simhash_hi", "b.simhash_hi")
            ).alias("d")
        )
        .agg(F.avg("d"))
        .first()[0]
    )
    assert near_avg < far, f"simhash near {near_avg} !< far {far}"


def test_minhash_query_subset_of_exact(spark, sf_dir):
    """The registered minhash query's pairs ⊆ the exact query's pairs."""
    specs = load_all()
    exact = {
        (r["key_a"], r["key_b"])
        for r in specs["ngram_jaccard_pairs"].builder(spark, sf_dir).collect()
    }
    approx = {
        (r["key_a"], r["key_b"])
        for r in specs["minhash_near_dup"].builder(spark, sf_dir).collect()
    }
    assert approx <= exact


def test_approx_count_distinct_within_bound(spark, sf_dir):
    """HLL (E14) can't hash-match an oracle; gate its relative error
    instead (rsd default 0.05 → generous 10% test bound)."""
    from mobility_etl_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    approx = ev.agg(
        F.approx_count_distinct("user_id").alias("a")
    ).collect()[0].a
    assert abs(approx - exact) / exact <= 0.10


def test_connected_components_chain_clique_isolated(spark):
    """operators/components.py on a known graph: a 4-chain (diameter 3,
    needs >1 propagation round), a triangle, and an isolated node."""
    from mobility_etl_spark.operators.components import connected_components

    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]], "id long")
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)], "a long, b long"
    )
    got = {
        r.id: r.component
        for r in connected_components(nodes, edges, "id", "a", "b").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_minhash_signature_mergeable_across_shards(spark, sf_dir):
    """MinHash signatures are MERGEABLE: elementwise min of the
    signatures of any partition of a document's shingle set equals the
    signature of the whole set (min is associative/commutative). This
    is the property that lets a 100 TB corpus build signatures
    shard-by-shard — or update a stored signature incrementally when a
    document grows — without ever re-reading processed text, the same
    persistence story gated for HLL and Misra-Gries."""
    from pyspark.sql import functions as F

    from mobility_etl_spark.io import load_table
    from mobility_etl_spark.operators.dedup import minhash_signatures, shingles

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    sh = shingles(docs, "text", "doc_id")
    whole = {
        r.doc_id: list(r.signature)
        for r in minhash_signatures(sh, "doc_id").collect()
    }
    # deterministic 2-way shard of each doc's shingle SET
    shard = sh.withColumn("s", F.pmod(F.xxhash64("shingle"), F.lit(2)))
    parts = [
        {
            r.doc_id: list(r.signature)
            for r in minhash_signatures(
                shard.filter(F.col("s") == i).drop("s"), "doc_id"
            ).collect()
        }
        for i in (0, 1)
    ]
    assert set(whole) == set(parts[0]) | set(parts[1])
    for doc_id, sig in whole.items():
        a = parts[0].get(doc_id)
        b = parts[1].get(doc_id)
        if a is None or b is None:
            assert sig == (a or b)
        else:
            assert sig == [min(x, y) for x, y in zip(a, b)]


def test_jaccard_candidates_broadcast_gate_fallback(spark, docs, monkeypatch):
    """r15 (VERDICT r14 #7): the candidate broadcast into the exact
    verify is size-gated. Force the gate shut (threshold 0) and
    require (a) identical verified pairs through the shuffled
    fallback, and (b) no broadcast of the candidate list in the
    fallback plan."""
    from mobility_etl_spark.operators import dedup as dd

    sh = shingles(docs, "text", "doc_id", n=3)
    sigs = minhash_signatures(sh, "doc_id", num_perm=32, with_count=True)
    cands = lsh_candidate_pairs(sigs, "doc_id", num_perm=32, bands=8)

    def pairs():
        return sorted(
            map(
                tuple,
                jaccard_pairs(
                    sh, "doc_id", candidates=cands,
                    min_jaccard=0.3, sizes=sigs,
                ).collect(),
            )
        )

    broadcast_pairs = pairs()
    monkeypatch.setattr(dd, "_CAND_BROADCAST_ROWS", 0)
    fallback_df = jaccard_pairs(
        sh, "doc_id", candidates=cands, min_jaccard=0.3, sizes=sigs
    )
    plan = fallback_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin LeftSemi" not in plan
    assert sorted(map(tuple, fallback_df.collect())) == broadcast_pairs


def test_jaccard_candidate_prefilter_bounds_self_join(spark, docs):
    """r15 (VERDICT r14 #4): both sides of the co-shingle self-join
    are semi-joined down to candidate-involved keys BEFORE the join —
    a hot shingle can no longer go quadratic in non-candidate docs.
    Gate the plan shape (two semi-joins feeding the self-join) and
    exactness against the unfiltered form."""
    sh = shingles(docs, "text", "doc_id", n=3)
    sigs = minhash_signatures(sh, "doc_id", num_perm=32, with_count=True)
    cands = lsh_candidate_pairs(sigs, "doc_id", num_perm=32, bands=8)
    out = jaccard_pairs(
        sh, "doc_id", candidates=cands, min_jaccard=0.3, sizes=sigs
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # key-set semi-joins on both self-join inputs + the pair-identity
    # semi-join below the count: >= 3 LeftSemi joins in the plan
    assert plan.count("LeftSemi") >= 3, plan
    truth = {
        (r["key_a"], r["key_b"])
        for r in jaccard_pairs(
            sh, "doc_id", min_jaccard=0.3
        ).collect()
    }
    got = {(r["key_a"], r["key_b"]) for r in out.collect()}
    assert got <= truth
