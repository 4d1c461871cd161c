"""Misra-Gries heavy-hitter gates (operators/sketch.py).

The sketch is approximate by design (no DuckDB oracle), so its formal
guarantees are gated here against exact token counts:

* est(x) ≤ f(x) — MG never overestimates;
* f(x) − est(x) ≤ N/(k+1) — bounded underestimate;
* every token with f(x) > N/(k+1) is present in the summary;
* the guarantees hold regardless of partitioning (mergeability).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.sketch import misra_gries_tokens


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def exact(spark, docs):
    tok = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("token")
    )
    counts = {
        r.token: r.n
        for r in tok.groupBy("token").agg(F.count("*").alias("n")).collect()
    }
    return counts, sum(counts.values())


@pytest.mark.parametrize("n_parts", [3, 7])
def test_mg_bounds_hold_under_any_partitioning(docs, exact, n_parts):
    counts, n_total = exact
    k = 64
    est = {
        r.token: r.est_count
        for r in misra_gries_tokens(docs.repartition(n_parts), k=k).collect()
    }
    assert 0 < len(est) <= k
    err = n_total / (k + 1)
    for tok, e in est.items():
        assert tok in counts, f"sketch invented token {tok!r}"
        assert e <= counts[tok], f"MG overestimated {tok!r}"
        assert counts[tok] - e <= err, f"{tok!r} underestimated beyond N/(k+1)"
    for tok, f_x in counts.items():
        if f_x > err:
            assert tok in est, f"guaranteed heavy hitter {tok!r} missing"


def test_mg_shuffles_summaries_not_tokens(docs):
    """The only wide stage merges per-partition summaries: the plan
    contains no exploded-token Exchange — mapInPandas emits ≤ k rows
    per partition, so shuffle volume is O(partitions × k)."""
    plan = (
        misra_gries_tokens(docs, k=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan  # no explode anywhere in the sketch path
    assert "FlatMapGroupsInPandas" not in plan


def test_exact_query_matches_mg_on_top_tokens(spark, sf_dir, docs, exact):
    """The registered exact heavy-hitter query and the sketch agree on
    the identity of the very frequent tokens (those above the exact
    query's 1/200 threshold AND the MG guarantee line)."""
    from mobility_etl_spark.registry import load_all

    counts, n_total = exact
    hh = {
        r.token
        for r in load_all()["token_heavy_hitters"].builder(spark, sf_dir).collect()
    }
    assert hh == {t for t, c in counts.items() if c * 200 >= n_total}
    est = {r.token for r in misra_gries_tokens(docs, k=64).collect()}
    guaranteed = {t for t, c in counts.items() if c > n_total / 65}
    assert guaranteed <= est
    assert guaranteed <= hh or not guaranteed


class TestBloom:
    """Bloom-filter gates: zero false negatives (structural), FPR
    within 5× of the sized theoretical rate, exact mergeability
    (build(A) ⊕ build(B) ≡ build(A ∪ B)), and an all-JVM probe plan."""

    M_BITS, K = 1 << 11, 4

    def _filter(self, docs):
        from mobility_etl_spark.operators.sketch import bloom_build

        seen = docs.filter(F.col("doc_id") % 3 != 0)
        return seen, bloom_build(seen, "doc_id", self.M_BITS, self.K)

    def test_no_false_negatives_and_bounded_fpr(self, docs):
        from mobility_etl_spark.operators.sketch import bloom_probe

        seen, bloom = self._filter(docs)
        probed = bloom_probe(docs, bloom, "doc_id", self.M_BITS, self.K)
        rows = {r.doc_id: r.maybe_seen for r in probed.collect()}
        n_seen = seen.count()
        assert all(rows[i] for i in rows if i % 3 != 0)  # never misses
        unseen = [i for i in rows if i % 3 == 0]
        fps = sum(1 for i in unseen if rows[i])
        fill = 1 - 2.718281828 ** (-self.K * n_seen / self.M_BITS)
        theoretical = fill**self.K
        assert fps / len(unseen) <= max(5 * theoretical, 0.02)

    def test_merge_of_partial_builds_is_exact(self, docs):
        from mobility_etl_spark.operators.sketch import bloom_build

        seen, whole = self._filter(docs)
        a = bloom_build(seen.filter("doc_id % 2 = 0"), "doc_id", self.M_BITS, self.K)
        b = bloom_build(seen.filter("doc_id % 2 = 1"), "doc_id", self.M_BITS, self.K)
        merged = (
            a.unionByName(b)
            .groupBy("word_idx")
            .agg(F.expr("bit_or(bits)").alias("bits"))
        )
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0

    def test_probe_plan_is_jvm_broadcast(self, docs):
        from mobility_etl_spark.operators.sketch import bloom_probe

        _, bloom = self._filter(docs)
        probed = bloom_probe(docs, bloom, "doc_id", self.M_BITS, self.K)
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmv_theta_error_bounds_and_merge_identity(spark):
    """Theta/KMV gates at sf0.1 (1 500 distinct custkeys > k=256, so
    the approximate regime is engaged): every set-algebra estimate —
    A, B, union, intersection, both differences — must land within
    4·RSE = 4/√(k−2) of the exact count (relative to the UNION size
    for the op estimates, the standard theta-sketch error model), and
    sketching the whole set must EQUAL merging sketches of its parts
    (k-smallest is associative — identity, not just within error)."""
    from mobility_etl_spark.operators.sketch import kmv_set_ops, kmv_sketch

    sf = "/root/testdata/sf0.1"
    orders = load_table(spark, sf, "orders")
    a_rows = orders.filter(F.col("o_totalprice") > 150000.0).select(
        F.col("o_custkey").alias("key")
    )
    b_rows = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("key")
    )
    k = 256
    mk = lambda d: kmv_sketch(  # noqa: E731
        d.withColumn("__g", F.lit(1)), ["__g"], "key", k=k
    ).drop("__g")
    sk_a, sk_b = mk(a_rows), mk(b_rows)
    got = kmv_set_ops(sk_a, sk_b, k=k).collect()[0]

    A = {r.key for r in a_rows.distinct().collect()}
    B = {r.key for r in b_rows.distinct().collect()}
    exact = {
        "est_union": len(A | B),
        "est_intersection": len(A & B),
        "est_only_a": len(A - B),
        "est_only_b": len(B - A),
    }
    assert len(A) > k and len(B) > k  # approximate regime engaged
    tol = 4.0 / (k - 2) ** 0.5 * len(A | B)
    for name, want in exact.items():
        assert abs(got[name] - want) <= tol, (name, got[name], want, tol)

    # merge identity: sketch(whole) == k-smallest of (sketch(p1) ∪
    # sketch(p2)) as exact sets of retained hashes
    h1 = mk(a_rows.filter(F.col("key") % 2 == 0))
    h2 = mk(a_rows.filter(F.col("key") % 2 != 0))
    merged = sorted(
        r.u for r in h1.unionByName(h2).orderBy("u").limit(k).collect()
    )
    whole = sorted(r.u for r in sk_a.orderBy("u").limit(k).collect())
    assert merged == whole


def test_kmv_overlap_matrix_error_bounds(spark):
    """All 10 pairwise intersection AND union estimates of the grouped
    theta-sketch matrix must land within 4·RSE of the exact counts at
    sf0.1 (k=256 engaged: every per-priority set ~11.3k keys ≫ k),
    error measured relative to each pair's exact union — the standard
    theta-sketch model."""
    from mobility_etl_spark.operators.sketch import (
        kmv_overlap_matrix,
        kmv_sketch,
    )

    sf = "/root/testdata/sf0.1"
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_totalprice") > 150000.0
    )
    k = 256
    sk = kmv_sketch(orders, ["o_orderpriority"], "o_custkey", k=k)
    got = {
        (r.g_a, r.g_b): (r.est_intersection, r.est_union)
        for r in kmv_overlap_matrix(sk, "o_orderpriority", k=k).collect()
    }
    assert len(got) == 10

    sets: dict[str, set] = {}
    for r in orders.select("o_orderpriority", "o_custkey").distinct().collect():
        sets.setdefault(r.o_orderpriority, set()).add(r.o_custkey)
    rse4 = 4.0 / (k - 2) ** 0.5
    for (ga, gb), (est_i, est_u) in got.items():
        A, B = sets[ga], sets[gb]
        assert len(A) > k and len(B) > k
        tol = rse4 * len(A | B)
        assert abs(est_i - len(A & B)) <= tol, (ga, gb, est_i, len(A & B))
        assert abs(est_u - len(A | B)) <= tol, (ga, gb, est_u, len(A | B))


def test_streaming_theta_merge_identity(spark):
    """The stream-maintained grouped theta sketch must be BIT-identical
    to the batch face (k-smallest is exactly associative, so merging
    per-batch partials ≡ sketching the whole table) — collected-row
    equality on the full overlap matrix at sf0.01."""
    from mobility_etl_spark.queries.sketch_graph import (
        sketch_theta_overlap_matrix,
        streaming_theta_overlap,
    )

    sf = "/root/testdata/sf0.01"
    got = sorted(map(tuple, streaming_theta_overlap(spark, sf).collect()))
    want = sorted(
        map(tuple, sketch_theta_overlap_matrix(spark, sf).collect())
    )
    assert got == want and len(got) == 10


def test_kmv_overlap_matrix_rows_matches_in_frame(spark, sf_dir):
    """r15 (VERDICT r14 #6): the driver-side matrix algebra
    (kmv_overlap_matrix_rows) must be BIT-identical to the in-frame
    join form it replaced in sketch_theta_overlap_matrix — same
    integer threshold compares, same IEEE divisions."""
    from mobility_etl_spark.operators.sketch import (
        kmv_overlap_matrix,
        kmv_overlap_matrix_rows,
        kmv_sketch,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 150000.0
    )
    k = 64  # engage the theta path at sf0.001
    sk = kmv_sketch(orders, ["o_orderpriority"], "o_custkey", k=k)
    in_frame = sorted(
        map(
            tuple,
            kmv_overlap_matrix(sk, "o_orderpriority", k=k).collect(),
        )
    )
    driver_side = kmv_overlap_matrix_rows(sk.collect(), k=k)
    assert len(in_frame) == len(driver_side) == 10
    for a, b in zip(in_frame, driver_side):
        assert a[0] == b[0] and a[1] == b[1]
        # bit-identical doubles, not approx
        assert a[2] == b[2] and a[3] == b[3], (a, b)
