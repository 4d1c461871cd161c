"""Execute the repo-wide determinism claim: results are BIT-IDENTICAL
at any parallelism.

Every face's docstring leans on the same argument — decimal-exact
sums, fixed-point flooring before reductions, integer arithmetic —
implying the result cannot depend on how partial aggregates merge.
This sweep runs one representative face per float-discipline class at
shuffle parallelism 3 and then 13 (co-prime, so partial-merge trees
differ completely) and asserts canonicalized equality, using the same
canonicalization as the driver-gate replica (tests/oracle_check.py).
A face that sneaks a raw double SUM into a shuffle fails here before
it flakes the driver's hash gate at some unlucky parallelism."""

from __future__ import annotations

import pytest

from mobility_etl_spark.registry import load_all
from tests.oracle_check import canon_rows

#: One face per determinism mechanism.
FACES = (
    "q1_pricing_summary",        # decimal-cast SUM/AVG (compat.dsum)
    "regression_multi_events",   # fixed-point floor over Cramer solve
    "mutual_information_tokens", # per-cell fixed point -> integer sum
    "stats_moments_events",      # decimal moment sums -> variance
    "star_join_revenue",         # broadcast join + decimal agg
    "window_rank_orders",        # window over explicit total order
    "sketch_countmin_tokens",    # portable-hash integer cells
    "timeseries_ewma_users",     # group-local sequential fold
    "shortest_paths_bfs",        # iterative frontier loop (level-exact)
    "dedup_cluster_components",  # iterative min-label fixpoint
    "span_dedup_ngram_docs",     # digest groupBy + semi-join + window (r5)
    "pareto_frontier_parts",     # segmented prefix-max sweep (r5)
    "timeseries_cusum_events",   # group-local nonlinear fold (r5)
    # r6: bucketed global rank — percentile_approx sketch merges (and
    # hence bucket BOUNDARIES) legitimately vary with parallelism; the
    # rank/NTILE result must not, by the offset-exactness argument
    "training_curriculum_phases",
    "training_epoch_shuffle",
    "tokenizer_train_bpe",       # r6: iterative argmax over exact counts
    "temporal_overlap_join",     # r6: grid-bucketed overlap join
)

SPECS = load_all()


@pytest.mark.parametrize("name", FACES)
def test_result_invariant_under_shuffle_parallelism(spark, sf_dir, name):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for n_part in ("3", "13"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            df = SPECS[name].builder(spark, sf_dir)
            results.append(canon_rows(df.toPandas()))
        assert results[0] == results[1], (
            f"{name}: result depends on shuffle parallelism — "
            "a raw float reduction leaked into the plan"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
