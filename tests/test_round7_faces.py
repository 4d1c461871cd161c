"""Property gates for the round-7 work (incremental-pair BPE trainer,
plus regression faces added this round).  The trainer gates are the
"done" criteria from the round-6 verdict: exact Sennrich-reference
merge-sequence parity at >= 64 merges, and proof that each round's
data-plane work touches only the affected-word subset, never the full
vocabulary."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table

# ---------------------------------------------- incremental BPE trainer


def _word_counts(spark, sf_dir):
    return {
        r["w"]: r["cnt"]
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }


@pytest.mark.slow  # r15: excluded from the default (driver-budget) run; see pytest.ini
def test_bpe_trainer_incremental_parity_at_64_merges(spark, sf_dir):
    """The incremental-pair trainer (pair counts maintained as state,
    patched with per-round deltas over only the words containing the
    merged pair) must produce the EXACT same merge sequence — pairs,
    order, weights — as the driver-side Sennrich reference, out to 64
    merges.  Any error in the delta algebra (missed overlap, double
    count, stale entry surviving at weight 0) diverges the argmax
    within a few rounds, so 64 exact rounds is a strong algebraic
    gate, not a smoke test."""
    from mobility_etl_spark.queries.tokenize import (
        learn_bpe_merges,
        learn_bpe_reference,
    )

    docs = load_table(spark, sf_dir, "documents")
    got = learn_bpe_merges(docs, 64)
    want = learn_bpe_reference(_word_counts(spark, sf_dir), 64)
    assert len(got) == 64
    for k, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"divergence at merge {k}: got {g}, want {w}"


@pytest.mark.slow  # r15: excluded from the default (driver-budget) run; see pytest.ini
def test_bpe_trainer_per_round_work_is_affected_subset(spark, sf_dir):
    """Scale gate: each round's explode/merge job must scan only the
    words that actually CONTAIN the winning pair.  The trainer records
    per-round stats; we (a) recompute the affected count independently
    from the reference trainer's vocabulary replay and require exact
    equality every round, and (b) require the affected fraction to
    collapse after the first few rounds (Zipf: later merges touch a
    vanishing tail) — the property that makes ~32k production merges
    viable where a full recount per round is not."""
    from mobility_etl_spark.queries.tokenize import (
        learn_bpe_merges,
        learn_bpe_reference,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats: list[dict] = []
    got = learn_bpe_merges(docs, 24, stats=stats)
    assert len(stats) == len(got) == 24

    # Reference replay: count affected words round-by-round in plain
    # Python over the driver-collected word counts.
    counts = _word_counts(spark, sf_dir)
    vocab = {w: tuple(w) for w in counts}
    ref = learn_bpe_reference(counts, 24)
    for k, (rank, left, right, _wgt) in enumerate(ref):
        affected = [
            w
            for w, syms in vocab.items()
            if any(
                syms[i] == left and syms[i + 1] == right
                for i in range(len(syms) - 1)
            )
        ]
        assert stats[k]["affected_words"] == len(affected), (
            f"round {k}: trainer touched {stats[k]['affected_words']} "
            f"words, reference says {len(affected)} contain "
            f"({left!r},{right!r})"
        )
        for w in affected:
            syms = vocab[w]
            out, j = [], 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == left
                    and syms[j + 1] == right
                ):
                    out.append(left + right)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            vocab[w] = tuple(out)

    # Zipf collapse: by round 8 the per-round working set must be a
    # small fraction of the vocabulary (the whole point of the
    # incremental formulation).
    tail = stats[8:]
    assert all(
        s["affected_words"] <= 0.2 * s["vocab_words"] for s in tail
    ), [
        (s["rank"], s["affected_words"], s["vocab_words"]) for s in tail
    ]


def test_bpe_trainer_stats_are_optional_and_stable(spark, sf_dir):
    """Passing stats=None (the default) must not change the learned
    merges — the accounting is observational only."""
    from mobility_etl_spark.queries.tokenize import learn_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    stats: list[dict] = []
    assert learn_bpe_merges(docs, 6) == learn_bpe_merges(
        docs, 6, stats=stats
    )
    assert [s["rank"] for s in stats] == list(range(6))
