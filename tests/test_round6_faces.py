"""Property gates for the round-6 face pack (distributed BPE trainer,
racing catalog committers, streaming near-dup — the latter two gated in
their own suites) — semantics the driver's rows-only check doesn't pin:
third-engine recomputes and structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import load_all

SPECS = load_all()


def _run(name, spark, sf_dir):
    return SPECS[name].builder(spark, sf_dir)


# ------------------------------------------------------------- BPE trainer


def test_bpe_trainer_matches_reference_and_weights_decrease(spark, sf_dir):
    """Third-engine recompute: collect the corpus word counts to the
    driver (test scale) and run the Sennrich-style reference trainer;
    the distributed trainer must produce the EXACT same merge
    sequence — same pairs, same order, same weights. Structural
    invariant: argmax weights are non-increasing in rank."""
    from mobility_etl_spark.queries.tokenize import learn_bpe_reference

    got = [
        (r["rank"], r["left"], r["right"], r["pair_weight"])
        for r in _run("tokenizer_train_bpe", spark, sf_dir)
        .orderBy("rank")
        .collect()
    ]
    counts = {
        r["w"]: r["cnt"]
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == learn_bpe_reference(counts, 8)
    weights = [w for (_, _, _, w) in got]
    assert weights == sorted(weights, reverse=True)
    assert len(got) == 8  # fixture corpus is rich enough for 8 rounds


def test_bpe_trainer_learned_merges_drive_the_encoder(spark, sf_dir):
    """Lifecycle closure: the merges LEARNED by the trainer, fed into
    the encoder's rank table, must actually fire — encoding the
    corpus' most frequent multi-char words with them yields fewer
    symbols than characters, and decoding (concatenation) is
    lossless."""
    from mobility_etl_spark.queries.tokenize import (
        bpe_encode,
        learn_bpe_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, 8)
    ranks = {(l, r): k for (k, l, r, _) in merges}
    top_words = [
        r["w"]
        for r in docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .filter(F.length("w") >= 4)
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(20)
        .collect()
    ]
    compressed = 0
    for w in top_words:
        enc = bpe_encode(w, ranks)
        assert "".join(enc) == w  # lossless
        if len(enc) < len(w):
            compressed += 1
    assert compressed >= 10, f"learned merges barely fire: {merges}"
