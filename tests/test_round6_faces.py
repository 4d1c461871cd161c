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


# ---------------------------------------------------------- epoch shuffle


def test_epoch_shuffle_true_permutations_that_differ(spark, sf_dir):
    """Each epoch's rank column is a complete permutation 1..n of the
    corpus, and the two epochs' permutations are materially different
    (an epoch shuffle that repeats itself defeats its purpose)."""
    rows = _run("training_epoch_shuffle", spark, sf_dir).collect()
    by_epoch: dict[int, dict[int, int]] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = r.rank
    assert set(by_epoch) == {1, 2}
    n = len(by_epoch[1])
    for e, m in by_epoch.items():
        assert sorted(m.values()) == list(range(1, n + 1)), f"epoch {e}"
    same = sum(1 for d in by_epoch[1] if by_epoch[1][d] == by_epoch[2][d])
    assert same < n * 0.05, f"{same}/{n} positions identical across epochs"


# ------------------------------------------------------ incremental index


def test_index_incremental_sentinel_and_churn_accounting(spark, sf_dir):
    """The update sentinel token appears with exactly one posting per
    updated doc (sum_tf == n_docs == |{doc: doc%3==0, doc%11!=0}|),
    and no deleted doc's id can satisfy the v2 membership — the
    delete/update/insert bookkeeping the oracle equality rests on."""
    docs = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .collect()
    ]
    n_updated = sum(1 for d in docs if d % 3 == 0 and d % 11 != 0)
    rows = {
        r.token: r
        for r in _run("text_index_incremental", spark, sf_dir).collect()
    }
    if n_updated >= 20:
        sent = rows["zzupdated"]
        assert sent.n_docs == n_updated == sent.sum_tf
    for r in rows.values():
        assert r.n_docs >= 20 and r.sum_tf >= r.n_docs


# ------------------------------------------------------------- KN bigram LM


def test_kn_oracle_series_bound_covers_corpus(spark, sf_dir):
    """Drift tripwire: the KN oracle enumerates bigram positions with
    generate_series(1, 400); if a testdata regen ever produces docs
    longer than 400 tokens the oracle would silently truncate while
    Spark scores everything. Pin the headroom."""
    mx = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert mx <= 400, f"docs grew to {mx} tokens; raise the oracle bound"


def test_kn_model_is_a_proper_distribution_on_seen_contexts(spark, sf_dir):
    """Σ_w2 P_KN(w2 | w1) == 1 for every seen context w1 when summed
    over the full continuation vocabulary — the defining property of
    interpolated KN (discount mass exactly re-distributed). Checked in
    exact arithmetic over the train split for 25 contexts."""
    import math

    docs = load_table(spark, sf_dir, "documents").collect()
    from collections import Counter, defaultdict

    c12: Counter = Counter()
    for r in docs:
        if r.doc_id % 5 == 0:
            continue
        toks = [t for t in r.text.lower().split(" ") if t]
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    n1fw: Counter = Counter()
    cont: Counter = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1fw[a] += 1
        cont[b] += 1
    nbb = len(c12)
    d = 0.75
    for w1 in sorted(c1)[:25]:
        total = 0.0
        for w2, cw in cont.items():
            c = c12.get((w1, w2), 0)
            total += max(c - d, 0.0) / c1[w1] + (
                d * n1fw[w1] / c1[w1]
            ) * (cw / nbb)
        assert math.isclose(total, 1.0, rel_tol=1e-9), (w1, total)


# ------------------------------------------------------- temporal holdout


def test_temporal_split_no_leakage_and_sized(spark, sf_dir):
    """The no-leakage certificate: train's max timestamp <= test's min
    timestamp (strictly earlier future), the split covers every row,
    and train holds ~80% (exact order-statistic, so between 79% and
    81% with duplicate-timestamp slack)."""
    rows = {
        r.split: r
        for r in _run("training_temporal_split", spark, sf_dir).collect()
    }
    assert set(rows) == {"train", "test"}
    assert rows["train"].max_ts_us <= rows["test"].min_ts_us
    n = rows["train"].n_rows + rows["test"].n_rows
    total = load_table(spark, sf_dir, "events").count()
    assert n == total
    assert 0.79 <= rows["train"].n_rows / n <= 0.81


def test_backtest_cut_assumption_unique_timestamps(spark, sf_dir):
    """Tripwire for the backtest/temporal-split boundary rule: Spark
    cuts by timestamp VALUE while the oracle cuts by RANK — equivalent
    only while event timestamps are globally unique (true of every
    driver testdata generation so far). If a regen introduces
    duplicates, the cut must gain the event_id tiebreak on both
    sides."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    n, nd = ev.agg(F.count("*"), F.countDistinct("ts")).first()
    assert n == nd, f"{n - nd} duplicate event timestamps — fix the cut rule"


def test_backtest_folds_structure(spark, sf_dir):
    """Expanding-window invariants: n_train strictly increases with
    fold, every fold's test decile is non-empty, scored <= test, and
    the unscored remainder are exactly cold-start users."""
    rows = sorted(
        _run("training_backtest_folds", spark, sf_dir).collect(),
        key=lambda r: r.fold,
    )
    assert [r.fold for r in rows] == [0, 1, 2, 3]
    trains = [r.n_train for r in rows]
    assert trains == sorted(trains) and len(set(trains)) == 4
    for r in rows:
        assert r.n_test > 0 and 0 <= r.n_scored <= r.n_test
        assert r.abs_err_fx >= 0


# -------------------------------------------------- weighted reservoir


def test_weighted_reservoir_plan_and_weight_monotonicity(spark, sf_dir):
    """Plan: TakeOrderedAndProject (per-partition heaps, no global
    sort). Statistics: selection is weight-proportional — the sampled
    docs' mean weight exceeds the corpus mean (heavier docs win the
    exponential race more often), and membership is deterministic
    across two independent builds."""
    from mobility_etl_spark.registry import load_all

    spec = load_all()["weighted_reservoir_topk"]
    df = spec.builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    picked = {r.doc_id for r in df.collect()}
    again = {r.doc_id for r in spec.builder(spark, sf_dir).collect()}
    assert picked == again  # pure function of the data

    docs = {r.doc_id: r.n_chars for r in load_table(
        spark, sf_dir, "documents").collect()}
    mean_all = sum(docs.values()) / len(docs)
    mean_picked = sum(docs[d] for d in picked) / len(picked)
    assert mean_picked > mean_all, (mean_picked, mean_all)


# ---------------------------------------------------- stratified quotas


def test_stratified_quota_exact_total_and_proportionality(spark, sf_dir):
    """Hamilton-allocation invariants: the sample is EXACTLY the fixed
    budget, every stratum's quota is within 1 of its exact
    proportional share (the largest-remainder guarantee), per-stratum
    counts equal quotas, and membership is deterministic."""
    rows = _run("stratified_quota_sample", spark, sf_dir).collect()
    assert len(rows) == 200
    from collections import Counter

    got = Counter(r.lang for r in rows)
    quota = {r.lang: r.quota for r in rows}
    for lang, c in got.items():
        assert c == quota[lang]
    strata = Counter(
        r.lang
        for r in load_table(spark, sf_dir, "documents")
        .select("lang")
        .collect()
    )
    n = sum(strata.values())
    for lang, n_s in strata.items():
        share = 200 * n_s / n
        if lang in quota:
            assert abs(quota[lang] - share) < 1.0 + 1e-9, (lang, share)
    again = {r.doc_id for r in _run(
        "stratified_quota_sample", spark, sf_dir).collect()}
    assert again == {r.doc_id for r in rows}
