"""Property gates for the round-4 face packs (analytics, retrieval,
time-series, count-min, triangles) — semantics the DuckDB oracle
equality alone doesn't pin (cross-face consistency, algorithmic
guarantees, mergeability)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import load_all

SPECS = load_all()


def _run(name, spark, sf_dir):
    return SPECS[name].builder(spark, sf_dir)


# ---------------------------------------------------------------- analytics


def test_sessionize_agrees_with_session_window(spark, sf_dir):
    """The gaps-and-islands sessionizer and the built-in
    session_window face must see the SAME session structure: identical
    session count and identical multiset of per-session event counts."""
    ids = _run("sessionize_events_ids", spark, sf_dir)
    sw = _run("session_window_events", spark, sf_dir)
    a = sorted(r.n_events for r in ids.select("n_events").collect())
    b = sorted(r.n_events for r in sw.select("n_events").collect())
    assert a == b


def test_retention_week0_is_full_cohort(spark, sf_dir):
    """Week offset 0 retains 100% of every cohort by construction
    (the first-seen week is itself an active week)."""
    ret = _run("retention_cohorts_events", spark, sf_dir)
    w0 = ret.filter(F.col("week_offset") == 0).collect()
    assert w0, "cohort triangle must include week 0"
    for r in w0:
        assert r.n_active == r.cohort_size
        assert r.retention_ppm == 1_000_000


def test_funnel_is_monotone(spark, sf_dir):
    row = _run("user_funnel_conversion", spark, sf_dir).collect()[0]
    assert row.n_signup >= row.n_view_after >= row.n_purchase_after
    assert row.n_signup > 0


def test_histogram_buckets_partition_the_table(spark, sf_dir):
    hist = _run("numeric_histogram_events", spark, sf_dir)
    total = hist.agg(F.sum("n")).collect()[0][0]
    n_rows = load_table(spark, sf_dir, "events").count()
    assert total == n_rows


def test_profile_counts_consistent(spark, sf_dir):
    prof = {r.col_name: r for r in _run("profile_table_stats", spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    assert prof["o_orderkey"].n_rows == orders.count()
    # o_orderkey is the table key: distinct == non-null == rows
    assert prof["o_orderkey"].n_distinct == prof["o_orderkey"].n_nonnull


# ---------------------------------------------------------------- retrieval


def test_rrf_fused_is_subset_of_leg_union(spark, sf_dir):
    """Every fused doc must come from at least one leg, and the top
    fused score can't exceed the best possible two-leg score."""
    fused = _run("rag_hybrid_retrieval", spark, sf_dir).collect()
    assert len(fused) == 20
    best = max(r.rrf_fx for r in fused)
    # floor(1e9/61)*2 is the maximum achievable RRF (rank 1 on both legs)
    assert best <= 2 * (10**9 // 61)
    assert all(r.rrf_fx > 0 for r in fused)


def test_decontaminate_never_flags_eval_docs(spark, sf_dir):
    flagged = _run("text_decontaminate_ngram", spark, sf_dir)
    assert flagged.filter(F.col("doc_id") % 100 < 3).count() == 0
    assert flagged.filter(F.col("n_shared_ngrams") <= 0).count() == 0


def test_group_split_no_straddle(spark, sf_dir):
    """A source must appear in exactly one split — the anti-leakage
    property the face exists for."""
    rows = _run("training_group_split", spark, sf_dir).collect()
    seen: dict[str, str] = {}
    for r in rows:
        assert seen.setdefault(r.source, r.split) == r.split
    assert {r.split for r in rows} == {"train", "test"}


def test_weighted_sample_rate_tracks_weight(spark, sf_dir):
    """Longer docs (higher keep_permille) must be kept at a higher
    empirical rate than shorter docs."""
    docs = load_table(spark, sf_dir, "documents")
    kept = _run("weighted_sample_docs", spark, sf_dir)
    long_total = docs.filter(F.col("n_chars") >= 350).count()
    short_total = docs.filter(F.col("n_chars") < 250).count()
    long_kept = kept.filter(F.col("n_chars") >= 350).count()
    short_kept = kept.filter(F.col("n_chars") < 250).count()
    assert long_total and short_total
    assert long_kept / long_total > short_kept / short_total


def test_temperature_mixture_flattens(spark, sf_dir):
    """√n weighting must compress the spread: the max/min sampled-count
    ratio can't exceed the max/min original-count ratio (and capacity
    binding means at least one source keeps everything)."""
    rows = _run("resample_temperature_mixture", spark, sf_dir).collect()
    n_orig = [r.n_orig for r in rows]
    n_samp = [r.n_sampled for r in rows if r.n_sampled > 0]
    assert max(r.keep_permille for r in rows) >= 999  # binding source ~keeps all
    if min(n_orig) > 0 and len(n_samp) == len(rows):
        assert (max(n_samp) / min(n_samp)) <= (max(n_orig) / min(n_orig)) * 1.25


# ---------------------------------------------------------------- timeseries


def test_m4_bounds_and_counts(spark, sf_dir):
    m4 = _run("timeseries_m4_downsample", spark, sf_dir)
    bad = m4.filter(
        (F.col("v_min") > F.col("v_max"))
        | (F.col("v_first") < F.col("v_min"))
        | (F.col("v_first") > F.col("v_max"))
        | (F.col("v_last") < F.col("v_min"))
        | (F.col("v_last") > F.col("v_max"))
        | (F.col("n") <= 0)
    )
    assert bad.count() == 0
    total = m4.agg(F.sum("n")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()


def test_twa_within_value_range(spark, sf_dir):
    """The time-weighted average (1e-3 fixed point) must lie within
    [min, max] of the observed values per user."""
    twa = {r.user_id: r.twa_mfx for r in _run("timeseries_twa_events", spark, sf_dir).collect()}
    bounds = {
        r.user_id: (r.vmin, r.vmax)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
        .collect()
    }
    for uid, mfx in twa.items():
        lo, hi = bounds[uid]
        assert lo * 1000 - 1 <= mfx <= hi * 1000 + 1


def test_ewma_within_value_range(spark, sf_dir):
    """EWMA is a convex combination of observations — it must lie in
    [min, max] of the series."""
    ew = {r.user_id: r.ewma_fx for r in _run("timeseries_ewma_users", spark, sf_dir).collect()}
    bounds = {
        r.user_id: (r.vmin, r.vmax)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
        .collect()
    }
    assert ew, "must emit one row per user"
    for uid, fx in ew.items():
        lo, hi = bounds[uid]
        assert lo * 1e6 - 1 <= fx <= hi * 1e6 + 1


# ------------------------------------------------------------- sketch/graph


def test_countmin_never_undercounts(spark, sf_dir):
    cm = _run("sketch_countmin_tokens", spark, sf_dir)
    assert cm.filter(F.col("overcount") < 0).count() == 0
    # d*w = 256 cells over a ~50-token vocabulary: the estimate must be
    # exact for at least some tokens (no collision in some row)
    assert cm.filter(F.col("overcount") == 0).count() > 0


def test_countmin_sketch_is_mergeable(spark, sf_dir):
    """Cell-wise: sketch(full corpus) == sketch(half A) + sketch(half B)
    — the property that makes CM shards/days combinable. Rebuilt here
    directly from the same portable bucketing."""
    from mobility_etl_spark.queries.sketch_graph import _CM_W, _SALTS, _bucket_col

    docs = load_table(spark, sf_dir, "documents")
    salts = spark.createDataFrame(
        [(j, s) for j, s in enumerate(_SALTS)], "j int, salt string"
    )

    def cells(df):
        tok = df.select(F.explode(F.split("text", " ")).alias("token"))
        pairs = tok.crossJoin(F.broadcast(salts)).select(
            "j", _bucket_col(F.col("token"), F.col("salt")).alias("bucket")
        )
        out = pairs.groupBy("j", "bucket").agg(F.count("*").alias("cell"))
        return {(r.j, r.bucket): r.cell for r in out.collect()}

    full = cells(docs)
    a = cells(docs.filter(F.col("doc_id") % 2 == 0))
    b = cells(docs.filter(F.col("doc_id") % 2 == 1))
    merged: dict = {}
    for part in (a, b):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_triangle_count_positive_and_bounded(spark, sf_dir):
    row = _run("triangle_count_graph", spark, sf_dir).collect()[0]
    assert row.n_nodes > 0 and row.n_edges > 0
    # an n-node graph has at most C(n,3) triangles
    n = row.n_nodes
    assert 0 <= row.n_triangles <= n * (n - 1) * (n - 2) // 6


# ------------------------------------------------------------- empty inputs
# (the round-3 ADVICE bug class: operators must short-circuit empty
# frames instead of crashing on .first()/next())


def test_sessionize_empty_frame(spark, sf_dir):
    from mobility_etl_spark.operators.timeseries import sessionize

    events = load_table(spark, sf_dir, "events").filter(F.lit(False))
    out = sessionize(events, "user_id", "ts", order_cols=("event_id",))
    assert out.count() == 0
    assert "session_seq" in out.columns


def test_bm25_scores_empty_corpus(spark, sf_dir):
    from mobility_etl_spark.queries.corpus_prep import bm25_scores

    docs = load_table(spark, sf_dir, "documents").filter(F.lit(False))
    out = bm25_scores(docs, ("scan", "join"))
    assert out.count() == 0
    assert out.columns == ["doc_id", "score_fx"]


def test_countmin_empty_corpus_is_empty_not_error(spark, sf_dir):
    from mobility_etl_spark.queries.sketch_graph import _SALTS, _bucket_col

    docs = load_table(spark, sf_dir, "documents").filter(F.lit(False))
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    salts = spark.createDataFrame(
        [(j, s) for j, s in enumerate(_SALTS)], "j int, salt string"
    )
    pairs = tok.crossJoin(F.broadcast(salts)).select(
        "j", _bucket_col(F.col("token"), F.col("salt")).alias("bucket")
    )
    assert pairs.groupBy("j", "bucket").count().count() == 0


# -------------------------------------------------- review-pass regressions


def test_decontaminate_survives_short_docs(spark, sf_dir):
    """A document with fewer than N tokens has no shingles — it must
    contribute nothing, not crash the sequence/slice expression."""
    from mobility_etl_spark.queries.retrieval import _NGRAM_N

    docs = load_table(spark, sf_dir, "documents").limit(5).select(
        "doc_id", F.lit("ab").alias("text")
    )
    toks = F.split(F.col("text"), " ")
    ngrams = F.when(
        F.size(toks) >= _NGRAM_N,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - _NGRAM_N),
            lambda i: F.array_join(F.slice(toks, i + 1, _NGRAM_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = docs.select("doc_id", F.explode_outer(F.array_distinct(ngrams)).alias("ng"))
    assert out.filter(F.col("ng").isNotNull()).count() == 0


def test_group_split_nonnumeric_source_goes_to_test_not_crash(spark):
    from mobility_etl_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame(
        [("web-crawl", 1), ("src3", 2), ("src12345678901", 3)],
        "source string, doc_id long",
    )
    src_num = F.expr("try_cast(substr(source, 4) AS BIGINT)")
    split = F.when(hash_bucket(src_num, 100) < 80, F.lit("train")).otherwise(
        F.lit("test")
    )
    rows = {r.source: r.s for r in df.select("source", split.alias("s")).collect()}
    assert rows["web-crawl"] == "test"  # NULL hash -> never < 80
    assert rows["src3"] in ("train", "test")
    assert rows["src12345678901"] in ("train", "test")


def test_table_diff_exercises_all_three_outcomes(spark, sf_dir):
    out = _run("table_diff_orders", spark, sf_dir)
    kinds = {r.change_type for r in out.select("change_type").distinct().collect()}
    assert kinds == {"added", "removed", "changed"}


def test_sessionize_rejects_colliding_columns(spark, sf_dir):
    from mobility_etl_spark.operators.timeseries import sessionize

    events = load_table(spark, sf_dir, "events").withColumn(
        "session_seq", F.lit(1)
    )
    with pytest.raises(ValueError, match="already has"):
        sessionize(events, "user_id", "ts")


def test_rag_oracle_constants_are_shared_with_bm25(spark):
    """The hybrid face's oracle must interpolate corpus_prep's BM25
    constants — the two sides of the comparison share one source of
    truth."""
    from mobility_etl_spark.queries import corpus_prep, retrieval

    assert retrieval._TERMS is corpus_prep._BM25_TERMS
    assert retrieval._K1 == corpus_prep._K1
    assert retrieval._B == corpus_prep._B


def test_bm25_fixed_point_margin_protects_ln_ulp(spark, sf_dir):
    """r12 review: the bm25 oracle identity assumes FLOOR(contrib*1e9)
    agrees across engines, but ln() is only ~1-ulp-reproducible
    between JVM Math.log and libm — abs noise ~1e-15, i.e. ~1e-6 at
    the 1e9 fixed-point scale. Gate: every contribution's distance to
    its floor boundary must exceed that noise band by an order of
    magnitude, the same margin discipline the semantic-dedup stage
    documents. If a future corpus/term-set lands a contribution within
    1e-5 of an integer, this fails loudly instead of letting the hash
    gate flap."""
    from pyspark.sql import functions as F

    from mobility_etl_spark.io import load_table
    from mobility_etl_spark.queries.corpus_prep import _BM25_TERMS

    from pyspark.sql import Window

    from mobility_etl_spark.queries.corpus_prep import _B, _K1

    docs = load_table(spark, sf_dir, "documents")
    # re-derive the pre-floor contributions (bm25_scores floors
    # per-term then sums, so the boundary risk is per (doc, term))

    toks = F.split(F.col("text"), " ")
    t = docs.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("dl")
    )
    stats = t.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*").cast("double")).alias("avgdl"),
    )
    terms_df = spark.createDataFrame(
        [(x,) for x in _BM25_TERMS], "term string"
    )
    tf = (
        t.crossJoin(F.broadcast(terms_df))
        .select(
            "doc_id",
            "dl",
            "term",
            F.size(F.filter("toks", lambda x: x == F.col("term")))
            .cast("double")
            .alias("tf"),
        )
        .filter(F.col("tf") > 0)
        .withColumn(
            "df_t", F.count("*").over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "c9",
            (
                F.log(
                    (F.col("n_docs") - F.col("df_t") + 0.5)
                    / (F.col("df_t") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (_K1 + 1.0))
                / (
                    F.col("tf")
                    + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
                )
            )
            * 1e9,
        )
    )
    min_margin = tf.select(
        F.min(F.least(F.col("c9") - F.floor("c9"),
                      1.0 - (F.col("c9") - F.floor("c9")))).alias("m")
    ).first()["m"]
    assert min_margin is not None and min_margin > 1e-5, (
        f"bm25 contribution within {min_margin} of a floor boundary — "
        "1-ulp ln() disagreement could flip the fixed-point hash"
    )
