"""Property gates for the round-5 face packs (span dedup, URL
canonicalization, ranking metrics, skyline, temporal coalescing,
linear interpolation, GROUPS frame, bounded kNN, streaming CDC) —
semantics the DuckDB oracle equality alone doesn't pin: algorithmic
invariants recomputed from raw data in plain Python (a third engine),
idempotence, and cross-face consistency."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import load_all

SPECS = load_all()


def _run(name, spark, sf_dir):
    return SPECS[name].builder(spark, sf_dir)


# ---------------------------------------------------------------- span dedup


def test_span_dedup_spans_are_real_duplicates_and_maximal(spark, sf_dir):
    """Third-engine recompute: re-derive every duplicated 8-gram window
    from the raw text in Python and assert (a) every reported span is
    exactly a maximal run of duplicated windows, (b) no duplicated
    window falls outside a reported span — i.e. the face's output IS
    the full, non-redundant answer."""
    W = 8
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    counts: dict[str, int] = {}
    doc_hashes: dict[int, list[str]] = {}
    for doc_id, toks in docs.items():
        hs = [
            hashlib.md5(" ".join(toks[i : i + W]).encode()).hexdigest()
            for i in range(len(toks) - W + 1)
        ]
        doc_hashes[doc_id] = hs
        for sh in hs:
            counts[sh] = counts.get(sh, 0) + 1

    dup_pos: dict[int, list[int]] = {}
    for doc_id, hs in doc_hashes.items():
        for i, sh in enumerate(hs):
            if counts[sh] >= 2:
                dup_pos.setdefault(doc_id, []).append(i + 1)  # 1-based

    expected = set()
    for doc_id, pos_list in dup_pos.items():
        run_start = prev = pos_list[0]
        n = 1
        for p in pos_list[1:]:
            if p - prev <= W:
                prev = p
                n += 1
            else:
                expected.add((doc_id, run_start, prev + W - 1, n))
                run_start = prev = p
                n = 1
        expected.add((doc_id, run_start, prev + W - 1, n))

    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in _run("span_dedup_ngram_docs", spark, sf_dir).collect()
    }
    assert got == expected
    for doc_id, s, e, _n in got:
        assert e - s + 1 >= W


# ---------------------------------------------------------------- URL dedup


def test_url_normalize_is_idempotent_and_total(spark, sf_dir):
    """Canonical URLs are a fixed point of the normalizer (running the
    same parse+normalize pipeline on them changes nothing), and the
    group counts add back up to the full orders table."""
    out = _run("url_normalize_dedup", spark, sf_dir)
    rows = out.collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_raw for r in rows) == n_orders

    from mobility_etl_spark.queries.curation2 import url_canonical

    canon = out.select(F.col("canonical_url").alias("url"))
    changed = canon.filter(url_canonical("url") != F.col("url")).count()
    assert changed == 0


# ------------------------------------------------------------- ndcg metrics


def test_ndcg_components_bounded(spark, sf_dir):
    """DCG can never exceed IDCG (the ideal ordering maximizes the
    discounted sum), MRR is in (0, 1e9] when any relevant doc is in
    the top k, and the top-k relevant count is bounded by both k and
    the total relevant count."""
    rows = _run("ndcg_eval_retrieval", spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.dcg_fx <= r.idcg_fx
        assert 0 <= r.mrr_fx <= 1_000_000_000
        assert 0 <= r.n_rel_topk <= min(10, r.n_rel_total)
        if r.n_rel_topk > 0:
            assert r.mrr_fx > 0


# ----------------------------------------------------------------- skyline


def test_pareto_frontier_exact_vs_python(spark, sf_dir):
    """Third-engine recompute of the skyline definition, plus the two
    structural facts: frontier points never dominate each other, and
    every non-frontier point is dominated by some frontier point."""
    pts = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p, q):
        return (
            q[1] <= p[1]
            and q[2] >= p[2]
            and (q[1] < p[1] or q[2] > p[2])
        )

    expected = {
        p[0] for p in pts if not any(dominated(p, q) for q in pts)
    }
    got_rows = _run("pareto_frontier_parts", spark, sf_dir).collect()
    got = {r.p_partkey for r in got_rows}
    assert got == expected
    frontier = [(r.p_partkey, r.p_retailprice, r.p_size) for r in got_rows]
    for p in frontier:
        assert not any(dominated(p, q) for q in frontier if q[0] != p[0])
    by_key = {p[0]: p for p in pts}
    for p in pts:
        if p[0] not in got:
            assert any(dominated(p, by_key[k]) for k in got)


# ------------------------------------------------------------- temporal ops


def test_interval_coalesce_spans_disjoint_and_cover(spark, sf_dir):
    """Per user: spans are strictly separated (end < next start — a
    touching pair would have been merged), and interval counts add up
    to the user's event count."""
    rows = _run("temporal_interval_coalesce", spark, sf_dir).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        assert r.span_start_s <= r.span_end_s
        per_user.setdefault(r.user_id, []).append(r)
    for spans in per_user.values():
        spans.sort(key=lambda r: r.span_start_s)
        for a, b in zip(spans, spans[1:]):
            assert a.span_end_s < b.span_start_s
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_intervals for r in rows) == n_events


def test_interpolation_preserves_observations_and_bounds(spark, sf_dir):
    """Observed days pass through unchanged (is_interp=0 rows equal
    the independently recomputed daily sums), and every interpolated
    value lies within [min, max] of its bracketing observations —
    the defining property of linear interpolation."""
    out = _run("timeseries_interpolate_linear", spark, sf_dir).collect()
    obs = {
        (r.user_id, r.dt): r.val_fx
        for r in load_table(spark, sf_dir, "events")
        .filter((F.col("event_id") % 3 != 0) & (F.col("user_id") < 40))
        .groupBy("user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("dt"))
        .agg(
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1e6).cast("long")
            ).alias("val_fx")
        )
        .collect()
    }
    per_user: dict[int, list] = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    n_obs_rows = 0
    for user, rows in per_user.items():
        rows.sort(key=lambda r: r.dt)
        for i, r in enumerate(rows):
            if r.is_interp == 0:
                assert obs[(user, r.dt)] == r.out_fx
                n_obs_rows += 1
            else:
                prev = next(
                    rows[j] for j in range(i - 1, -1, -1) if rows[j].is_interp == 0
                )
                nxt = next(
                    rows[j] for j in range(i + 1, len(rows)) if rows[j].is_interp == 0
                )
                lo, hi = sorted((prev.out_fx, nxt.out_fx))
                assert lo <= r.out_fx <= hi
    assert n_obs_rows == len(obs)


def test_groups_frame_matches_pandas_recompute(spark, sf_dir):
    """Rebuild the GROUPS-frame sums in pandas (group by user+hour,
    neighbor-sum by group order, broadcast back to rows) and compare
    every row — a third formulation, independent of both the Spark
    dense_rank emulation and the oracle's lag/lead join."""
    out = _run("window_groups_frame_events", spark, sf_dir).toPandas()
    base = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_s"),
            F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 1e6)
            .cast("long")
            .alias("val_fx"),
        )
        .toPandas()
    )
    grp = (
        base.groupby(["user_id", "hour_s"], as_index=False)["val_fx"]
        .sum()
        .sort_values(["user_id", "hour_s"])
    )
    grp["want"] = (
        grp.groupby("user_id")["val_fx"]
        .transform(lambda s: s + s.shift(1, fill_value=0) + s.shift(-1, fill_value=0))
    )
    merged = base.merge(grp[["user_id", "hour_s", "want"]], on=["user_id", "hour_s"])
    check = merged.merge(out, on=["event_id", "user_id", "hour_s"])
    assert len(check) == len(base)
    assert (check["want"] == check["grp_sum_fx"]).all()


# ----------------------------------------------------------------- spatial


def test_knn_ranks_contiguous_and_within_radius(spark, sf_dir):
    """Per source: ranks are exactly 1..n (n <= k) with distances
    non-decreasing, every distance is within the radius bound, and
    the kNN edge set is a subset of the radius join's pair set."""
    knn = _run("spatial_knn_bounded", spark, sf_dir).collect()
    pairs = {
        frozenset((r.key_a, r.key_b))
        for r in _run("spatial_grid_join", spark, sf_dir).collect()
    }
    per_src: dict[int, list] = {}
    for r in knn:
        assert r.dist_fx <= 400_000_000  # 400 m in 1e-6 m
        assert frozenset((r.src, r.nbr)) in pairs
        per_src.setdefault(r.src, []).append(r)
    for rows in per_src.values():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        dists = [r.dist_fx for r in rows]
        assert dists == sorted(dists)


# ------------------------------------------------------------- tokenization


def test_bpe_face_matches_driver_side_recompute(spark, sf_dir):
    """Full third-engine parity for the rows-only BPE face: encode
    every document on the driver with the pure bpe_encode function and
    compare all columns, plus the structural tokenizer invariants —
    losslessness (concatenating a word's subwords reproduces the word)
    and monotone counts (n_words <= n_subwords <= total chars)."""
    from mobility_etl_spark.queries.tokenize import BPE_MERGES, bpe_encode

    ranks = {pair: i for i, pair in enumerate(BPE_MERGES)}
    got = {
        r.doc_id: r
        for r in SPECS["tokenize_bpe_docs"].builder(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").collect()
    assert len(got) == len(docs)
    merged_something = False
    for d in docs:
        words = d.text.split(" ") if d.text else []
        subs = []
        for w in words:
            enc = bpe_encode(w, ranks)
            assert "".join(enc) == w  # lossless
            if len(enc) < len(w):
                merged_something = True
            subs.extend(enc)
        r = got[d.doc_id]
        assert r.n_words == len(words)
        assert r.n_subwords == len(subs)
        assert r.subword_sample == " ".join(subs[:8])
        assert r.n_words <= r.n_subwords <= sum(len(w) for w in words)
    assert merged_something, "merge table never fired - vacuous test"


# ------------------------------------------------------------------- cusum


def test_cusum_nonnegative_and_total(spark, sf_dir):
    """The one-sided CUSUM statistic is >= 0 by construction (the
    fold clamps at zero) and every event is folded exactly once."""
    rows = SPECS["timeseries_cusum_events"].builder(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == n_events
    for r in rows:
        assert r.cusum_fx >= 0


# ------------------------------------------------------------------ markov


def test_markov_rows_conserve_transitions_and_probability(spark, sf_dir):
    """Transition counts add up to (events - one per user), and each
    source row's probabilities sum to 1e9 up to the per-row floor
    loss (< number of destinations)."""
    rows = SPECS["user_markov_transitions"].builder(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.src_type, []).append(r)
    for src, rs in by_src.items():
        p_sum = sum(r.p_fx for r in rs)
        assert 1_000_000_000 - len(rs) < p_sum <= 1_000_000_000


# ---------------------------------------------------------------- upsampling


def test_upsample_repeat_copy_structure_and_rate(spark, sf_dir):
    """Per doc: copy_ids are exactly 0..n-1 with n in
    {floor(epochs), ceil(epochs)}; per source: the total copy count
    equals floor-copies plus the deterministic hash-selected extras
    (recomputed with the same portable hash), so the fractional epoch
    is exact, not approximate."""
    from mobility_etl_spark.queries.curation2 import _REPEAT_PERMILLE

    rows = SPECS["resample_upsample_repeat"].builder(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    src_of: dict[int, str] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.copy_id)
        src_of[r.doc_id] = r.source
    for doc_id, copies in per_doc.items():
        pm = _REPEAT_PERMILLE[src_of[doc_id]]
        assert sorted(copies) == list(range(len(copies)))
        assert len(copies) in (pm // 1000, pm // 1000 + 1)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    for src, pm in _REPEAT_PERMILLE.items():
        ids = [d.doc_id for d in docs if d.source == src]
        extras = sum(
            1
            for i in ids
            if ((i % 1000003) * 2654435761) % 1000000007 % 1000 < pm % 1000
        )
        want = (pm // 1000) * len(ids) + extras
        got = sum(len(per_doc.get(i, [])) for i in ids)
        assert got == want


# --------------------------------------------------------------------- psi


def test_psi_nonnegative_and_conserves_counts(spark, sf_dir):
    """Every (p-q)*ln(p/q) term is >= 0 (the factors share sign), so
    PSI is >= 0; and the two halves partition each event type."""
    rows = SPECS["psi_drift_events"].builder(spark, sf_dir).collect()
    per_type = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(rows) == len(per_type)
    for r in rows:
        assert r.psi_fx >= 0
        assert r.n_ref + r.n_cur == per_type[r.event_type]


def test_url_normalizer_idempotent_on_adversarial_grammar(spark):
    """Fuzz the normalizer over a seeded adversarial URL grammar far
    wider than the face's fixture (mixed-case schemes/hosts, both
    default and explicit non-default ports, deep and empty paths, runs
    of trailing slashes, shuffled tracking/real params, empty params,
    fragments with separators) and assert the defining property:
    normalize(normalize(u)) == normalize(u) for every URL."""
    import itertools

    schemes = ["http", "HTTP", "https", "HTTPS", "hTTpS"]
    hosts = ["A.B.example.COM", "x.example.com:443", "x.example.com:8443",
             "Y.example.ORG:80", "z.example.net"]
    paths = ["", "/", "/a/b/c", "/a//", "/a/b///", "/UPPER/Case"]
    queries = ["", "?a=1", "?utm_source=x", "?b=2&a=1&utm_b=3&ref=h&c=3",
               "?&&a=1&", "?ref=only", "?z=9&y=8&x=7"]
    frags = ["", "#f", "#a?b&c"]
    urls = [
        s + "://" + h + p + q + f
        for s, h, p, q, f in itertools.product(
            schemes, hosts, paths, queries, frags
        )
    ]
    from mobility_etl_spark.queries.curation2 import url_canonical

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(url_canonical("url").alias("url"))
    twice = once.select(url_canonical("url").alias("url"))
    diff = [
        (a, b)
        for a, b in zip(
            sorted(r.url for r in once.collect()),
            sorted(r.url for r in twice.collect()),
        )
        if a != b
    ]
    assert diff == [], f"normalizer not idempotent, e.g. {diff[:3]}"


# ----------------------------------------------------------- autocorrelation


def test_autocorr_matches_numpy_definition(spark, sf_dir):
    """Third-engine recompute: the exact-integer (num, den) rational of
    timeseries_autocorr_events must equal the textbook sample ACF
    computed by numpy on the same 1e-3 fixed-point series — pins the
    n²-scaling algebra (not just Spark-vs-DuckDB agreeing on it)."""
    import numpy as np

    rows = _run("timeseries_autocorr_events", spark, sf_dir).collect()
    assert rows, "face returned no rows"
    raw = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict[int, list[tuple]] = {}
    for r in raw:
        series.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    for r in rows:
        xs = np.array(
            [
                float(np.floor(v * 1000.0))
                for _, _, v in sorted(series[r.user_id])
            ]
        )
        n, k = len(xs), r.lag
        assert n > k and r.acf_den > 0
        c = xs - xs.mean()
        num = float(np.dot(c[:-k], c[k:]))
        den = float(np.dot(c, c))
        got = r.acf_num / r.acf_den
        want = num / den
        assert abs(got - want) < 1e-9, (r.user_id, k, got, want)
        assert -1.0 - 1e-9 <= got <= 1.0 + 1e-9
        assert r.acf_mfx == int(
            np.floor(1e6 * float(r.acf_num) / float(r.acf_den))
        )


def test_autocorr_regime_guard_trips_on_overflow_data(spark, sf_dir):
    """ADVICE r5: Spark (non-ANSI) silently wraps BIGINT while the
    DuckDB oracle computes in HUGEINT, so series outside the documented
    1e-3 fixed-point regime must RAISE, not return plausible garbage.
    Feed a synthetic series with 4*n^3*max|v|^2 >= 9e18 and expect the
    fused raise_error; a comfortably in-regime series still computes."""
    import pytest as _pytest

    from mobility_etl_spark.queries.timeseries_q import acf_lags

    def mk(scale):
        return spark.createDataFrame(
            [(1, float(i), i, float((i % 4 + 1) * scale)) for i in range(10)],
            "user_id long, ts double, event_id long, value double",
        )

    # v_fx = 1e8, n = 10: every RAW aggregate stays inside int64
    # (s2 = n*v^2 = 1e17) so ANSI's own overflow check stays silent,
    # but the combined moments would not (4*n^3*v^2 = 4e19 >= 9e18):
    # exactly the regime the guard exists for — it must fire BEFORE
    # the moment arithmetic wraps (non-ANSI) or raw-raises (ANSI).
    with _pytest.raises(Exception, match="fixed-point BIGINT regime"):
        acf_lags(mk(1.0e5)).collect()
    # in-regime control: same shape, small values
    assert len(acf_lags(mk(42.5)).collect()) == 3  # lags 1..3
