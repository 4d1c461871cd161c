"""Time-series downsampling/averaging pack: M4 visual downsampling,
time-weighted averages, and per-key EWMA smoothing.

The reference's hourly sinks (dags/weather.py, dags/warsaw-delays.py)
produce exactly this shape of data — regular-ish per-key observation
streams — and every dashboard/monitoring consumer runs these three
reductions on them. All exact DuckDB oracles:

* M4 (min/max/first/last per time bucket) — the standard
  error-free line-chart downsampling aggregation; first/last are
  window-ranked with (ts, event_id) tiebreaks so they're deterministic.
* TWA — irregular-interval averaging weighting each observation by its
  holding time; per-term products floor to BIGINT fixed-point before an
  order-free integer sum.
* EWMA — sequential-by-nature exponential smoothing; Spark side is a
  group-local applyInPandas fold, oracle side is DuckDB's list_reduce
  over the same ordered list: both run the identical IEEE op sequence
  (0.9·acc + 0.1·x left fold) so the result is bit-identical, floored
  to 1e-6 fixed point.

Scale posture: M4/TWA are single-shuffle keyed aggregations; EWMA is
applyInPandas over the key partitioning with bounded per-group state.
All names sort after "minhash_near_dup" (driver-window rule).
"""

from __future__ import annotations

import math
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register

#: 6-hour M4 buckets (µs).
_BUCKET_US = 21_600_000_000
_ALPHA = 0.1


@register(
    "timeseries_m4_downsample",
    oracle=f"""
    WITH b AS (
        SELECT user_id, epoch_us(ts) // {_BUCKET_US} AS bucket,
               ts, event_id, value
        FROM events
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM b
    )
    SELECT user_id, bucket,
           COUNT(*) AS n,
           MIN(value) AS v_min,
           MAX(value) AS v_max,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS v_first,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS v_last
    FROM r
    GROUP BY user_id, bucket
    """,
    tags=("E13", "E19"),
)
def timeseries_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling: per (series, 6 h bucket) the min/max/first/last
    of the value — the aggregation proven to reproduce a line chart
    pixel-exactly at 4 rows per bucket, i.e. the lossy-but-visually-
    lossless way to ship a 100 TB series to a dashboard. First/last
    are rank-1 rows of ascending/descending (ts, event_id) windows;
    min/max of doubles are order-free, so everything hash-matches.
    Both windows and the final groupBy share the (user_id) keyed
    shuffle — one Exchange total."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = events.select(
        "user_id",
        F.floor(us / F.lit(_BUCKET_US)).cast("bigint").alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = b.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return r.groupBy("user_id", "bucket").agg(
        F.count("*").alias("n"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("v_first"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("v_last"),
    )


@register(
    "timeseries_twa_events",
    oracle="""
    WITH seq AS (
        SELECT user_id, value, epoch_us(ts) AS us, event_id,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_us
        FROM events
    ),
    seg AS (
        SELECT user_id,
               CAST(FLOOR(value * CAST(next_us - us AS DOUBLE)) AS BIGINT)
                   AS wv_fx,
               next_us - us AS dt_us
        FROM seq WHERE next_us IS NOT NULL
    )
    SELECT user_id,
           COUNT(*) AS n_segments,
           CAST(SUM(wv_fx) AS BIGINT) AS sum_wv_fx,
           CAST(SUM(dt_us) AS BIGINT) AS sum_dt_us,
           CAST(FLOOR(1000.0 * CAST(SUM(wv_fx) AS DOUBLE)
                      / CAST(SUM(dt_us) AS DOUBLE)) AS BIGINT) AS twa_mfx
    FROM seg
    GROUP BY user_id
    """,
    tags=("E13", "E18"),
)
def timeseries_twa_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series for irregular observations:
    each value is weighted by how long it was current (lead-ts delta),
    the metric for sensor/delay feeds where a plain AVG over-counts
    bursts. Per-segment value·µs products floor to BIGINT (exact in
    double below 2^53), integer-sum order-free; the final ratio is the
    identical double expression on both engines. One keyed shuffle
    shared by the lead window and the groupBy."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        "value",
        us.alias("us"),
        F.lead(us).over(w).alias("next_us"),
    )
    seg = seq.filter(F.col("next_us").isNotNull()).select(
        "user_id",
        F.floor(
            F.col("value") * (F.col("next_us") - F.col("us")).cast("double")
        )
        .cast("bigint")
        .alias("wv_fx"),
        (F.col("next_us") - F.col("us")).alias("dt_us"),
    )
    agg = seg.groupBy("user_id").agg(
        F.count("*").alias("n_segments"),
        F.sum("wv_fx").cast("bigint").alias("sum_wv_fx"),
        F.sum("dt_us").cast("bigint").alias("sum_dt_us"),
    )
    return agg.withColumn(
        "twa_mfx",
        F.floor(
            1000.0
            * F.col("sum_wv_fx").cast("double")
            / F.col("sum_dt_us").cast("double")
        ).cast("bigint"),
    )


_EWMA_SCHEMA = "user_id long, n_events long, ewma_fx long"


def _ewma_fold(values: Iterable[float], alpha: float) -> float:
    """Left fold e ← (1−α)·e + α·x with e₀ = x₀ — the exact op sequence
    DuckDB's list_reduce runs, so results are bit-identical. The α·x
    products are precomputed vectorized when a numpy array is passed
    (each is the identical single double multiply the inline loop
    performed; the fold's multiply-add order is untouched)."""
    import numpy as np

    om = 1.0 - alpha
    if isinstance(values, np.ndarray):
        ax = (alpha * values.astype(np.float64, copy=False)).tolist()
        e = float(values[0])
        for axi in ax[1:]:
            e = om * e + axi
        return e
    it = iter(values)
    e = next(it)
    for x in it:
        e = om * e + alpha * x
    return e


def _series_partition_fold(events: DataFrame, emit, schema: str) -> DataFrame:
    """Per-series sequential fold WITHOUT per-group pandas overhead
    (guide §4.2/§4.5): the old groupBy().applyInPandas shape paid a
    pandas DataFrame construction + sort + Python emit per GROUP —
    at ~67 rows/series that overhead, not the fold arithmetic, was
    ~all of the face (measured: events has 1 500 tiny series at
    sf0.1). Same single shuffle (hash repartition on the series key,
    partition count from spark.sql.shuffle.partitions — scale-
    adaptive conf, not a constant), then a JVM sort-within-partitions
    replaces the 1 500 pandas sorts, only (user_id, value) crosses the
    Arrow boundary, and ONE mapInPandas pass walks each partition's
    contiguous series runs, carrying the open run across Arrow batch
    boundaries. ``emit(user_id, values_np)`` receives the series'
    values in exactly the (ts, event_id) order the old per-group
    ``pdf.sort_values`` produced and returns one output-row dict;
    every fold still executes the identical IEEE op sequence, so
    results stay bit-identical (oracle-gated per face). State is one
    open series per partition — the same bound as applyInPandas."""
    import numpy as np

    cols = [c.strip().split()[0] for c in schema.split(",")]

    def run(batches):
        cur_uid = None
        parts: list = []
        rows: list = []

        def flush() -> None:
            if cur_uid is not None:
                vals = (
                    np.concatenate(parts) if len(parts) > 1 else parts[0]
                )
                rows.append(emit(int(cur_uid), vals))

        for pdf in batches:
            if not len(pdf):
                continue
            uids = pdf["user_id"].to_numpy()
            vals = pdf["value"].to_numpy()
            idx = np.flatnonzero(uids[1:] != uids[:-1]) + 1
            starts = np.concatenate(([0], idx))
            ends = np.concatenate((idx, [len(uids)]))
            for s, e in zip(starts, ends):
                if cur_uid is None or uids[s] != cur_uid:
                    flush()
                    cur_uid = uids[s]
                    parts = []
                parts.append(vals[s:e])
            if rows:
                yield pd.DataFrame(rows, columns=cols)
                rows = []
        flush()
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    return (
        events.select("user_id", "ts", "event_id", "value")
        .repartition(F.col("user_id"))
        .sortWithinPartitions("user_id", "ts", "event_id")
        .select("user_id", "value")
        .mapInPandas(run, schema)
    )


@register(
    "timeseries_ewma_users",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id,
               list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           CAST(FLOOR(list_reduce(vals,
               (acc, x) -> (1.0 - CAST({_ALPHA} AS DOUBLE)) * acc
                           + CAST({_ALPHA} AS DOUBLE) * x)
               * 1000000.0) AS BIGINT) AS ewma_fx
    FROM ordered
    """,
    tags=("E39", "E13"),
)
def timeseries_ewma_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series EWMA (α=0.1) final smoothed level — exponential
    smoothing is inherently sequential (each step depends on the
    previous), so this is the honest applyInPandas shape: group-local
    fold over (ts, event_id)-ordered values, state is one double.
    The oracle runs DuckDB's list_reduce over the same ordered list;
    both engines execute the identical left-fold IEEE sequence
    (1−α)·acc + α·x, so the 1e-6-floored result matches exactly —
    a stronger statement than tolerance-gating. At 100 TB this is one
    shuffle on the series key and O(1) memory per group (the pandas
    batch holds one group's rows, same bound as any sessionizer)."""
    events = load_table(spark, sf_dir, "events")

    def emit(uid: int, vals) -> dict:
        e = _ewma_fold(vals, _ALPHA)
        return {
            "user_id": uid,
            "n_events": len(vals),
            "ewma_fx": int(math.floor(e * 1000000.0)),
        }

    return _series_partition_fold(events, emit, _EWMA_SCHEMA)


@register(
    "timeseries_cusum_events",
    oracle="""
    WITH ev AS (
        SELECT user_id, ts, event_id,
               CAST(FLOOR(COALESCE(value, 0) * 1000000.0) AS BIGINT) AS vfx
        FROM events
    ),
    g AS (
        SELECT user_id,
               list(CAST(vfx AS DOUBLE) ORDER BY ts, event_id) AS vals,
               CAST(SUM(vfx) AS BIGINT) AS sum_fx,
               COUNT(*) AS n
        FROM ev GROUP BY user_id
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_events,
           CAST(FLOOR(list_reduce(
               list_prepend(0.0, vals),
               (acc, x) -> greatest(0.0, acc + (x - sum_fx / n))
           )) AS BIGINT) AS cusum_fx
    FROM g
    """,
    tags=("E39", "E13"),
)
def timeseries_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change detection (one-sided, final statistic): the
    running fold s_i = max(0, s_{i-1} + (x_i - mu)) over each user's
    event values in (ts, event_id) order, with mu the user's own mean.
    The reset-at-zero makes this a nonlinear fold no window frame can
    express — the honest applyInPandas shape, like EWMA. Exactness
    discipline: values enter as 1e-6 fixed-point BIGINTs, mu is the
    exact integer sum divided once (one IEEE division both engines
    share), and the oracle replays the identical fold with DuckDB's
    list_reduce over the same ordered list (0.0 prepended as the
    init), so the floored result is bit-identical — the EWMA
    cross-engine-fold proof extended to a max() nonlinearity. At
    100 TB: one shuffle on the series key, O(1) state per group."""
    events = load_table(spark, sf_dir, "events")

    import numpy as np

    def emit(uid: int, vals) -> dict:
        # same per-element arithmetic as the old list comprehension:
        # NaN→0.0, one double multiply, floor — exact-int float64s
        a = np.where(np.isnan(vals), 0.0, vals.astype(np.float64))
        vfx = np.floor(a * 1000000.0).astype(np.int64)
        mu = int(vfx.sum()) / len(vfx)
        # (x − mu) is one double subtraction per element in the old
        # loop too — precomputing it vectorized leaves the fold's
        # s := max(0, s + d_i) op sequence untouched
        s = 0.0
        for dx in (vfx.astype(np.float64) - mu).tolist():
            s = max(0.0, s + dx)
        return {
            "user_id": uid,
            "n_events": len(vfx),
            "cusum_fx": int(math.floor(s)),
        }

    return _series_partition_fold(
        events, emit, "user_id long, n_events long, cusum_fx long"
    )


#: 1e-3 fixed point for ACF inputs — value ≤ ~600 and ≤ ~100 rows/series
#: in the driver data, so every moment term below stays far inside
#: BIGINT: Sk ≤ n·v² ≈ 1e2·(6e5)² ≈ 3.6e13, n²·Sk ≈ 3.6e17,
#: n·S1·A ≈ 3.6e17, (n−k)·S1² ≈ 3.6e17 — worst-case |num| ≲ 1.5e18
#: < 2⁶³. The regime is ENFORCED at runtime, not assumed: acf_lags
#: fuses a per-series guard (4·n³·max|v|² < 9.0e18, derived from the
#: term bounds above) into the output so out-of-regime series raise
#: with a targeted message instead of wrapping (non-ANSI deployments)
#: or raw-overflowing mid-plan (ANSI, the session default).
#: Series length does not grow with corpus size (users scale
#: with rows), so the bound holds at 100 TB.
_ACF_SCALE = 1_000
_ACF_LAGS = (1, 2, 3)


def _acf_oracle() -> str:
    lead_cols = ",\n               ".join(
        f"LEAD(v, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        f" AS v{k}"
        for k in _ACF_LAGS
    )
    agg_cols = ",\n               ".join(
        f"SUM(v * v{k}) AS sk{k},\n               "
        f"SUM(CASE WHEN v{k} IS NOT NULL THEN v END) AS a{k},\n"
        f"               SUM(v{k}) AS b{k}"
        for k in _ACF_LAGS
    )
    branches = "\n        UNION ALL\n".join(
        f"""        SELECT user_id, CAST({k} AS BIGINT) AS lag,
               n * n * sk{k} - n * s1 * a{k} - n * s1 * b{k}
                   + (n - {k}) * s1 * s1 AS acf_num,
               n * n * s2 - n * s1 * s1 AS acf_den
        FROM g WHERE n > {k}"""
        for k in _ACF_LAGS
    )
    return f"""
    WITH s AS (
        SELECT user_id, ts, event_id,
               CAST(FLOOR(value * {_ACF_SCALE}) AS BIGINT) AS v
        FROM events
        WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    w AS (
        SELECT user_id, v,
               {lead_cols}
        FROM s
    ),
    g AS (
        SELECT user_id,
               COUNT(*) AS n,
               SUM(v) AS s1,
               SUM(v * v) AS s2,
               {agg_cols}
        FROM w
        GROUP BY user_id
    ),
    l AS (
{branches}
    )
    SELECT user_id, lag,
           CAST(acf_num AS BIGINT) AS acf_num,
           CAST(acf_den AS BIGINT) AS acf_den,
           CAST(FLOOR(1000000.0 * CAST(acf_num AS DOUBLE)
                      / CAST(acf_den AS DOUBLE)) AS BIGINT) AS acf_mfx
    FROM l
    WHERE acf_den > 0
    """


@register(
    "timeseries_autocorr_events",
    oracle=_acf_oracle(),
    tags=("E13", "E18", "N15"),
)
def timeseries_autocorr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation r_k per series at lags 1..3 — the
    standard seasonality/burstiness diagnostic for the reference's
    hourly delay/weather feeds (dags/weather.py:1, dags/warsaw-delays.py:1
    produce exactly these per-key observation streams).

    Exact-integer formulation so the cross-engine hash matches without
    tolerance: values floor to 1e-3 fixed point, then with S1=Σv,
    S2=Σv², Sk=Σ v_t·v_{t+k}, A_k=Σ_{t≤n−k} v_t, B_k=Σ_{t>k} v_t the
    mean-centred numerator/denominator scale by n² to clear the
    rational mean:

        num_k = n²·Sk − n·S1·(A_k + B_k) + (n−k)·S1²
        den   = n²·S2 − n·S1²          (r_k = num_k / den)

    A_k is Σv over rows whose lead survives, B_k is Σ lead_k — both
    fall out of the same single window pass, so the whole face is one
    keyed shuffle shared by the lead window and the groupBy, then a
    map-side stack() expand to (user, lag) rows. The ratio is emitted
    both as the exact integer pair and as a 1e-6-floored double ratio
    (identical IEEE expression on both engines)."""
    return acf_lags(load_table(spark, sf_dir, "events"))


def acf_lags(events: DataFrame) -> DataFrame:
    """Exact-integer sample-ACF body of timeseries_autocorr_events,
    exposed so tests can feed synthetic series — in particular
    out-of-regime ones that must trip the BIGINT-headroom guard."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        events.filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            F.floor(F.col("value") * _ACF_SCALE).cast("bigint").alias("v"),
        )
    )
    for k in _ACF_LAGS:
        s = s.withColumn(f"v{k}", F.lead("v", k).over(w))
    aggs = [
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
        F.max(F.abs(F.col("v"))).alias("maxabs"),
    ]
    for k in _ACF_LAGS:
        aggs += [
            F.sum(F.col("v") * F.col(f"v{k}")).alias(f"sk{k}"),
            F.sum(F.when(F.col(f"v{k}").isNotNull(), F.col("v"))).alias(
                f"a{k}"
            ),
            F.sum(f"v{k}").alias(f"b{k}"),
        ]
    g = s.groupBy("user_id").agg(*aggs)
    # Runtime regime guard: every moment term is bounded by 4·n³·v_max²
    # (|n²·Sk| ≤ n³v², |n·S1·(A+B)| ≤ 2n³v², |(n−k)·S1²| ≤ n³v²), so
    # requiring 4·n³·v_max² < 9.0e18 keeps the BIGINT arithmetic exact.
    # Spark (non-ANSI) would WRAP silently past 2⁶³ while the DuckDB
    # oracle computes in HUGEINT — out-of-regime series must therefore
    # fail LOUDLY, not return plausible garbage. The guard is fused
    # into acf_den (a column every output row consumes, so pruning
    # can't drop it); driver data sits ~15× inside the bound at sf0.1.
    in_regime = (
        F.pow(F.col("n").cast("double"), F.lit(3.0))
        * F.pow(F.col("maxabs").cast("double"), F.lit(2.0))
        * 4.0
        < 9.0e18
    )
    g = g.withColumn(
        "n",
        F.when(in_regime, F.col("n")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "timeseries_autocorr_events: series exceeds the "
                        "1e-3 fixed-point BIGINT regime (4*n^3*max|v|^2 "
                        ">= 9.0e18) for user_id "
                    ),
                    F.col("user_id").cast("string"),
                    F.lit(" — recompute this series' moments in DECIMAL"),
                )
            ).cast("long")
        ),
    )
    stack_args = ", ".join(
        f"{k}L, n * n * sk{k} - n * s1 * a{k} - n * s1 * b{k}"
        f" + (n - {k}) * s1 * s1, IF(n > {k}, 1, 0)"
        for k in _ACF_LAGS
    )
    l = g.selectExpr(
        "user_id",
        "n * n * s2 - n * s1 * s1 AS acf_den",
        f"stack({len(_ACF_LAGS)}, {stack_args}) AS (lag, acf_num, ok)",
    ).filter("ok = 1 AND acf_den > 0")
    return l.select(
        "user_id",
        "lag",
        "acf_num",
        "acf_den",
        F.floor(
            1000000.0
            * F.col("acf_num").cast("double")
            / F.col("acf_den").cast("double")
        )
        .cast("bigint")
        .alias("acf_mfx"),
    )


#: Holt smoothing weights: exact binary fractions, so both engines'
#: multiplications round identically at every step of the fold.
#: NOTE the oracle is a RECURSIVE CTE, not list_reduce: DuckDB 1.0's
#: list_reduce over struct accumulators updates fields SEQUENTIALLY
#: (the t-expression would see the already-overwritten acc.l), so a
#: two-component fold is only well-defined through recursion, where
#: every reference is to the previous row's immutable columns.
_HOLT_NL = "0.5 * o.vfx + 0.5 * (h.l + h.t)"


@register(
    "timeseries_holt_linear",
    oracle=f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, ts, event_id,
               CAST(CAST(FLOOR(COALESCE(value, 0) * 1000000.0) AS BIGINT)
                    AS DOUBLE) AS vfx
        FROM events
    ),
    ord AS (
        SELECT user_id, vfx,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM ev
    ),
    sizes AS (
        SELECT user_id, MAX(rn) AS n FROM ord GROUP BY user_id
    ),
    holt(user_id, rn, l, t) AS (
        SELECT user_id, 1, vfx, CAST(0.0 AS DOUBLE)
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT h.user_id, h.rn + 1,
               {_HOLT_NL},
               0.25 * (({_HOLT_NL}) - h.l) + 0.75 * h.t
        FROM holt h
        JOIN ord o ON o.user_id = h.user_id AND o.rn = h.rn + 1
    )
    SELECT h.user_id,
           CAST(s.n AS BIGINT) AS n_events,
           CAST(FLOOR(h.l) AS BIGINT) AS level_fx,
           CAST(FLOOR(h.t) AS BIGINT) AS trend_fx
    FROM holt h JOIN sizes s ON s.user_id = h.user_id AND h.rn = s.n
    """,
    tags=("E39", "E13", "N15"),
)
def timeseries_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend double-exponential smoothing (final level
    and trend per series, α=0.5 β=0.25): the forecasting primitive one
    step past EWMA — TWO coupled state components, so no window frame
    expresses it and the cross-engine proof needs a struct-typed fold.
    Exactness discipline extends timeseries_cusum_events' technique:
    values floor to 1e-6 fixed point; the weights are exact binary
    fractions; DuckDB replays the identical fold as a RECURSIVE CTE
    carrying (l, t) columns (the new level's expression is inlined
    twice — bitwise the same computation), and Spark runs the same
    IEEE ops in the same order inside an applyInPandas fold, so the
    floored (level, trend) pair is bit-identical. At 100 TB: one
    shuffle on the series key, O(1) state per group."""
    events = load_table(spark, sf_dir, "events")

    import numpy as np

    def emit(uid: int, vals) -> dict:
        a = np.where(np.isnan(vals), 0.0, vals.astype(np.float64))
        vfx = np.floor(a * 1000000.0).tolist()  # exact-int doubles
        l, t = vfx[0], 0.0
        for x in vfx[1:]:
            nl = 0.5 * x + 0.5 * (l + t)
            nt = 0.25 * (nl - l) + 0.75 * t
            l, t = nl, nt
        return {
            "user_id": uid,
            "n_events": len(vfx),
            "level_fx": int(math.floor(l)),
            "trend_fx": int(math.floor(t)),
        }

    return _series_partition_fold(
        events,
        emit,
        "user_id long, n_events long, level_fx long, trend_fx long",
    )
