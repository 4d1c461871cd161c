"""Dataloader-facing training-prep faces: deterministic epoch
sharding (operators/sharding.py) and the JSONL export surface — the
step where the curated corpus leaves the lake and meets the trainer.

The sharding oracle re-derives the exact mix arithmetic in SQL, so the
"global shuffle" is proven to be the pure function it claims to be:
same inputs → same shard membership and same in-shard order, in two
unrelated engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.sampling import sql_hash_bucket
from mobility_etl_spark.operators.sharding import (
    _EPOCH_PRIME,
    _KNUTH,
    _KNUTH2,
    assign_shards,
    shard_manifest,
    sql_mix,
)
from mobility_etl_spark.registry import register

#: Per-process export cache: sf_dir -> JSONL artifact dir (the export
#: side effect runs once per process, not once per builder call).
_JSONL_CACHE: dict[str, str] = {}

_N_SHARDS = 16
_EPOCH = 1


@register(
    "shard_assignment_docs",
    oracle=f"""
    SELECT doc_id,
           {sql_mix("doc_id", _KNUTH, _EPOCH)} % {_N_SHARDS} AS shard_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY {sql_mix("doc_id", _KNUTH, _EPOCH)} % {_N_SHARDS}
               ORDER BY {sql_mix("doc_id", _KNUTH2, _EPOCH)}, doc_id
           ) AS INTEGER) AS epoch_pos
    FROM documents
    """,
    tags=("N7", "N12"),
)
def shard_assignment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-1 global shuffle of the documents corpus
    into {n} dataloader shards: ``shard_id`` is worker ownership,
    ``epoch_pos`` the read order within the shard — both pure functions
    of (doc_id, epoch), so training is reproducible and resumable with
    zero coordination state. One projection + one per-shard window
    (single shuffle over n_shards partitions; each sort run is
    corpus/n_shards rows — executor-sized at any scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return assign_shards(docs, "doc_id", _N_SHARDS, epoch=_EPOCH).select(
        "doc_id", "shard_id", "epoch_pos"
    )


@register(
    "shard_manifest_docs",
    oracle=f"""
    WITH sharded AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               {sql_mix("doc_id", _KNUTH, _EPOCH)} % {_N_SHARDS} AS shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY
                       {sql_mix("doc_id", _KNUTH, _EPOCH)} % {_N_SHARDS}
                   ORDER BY {sql_mix("doc_id", _KNUTH2, _EPOCH)}, doc_id
               ) AS INTEGER) AS epoch_pos
        FROM documents
    )
    SELECT shard_id,
           COUNT(*) AS n_rows,
           MIN(epoch_pos) AS first_pos,
           MAX(epoch_pos) AS last_pos,
           CAST(SUM(n_tokens) AS BIGINT) AS total_size
    FROM sharded
    GROUP BY shard_id
    """,
    tags=("N7", "N12"),
)
def shard_manifest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-shard index a trainer reads instead of scanning data:
    row count, contiguous position range (first_pos=1, last_pos=n_rows
    — the resumability contract), and the token payload per worker.
    The oracle recomputes the whole shuffle independently, so manifest
    totals are proven against the assignment itself."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    sharded = assign_shards(docs, "doc_id", _N_SHARDS, epoch=_EPOCH)
    return shard_manifest(sharded, size_col="n_tokens")


@register(
    "training_jsonl_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, length(text) AS n_chars
    FROM documents
    """,
    tags=("E3", "N12", "R10"),
)
def training_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export surface: the corpus written as JSON-lines (the
    interchange format every training stack ingests) and read back
    with an explicit schema — the returned frame must hash-match the
    parquet original, proving the export is lossless including text
    payloads (quoting/escaping round-trips). Format conversion on copy
    is the reference's R10 (dags/warsaw-gtfs.py:61-71, CSV→parquet);
    this is the same face pointed at the trainer."""
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    # export once per (process, sf_dir); later builder invocations
    # reuse the artifact (review finding: one tempdir per call)
    out = _JSONL_CACHE.get(sf_dir)
    if out is None:
        out = tempfile.mkdtemp(prefix="jsonl_export_")
        docs.write.mode("overwrite").json(out)
        _JSONL_CACHE[sf_dir] = out
    back = spark.read.schema(
        "doc_id long, lang string, source string, text string"
    ).json(out)
    return back.select(
        "doc_id", "lang", "source", F.length("text").alias("n_chars")
    )


_K_FOLDS = 5


@register(
    "training_kfold_counts",
    oracle=f"""
    SELECT {sql_hash_bucket("doc_id", _K_FOLDS)} AS fold,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1
    """,
    tags=("N7", "N12"),
)
def training_kfold_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment (operators/sampling.py:
    kfold_assign): 5 deterministic folds over the corpus with per-fold
    document/token counts — the oracle re-derives membership from the
    portable hash, so fold boundaries are engine- and layout-
    independent (the property that lets a training stack and this
    engine agree on splits without shipping membership lists)."""
    from mobility_etl_spark.operators.sampling import kfold_assign

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    return (
        kfold_assign(docs, "doc_id", _K_FOLDS)
        .groupBy("fold")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )


def exact_us_cutoffs(
    events: DataFrame, fracs: tuple[float, ...], n: int | None = None
) -> list[int]:
    """Batched :func:`exact_us_cutoff`: the SAME exact order-statistic
    per fraction, with the control-plane jobs fused across fractions
    (guide §1.2 — fewer passes; §2.6 — overlap independent jobs):
    ONE approxQuantile call carries every bracket probe (the sketch is
    built once from (data, relativeError) and queried per probability,
    so each answer is identical to a single-probe call), ONE
    aggregation computes every bracket's below-count, and the
    per-fraction sliver ranks — each a few-percent slice of the data —
    run concurrently from a driver thread pool so their small jobs
    back-fill each other's task tails. Values returned are
    bit-identical to calling exact_us_cutoff per fraction."""
    from concurrent.futures import ThreadPoolExecutor

    from mobility_etl_spark.operators.sampling import bucketed_global_rank

    probes: list[float] = []
    for f in fracs:
        probes += [max(0.0, f - 0.02), min(1.0, f + 0.02)]
    qs = events.approxQuantile("us", probes, 0.001)
    brackets = [(qs[2 * i], qs[2 * i + 1]) for i in range(len(fracs))]
    # n (when the caller hasn't already counted) rides the same
    # aggregation as the below-counts — no separate count() job
    below = events.agg(
        *[
            F.sum((F.col("us") < F.lit(lo)).cast("long")).alias(f"b{i}")
            for i, (lo, _) in enumerate(brackets)
        ],
        F.count("*").alias("__n"),
    ).collect()[0]
    if n is None:
        n = int(below["__n"])

    def one(i: int) -> int:
        lo, hi = brackets[i]
        target = int(fracs[i] * n)
        sliver = events.filter((F.col("us") >= lo) & (F.col("us") <= hi))
        ranked, _ = bucketed_global_rank(
            sliver.select("us", "event_id"), "us", "event_id", "rank"
        )
        return ranked.filter(
            F.col("rank") == target - int(below[f"b{i}"] or 0)
        ).select("us").collect()[0]["us"]

    with ThreadPoolExecutor(max_workers=len(fracs)) as pool:
        return list(pool.map(one, range(len(fracs))))


def exact_us_cutoff(events: DataFrame, frac: float, n: int) -> int:
    """Exact order-statistic timestamp (unix micros) at rank
    floor(frac*n), computed scale-correctly: approx-quantile bracket
    around the target rank, then operators/sampling.bucketed_global_rank
    INSIDE the sliver (every window partitioned by range bucket — a
    single-partition rank over even a few-percent sliver is terabytes
    through one task at 100 TB). ``events`` must carry (us, event_id).
    Single-fraction form of :func:`exact_us_cutoffs` (one code path)."""
    return exact_us_cutoffs(events, (frac,), n)[0]


@register(
    "training_temporal_split",
    oracle="""
    WITH cutoff AS (
        SELECT ts AS cut FROM (
            SELECT ts, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
                   COUNT(*) OVER () AS n
            FROM events
        ) WHERE rn = CAST(FLOOR(0.8 * n) AS BIGINT)
    )
    SELECT CASE WHEN e.ts <= c.cut THEN 'train' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(MIN(epoch_us(e.ts)) AS BIGINT) AS min_ts_us,
           CAST(MAX(epoch_us(e.ts)) AS BIGINT) AS max_ts_us
    FROM events e CROSS JOIN cutoff c
    GROUP BY CASE WHEN e.ts <= c.cut THEN 'train' ELSE 'test' END
    """,
    tags=("N7", "N16", "E13"),
)
def training_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal holdout split — the ONLY leakage-safe split for
    forecasting/ranking training data (hash splits leak future
    information into train; see hash_split_train_test for the i.i.d.
    case): the cutoff is the exact 80th-percentile event timestamp
    (order-statistic via approx-quantile-bounded candidates, NOT a
    global sort — the candidate filter below keeps the rank window's
    input to a sliver of the data), train = ts <= cutoff, test = the
    future. Output: per-split row/user counts and the time ranges —
    whose non-overlap IS the no-leakage certificate
    (train.max_ts <= test.min_ts, gated in tests). At 100 TB the
    cutoff is 1 scalar; assignment is a map-only comparison."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    # r14: one cutoff via the batched helper — n rides the below-count
    # aggregation instead of a separate count() job
    cut_us = exact_us_cutoffs(events, (0.8,))[0]
    tagged = events.withColumn(
        "split",
        F.when(F.col("us") <= F.lit(cut_us), "train").otherwise("test"),
    )
    return tagged.groupBy("split").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.min(F.unix_micros(F.col("ts").cast("timestamp")))
        .cast("bigint")
        .alias("min_ts_us"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
        .cast("bigint")
        .alias("max_ts_us"),
    )


@register(
    "training_winsorize_events",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(FLOOR(value * 1000000.0) AS BIGINT) AS vfx
        FROM events WHERE value IS NOT NULL
    ),
    bounds AS (
        SELECT event_type,
               CAST(quantile_disc(vfx, 0.01) AS BIGINT) AS lo,
               CAST(quantile_disc(vfx, 0.99) AS BIGINT) AS hi
        FROM v GROUP BY event_type
    )
    SELECT v.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(b.lo) AS lo_fx,
           MIN(b.hi) AS hi_fx,
           CAST(SUM(CASE WHEN vfx < b.lo THEN 1
                         WHEN vfx > b.hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped,
           CAST(SUM(GREATEST(b.lo, LEAST(b.hi, vfx))) AS BIGINT)
               AS sum_winsorized_fx
    FROM v JOIN bounds b USING (event_type)
    GROUP BY v.event_type
    """,
    tags=("N16", "E13"),
)
def training_winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — percentile clipping to [p01, p99] per group —
    the standard tail-taming normalization before feature scaling or
    loss computation (a single corrupt sensor reading otherwise owns
    the gradient). Bounds are EXACT discrete percentiles
    (percentile_disc on 1e-6 fixed-point integers — bit-identical
    cross-engine, no interpolation ambiguity), applied as a map-only
    greatest/least clamp after a broadcast join of the per-group
    bounds — the aggregate-then-broadcast two-pass, same plan family
    as outlier_mad_events. All outputs integer-exact."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    v = events.select(
        "event_type",
        F.floor(F.col("value") * 1000000.0).cast("long").alias("vfx"),
    )
    v.createOrReplaceTempView("__wins_v")
    bounds = spark.sql(
        """SELECT event_type,
                  CAST(percentile_disc(0.01) WITHIN GROUP (ORDER BY vfx)
                       AS BIGINT) AS lo,
                  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY vfx)
                       AS BIGINT) AS hi
           FROM __wins_v GROUP BY event_type"""
    )
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("vfx")))
    return (
        v.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("lo").alias("lo_fx"),
            F.min("hi").alias("hi_fx"),
            F.sum(
                F.when(
                    (F.col("vfx") < F.col("lo"))
                    | (F.col("vfx") > F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_clipped"),
            F.sum(clipped).cast("bigint").alias("sum_winsorized_fx"),
        )
    )


_BT_FRACS = (0.6, 0.7, 0.8, 0.9)


def _bt_fold_sql(i: int) -> str:
    """One backtest fold of the oracle: train on ranks <= cut_i, test
    on (cut_i, cut_{i+1}]; the baseline model is the per-user train
    mean (decimal-exact), scored by 1e-6-floored absolute error."""
    lo = f"c{i}"
    hi = f"c{i + 1}" if i + 1 < len(_BT_FRACS) + 1 else None
    hi_cond = f"AND e.rn <= cuts.{hi}" if hi else ""
    return f"""
        SELECT {i} AS fold,
               CAST(t.n_train AS BIGINT) AS n_train,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(COUNT(m.mean_v) AS BIGINT) AS n_scored,
               CAST(SUM(CASE WHEN m.mean_v IS NOT NULL THEN
                   CAST(FLOOR(1000000.0 * ABS(e.value - m.mean_v))
                        AS BIGINT) END) AS BIGINT) AS abs_err_fx
        FROM ev e
        CROSS JOIN cuts
        CROSS JOIN (
            SELECT COUNT(*) AS n_train FROM ev e2 CROSS JOIN cuts
            WHERE e2.rn <= cuts.c{i}
        ) t
        LEFT JOIN (
            SELECT e3.user_id,
                   CAST(SUM(CAST(e3.value AS DECIMAL(20,6))) AS DOUBLE)
                       / COUNT(*) AS mean_v
            FROM ev e3 CROSS JOIN cuts
            WHERE e3.rn <= cuts.c{i}
            GROUP BY e3.user_id
        ) m ON m.user_id = e.user_id
        WHERE e.rn > cuts.c{i} {hi_cond}
        GROUP BY t.n_train"""


@register(
    "training_backtest_folds",
    oracle="""
    WITH ev AS (
        SELECT user_id, value,
               ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER () AS n
        FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    cuts AS (
        SELECT CAST(FLOOR(0.6 * MAX(n)) AS BIGINT) AS c0,
               CAST(FLOOR(0.7 * MAX(n)) AS BIGINT) AS c1,
               CAST(FLOOR(0.8 * MAX(n)) AS BIGINT) AS c2,
               CAST(FLOOR(0.9 * MAX(n)) AS BIGINT) AS c3,
               CAST(MAX(n) AS BIGINT) AS c4
        FROM ev
    )
    """ + "\n    UNION ALL\n".join(_bt_fold_sql(i) for i in range(4)),
    tags=("N7", "N16", "E13"),
)
def training_backtest_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest — THE forecasting evaluation protocol:
    four expanding train windows cut at the exact 60/70/80/90%
    event-order statistics, each scored on the NEXT decile only, with
    a per-user train-mean baseline (decimal-exact means; per-event
    absolute errors floored to 1e-6 fixed point before the order-free
    integer sum). Cold-start test events (user unseen in train) are
    counted but not scored — reported, never silently imputed. The
    cutoffs come from :func:`exact_us_cutoff` (approx bracket +
    bucketed rank — zero global windows); each fold's model is one
    aggregation + broadcast join. The oracle replays the whole
    protocol from a literal global ROW_NUMBER, so the equality also
    re-proves the cutoff machinery fold-for-fold."""
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    cuts = exact_us_cutoffs(events, _BT_FRACS)  # n rides the below-agg

    # r14 (guide §1.2 "the distributed algorithm", §2.4): the per-fold
    # loop ran 4 model aggregations + 4 train.count jobs + 8 event
    # scans (26 jobs with the per-fold cutoff machinery). The fold
    # tests are DISJOINT us ranges and every fold's train set is a
    # prefix of the next, so one scan computes all four: the four
    # per-fold train counts fuse into ONE aggregation, the four
    # per-user train means fuse into ONE groupBy with conditional
    # decimal sums (identical values — the decimal sum is exact and
    # order-free, and the single IEEE division is unchanged), and the
    # test side becomes one tagged scan + one broadcast join. A user
    # unseen in fold i's train has a NULL conditional sum, so mean_i
    # is NULL exactly where the old left-join missed (ANSI-safe: the
    # NULL numerator short-circuits before the /0 check).
    n_trains = events.agg(
        *[
            F.sum((F.col("us") <= F.lit(c)).cast("long")).alias(f"t{i}")
            for i, c in enumerate(cuts)
        ]
    ).collect()[0]
    model = events.filter(F.col("us") <= cuts[-1]).groupBy("user_id").agg(
        *[
            (
                F.sum(
                    F.when(
                        F.col("us") <= F.lit(c),
                        F.col("value").cast("decimal(20,6)"),
                    )
                ).cast("double")
                / F.sum((F.col("us") <= F.lit(c)).cast("long"))
            ).alias(f"mean_{i}")
            for i, c in enumerate(cuts)
        ]
    )
    fold_tag = F.when(F.col("us") <= cuts[1], 0)
    for i in range(1, len(cuts) - 1):
        fold_tag = fold_tag.when(F.col("us") <= cuts[i + 1], i)
    fold_tag = fold_tag.otherwise(len(cuts) - 1)
    mean_sel = F.when(F.col("fold") == 0, F.col("mean_0"))
    for i in range(1, len(cuts)):
        mean_sel = mean_sel.when(F.col("fold") == i, F.col(f"mean_{i}"))
    err = F.when(
        mean_sel.isNotNull(),
        F.floor(1000000.0 * F.abs(F.col("value") - mean_sel)).cast(
            "bigint"
        ),
    )
    scored = (
        events.filter(F.col("us") > cuts[0])
        .withColumn("fold", fold_tag)
        .join(F.broadcast(model), "user_id", "left")
        .groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.count(mean_sel).cast("bigint").alias("n_scored"),
            F.sum(err).cast("bigint").alias("abs_err_fx"),
        )
    )
    # Literal fold spine: a fold with an empty test range must still
    # emit its row (count 0, null error sum) exactly as the old
    # ungrouped per-fold aggregate did.
    folds = spark.createDataFrame(
        [(i, int(n_trains[f"t{i}"] or 0)) for i in range(len(cuts))],
        "fold int, n_train bigint",
    )
    return folds.join(scored, "fold", "left").select(
        "fold",
        "n_train",
        F.coalesce(F.col("n_test"), F.lit(0).cast("bigint")).alias(
            "n_test"
        ),
        F.coalesce(F.col("n_scored"), F.lit(0).cast("bigint")).alias(
            "n_scored"
        ),
        "abs_err_fx",
    )
