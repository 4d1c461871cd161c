"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus job needs *reproducible* sampling: re-running the
pipeline (or re-reading with different partitioning) must select the
same rows, and train/test membership must be a pure function of the
record key — never of Spark's RNG, task layout, or row order. The
reference's change-detection hash (dags/warsaw-gtfs.py:41-47,60-71)
applies the same principle to files; these operators apply it to rows.

The hash is a Knuth multiplicative hash on the key, built entirely from
64-bit integer arithmetic so any engine (Spark, DuckDB, a SQL
warehouse) computes identical buckets — which also makes every sampling
query below exactly oracle-checkable, unlike ``df.sample``/``sampleBy``
whose partition-seeded RNG is engine- and layout-dependent.

Scale posture: all three operators are narrow (per-row expressions or a
single window per label); nothing shuffles except the explicit
``Window.partitionBy(label)`` in :func:`balanced_sample`, whose state is
bounded by k rows per label.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Knuth's multiplicative constant (2^32 * golden ratio conjugate).
_KNUTH = 2654435761
#: Pre-reduction modulus keeps key * _KNUTH inside int64.
_PREMOD = 1000003
#: Large prime for the final mix.
_MIXMOD = 1000000007


def hash_bucket(key: Column | str, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer key.

    ``((key % 1000003) * 2654435761) % 1000000007 % n_buckets`` — exact
    integer arithmetic, identical in Spark and ANSI SQL engines.
    """
    key = F.col(key) if isinstance(key, str) else key
    return ((key % _PREMOD) * F.lit(_KNUTH)) % _MIXMOD % n_buckets


def sql_hash_bucket(key_expr: str, n_buckets: int) -> str:
    """Oracle-side rendering of :func:`hash_bucket`."""
    return f"(({key_expr} % {_PREMOD}) * {_KNUTH}) % {_MIXMOD} % {n_buckets}"


def hash_split(
    df: DataFrame, key: str, train_pct: int = 80, col: str = "split"
) -> DataFrame:
    """Tag each row 'train'/'test' by hash bucket — a pure function of
    the key, so membership is stable across runs, partitionings, and
    cluster sizes."""
    bucket = hash_bucket(key, 100)
    return df.withColumn(
        col, F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("test"))
    )


def hash_sample(df: DataFrame, key: str, permille: int) -> DataFrame:
    """Keep a deterministic ~permille/1000 subset keyed on ``key``."""
    return df.filter(hash_bucket(key, 1000) < permille)


def balanced_sample(
    df: DataFrame, label: str, key: str, k: int, rank_col: str = "rn"
) -> DataFrame:
    """At most k rows per label class, chosen by hash order (not file
    order, which is layout-dependent). The per-class rank is kept so
    downstream can sub-slice without re-windowing."""
    w = Window.partitionBy(label).orderBy(hash_bucket(key, _MIXMOD), F.col(key))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def bucketed_global_rank(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    rank_col: str = "grank",
    num_buckets: int = 32,
) -> tuple[DataFrame, int]:
    """Exact global row_number over ``(order_col, tiebreak_col)``
    WITHOUT a single-partition window — the distributed-ranking
    pattern (range-bucket, count, offset) that scales to 100 TB where
    ``row_number() OVER (ORDER BY ...)`` funnels the corpus through
    one task.

    1. Approximate quantile boundaries of ``order_col`` (one bounded
       collect of ``num_buckets - 1`` scalars). Boundary *placement*
       only affects bucket balance, never correctness.
    2. Bucket id = #boundaries strictly below the value — a pure,
       deterministic, monotone function of the row value, so every
       job/stage recomputes identical buckets with no caching or
       cross-job shuffle-reuse assumptions (unlike
       ``repartitionByRange``, whose sampled boundaries can differ
       between the count pass and the rank pass).
    3. Per-bucket counts (one bounded collect of ``<= num_buckets``
       scalars) -> cumulative offsets, embedded as a literal map.
    4. ``row_number`` over ``Window.partitionBy(bucket)`` (state
       bounded by the bucket, never global) + offset = exact global
       rank.

    Ties in ``order_col`` share a bucket (the bucket function must be
    monotone in the sort key), so a single massively-repeated value is
    a hot bucket — the same caveat as any range partitioner; for such
    data widen the sort key before bucketing.

    PRECONDITION: ``order_col`` must be non-null on every row.  NULL
    order keys would land in bucket 0 while Spark windows sort NULLS
    FIRST and DuckDB ``ROW_NUMBER ... ORDER BY`` defaults NULLS LAST —
    a silent cross-engine divergence for any oracle-gated caller.  The
    boundary-quantile pass below therefore also counts nulls (same
    single job, zero extra scans) and RAISES if any exist; callers
    must pre-filter or coalesce.

    Returns ``(df_with_rank_col, total_row_count)``.
    """
    quantiles = [i / num_buckets for i in range(1, num_buckets)]
    bounds_row = df.agg(
        F.percentile_approx(order_col, quantiles, 10000).alias("b"),
        F.count_if(F.col(order_col).isNull()).alias("nulls"),
    ).collect()  # control-plane: num_buckets-1 scalars + 1 null count
    if bounds_row[0]["nulls"]:
        raise ValueError(
            f"bucketed_global_rank: order_col {order_col!r} has "
            f"{bounds_row[0]['nulls']} NULL rows; rank over nullable "
            "keys is engine-dependent (Spark NULLS FIRST vs SQL NULLS "
            "LAST) — filter or coalesce them first"
        )
    bounds = sorted(set(bounds_row[0]["b"] or []))
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(barr, lambda x: x < F.col(order_col)))
    else:
        bucket = F.lit(0)
    tagged = df.withColumn("_rb", bucket)
    counts = {
        r["_rb"]: r["cnt"]
        for r in tagged.groupBy("_rb").agg(F.count("*").alias("cnt")).collect()
    }  # control-plane: <= num_buckets scalars, exact + deterministic
    total = sum(counts.values())
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    if offsets:
        omap = F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        )
        offset = F.element_at(omap, F.col("_rb"))
    else:
        offset = F.lit(0)
    w = Window.partitionBy("_rb").orderBy(order_col, tiebreak_col)
    ranked = tagged.withColumn(
        rank_col,
        (offset.cast("long") + F.row_number().over(w)).alias(rank_col),
    ).drop("_rb")
    return ranked, total


def partitioned_ntile(
    df: DataFrame,
    n_tiles: int,
    order_col: str,
    tiebreak_col: str,
    col: str = "phase",
    num_buckets: int = 32,
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY order_col, tiebreak_col)`` with exact
    SQL semantics but zero unpartitioned windows: global rank from
    :func:`bucketed_global_rank`, then the NTILE size formula applied
    as a map-only expression. With ``n`` rows total, the first
    ``n % n_tiles`` tiles hold ``n div n_tiles + 1`` rows and the rest
    ``n div n_tiles`` — exactly SQL NTILE's row distribution, so the
    result hash-matches the window form while the plan's only Window
    is partitioned by range bucket."""
    ranked, total = bucketed_global_rank(
        df, order_col, tiebreak_col, rank_col="_grank", num_buckets=num_buckets
    )
    base, rem = divmod(total, n_tiles)
    big = base + 1
    head = rem * big  # rows covered by the (base+1)-sized tiles
    r0 = F.col("_grank") - 1
    phase = F.when(
        r0 < F.lit(head), F.lit(1) + (r0 - r0 % big) / big
    ).otherwise(
        F.lit(1 + rem) + ((r0 - head) - (r0 - head) % max(base, 1)) / max(base, 1)
    )
    return ranked.withColumn(col, phase.cast("int")).drop("_grank")


def kfold_assign(df: DataFrame, key: str, k: int, col: str = "fold") -> DataFrame:
    """Deterministic k-fold assignment: fold = portable hash of the key
    mod k — membership is a pure function of the key, so every worker,
    run, and engine derives identical folds with zero coordination
    (the cross-validation face of :func:`hash_split`). Train/validate
    splits fall out as fold != i / fold == i filters that both push to
    the scan."""
    return df.withColumn(col, hash_bucket(key, k))
