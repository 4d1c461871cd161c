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


def kfold_assign(df: DataFrame, key: str, k: int, col: str = "fold") -> DataFrame:
    """Deterministic k-fold assignment: fold = portable hash of the key
    mod k — membership is a pure function of the key, so every worker,
    run, and engine derives identical folds with zero coordination
    (the cross-validation face of :func:`hash_split`). Train/validate
    splits fall out as fold != i / fold == i filters that both push to
    the scan."""
    return df.withColumn(col, hash_bucket(key, k))
