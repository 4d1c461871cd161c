"""Dataloader sharding: the last mile between a curated corpus and a
training job — a deterministic global shuffle, shard assignment, and
per-shard manifest (SURVEY.md §2.C north-star; companion to
operators/packing.py, which fills the context window AFTER sharding
decides which worker reads what).

Every distributed trainer needs the same three properties:

* **Deterministic epoch shuffle** — the permutation of the corpus for
  epoch ``e`` must be a pure function of (key, e): reproducible across
  runs, resumable mid-epoch, identical no matter how the corpus is
  partitioned. An ``orderBy(rand())`` has none of these.
* **Shard = unit of worker ownership** — worker ``i`` of ``n`` reads
  shard files ``i, i+n, i+2n…`` with no coordination; membership must
  therefore also be a pure function of (key, e).
* **Manifest** — per-shard row/token counts so the trainer can size
  epochs and detect truncation without scanning data.

Implementation is the portable integer hash family from
operators/sampling.py (exact int64 arithmetic, identical in Spark and
ANSI SQL — which is what makes the whole pipeline oracle-checkable):
``shard(key, e)  = mix(key·KNUTH  + e·EPOCH_PRIME)  % n_shards`` and
``pos(key, e)`` ranks a second, independent mix within the shard. Two
different odd multipliers make the streams independent; changing ``e``
re-deals both membership and order (a true global reshuffle, not a
per-shard rotate).

Scale: assignment is a pure projection (no shuffle); the in-shard rank
is one hash-partitioned window over n_shards partitions — the same
single shuffle a groupBy(shard) would cost, and the sort is per-shard
(corpus_size/n_shards rows), never global. At 100 TB with 8192 shards
each sort run is ~12 GB — executor-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mobility_etl_spark.operators.sampling import _KNUTH, _MIXMOD, _PREMOD

#: Second multiplier (xxhash PRIME32_2): decorrelates the position
#: stream from the shard stream — both mod _MIXMOD, both int64-safe
#: (_PREMOD · multiplier < 2^52).
_KNUTH2 = 2246822519
#: Folds the epoch into both streams so each epoch is a fresh deal.
_EPOCH_PRIME = 1299709


def _epoch_mult(mult: int, epoch: int) -> int:
    """Epoch-dependent multiplier, reduced so the product stays int64.

    The epoch MUST enter multiplicatively: with a multiplicative hash,
    any purely additive epoch term (pre- or post-multiply) is affine in
    the key, so epoch e+1 becomes a near-pure shard-label ROTATION of
    epoch e (same members, same order, shifted label — caught by
    review simulation: 99.9% of keys followed a constant +offset).
    Changing the multiplier makes the cross-epoch difference
    key-dependent; measured max Jaccard between any e0 and e1 shard is
    ~1/(2·n_shards−1), i.e. the uniform-re-deal expectation, and the
    in-shard order correlation is ~0.
    """
    return (mult + epoch * _EPOCH_PRIME) % _MIXMOD


def _mix(key, mult: int, epoch: int):
    return (
        (key % _PREMOD) * F.lit(_epoch_mult(mult, epoch))
        + F.lit(epoch * _EPOCH_PRIME)  # moves the key ≡ 0 fixed point too
    ) % _MIXMOD


def sql_mix(key_expr: str, mult: int, epoch: int) -> str:
    """Oracle-side rendering of :func:`_mix`."""
    return (
        f"(({key_expr} % {_PREMOD}) * {_epoch_mult(mult, epoch)}"
        f" + {epoch * _EPOCH_PRIME}) % {_MIXMOD}"
    )


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    epoch: int = 0,
) -> DataFrame:
    """Add ``shard_id`` (worker ownership) and ``epoch_pos`` (1-based
    read order within the shard) — together a deterministic global
    shuffle of the corpus for the given epoch.

    ``epoch_pos`` ties on the mix value break by key, so the full
    ordering is total and engine-independent.
    """
    shard = _mix(F.col(key_col), _KNUTH, epoch) % n_shards
    posmix = _mix(F.col(key_col), _KNUTH2, epoch)
    w = Window.partitionBy("shard_id").orderBy(posmix.asc(), F.col(key_col))
    return df.withColumn("shard_id", shard).withColumn(
        "epoch_pos", F.row_number().over(w)
    )


def shard_manifest(
    sharded: DataFrame, size_col: str | None = None
) -> DataFrame:
    """Per-shard index the trainer reads instead of scanning data:
    row count, payload size, and the key-range fingerprint."""
    aggs = [
        F.count("*").alias("n_rows"),
        F.min("epoch_pos").alias("first_pos"),
        F.max("epoch_pos").alias("last_pos"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("long").alias("total_size"))
    return sharded.groupBy("shard_id").agg(*aggs)
