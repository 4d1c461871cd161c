"""Scale-out join utilities (SURVEY.md §2.C 100 TB design rules):
bucketed co-located joins and salted skew joins.

These are the two levers when a join's BOTH sides are too big to
broadcast:

* **Bucketing** removes the shuffle entirely: both tables are written
  pre-hashed into the same number of buckets on the join key, so the
  sort-merge join reads co-located buckets with no Exchange — at
  100 TB that's the difference between re-shuffling 100 TB per query
  and never shuffling it again after ingest.
* **Salting** splits a hot key across ``n_salts`` sub-keys when the
  key distribution is skewed (one route, one user, one null-ish
  default dominating): the skewed side gets a deterministic salt, the
  small/replicated side is exploded across all salts, and the join
  fans the hot key over ``n_salts`` tasks instead of one straggler.
  (AQE skew-join splitting — on by default in session.py — handles
  moderate skew automatically; explicit salting is for the pathological
  key that exceeds a single executor even after AQE splits.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join
    key, as an external parquet table at ``path``. Joins between two
    tables bucketed identically on the join key plan with NO Exchange
    (verified in tests/test_scale.py)."""
    writer = (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode("overwrite").saveAsTable(table_name)


def bucketed_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata only lives in the
    catalog — a plain ``spark.read.parquet(path)`` loses it)."""
    return spark.table(table_name)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join where ``skewed`` has pathological key skew: the skewed side
    gets a deterministic per-row salt (xxhash64 of the whole row —
    stable, no RNG state), ``other`` is replicated across all salts,
    and the join key becomes (key, salt) — the hot key's rows spread
    over ``n_salts`` tasks.

    Replication multiplies ``other``'s shuffle volume by ``n_salts``,
    so salt only the join whose skew actually hurts, with the smallest
    working n_salts. Result is row-identical to the unsalted join
    (asserted in tests/test_scale.py).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, [*on, "__salt"], how).drop("__salt")
