"""CDC apply / MERGE-upsert: reconcile a change feed into a snapshot.

The reference's state handling is overwrite-latest-blob (SURVEY.md §2,
R7: dags/warsaw-gtfs.py's re-land of the whole feed); the lakehouse
form is ``MERGE INTO target USING changes`` — insert new keys, update
matched keys, drop deleted keys — without a transactional table
format. Engine-native decomposition:

1. collapse the feed to its LATEST change per key (window row_number
   by a monotonic sequence — a CDC feed replays and reorders, so
   last-writer-wins must be explicit, never "whatever arrived last");
2. survivors = target ⟕anti latest-keys (rows the feed never touched
   keep their payload untouched);
3. result = survivors ∪ latest upserts (ops I/U), deletes simply
   never re-enter.

At 100 TB the anti-join shuffles only the feed's KEYS against the
target (digests-not-payloads, SURVEY.md §2.C) — with a day-sized feed
that side broadcasts, so refreshing a billion-row snapshot costs one
scan of the target plus a broadcast, not a sort-merge of two lakes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D change feed to ``target``; returns the new
    snapshot with target's schema.

    ``changes`` must carry target's columns plus ``seq_col`` (strictly
    increasing per key — ties would make last-writer-wins ambiguous)
    and ``op_col`` in {'I','U','D'}.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = target.join(F.broadcast(latest.select(*keys)), keys, "left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*target.columns)
    return survivors.unionByName(upserts)
