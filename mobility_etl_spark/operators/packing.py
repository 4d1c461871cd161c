"""Sequence packing: assemble variable-length documents into
fixed-token-budget training bins.

LLM pre-training consumes fixed-length sequences; feeding one short
document per sequence wastes the context window, so pipelines *pack*
documents back-to-back up to a token budget (padding only the tail of
each bin). Optimal bin packing is NP-hard and inherently sequential —
the wrong shape for a cluster — so the standard distributed compromise
is **greedy next-fit within independent buckets**: documents are
hash/mod-bucketed, each bucket is packed sequentially in deterministic
key order, and bucket-local bin ids compose into globally unique bin
ids. Buckets are embarrassingly parallel; with thousands of buckets the
per-bucket greedy pass is a few thousand rows — driver-free, skew-free,
and the packing efficiency loss vs a global first-fit-decreasing is
bounded by one partially-filled bin per bucket.

The recurrence is exactly::

    first doc in bucket:            bin = 0,       fill = w
    fill + w >  budget:             bin = bin + 1, fill = w
    fill + w <= budget:             bin stays,     fill += w

(an oversized doc — w > budget — always gets a bin of its own). Because
the recurrence is pure integer arithmetic over a deterministic order,
the WHOLE operator is value-level oracle-checkable: DuckDB replays the
same recurrence as a recursive CTE (see queries/curation.py —
``pack_sequences_greedy``), which is the rare case of an inherently
sequential operator with an exact cross-engine oracle.

No reference counterpart (the reference defers all analytics,
SURVEY.md §2.C); north-star training-pipeline surface alongside
dedup and sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
    n_buckets: int = 16,
) -> DataFrame:
    """Pack rows into bins of ≤ ``budget`` total weight, greedily in
    ``key_col`` order within ``key mod n_buckets`` buckets.

    One shuffle (groupBy bucket); the per-bucket sequential scan runs
    as an Arrow-batched ``applyInPandas`` (numpy ints, no per-row
    Python objects crossing the boundary). At scale, set ``n_buckets``
    ≈ a few × cores so every task packs ~corpus/n_buckets rows.

    Returns (bucket, key, weight, bin_local, bin_fill) — ``bin_local``
    is the bucket-local bin ordinal; (bucket, bin_local) is the global
    bin identity.
    """
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col).reset_index(drop=True)
        ws = pdf[weight_col].to_numpy()
        bins = []
        b, fill = 0, 0
        for i, w in enumerate(ws):
            w = int(w)
            if i == 0:
                fill = w
            elif fill + w > budget:
                b, fill = b + 1, w
            else:
                fill += w
            bins.append(b)
        out = pdf[["bucket", key_col, weight_col]].copy()
        out["bin_local"] = pd.Series(bins, dtype="int64")
        return out

    bucketed = df.select(
        (F.col(key_col) % n_buckets).cast("long").alias("bucket"),
        F.col(key_col),
        F.col(weight_col).cast("long"),
    )
    packed = bucketed.groupBy("bucket").applyInPandas(
        pack,
        f"bucket long, {key_col} long, {weight_col} long, bin_local long",
    )
    return packed.withColumn(
        "bin_fill",
        F.sum(weight_col).over(Window.partitionBy("bucket", "bin_local")),
    )
