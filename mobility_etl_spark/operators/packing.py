"""Sequence packing: bin documents into fixed token-budget training
sequences (SURVEY.md §2.C north-star; the step between a curated
corpus and a dataloader — every LLM pretraining pipeline packs
variable-length documents into fixed context windows to avoid padding
waste).

100 TB design: packing is inherently sequential (bin state), so the
corpus is first salted into ``num_groups`` independent packing groups
by a deterministic hash of the key — each group packs in isolation
inside one ``applyInPandas`` call (Arrow-batched, no driver loop, no
global sort). Group-local best-fit-decreasing (BFD) gives ≥ (1 −
capacity/group_tokens) of global packing efficiency while scaling
linearly with executors; the fill loss from sharding is at most one
partially-filled bin per group, negligible when groups carry ≫
capacity tokens. BFD carries the classic 11/9·OPT + 6/9 guarantee.

Oversized documents (size > capacity) are NOT dropped silently: each
becomes its own single-doc bin with ``overflow = true`` so a
downstream chunker (see ``text_chunk_windows``) can split them —
the no-silent-caps rule.

Determinism: group assignment is the portable md5 60-bit hash of the
key mod groups (engine-portable — a DuckDB oracle rebuilds identical
groups); within a group docs sort by (size desc, key); best-fit takes
the tightest bin that fits (bisect on sorted remainders, ties resolved
by insert-before-equals order — which the SQL replay mirrors with
list_filter counts and list_slice splices) — so the packing is a pure
function of the input set, stable across runs, partitionings,
clusters, AND engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: bin_id = group * _BIN_STRIDE + bin_index — globally unique, stable.
#: The stride is 2^40 (~1.1e12 bins/group), so a 63-bit signed bin_id
#: holds ~8.4M groups without overlap; pack_group asserts bin_index <
#: stride so a group that somehow exceeds it fails loudly instead of
#: silently colliding with the next group's ids.
_BIN_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    key_col: str,
    size_col: str,
    capacity: int,
    num_groups: int = 32,
) -> DataFrame:
    """Assign each row to a packed bin: returns the input keys plus
    ``(pack_group, bin_id, bin_fill ignored)`` → columns
    (key, size, pack_group, bin_id, overflow).

    One shuffle (the groupBy on the salt); packing state never leaves
    the executor; output is one row per input row.
    """
    import pandas as pd

    schema = (
        f"{key_col} long, {size_col} long, pack_group int, "
        "bin_id long, overflow boolean"
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # Best-fit-decreasing with a bisect-maintained sorted remainder
        # list: O(n log n) searches instead of first-fit's O(n·bins)
        # linear scans — the difference between 100k docs/group packing
        # in milliseconds vs minutes. Same 11/9·OPT + 6/9 guarantee as
        # FFD, and still a pure function of the input set (sorted
        # order + tightest-fit choice are both deterministic).
        import bisect

        group = int(pdf["__grp"].iloc[0])
        rows = pdf[[key_col, size_col]].sort_values(
            [size_col, key_col], ascending=[False, True]
        )
        sizes = rows[size_col].to_numpy()
        rem: list[int] = []  # sorted remaining capacities
        rem_bin: list[int] = []  # bin index aligned with rem
        n_bins = 0
        out_bin: list[int] = []
        out_over: list[bool] = []
        for size in sizes:
            size = int(size)
            if size > capacity:
                out_bin.append(n_bins)  # oversized solo bin, never reused
                out_over.append(True)
                n_bins += 1
                continue
            i = bisect.bisect_left(rem, size)  # tightest bin that fits
            if i < len(rem):
                b, new_rem = rem_bin.pop(i), rem.pop(i) - size
            else:
                b, new_rem = n_bins, capacity - size
                n_bins += 1
            j = bisect.bisect_left(rem, new_rem)
            rem.insert(j, new_rem)
            rem_bin.insert(j, b)
            out_bin.append(b)
            out_over.append(False)
        if n_bins >= _BIN_STRIDE:
            raise ValueError(
                f"pack_group {group} produced {n_bins} bins, exceeding "
                f"the bin_id stride {_BIN_STRIDE}; raise num_groups"
            )
        return pd.DataFrame(
            {
                key_col: rows[key_col].values,
                size_col: rows[size_col].values,
                "pack_group": group,
                "bin_id": [group * _BIN_STRIDE + b for b in out_bin],
                "overflow": out_over,
            }
        )

    salted = df.select(
        F.col(key_col),
        F.col(size_col).cast("long"),
        # PORTABLE md5 group salt (r11, the minhash re-key move — was
        # xxhash64): a DuckDB oracle can rebuild the identical groups,
        # which together with the in-group replay below makes the
        # whole packing exact-oracle checkable
        F.pmod(
            F.expr(
                f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), "
                "1, 15), 16, 10) AS BIGINT)"
            ),
            F.lit(num_groups),
        )
        .cast("int")
        .alias("__grp"),
    )
    return salted.groupBy("__grp").applyInPandas(pack_group, schema)


def bin_stats(packed: DataFrame, size_col: str, capacity: int) -> DataFrame:
    """Per-bin audit: doc count, fill, utilization, overflow flag."""
    return packed.groupBy("pack_group", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).alias("fill_tokens"),
        (F.sum(size_col) / F.lit(float(capacity))).alias("utilization"),
        F.max("overflow").alias("has_overflow"),
    )
