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
    (asserted in tests/test_scale.py) — for the SUPPORTED join types:
    inner/cross and the left-preserving family (left/semi/anti), where
    every left row matches exactly its own salt's replica. Right/full
    outer joins are REJECTED: each unmatched replica of an ``other``
    row would surface as its own null-padded output row (n_salts
    copies), silently corrupting the result.

    Retry-safety (SPARK-23207 class): the salt feeds the join
    SHUFFLE, so it must be deterministic at the output-multiset level
    — a nondeterministic salt (RNG, ``monotonically_increasing_id``)
    recomputed on task retry can land a row in a DIFFERENT reducer
    after some reduce tasks already fetched, silently dropping or
    duplicating rows. The salt here is ``xxhash64(all columns) +
    duplicate-rank``, with the rank produced WITHOUT a window sort:
    rows collapse to (distinct row, count) via groupBy over all
    columns — map-side partial aggregation collapses duplicates
    before the shuffle, so the exchange carries O(distinct rows), not
    the table — then each distinct row re-expands to ranks 1..m
    through a chunked sequence-explode (bounded 2^16-element arrays,
    so a hot row with millions of identical copies never materializes
    one giant in-memory array; generation streams through codegen
    with no WindowExec buffer). Distinct rows spread by the hash;
    the m identical copies of a hot row fan across min(m, n_salts)
    salts; and because copies are byte-identical, which copy gets
    which rank cannot change the output multiset — any recomputation
    yields the same (row, salt) bag.

    Columns must be hashable/groupable: MAP-typed columns — including
    maps NESTED inside structs/arrays — are rejected up front (Spark
    cannot group or hash them) — drop or ``map_entries``-convert them
    before salting.

    Cost and role: the groupBy-all-columns rank carries each DISTINCT
    row's full payload through one Exchange — acceptable for the
    skew-fallback role (the plain join shuffles the same bytes, and
    map-side combine collapses the hot key's duplicates), but plain
    AQE skew handling (``spark.sql.adaptive.skewJoin``, plan-gated by
    the ``skewjoin_aqe_identity`` face) is the DEFAULT path;
    ``salted_join`` is the last resort for keys AQE can't split (e.g.
    skew materialized by a post-aggregation explosion, where AQE's
    partition-splitting sees balanced map output).

    Float semantics: the groupBy round-trip canonicalizes floating
    values under Spark's grouping equality — ``-0.0`` normalizes to
    ``0.0`` and distinct NaN bit patterns collapse to one canonical
    NaN in the OUTPUT rows. Joins treat those values as equal anyway,
    so match results are unchanged, but byte-level float identity of
    pass-through columns is not preserved.
    """
    base = how.lower().replace("outer", "").strip("_")
    if base in ("right", "full"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — unmatched replicas "
            "of the non-salted side would emit one null-padded row PER "
            "SALT; salt the other side or use the plain join with AQE"
        )
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _has_map(dt) -> bool:
        # recurse: a map nested in a struct/array still breaks
        # groupBy/xxhash64, with an opaque Spark error if admitted
        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    maps = [f.name for f in skewed.schema.fields if _has_map(f.dataType)]
    if maps:
        raise TypeError(
            f"salted_join: map-typed column(s) {maps} cannot be "
            "grouped or hashed for the deterministic salt — drop "
            "them or convert with map_entries() before salting"
        )
    cols = list(skewed.columns)
    _CHUNK = 1 << 16
    counted = skewed.groupBy(*cols).agg(F.count("*").alias("__m"))
    chunked = counted.select(
        *cols,
        "__m",
        F.explode(
            F.sequence(
                F.lit(0), ((F.col("__m") - 1) / _CHUNK).cast("long")
            )
        ).alias("__c"),
    )
    ranked = chunked.select(
        *cols,
        F.explode(
            F.sequence(
                F.col("__c") * _CHUNK + 1,
                F.least(F.col("__m"), (F.col("__c") + 1) * _CHUNK),
            )
        ).alias("__dup"),
    )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in cols]) + F.col("__dup"),
        F.lit(n_salts),
    )
    left = ranked.withColumn("__salt", salt).drop("__dup")
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, [*on, "__salt"], how).drop("__salt")


def detect_hot_keys(
    df: DataFrame,
    key_cols: tuple[str, ...],
    skew_factor: float = 8.0,
    k: int = 256,
) -> list[tuple]:
    """Find join keys hot enough to need salting, WITHOUT a full
    groupBy over the key space: one pass of mergeable frequency
    summaries (the Misra-Gries machinery, operators/sketch.py applied
    to key tuples) — shuffle O(partitions × k) counter rows, so the
    diagnosis costs a scan, not a shuffle of the table.

    Returns keys whose (under-)estimated frequency still exceeds
    ``skew_factor ×`` the uniform share — MG never overestimates, so
    every returned key is genuinely hot; with k counters a key can
    evade detection only below N/(k+1), far under any harmful skew.
    Feed the result to :func:`salted_join` (or trust AQE for moderate
    cases). Driver receives ≤ k control rows.
    """
    import pandas as pd

    key_struct = F.struct(*[F.col(c) for c in key_cols])

    def summarize(batches):
        from mobility_etl_spark.operators.sketch import _mg_add_and_compress

        counters: dict = {}
        for pdf in batches:
            vc = pdf["__key"].value_counts()
            _mg_add_and_compress(counters, vc.to_dict(), k)
        yield pd.DataFrame(
            {
                "key": [str(t) for t in counters],
                "wt": list(counters.values()),
            }
        )

    raw = (
        df.select(key_struct.cast("string").alias("__key"))
        .mapInPandas(summarize, "key string, wt long")
        .groupBy("key")
        .agg(F.sum("wt").alias("wt"))
    )
    stats = df.agg(
        F.count("*").alias("total"),
        F.approx_count_distinct(key_struct).alias("n_keys"),
    ).first()
    uniform = stats.total / max(stats.n_keys, 1)
    return [
        (r.key, r.wt)
        for r in raw.filter(F.col("wt") >= skew_factor * uniform).collect()
    ]


#: Bits per dimension in the z-value (256 quantile buckets/dim).
_Z_BITS = 8


def _zvalue_expr(bucket_cols: list, bits: int = _Z_BITS):
    """Interleave the bits of per-dimension bucket ids into one z-value
    (Morton code): bit i of dimension d lands at position
    ``i * ndims + d``. Pure shiftleft/bitwise-OR tree — whole-stage
    codegen, no UDF. The interleaved code must fit the 63 value bits
    of a signed BIGINT: at 8 dims x 8 bits the top bit would hit the
    sign (negative z-values sort first, breaking contiguity) and
    beyond that Java's shift masks the count mod 64, silently
    COLLIDING unrelated (bit, dim) pairs — so over-wide requests fail
    loudly instead."""
    ndims = len(bucket_cols)
    if ndims * bits > 62:
        raise ValueError(
            f"z-order over {ndims} dims x {bits} bits needs "
            f"{ndims * bits} bits, exceeding a signed BIGINT's safe "
            "62 — reduce dimensions or bits per dimension"
        )
    z = F.lit(0).cast("long")
    for d, b in enumerate(bucket_cols):
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * ndims + d))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    zorder_cols: tuple[str, ...],
    n_files: int = 32,
    rel_err: float = 0.01,
) -> None:
    """Write ``df`` as parquet clustered on a Morton (z-order)
    space-filling curve over ``zorder_cols`` — multi-dimensional data
    skipping for the columns a single sort key can't serve.

    A sort by (a, b) gives perfect min/max pruning on ``a`` and none on
    ``b``; z-ordering makes every file a small hyper-rectangle in
    (a, b) space, so parquet footer min/max stats prune scans filtered
    on EITHER column (or both). At 100 TB this is the difference
    between "fast for the leading key only" and "fast for every
    clustered dimension".

    Mechanics (all JVM-side after one sketch pass):

    1. ``approxQuantile`` collects 256 rank cutpoints per column — a
       driver-side *control* scalar pass (skew-proof: ranks, not value
       ranges, so a heavy-tailed column still fills buckets evenly).
    2. Each row maps to per-dimension bucket ids via a broadcast
       cutpoint array (``size(filter(cuts, c -> c <= v))`` — codegen,
       no UDF), whose bits interleave into one z-value.
    3. ``repartitionByRange`` on the z-value + in-partition sort, then
       write — each file covers one contiguous z-range.

    tests/test_scale.py asserts per-file min/max spans shrink for ALL
    z-ordered dimensions vs a linear sort, which is exactly the stat
    parquet row-group pruning consumes.
    """
    probs = [i / 2**_Z_BITS for i in range(1, 2**_Z_BITS)]
    # ONE multi-column sketch pass — the per-column overload re-scans
    # the table once per z-order column for identical information
    all_cuts = df.approxQuantile(list(zorder_cols), probs, rel_err)
    buckets = []
    for c, cuts in zip(zorder_cols, all_cuts):
        arr = F.array(*[F.lit(float(x)) for x in cuts])
        buckets.append(
            F.size(
                F.filter(arr, lambda cut: cut <= F.col(c).cast("double"))
            ).cast("long")
        )
    zdf = df.withColumn("__z", _zvalue_expr(buckets))
    (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def auto_salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    skew_factor: float = 8.0,
    n_salts: int = 8,
) -> DataFrame:
    """Join that diagnoses its own skew: run :func:`detect_hot_keys`
    on the probe side and salt ONLY when a pathologically hot key
    exists — otherwise return the plain join and let AQE handle
    moderate skew. The diagnosis is one sketch scan (O(partitions × k)
    shuffle); salting replicates ``other`` ``n_salts``×, so paying it
    only on diagnosed skew is the right default at 100 TB.
    """
    hot = detect_hot_keys(skewed, tuple(on), skew_factor=skew_factor)
    if not hot:
        return skewed.join(other, on, how)
    return salted_join(skewed, other, on, n_salts=n_salts, how=how)
