"""Scalar function families, part 2 (SURVEY.md §2.B E23/E25/E26) and
exact distributional statistics.

Extends queries/scalars.py with the function families the first pack
did not exercise — edit-distance, character translation, pad/repeat/
reverse, bitwise arithmetic — plus grouped second-moment statistics
(variance/stddev) computed with the exact-decimal pattern so they
hash-match DuckDB at any parallelism (a raw STDDEV over doubles is
order-dependent and would not).

Scope justification: scraped-text cleanup implies the string family
(dags/warsaw-delays.py:147-154); hash/bitwise ops generalize the
digest handling of dags/warsaw-gtfs.py:41-47; delay-series dispersion
per route ("is route X consistently late or just noisy?") is the
moments query over dags/warsaw-delays.py:182's schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register


@register(
    "string_funcs2_docs",
    oracle="""
    SELECT doc_id,
           levenshtein(lang, source) AS lev_lang_source,
           translate(lang, 'aeiou', '12345') AS lang_translated,
           repeat(lang, 2) AS lang_doubled,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id_padded,
           reverse(source) AS source_reversed,
           ascii(lang) AS lang_ascii,
           regexp_replace(source, '[0-9]', '#', 'g') AS source_masked
    FROM documents
    """,
    tags=("E23",),
)
def string_funcs2_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family 2: edit distance, char translation, pad/repeat/
    reverse, ASCII code, global regexp masking — all JVM built-ins
    inside one whole-stage-codegen projection (no UDF, no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.levenshtein("lang", "source").alias("lev_lang_source"),
        F.translate("lang", "aeiou", "12345").alias("lang_translated"),
        F.repeat("lang", 2).alias("lang_doubled"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_padded"),
        F.reverse("source").alias("source_reversed"),
        F.ascii("lang").alias("lang_ascii"),
        F.regexp_replace("source", "[0-9]", "#").alias("source_masked"),
    )


@register(
    "bitwise_funcs_events",
    oracle="""
    SELECT event_id,
           xor(event_id, 255) AS id_xor,
           event_id & 4095 AS id_and,
           event_id | 1024 AS id_or,
           event_id << 3 AS id_shl,
           event_id >> 2 AS id_shr
    FROM events
    WHERE event_id < 2000
    """,
    tags=("E25", "E26"),
)
def bitwise_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: xor/and/or/shifts on int64 keys — the primitive
    layer under hash-partition routing, bloom probes, and SimHash
    (operators/dedup.py); pure codegen projection."""
    events = load_table(spark, sf_dir, "events")
    i = F.col("event_id")
    return events.filter(i < 2000).select(
        "event_id",
        i.bitwiseXOR(255).alias("id_xor"),
        i.bitwiseAND(4095).alias("id_and"),
        i.bitwiseOR(1024).alias("id_or"),
        F.shiftleft(i, 3).alias("id_shl"),
        F.shiftright(i, 2).alias("id_shr"),
    )


@register(
    "stats_moments_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*)
               AS mean_value,
           (CAST(SUM(CAST(value * value AS DECIMAL(20,6))) AS DOUBLE)
            - CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
              * CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1) AS var_value,
           sqrt((CAST(SUM(CAST(value * value AS DECIMAL(20,6))) AS DOUBLE)
            - CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
              * CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1)) AS std_value
    FROM events
    GROUP BY event_type
    """,
    tags=("E13", "E25"),
)
def stats_moments_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped variance/stddev: built-in VAR_SAMP/STDDEV stream
    doubles in partition order (non-deterministic across engines and
    parallelism), so the engine computes the two exact decimal moments
    Σx and Σx² (x² is one IEEE op per row — bit-identical everywhere)
    and derives var = (Σx² − (Σx)²/n)/(n−1) with a fixed final op
    sequence. Still one partial→final aggregation pass at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    v = F.col("value")
    agg = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v.cast("decimal(20,6)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(20,6)")).cast("double").alias("s2"),
    )
    n = F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / n) / (n - 1)
    return agg.select(
        "event_type",
        "n",
        (F.col("s1") / n).alias("mean_value"),
        var.alias("var_value"),
        F.sqrt(var).alias("std_value"),
    )


@register(
    "map_funcs_events",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           COUNT(*) AS n_types,
           MAX(CASE WHEN event_type = 'click' THEN n END) AS click_count,
           COUNT(CASE WHEN n > 5 THEN 1 END) AS heavy_types
    FROM c GROUP BY user_id
    """,
    tags=("E27", "E29"),
)
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns + higher-order map lambdas (the map half of
    E27): per-user event-type counts are materialized as a MAP column
    (map_from_entries over collect_list), then consumed with
    map_keys/element_at/map_filter — all JVM-side lambda expressions,
    no explode and no Python. The oracle computes the same scalars
    relationally, proving the map pipeline loses nothing."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    maps = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("type_counts")
    )
    return maps.select(
        "user_id",
        F.size(F.map_keys("type_counts")).cast("long").alias("n_types"),
        F.element_at("type_counts", "click").alias("click_count"),
        F.size(
            F.map_filter("type_counts", lambda k, v: v > 5)
        ).cast("long").alias("heavy_types"),
    )


@register(
    "try_arithmetic_events",
    oracle="""
    SELECT event_id,
           CASE WHEN (event_id % 7) <> 0
                THEN CAST(FLOOR(CAST(FLOOR(value * 1000000) AS DOUBLE)
                                / (event_id % 7)) AS BIGINT) END AS safe_div,
           TRY_CAST(CASE WHEN event_id % 3 = 0 THEN event_type
                         ELSE CAST(event_id AS VARCHAR) END
                    AS BIGINT) AS maybe_num,
           CAST(CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE event_id * 1000000 END AS BIGINT) AS guarded_mul
    FROM events
    WHERE event_id < 3000
    """,
    tags=("E25", "E8"),
)
def try_arithmetic_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface: ``try_divide`` (NULL on zero
    denominator, not a job-killing error), ``try_cast`` over mixed
    parseable/garbage strings, ``try_multiply`` under a NULL guard —
    the poisoned-feed posture (R8) applied to expressions: a bad row
    yields NULL and flows on instead of killing the 100 TB job. The
    oracle states identical semantics with ANSI CASE guards; the
    quotient goes through a single double divide + FLOOR so it is
    integer-exact cross-engine."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    denom = F.col("event_id") % 7
    micro = F.floor(F.col("value") * 1_000_000).cast("double")
    mixed = F.when(
        F.col("event_id") % 3 == 0, F.col("event_type")
    ).otherwise(F.col("event_id").cast("string"))
    return ev.select(
        "event_id",
        F.floor(F.try_divide(micro, denom)).cast("bigint").alias("safe_div"),
        mixed.try_cast("bigint").alias("maybe_num"),
        F.try_multiply(
            F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("long")).otherwise(
                F.col("event_id")
            ),
            F.lit(1_000_000).cast("long"),
        ).alias("guarded_mul"),
    )


@register(
    "string_collation_docs",
    oracle="""
    WITH t AS (
        SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
                   AS tag,
               source
        FROM documents
        WHERE doc_id < 400
    )
    SELECT lower(tag) AS lang_ci,
           COUNT(*) AS n_docs,
           MIN(source) AS first_source
    FROM t
    GROUP BY lower(tag)
    """,
    tags=("E23", "E13"),
)
def string_collation_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark-4 collations): a mixed-case tag
    column grouped under UTF8_LCASE merges case variants WITHOUT
    rewriting values — the collation is type-level, so comparisons,
    joins, and aggregations all honor it (vs the lower()-everywhere
    workaround the oracle states). The projected key is normalized
    with lower() only to pin a deterministic output representative."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    tag = F.when(
        F.col("doc_id") % 2 == 0, F.upper("lang")
    ).otherwise(F.col("lang"))
    return (
        docs.select(
            F.collate(tag, "UTF8_LCASE").alias("tag"), "source"
        )
        .groupBy("tag")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("source").alias("first_source"),
        )
        .select(
            F.lower(F.col("tag").cast("string")).alias("lang_ci"),
            "n_docs",
            "first_source",
        )
    )
