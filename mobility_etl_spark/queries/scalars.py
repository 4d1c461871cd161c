"""Scalar function families (SURVEY.md §2.B E23–E29).

Each family is justified by a concrete reference value: scraped-text
cleanup is trim/split/regexp (reference dags/warsaw-delays.py:91,
147-154), blob path templates are date_format (dags/warsaw-gtfs.py:90),
the feed marker is a content hash (dags/warsaw-gtfs.py:41-47), the
IMGW payload and ``events.props`` are JSON (dags/warsaw-weather.py:32),
GTFS shape-point sequences group to arrays (dags/warsaw-gtfs.py:35).

All expressions are built-ins (JVM-side, whole-stage codegen) — the
UDF surface is exercised separately (queries/multimodal.py, E38–E41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register


@register(
    "string_funcs_docs",
    oracle="""
    SELECT doc_id,
           upper(substr(text, 1, 12)) AS head,
           length(text) AS n_chars_computed,
           regexp_extract(text, '^(\\w+)', 1) AS first_word,
           len(string_split(text, ' ')) AS n_tokens,
           lang || ':' || source AS lang_source,
           trim('  ' || lang || '  ') AS trimmed_lang
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("E23", "E6"),
)
def string_funcs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/substring/length/regexp_extract/split/concat/
    trim (scraped-text cleanup, reference dags/warsaw-delays.py:147-154)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head"),
        F.length("text").alias("n_chars_computed"),
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias(
            "trimmed_lang"
        ),
    )


@register(
    "date_funcs_orders",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           quarter(o_orderdate) AS qtr,
           date_trunc('month', o_orderdate) AS month_start,
           strftime(o_orderdate, '%Y/%m/%d') AS blob_path,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    WHERE o_orderkey < 300
    """,
    tags=("E24",),
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: year/month/day/quarter/date_trunc/date_format/
    epoch. ``blob_path`` is exactly the reference's `%Y/%m/%d` blob
    template (reference dags/warsaw-gtfs.py:90)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_format("o_orderdate", "yyyy/MM/dd").alias("blob_path"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
    )


@register(
    "hash_funcs_docs",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_md5,
           sha256(text) AS content_sha256,
           md5(text) = md5(text) AS self_consistent
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("E26",),
)
def hash_funcs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5 / sha2-256 — the reference's feed change marker
    (R5/R6, reference dags/warsaw-gtfs.py:41-47) as a column expression;
    at 100 TB dedup shuffles these 16/32-byte digests, not payloads."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
        # expr, not Column == Column: comparing a Column expression to
        # itself makes pyspark log a "trivially true equals predicate"
        # analyzer warning on every run; the SQL form is silent and
        # identical (it exists to assert md5 determinism vs the oracle)
        F.expr("md5(text) = md5(text)").alias("self_consistent"),
    )


@register(
    "json_funcs_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
             / COUNT(json_extract_string(props, '$.k')) AS avg_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("E28", "E3"),
)
def json_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string family: get_json_object over ``events.props`` (the
    IMGW API payload pattern, reference dags/warsaw-weather.py:32-34);
    integer sums are exact so no decimal cast is needed."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "array_funcs_embeddings",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST((SELECT SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                 AS DECIMAL(27,6)))
                 FROM UNNEST(embedding) AS u(x)) AS DOUBLE) AS sq_norm,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    WHERE vec_id < 100
    """,
    tags=("E27",),
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order family: size/element_at/aggregate/filter over
    ``embedding: array<float>``. The squared norm quantizes each squared
    term to decimal(27,6) before the fold, so the sum is associative and
    both engines agree exactly (see functions/compat.py rationale)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_norm = F.expr(
        """
        CAST(aggregate(
            embedding,
            CAST(0 AS DECIMAL(27,6)),
            (acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                        AS DECIMAL(27,6)) AS DECIMAL(27,6))
        ) AS DOUBLE)
        """
    )
    return emb.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        sq_norm.alias("sq_norm"),
        F.size(F.expr("filter(embedding, x -> x > 0)")).alias("n_positive"),
    )


@register(
    "collect_list_labels",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vecs,
           array_to_string(list_sort(list(vec_id)), ',') AS vec_ids
    FROM embeddings
    WHERE vec_id < 50
    GROUP BY label
    """,
    tags=("E29",),
)
def collect_list_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregation: collect_list sorted for determinism — the
    GTFS shape-point → polyline grouping (reference dags/warsaw-gtfs.py:35).
    The list is rendered as a comma-joined string (sorted numerically
    BEFORE the string cast) because array-typed output columns are not
    portable across result harnesses — pandas sort_values can't order
    ndarray cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < 50)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("vec_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("vec_ids"),
        )
    )


@register(
    "json_corrupt_records_events",
    oracle="""
    WITH t AS (
        SELECT event_type,
               CASE WHEN event_id % 7 = 0 THEN 'x' || props
                    ELSE props END AS s
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN json_valid(s) THEN 1 END) AS n_valid,
           CAST(SUM(CASE WHEN json_valid(s)
                         THEN CAST(json_extract_string(s, '$.k') AS INTEGER)
                    END) AS BIGINT) AS sum_k
    FROM t GROUP BY event_type
    """,
    tags=("E28", "E3", "R8"),
)
def json_corrupt_records_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record tolerance on the JSON path: 1-in-7 payloads are
    deterministically mangled (prefix garbage — real feeds truncate
    and concatenate), parsed with try_parse_json (strict VARIANT
    parser → NULL on malformed, never a job abort), and the query
    routes on validity: totals, parse-success counts, and sums over
    only the parseable payloads. The poisoned-feed drill every
    100 TB ingest needs; from_json alone can't express 'did it parse'
    (it yields a null-fielded struct, and is lenient about trailing
    garbage where DuckDB's json_valid is not)."""
    events = load_table(spark, sf_dir, "events")
    s = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("x"), F.col("props"))
    ).otherwise(F.col("props"))
    v = F.try_parse_json(s)
    k = F.try_variant_get(v, "$.k", "int")
    return (
        events.select("event_type", v.alias("v"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("v").isNotNull(), 1)).alias("n_valid"),
            F.sum(F.when(F.col("v").isNotNull(), F.col("k"))).alias("sum_k"),
        )
    )
