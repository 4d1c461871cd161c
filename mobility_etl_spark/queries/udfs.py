"""Custom-function surface: grouped-agg pandas UDAF and Python UDTF
(SURVEY.md §2.B E40/E41; E38/E39 are exercised by queries/multimodal.py).

UDFs are the engine's slow path (opaque to Catalyst, Python round-trip)
— the rule is built-ins first (queries/scalars.py), Arrow-vectorized
pandas UDFs when custom logic is unavoidable. These queries prove the
Arrow boundary preserves exact semantics: the oracle computes the same
answers in pure SQL.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register

# pandas_udf/udtf decorators parse their DDL return types against the
# ACTIVE session, so they must be built lazily inside the query fns
# (the registry imports this module before any SparkSession exists).


def _median_udaf():
    @pandas_udf(DoubleType())
    def median_udaf(v: pd.Series) -> float:
        """Exact median (interpolated for even counts): per-group custom
        aggregation the built-in surface lacks exactly (percentile_approx
        is approximate). (a+b)/2 is one IEEE op — bit-identical to the
        oracle's MEDIAN, so the result is hash-comparable."""
        return float(v.median())

    return median_udaf


def _count_udaf():
    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return int(len(v))

    return count_udaf


@register(
    "grouped_agg_udaf_median",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           MEDIAN(o_totalprice) AS median_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("E40",),
)
def grouped_agg_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E40: custom grouped-agg pandas UDAF (Arrow-batched, partial-agg
    NOT available — Spark ships whole groups to Python, so group
    cardinality must be bounded; fine for enum-like keys, wrong for
    high-cardinality keys at 100 TB where percentile_approx is the
    scale path)."""
    orders = load_table(spark, sf_dir, "orders")
    # Pandas grouped-agg UDFs cannot mix with JVM aggregates in one
    # agg (INVALID_PANDAS_UDF_PLACEMENT) — the count is a pandas UDAF too.
    return orders.groupBy("o_orderpriority").agg(
        _count_udaf()("o_orderkey").alias("n"),
        _median_udaf()("o_totalprice").alias("median_price"),
    )


def _split_sentences_udtf():
    @udtf(returnType="idx int, sentence string")
    class SplitSentences:
        """E41: one-row→many UDTF — the zip-manifest expansion shape
        (R4) applied to text: emit (index, sentence) per '. '-delimited
        chunk. Mirrors Python str.split semantics exactly; the oracle
        mirrors it with string_split + unnest."""

        def eval(self, text: str):  # noqa: D102
            for i, s in enumerate((text or "").split(". ")):
                yield i, s

    return SplitSentences


@register(
    "udtf_split_sentences",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, '. '), 1) - 1 AS idx,
           unnest(string_split(text, '. ')) AS sentence
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("E41",),
)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via SQL LATERAL join: each document row fans out to
    one row per sentence with its ordinal."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("split_sentences", _split_sentences_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, s.sentence
        FROM _udtf_docs d, LATERAL split_sentences(d.text) s
        WHERE d.doc_id < 200
        """
    )


def _value_micro_udf():
    @pandas_udf("long")
    def value_micro(v: pd.Series) -> pd.Series:
        """Vectorized scalar pandas UDF (Arrow batches): floor(v·1e6)
        as int64 — one IEEE multiply + floor per element, bit-identical
        to the SQL oracle, so the whole Python round-trip is
        hash-checked."""
        import numpy as np

        return pd.Series(np.floor(v.values * 1_000_000.0).astype("int64"))

    return value_micro


@register(
    "pandas_udf_scalar",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT))
                AS BIGINT) AS sum_micro
    FROM events
    GROUP BY event_type
    """,
    tags=("E38",),
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E38 standalone: a scalar @pandas_udf in the projection (the
    Delay-parser-fallback shape, SURVEY §2.B) feeding a JVM aggregate —
    proving the Arrow scalar boundary preserves exact semantics.
    Engine rule remains built-ins-first: this op exists because custom
    per-value Python sometimes can't be avoided; when it can't, it
    looks like this (vectorized, never row-at-a-time)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("micro", _value_micro_udf()("value"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("micro").alias("sum_micro"))
    )


@register(
    "cogrouped_pandas_asof",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, MAX(value) AS purchase_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.purchase_value AS purchase_value_asof
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("E39", "E12"),
)
def cogrouped_pandas_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped ``applyInPandas`` (E39's two-sided form): clicks and
    purchases co-grouped per user, merged with ``pandas.merge_asof``
    inside the Arrow batch — the escape hatch for per-key logic that
    needs BOTH sides as local frames. Proven equivalent to DuckDB's
    native ASOF JOIN (and to operators/asof.py, which stays the
    preferred all-JVM form)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "purchase_value_asof"]
            )
        left = left.sort_values("ts", kind="mergesort")
        right = right.sort_values("ts", kind="mergesort")[["ts", "purchase_value"]]
        out = pd.merge_asof(left, right, on="ts", direction="backward")
        return out.rename(columns={"purchase_value": "purchase_value_asof"})[
            ["event_id", "user_id", "ts", "purchase_value_asof"]
        ]

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, ts timestamp_ntz, "
            "purchase_value_asof double",
        )
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(FLOOR(sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * 1000000000.0) AS BIGINT) AS l2_norm_fx
    FROM embeddings
    WHERE vec_id < 500
    """,
    tags=("E38", "N3"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy end of the Python-execution
    surface (scalar pandas UDF → grouped map → grouped agg → UDTF →
    mapInPandas → stateful → THIS): record batches arrive as raw
    ``pyarrow.RecordBatch`` with no pandas materialization, the numpy
    kernel computes L2 norms per batch, and results return as Arrow.
    numpy's SIMD dot and the oracle's sequential list_sum may differ
    in the last ulp, so the norm is snapped to 1e-9 fixed-point
    (floor) before comparison — at ~1.0-magnitude norms the snap
    absorbs ~7 orders of magnitude more error than either engine
    produces. Per-batch cost is one BLAS dot per row; nothing shuffles.
    """
    import numpy as np
    import pyarrow as pa

    docs = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 500
    ).select("vec_id", "embedding")

    def norms(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            embs = batch.column("embedding")
            dims, fx = [], []
            for lst in embs:
                v = np.asarray(lst.as_py(), dtype=np.float64)
                dims.append(len(v))
                fx.append(int(np.floor(np.sqrt(np.dot(v, v)) * 1e9)))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(dims, pa.int32()), pa.array(fx, pa.int64())],
                names=["vec_id", "dim", "l2_norm_fx"],
            )

    return docs.mapInArrow(
        norms, "vec_id long, dim int, l2_norm_fx long"
    )


@register(
    "udf_iterator_batch_scaled",
    oracle="""
    SELECT event_id,
           value * 0.001 + 1.0 AS scaled
    FROM events WHERE user_id < 500
    """,
    tags=("E38",),
)
def udf_iterator_batch_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form scalar pandas UDF (``Iterator[pd.Series] →
    Iterator[pd.Series]``) — the shape for per-task amortized state:
    expensive init (model load, dictionary build) runs ONCE per task
    before the batch loop, then every Arrow batch reuses it. The
    per-row math here is trivial on purpose; the face gates the
    execution contract (init-once visible across batches, streaming
    batch iteration, no pandas re-materialization per row). Identical
    IEEE ops both engines → exact compare. Completes the Python
    surface: scalar UDF → THIS (iterator) → grouped map → grouped agg
    → UDTF → mapInPandas/mapInArrow → stateful."""

    @pandas_udf("double")
    def scale_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # amortized once-per-task init (a real pipeline loads a model
        # or codec table here); the loop below must observe it
        scale, shift = 0.001, 1.0
        for s in batches:
            yield s * scale + shift

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 500)
    return events.select(
        "event_id", scale_iter(F.col("value")).alias("scaled")
    )


@register(
    "sql_udf_price_bands",
    oracle="""
    WITH banded AS (
        SELECT o_orderpriority,
               CASE WHEN o_totalprice > 300000.0 THEN 'high'
                    WHEN o_totalprice > 100000.0 THEN 'mid'
                    ELSE 'low' END AS band
        FROM orders
    ),
    counts AS (
        SELECT o_orderpriority, band, COUNT(*) AS n
        FROM banded GROUP BY o_orderpriority, band
    )
    SELECT c.o_orderpriority, c.band, c.n, m.mult,
           c.n * m.mult AS weighted
    FROM counts c
    JOIN (SELECT unnest([1, 2, 3]) AS mult) m ON m.mult <= 2
    """,
    tags=("E8", "E41"),
)
def sql_udf_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 SQL-defined functions, both kinds, plus parameterized
    SQL in one face: a SQL scalar UDF (CREATE TEMPORARY FUNCTION …
    RETURN CASE …) bands order prices with the thresholds passed as
    NAMED PARAMETERS (`:hi` / `:mid` — plan-safe literals, no string
    splicing), and a SQL table-valued function (RETURNS TABLE) joins a
    generated multiplier table. SQL UDFs inline into the plan at
    analysis time — zero serialization cost, unlike Python UDFs — so
    they're the first choice for shareable business logic; the oracle
    re-expresses both as plain SQL, proving the inlining is
    semantics-preserving."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sqludf_orders"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_band(
            x DOUBLE, hi DOUBLE, mid DOUBLE) RETURNS STRING
        RETURN CASE WHEN x > hi THEN 'high'
                    WHEN x > mid THEN 'mid'
                    ELSE 'low' END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION mults(cap INT)
        RETURNS TABLE(mult INT)
        RETURN SELECT explode(sequence(1, cap)) AS mult
        """
    )
    return spark.sql(
        """
        WITH counts AS (
            SELECT o_orderpriority,
                   price_band(o_totalprice, :hi, :mid) AS band,
                   COUNT(*) AS n
            FROM sqludf_orders
            GROUP BY o_orderpriority, price_band(o_totalprice, :hi, :mid)
        )
        SELECT c.o_orderpriority, c.band, c.n, m.mult,
               c.n * m.mult AS weighted
        FROM counts c JOIN mults(3) m ON m.mult <= :cap
        """,
        args={"hi": 300000.0, "mid": 100000.0, "cap": 2},
    )


@register(
    "sql_variables_group_all",
    oracle="""
    SELECT o_orderpriority,
           o_orderstatus,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_totalprice > 150000.0) AS n_over
    FROM orders
    WHERE o_custkey % 10 < 4
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("E6", "E13"),
)
def sql_variables_group_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 SQL session variables (DECLARE / SET VAR) driving a
    GROUP BY ALL / ORDER BY ALL aggregation — the scripting surface
    that replaces client-side string splicing for runtime parameters:
    variables are typed, plan-safe (constant-folded at analysis, so
    pushdown still sees literals), and session-scoped, which is how
    parameterized scheduled jobs carry thresholds between statements.
    GROUP BY ALL derives the grouping key from the non-aggregate
    select list (and ORDER BY ALL the sort key) — both also DuckDB
    dialect, so the oracle states the identical query with the
    variable inlined. DECLARE OR REPLACE keeps the builder idempotent
    across invocations in one session."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sqlvar_orders"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0")
    spark.sql("DECLARE OR REPLACE VARIABLE custkey_mod INT DEFAULT 0")
    spark.sql("SET VAR price_floor = 150000.0")
    spark.sql("SET VAR custkey_mod = 4")
    return spark.sql(
        """
        SELECT o_orderpriority,
               o_orderstatus,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE o_totalprice > price_floor) AS n_over
        FROM sqlvar_orders
        WHERE o_custkey % 10 < custkey_mod
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "sql_scripting_bisect_median",
    oracle="""
    WITH k AS (
        SELECT CAST(CEIL(COUNT(*) / 2.0) AS BIGINT) AS need FROM orders
    ),
    ranked AS (
        SELECT o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn
        FROM orders
    ),
    pk AS (
        SELECT MIN(o_totalprice) AS p
        FROM ranked WHERE rn = (SELECT need FROM k)
    )
    SELECT CAST(FLOOR(p) + 1 AS BIGINT) AS thresh,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
            WHERE o_totalprice < FLOOR(p) + 1) AS n_below,
           (SELECT need FROM k) AS need
    FROM pk
    """,
    tags=("E13", "E21"),
)
def sql_scripting_bisect_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 SQL scripting (BEGIN/END compound statements, DECLARE,
    WHILE, scalar-subquery SET) running a REAL iterative algorithm
    over data: binary search for the smallest integer price threshold
    whose strict-below count reaches half the table — a scripted
    median bracket, ~20 data-driven loop iterations where each
    re-query refines the bound. The oracle is the CLOSED FORM the
    bisection must converge to (floor(k-th smallest) + 1, k = ceil(n/2)
    — smallest integer strictly above at least k prices), so the
    equality proves the control flow, the loop-variable updates, and
    the scalar-subquery reads all compose correctly. Scripting is the
    procedural replacement for driver-side Python loops around
    spark.sql; each iteration is one count aggregate (a control-plane
    scalar), the classic shape of any iterative-refinement job."""
    from mobility_etl_spark.io import load_table

    view = "scripting_orders_v"
    load_table(spark, sf_dir, "orders").select(
        "o_totalprice"
    ).createOrReplaceTempView(view)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(f"""
    BEGIN
      DECLARE need BIGINT;
      DECLARE lo BIGINT DEFAULT 0;
      DECLARE hi BIGINT DEFAULT 1000000;
      DECLARE mid BIGINT;
      DECLARE c BIGINT;
      SET need = (SELECT CAST(CEIL(COUNT(*) / 2.0) AS BIGINT) FROM {view});
      WHILE hi - lo > 1 DO
        SET mid = (lo + hi) DIV 2;
        SET c = (SELECT COUNT(*) FROM {view} WHERE o_totalprice < mid);
        IF c >= need THEN
          SET hi = mid;
        ELSE
          SET lo = mid;
        END IF;
      END WHILE;
      SELECT hi AS thresh,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM {view}
              WHERE o_totalprice < hi) AS n_below,
             need;
    END
    """)
