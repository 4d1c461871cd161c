"""Streaming queries run through the real streaming engine
(SURVEY.md §2.B E30–E37), surfaced in the driver contract.

``streaming_tumbling_window`` executes an actual Structured Streaming
job (file source → watermark → tumbling window → memory sink,
availableNow trigger) and returns the drained sink as a batch
DataFrame — so the DuckDB oracle can hash-check that the *streaming*
engine computed exactly the batch answer. The rest of the streaming
surface (sliding/session/dedup/foreachBatch sink) is exercised in
tests/test_streaming.py on temp-dir streams.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register
from mobility_etl_spark.streaming.jobs import (
    dedup_stream,
    drain_available_now,
    events_file_stream,
    sliding_agg,
    stateful_user_totals,
    stream_stream_join,
    tumbling_hourly_agg,
)


@register(
    "streaming_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("E30", "E31", "E34", "E37"),
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type computed BY THE STREAMING
    ENGINE (readStream → watermark → window → availableNow → memory
    sink); the oracle is the equivalent batch GROUP BY — proving
    stream/batch semantic parity on a bounded input."""
    name = f"stw_{uuid.uuid4().hex[:12]}"
    stream = events_file_stream(spark, f"{sf_dir}/events.parquet")
    result = tumbling_hourly_agg(stream)
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        out = drain_available_now(result, name, ckpt)
    return out


@register(
    "streaming_sliding_window",
    oracle="""
    WITH base AS (
        SELECT date_trunc('hour', ts)
               + ((EXTRACT(minute FROM ts)::INT // 15) * 15) * INTERVAL 1 MINUTE
               AS b15
        FROM events
    ), offs AS (SELECT unnest([0, 1, 2, 3]) AS k)
    SELECT b15 - k * 15 * INTERVAL 1 MINUTE AS win_start,
           b15 - k * 15 * INTERVAL 1 MINUTE + INTERVAL 1 HOUR AS win_end,
           COUNT(*) AS n_events
    FROM base, offs
    GROUP BY 1, 2
    """,
    tags=("E30", "E32", "E34"),
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (1 h window, 15 min slide) counts computed by the
    streaming engine; each event falls in exactly 4 overlapping
    windows, which the oracle states as an explicit 4-offset fan-out
    over the batch table."""
    name = f"ssw_{uuid.uuid4().hex[:12]}"
    stream = events_file_stream(spark, f"{sf_dir}/events.parquet")
    result = sliding_agg(stream, "1 hour", "15 minutes")
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        out = drain_available_now(result, name, ckpt)
    return out


@register(
    "streaming_dedup_replay",
    oracle="""
    SELECT event_type, COUNT(*) AS n_unique
    FROM events
    WHERE event_id < 2000
    GROUP BY event_type
    """,
    tags=("E30", "E35"),
)
def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E35: the feed-hash short-circuit (R6) as streaming dedup — the
    same batch of events is landed TWICE (an at-least-once replay);
    `dropDuplicatesWithinWatermark` on the row content digest must
    land each logical row exactly once, matching the oracle's count
    over the single original copy."""
    landing = tempfile.mkdtemp(prefix="mes_replay_")
    raw = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 2000
    )
    raw.write.mode("overwrite").parquet(landing)
    raw.write.mode("append").parquet(landing)  # the replay

    name = f"sdr_{uuid.uuid4().hex[:12]}"
    deduped = dedup_stream(events_file_stream(spark, landing))
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        out = drain_available_now(deduped, name, ckpt, output_mode="append")
    return (
        out
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
    )


@register(
    "stateful_running_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT))
                AS BIGINT) AS total_micro
    FROM events
    GROUP BY user_id
    """,
    tags=("E36",),
)
def stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E36: applyInPandasWithState running totals per user, forced
    across 4 micro-batches (4 landed files, maxFilesPerTrigger=1) so
    state genuinely carries between batches; the final state per user
    must equal the batch GROUP BY."""
    landing = tempfile.mkdtemp(prefix="mes_state_")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(landing)

    name = f"srt_{uuid.uuid4().hex[:12]}"
    stream = events_file_stream(
        spark, landing, options={"maxFilesPerTrigger": "1"}
    )
    result = stateful_user_totals(stream)
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        sink = drain_available_now(result, name, ckpt, output_mode="update")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_micro")
    )


@register(
    "streaming_session_window",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ),
    s AS (
        SELECT user_id, ts,
               -- cumsum ordered by the SAME (ts, event_id) total order
               -- as the lag above: ordering by (ts, prev_ts) put a
               -- first-row NULL prev_ts AFTER its tied sibling and
               -- mis-split a session on duplicate timestamps (latent
               -- on current data, live on a second-granularity regen
               -- -- r12 review)
               SUM(CASE WHEN prev_ts IS NULL
                          OR ts - prev_ts > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events
    FROM s
    GROUP BY user_id, session_id
    """,
    tags=("E33", "E34"),
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E33 through the real streaming engine: per-user session windows
    (30-minute gap) computed by ``session_window`` with a watermark,
    drained with availableNow. The oracle derives identical sessions
    with the lag/cumulative-sum technique — streaming session
    semantics proven against an independent batch construction.

    session_window's end is last_event + gap, so only (user, start,
    count) are compared; the gap-extended end is engine-internal.
    """
    from mobility_etl_spark.streaming.jobs import session_agg

    name = f"ssn_{uuid.uuid4().hex[:12]}"
    stream = events_file_stream(spark, f"{sf_dir}/events.parquet")
    result = session_agg(stream, gap="30 minutes")
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        out = drain_available_now(result, name, ckpt)
    return out.select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        "n_events",
    )


@register(
    "streaming_stream_stream_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.ts AS p_ts,
           c.ts AS c_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts <= p.ts
    """,
    tags=("E30", "E34"),
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream⋈stream inner join executed by the streaming engine (both
    sides watermarked, time-bounded join condition → bounded state,
    append sink), proven identical to the batch interval self-join."""
    name = f"ssj_{uuid.uuid4().hex[:12]}"
    stream = events_file_stream(spark, f"{sf_dir}/events.parquet")
    result = stream_stream_join(stream)
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        out = drain_available_now(result, name, ckpt, output_mode="append")
    return out


@register(
    "streaming_stream_stream_outer",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'click'
    ),
    wm AS (
        SELECT least((SELECT MAX(ts) FROM p), (SELECT MAX(ts) FROM c))
               - INTERVAL 2 HOUR AS w
    ),
    j AS (
        SELECT p.user_id,
               p.event_id AS purchase_id,
               c.event_id AS click_id,
               p.ts AS p_ts,
               c.ts AS c_ts
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
         AND c.ts <= p.ts
    )
    SELECT user_id, purchase_id, click_id, p_ts, c_ts
    FROM j, wm
    WHERE click_id IS NOT NULL OR p_ts < w
    """,
    tags=("E30", "E34"),
)
def streaming_stream_stream_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream⋈stream LEFT OUTER join — the state-eviction-as-emission
    path the inner face never exercises: a purchase with no click in
    its window is emitted null-padded only once the watermark PROVES
    no matching click can still arrive. The oracle states that
    semantics exactly: matched rows are the plain interval join;
    null-padded rows appear iff p_ts < min(max purchase ts, max click
    ts) - 2h — the engine's final watermark under the default 'min'
    multiple-watermark policy (each withWatermark node tracks its own
    filtered max; availableNow commits a final flush batch at that
    watermark, measured: the null set is split-invariant and
    deterministic, 1-file vs 4-file runs identical). The trailing
    window's unmatched purchases are NOT emitted — that is correct
    streaming semantics, not loss: they are still in state awaiting
    later clicks, and the oracle's watermark clause models exactly
    that."""
    name = f"ssjo_{uuid.uuid4().hex[:12]}"
    stream = events_file_stream(spark, f"{sf_dir}/events.parquet")
    result = stream_stream_join(stream, how="left_outer")
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        out = drain_available_now(result, name, ckpt, output_mode="append")
    return out


@register(
    "streaming_static_join",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           e.event_type,
           e.value,
           c.c_mktsegment,
           e.ts
    FROM (SELECT * FROM events WHERE event_id < 2000) e
    JOIN customer c ON c.c_custkey = e.user_id
    """,
    tags=("E30",),
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joined per
    micro-batch against a static broadcast dimension (no state, no
    watermark needed — the static side is re-broadcast per batch).
    The streaming form of the GTFS-dimension enrichment every landed
    snapshot needs."""
    name = f"ssj2_{uuid.uuid4().hex[:12]}"
    stream = events_file_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_id") < 2000
    )
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = stream.join(
        F.broadcast(dim), stream["user_id"] == dim["c_custkey"]
    ).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "c_mktsegment",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
    )
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        out = drain_available_now(enriched, name, ckpt, output_mode="append")
    return out


@register(
    "streaming_pyds_weather",
    oracle="""
    SELECT CAST(i AS INTEGER) AS station_id,
           COUNT(*) AS n_obs,
           CAST(SUM(CAST(((i * 7 + h * 3) % 350) / 10.0 - 5.0
                         AS DECIMAL(20,6))) AS DOUBLE) AS sum_temp
    FROM generate_series(0, 39) s(i)
    CROSS JOIN generate_series(0, 23) t(h)
    GROUP BY i
    """,
    tags=("R1", "E30"),
)
def streaming_pyds_weather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python data source consumed as a STREAM (Spark-4
    SimpleDataSourceStreamReader): hour-watermark offsets, 4 forced
    micro-batches (6-hour pages), deterministic replay between offsets
    — then aggregated and hash-checked against the oracle's closed-form
    regeneration of the same feed. Proves engine-native feed ingestion
    is batch/stream symmetric (same source class, both faces)."""
    from mobility_etl_spark.sources.pydatasource import (
        WEATHER_SOURCE_NAME,
        FakeWeatherDataSource,
    )

    # unconditional, like the snapshot-source faces: duplicate
    # registration does not raise, and a guard here would only hide a
    # genuine registration failure until a less-diagnostic
    # format-not-found at .load() (r12 review)
    spark.dataSource.register(FakeWeatherDataSource)
    name = f"spw_{uuid.uuid4().hex[:12]}"
    stream = (
        spark.readStream.format(WEATHER_SOURCE_NAME)
        .option("hours_per_batch", "6")
        .load()
    )
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    drained = spark.table(name)
    out = spark.createDataFrame(drained.collect(), drained.schema)
    spark.catalog.dropTempView(name)  # memory sinks outlive the face
    return (
        out
        .groupBy("station_id")
        .agg(
            F.count("*").alias("n_obs"),
            F.sum(F.col("temp_c").cast("decimal(20,6)"))
            .cast("double")
            .alias("sum_temp"),
        )
    )


#: Per-process cache: sf_dir -> final CDC state dir (the stream is
#: drained once per process; re-invocations read the settled state).
_CDC_STATE_CACHE: dict[str, str] = {}


@register(
    "streaming_upsert_cdc",
    oracle="""
    WITH target AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
    ),
    changes AS (
        SELECT o_orderkey, o_custkey, o_totalprice * 1.05 AS o_totalprice,
               o_orderstatus, 1 AS seq, 'U' AS op
        FROM target WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice * 1.1,
               o_orderstatus, 2, 'U'
        FROM target WHERE o_orderkey % 14 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, 3, 'D'
        FROM target WHERE o_orderkey % 21 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, 1, 'I'
        FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    ),
    latest AS (
        SELECT * FROM changes
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                   ORDER BY seq DESC) = 1
    )
    SELECT t.* FROM target t ANTI JOIN latest l
        ON t.o_orderkey = l.o_orderkey
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM latest WHERE op <> 'D'
    """,
    tags=("R7", "E30", "E37"),
)
def streaming_upsert_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cdc_merge_orders feed driven through the REAL streaming
    engine: the three change batches land as parquet files, a file
    stream drains them one file per micro-batch, and
    streaming/jobs.py:cdc_apply_stream_seq MERGEs each micro-batch
    into the parquet snapshot inside foreachBatch. The oracle is the
    pure batch SQL replay of the whole feed — the equality holds
    BECAUSE the snapshot carries (__seq, __deleted) per key: a change
    applies only if its seq beats the stored one and deletes tombstone
    rather than drop, so the final state is invariant to micro-batch
    boundaries AND arrival order (reversed-order gate in
    tests/test_streaming.py — the plain target-schema
    cdc_apply_stream is only order-invariant within a batch). This
    face pins the streaming MERGE path end-to-end in the driver
    contract; at 100 TB the same loop is a foreachBatch MERGE INTO a
    table format, state bounded by the snapshot, not the stream."""
    import os

    from mobility_etl_spark.streaming.jobs import (
        cdc_apply_stream_seq,
        init_cdc_state,
        read_cdc_state,
    )

    out = _CDC_STATE_CACHE.get(sf_dir)
    if out is None:
        orders = load_table(spark, sf_dir, "orders")
        cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
        target = orders.filter(F.col("o_orderdate") < "1999-01-01").select(
            *cols
        )

        def batch(df, price_mult, seq, op):
            price = (
                (F.col("o_totalprice") * price_mult).alias("o_totalprice")
                if price_mult != 1.0
                else F.col("o_totalprice")
            )
            return df.select(
                "o_orderkey",
                "o_custkey",
                price,
                "o_orderstatus",
                F.lit(seq).cast("int").alias("seq"),
                F.lit(op).alias("op"),
            )

        b1 = batch(target.filter(F.col("o_orderkey") % 7 == 0), 1.05, 1, "U")
        b2 = batch(target.filter(F.col("o_orderkey") % 14 == 0), 1.1, 2, "U")
        b3 = batch(
            target.filter(F.col("o_orderkey") % 21 == 0), 1.0, 3, "D"
        ).unionByName(
            batch(
                orders.filter(F.col("o_orderdate") >= "1999-01-01").select(
                    *cols
                ),
                1.0,
                1,
                "I",
            )
        )

        root = tempfile.mkdtemp(prefix="cdc_stream_")
        state = os.path.join(root, "state")
        feed_dir = os.path.join(root, "feed")
        init_cdc_state(target, state)
        for i, b in enumerate((b1, b2, b3)):
            b.coalesce(1).write.parquet(os.path.join(feed_dir, f"b{i}"))

        feed_schema = spark.read.parquet(f"{feed_dir}/*").schema
        feed = (
            spark.readStream.schema(feed_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{feed_dir}/*")
        )
        cdc_apply_stream_seq(
            spark,
            feed,
            state,
            ["o_orderkey"],
            "seq",
            os.path.join(root, "ckpt"),
        )
        out = state
        _CDC_STATE_CACHE[sf_dir] = out
    return read_cdc_state(spark, out)


#: Per-process cache: (sf_dir) -> decisions dir for the streaming
#: near-dup probe (stream drained once per process).
_NDUP_STREAM_CACHE: dict[str, str] = {}


def build_near_dup_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic vector stream for the online near-dup face, in
    ascending vec_id (= arrival) order:

    * 300–499: novel vectors (the rest of the embeddings table) —
      near-orthogonal to everything, all should be accepted;
    * 100000–100059: jittered copies of ALREADY-INDEXED vectors 0–59
      (cos ≈ 0.94 to their source) — rejected against the index;
    * 200300–200359: jittered copies of STREAM vectors 300–359 —
      rejected against earlier-accepted stream members, exercising the
      cross-micro-batch index append.
    """
    from mobility_etl_spark.queries.similarity import _JITTER

    emb = load_table(spark, sf_dir, "embeddings")
    novel = emb.filter(F.col("vec_id") >= 300).select("vec_id", "embedding")
    dup_index = emb.filter(F.col("vec_id") < 60).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(_JITTER).alias("embedding"),
    )
    dup_stream = (
        emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 360))
        .select(
            (F.col("vec_id") + 200000).alias("vec_id"),
            F.expr(_JITTER).alias("embedding"),
        )
    )
    return novel.unionByName(dup_index).unionByName(dup_stream)


def run_near_dup_stream(
    spark: SparkSession,
    sf_dir: str,
    chunks: list[tuple[int, int]],
    root: str | None = None,
    index_snapshots: bool = False,
    compact_every: int = 0,
) -> DataFrame:
    """Drive build_near_dup_feed through near_dup_stream_ingest with
    the given (lo, hi) vec_id chunking (one file = one micro-batch,
    written in stream order), returning the decisions table. With
    ``index_snapshots`` the index lives in a manifest-committed
    snapshot table that the stream compacts+vacuums whenever the tip
    exceeds ``compact_every`` files (pass ``root`` to inspect it).
    Returns the decisions DIRECTORY (not a DataFrame): callers cache
    the path and re-read with their own session — a cached DataFrame
    is bound to the session that built it and throws after a session
    swap (r12 review)."""
    import os

    from mobility_etl_spark.streaming.jobs import (
        init_near_dup_index,
        near_dup_stream_ingest,
    )

    root = root or tempfile.mkdtemp(prefix="ndup_stream_")
    index = os.path.join(root, "index")
    decisions = os.path.join(root, "decisions")
    feed_dir = os.path.join(root, "feed")

    emb = load_table(spark, sf_dir, "embeddings")
    init_near_dup_index(
        emb.filter(F.col("vec_id") < 300), index, snapshot=index_snapshots
    )

    feed_df = build_near_dup_feed(spark, sf_dir)
    for i, (lo, hi) in enumerate(chunks):
        feed_df.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(os.path.join(feed_dir, f"c{i:02d}"))

    schema = spark.read.parquet(f"{feed_dir}/*").schema
    feed = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed_dir}/*")
    )
    near_dup_stream_ingest(
        spark,
        feed,
        index,
        decisions,
        os.path.join(root, "ckpt"),
        index_snapshots=index_snapshots,
        compact_every=compact_every,
    )
    return decisions


def _ndup_stream_oracle() -> str:
    """DuckDB replay of the ONLINE greedy near-dup admission — the
    exact decisions table the streaming faces publish.

    Non-recursive part: rebuild the init index (embeddings vec_id <
    300) plus the deterministic feed (novel >= 300, two planted
    jittered-dup cohorts at +100000/+200000 — build_near_dup_feed)
    with the SAME portable md5 jitter/planes and 1e-6 fixed-point
    folds as the batch LSH oracles (queries/similarity.py
    _LSH_ORACLE_CTES), score every (feed, lower-id) bucket collision
    >= 0.9 — a SUPERSET of what the stream ever probes, since the
    stream only scores against init + previously-ACCEPTED rows.

    Recursive part: the greedy walk itself IS SQL-expressible because
    decisions are invariant to micro-batch boundaries (gated in
    tests/test_streaming.py), i.e. equal to the one-item-per-batch
    sequential walk in vec_id order. Only ids that appear in a
    qualifying pair need stepping (everything else is accepted by
    default), so the recursion is ~|planted dups| steps carrying the
    decision list as a STRUCT[] working row; a pair blocks its
    inc side iff its corp side is init or accepted-so-far, and
    attribution is argmax by (sim, then lowest id) over QUALIFYING
    pairs only — exactly near_dup_apply_batch's pooled walk."""
    from mobility_etl_spark.queries.similarity import (
        _LSH_BITS,
        _LSH_PLANES,
        _P60,
    )

    jitter = (
        "CAST(CAST(x * (1.0 + ((("
        + _P60.format(
            key="CAST(vec_id AS VARCHAR) || ',' || CAST(i - 1 AS VARCHAR)"
        )
        + " % 1001) / 500.0) - 1.0) * 0.6) AS REAL) AS DOUBLE)"
    )
    return f"""
    WITH RECURSIVE elems AS (
        SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings,
             UNNEST(generate_series(1, len(embedding))) AS g(i)
    ),
    allv AS (
        SELECT vec_id, i, x FROM elems
        UNION ALL
        SELECT vec_id + 100000, i, {jitter} FROM elems WHERE vec_id < 60
        UNION ALL
        SELECT vec_id + 200000, i, {jitter}
        FROM elems WHERE vec_id >= 300 AND vec_id < 360
    ),
    feed_ids AS MATERIALIZED (SELECT DISTINCT vec_id FROM allv WHERE vec_id >= 300),
    init_ids AS MATERIALIZED (SELECT DISTINCT vec_id FROM elems WHERE vec_id < 300),
    planes AS (
        SELECT pp.p, ii.i,
               (({_P60.format(key="CAST(pp.p AS VARCHAR) || ',' || CAST(ii.i AS VARCHAR)")}
                 % 10001) / 5000.0) - 1.0 AS h
        FROM UNNEST(generate_series(0, {_LSH_PLANES - 1})) AS pp(p),
             (SELECT DISTINCT i - 1 AS i FROM elems) AS ii
    ),
    dots AS (
        SELECT c.vec_id, pl.p,
               SUM(CAST(FLOOR(c.x * pl.h * 1000000.0) AS BIGINT)) AS q
        FROM allv c JOIN planes pl ON pl.i = c.i - 1
        GROUP BY c.vec_id, pl.p
    ),
    buckets AS (
        SELECT vec_id, CAST(p // {_LSH_BITS} AS INT) AS band,
               SUM(CASE WHEN q >= 0
                   THEN 1::BIGINT
                        << CAST({_LSH_BITS - 1} - (p % {_LSH_BITS}) AS INT)
                   ELSE 0 END) AS bucket
        FROM dots GROUP BY vec_id, p // {_LSH_BITS}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS inc_id, b.vec_id AS corp_id
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bucket = b.bucket
         AND b.vec_id < a.vec_id
        WHERE a.vec_id >= 300
    ),
    norms AS (
        SELECT vec_id,
               CAST(SUM(CAST(FLOOR(x * x * 1000000.0) AS BIGINT))
                    AS DOUBLE) / 1000000.0 AS q2
        FROM allv GROUP BY vec_id
    ),
    scored AS (
        SELECT c.inc_id, c.corp_id,
               CAST(FLOOR(
                   ((CAST(SUM(CAST(FLOOR(ea.x * eb.x * 1000000.0)
                                   AS BIGINT)) AS DOUBLE) / 1000000.0)
                    / SQRT(na.q2 * nb.q2)) * 1000000.0
               ) AS BIGINT) AS sim_fx
        FROM cand c
        JOIN allv ea ON ea.vec_id = c.inc_id
        JOIN allv eb ON eb.vec_id = c.corp_id AND eb.i = ea.i
        JOIN norms na ON na.vec_id = c.inc_id
        JOIN norms nb ON nb.vec_id = c.corp_id
        GROUP BY c.inc_id, c.corp_id, na.q2, nb.q2
    ),
    pairs_fx AS MATERIALIZED (
        SELECT inc_id, corp_id, sim_fx FROM scored WHERE sim_fx >= 900000
    ),
    pinc AS MATERIALIZED (SELECT DISTINCT inc_id FROM pairs_fx),
    ordered AS MATERIALIZED (
        SELECT inc_id, ROW_NUMBER() OVER (ORDER BY inc_id) AS rn FROM pinc
    ),
    default_acc AS MATERIALIZED (
        SELECT vec_id FROM feed_ids
        WHERE vec_id NOT IN (SELECT inc_id FROM pinc)
    ),
    walk(step, dec) AS (
        SELECT 0, CAST([] AS STRUCT(vec_id BIGINT, accepted INT,
                                    match_id BIGINT, sim_fx BIGINT)[])
        UNION ALL
        SELECT w.step + 1,
            list_append(w.dec, (
                SELECT CASE WHEN COUNT(*) = 0
                    THEN {{'vec_id': o.inc_id, 'accepted': 1,
                          'match_id': CAST(NULL AS BIGINT),
                          'sim_fx': CAST(NULL AS BIGINT)}}
                    ELSE {{'vec_id': o.inc_id, 'accepted': 0,
                          'match_id': CAST(arg_max(p.corp_id,
                              p.sim_fx * 1000000000
                              + (1000000000 - p.corp_id)) AS BIGINT),
                          'sim_fx': CAST(MAX(p.sim_fx) AS BIGINT)}}
                END
                FROM pairs_fx p
                WHERE p.inc_id = o.inc_id
                  AND (p.corp_id IN (SELECT vec_id FROM init_ids)
                       OR p.corp_id IN (SELECT vec_id FROM default_acc)
                       OR list_contains(
                            list_transform(
                                list_filter(w.dec, d -> d.accepted = 1),
                                d -> d.vec_id),
                            p.corp_id))
            ))
        FROM walk w JOIN ordered o ON o.rn = w.step + 1
    ),
    walked AS (
        SELECT UNNEST(dec) AS d
        FROM walk WHERE step = (SELECT COUNT(*) FROM pinc)
    )
    SELECT vec_id, accepted, match_id, sim_fx FROM (
        SELECT d.vec_id AS vec_id, d.accepted AS accepted,
               d.match_id AS match_id, d.sim_fx AS sim_fx
        FROM walked
        UNION ALL
        SELECT vec_id, CAST(1 AS INT), CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT)
        FROM default_acc
    ) ORDER BY vec_id
    """


@register(
    "streaming_near_dup_probe",
    oracle=_ndup_stream_oracle(),
    tags=("N2", "N6", "E30", "E37"),
)
def streaming_near_dup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online near-duplicate admission driven through the REAL
    streaming engine (streaming/jobs.py:near_dup_stream_ingest): a
    4-micro-batch vector feed probes the LSH-indexed corpus inside
    foreachBatch; accepted vectors append to the index snapshot and
    gate later arrivals. EXACT-oracle checked since r11: order-defined
    greedy admission IS SQL-expressible — boundary invariance (gated
    in tests/test_streaming.py: 1-file vs 4-file vs 8-file runs
    identical) reduces it to the sequential id-order walk, which
    _ndup_stream_oracle replays as a recursive CTE over the portable
    LSH pair graph; the driver hash equality is therefore a proof
    that the STREAM made exactly the decisions the greedy spec
    defines. Batch-side sequential-replay parity stays gated in
    tests/test_streaming.py."""
    dec_dir = _NDUP_STREAM_CACHE.get(sf_dir)
    if dec_dir is None:
        dec_dir = run_near_dup_stream(
            spark,
            sf_dir,
            [(300, 400), (400, 100000), (100000, 200000), (200000, 300000)],
        )
        _NDUP_STREAM_CACHE[sf_dir] = dec_dir
    return spark.read.parquet(dec_dir).orderBy("vec_id")


#: Per-process cache: sf_dir -> (decisions dir, run root) for the
#: snapshot-indexed streaming near-dup face — PATHS, not DataFrames:
#: a cached DataFrame is bound to the building session (r12 review).
_NDUP_SNAP_CACHE: dict[str, tuple[str, str]] = {}


@register(
    "streaming_near_dup_compacted",
    # the SAME oracle as streaming_near_dup_probe: the two faces
    # differing only in index storage backend is itself the claim —
    # hash-proven at every sweep (the near_dup_lsh_idonly move)
    oracle=_ndup_stream_oracle(),
    tags=("N2", "N6", "N13", "E30", "E37"),
)
def streaming_near_dup_compacted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The online near-dup admission loop with its index on the
    SNAPSHOT layer and self-compacting (streaming/jobs.py:
    near_dup_stream_ingest ``index_snapshots`` + ``compact_every``):
    instead of appending one parquet per chunk per batch forever, each
    batch that leaves the index tip over the file budget compacts it
    to one right-sized file and vacuums unreferenced data — the
    Iceberg-style maintenance loop a continuously-ingesting 100 TB
    corpus needs, running INSIDE the stream without ever breaking a
    committed reader. Rows-only driver check; tests/test_streaming.py
    gates that (a) decisions are byte-identical to the raw-directory
    run (storage backend cannot change semantics), (b) compaction
    actually fired and bounded the tip's file count, (c) the final
    index equals init + accepted exactly, and (d) vacuum left no
    unreferenced file on disk."""
    cached = _NDUP_SNAP_CACHE.get(sf_dir)
    if cached is None:
        root = tempfile.mkdtemp(prefix="ndup_snap_")
        dec_dir = run_near_dup_stream(
            spark,
            sf_dir,
            [(300, 400), (400, 100000), (100000, 200000), (200000, 300000)],
            root=root,
            index_snapshots=True,
            compact_every=2,  # r10: chunk appends are single-file now
        )
        _NDUP_SNAP_CACHE[sf_dir] = (dec_dir, root)
        cached = (dec_dir, root)
    return spark.read.parquet(cached[0]).orderBy("vec_id")


#: Per-process cache: sf_dir -> catalog root for the streaming
#: corpus+index maintenance face.
_IDX_STREAM_CACHE: dict[str, str] = {}

#: Shared churn rule with text_index_incremental: v2 membership is
#: doc_id % 11 != 0; docs with doc_id % 3 == 0 carry an appended
#: sentinel token. The streaming feed below lands the SAME final
#: state through three micro-batches (deletes, updates, inserts).
_IDX_ORACLE = """
    WITH v2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN text || ' zzupdated' ELSE text END AS text
        FROM documents WHERE doc_id % 11 != 0
    ),
    tok AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM v2
    ),
    postings AS (
        SELECT token, doc_id, COUNT(*) AS tf
        FROM tok WHERE LENGTH(token) > 0
        GROUP BY token, doc_id
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tf) AS BIGINT) AS sum_tf
    FROM postings
    GROUP BY token
    HAVING COUNT(*) >= 20
"""


def run_index_maintenance_stream(spark: SparkSession, sf_dir: str) -> str:
    """Build the v1 (corpus, index) catalog, write the 3-batch change
    feed (deletes, updates, inserts), drain it through
    corpus_index_stream_maintain, and return the catalog root."""
    import os

    from mobility_etl_spark.operators.snapshots import (
        commit_catalog,
        commit_snapshot,
    )
    from mobility_etl_spark.streaming.jobs import (
        corpus_index_stream_maintain,
        index_postings,
    )

    root = tempfile.mkdtemp(prefix="idx_stream_")
    corpus_p = os.path.join(root, "corpus")
    index_p = os.path.join(root, "index")
    feed_dir = os.path.join(root, "feed")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    v1 = docs.filter(F.col("doc_id") % 13 != 0)
    v1.write.parquet(corpus_p)
    cv = commit_snapshot(spark, corpus_p, note="v1")
    index_postings(v1).write.parquet(index_p)
    iv = commit_snapshot(spark, index_p, note="v1")
    commit_catalog(
        root, {"corpus": (corpus_p, cv), "index": (index_p, iv)}, note="v1"
    )

    v2_text = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.col("text"), F.lit(" zzupdated")),
    ).otherwise(F.col("text"))
    deletes = docs.filter(
        (F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 13 != 0)
    ).select("doc_id", F.lit(None).cast("string").alias("text"),
             F.lit("D").alias("op"))
    updates = docs.filter(
        (F.col("doc_id") % 3 == 0)
        & (F.col("doc_id") % 11 != 0)
        & (F.col("doc_id") % 13 != 0)
    ).select("doc_id", v2_text.alias("text"), F.lit("U").alias("op"))
    inserts = docs.filter(
        (F.col("doc_id") % 13 == 0) & (F.col("doc_id") % 11 != 0)
    ).select("doc_id", v2_text.alias("text"), F.lit("I").alias("op"))
    for i, b in enumerate((deletes, updates, inserts)):
        b.coalesce(1).write.parquet(os.path.join(feed_dir, f"b{i}"))

    schema = spark.read.parquet(f"{feed_dir}/*").schema
    feed = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{feed_dir}/*")
    )
    corpus_index_stream_maintain(
        spark, feed, root, corpus_p, index_p, os.path.join(root, "ckpt")
    )
    return root


@register(
    "streaming_index_maintenance",
    oracle=_IDX_ORACLE,
    tags=("N13", "N16", "E37", "R7"),
)
def streaming_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MULTI-TABLE transactional maintenance
    (streaming/jobs.py:corpus_index_stream_maintain): a 3-micro-batch
    change feed (deletes, updates, inserts) updates the corpus AND its
    inverted index inside foreachBatch, each batch visible only
    through ONE atomic catalog commit binding both tables — the
    composition of text_index_incremental's delta rule (only changed
    docs re-tokenize), the snapshot layer's REPLACE manifests, and the
    catalog's cross-table atomicity. The DuckDB oracle builds the
    final index FROM SCRATCH from the batch-equivalent v2 corpus, so
    the hash equality proves three stacked claims at once: the delta
    maintenance, the snapshot file accounting, and the catalog
    resolution. Per-version corpus≡index consistency (no torn pair at
    ANY catalog version) is gated in tests/test_streaming.py."""
    from mobility_etl_spark.operators.snapshots import read_catalog_table

    root = _IDX_STREAM_CACHE.get(sf_dir)
    if root is None:
        root = run_index_maintenance_stream(spark, sf_dir)
        _IDX_STREAM_CACHE[sf_dir] = root
    index = read_catalog_table(spark, root, "index")
    return (
        index.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tf").cast("long").alias("sum_tf"),
        )
        .filter(F.col("n_docs") >= 20)
    )


#: Per-process cache: sf_dir -> fixture table root.
_SNAP_SRC_CACHE: dict[str, str] = {}


@register(
    "streaming_snapshot_source",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id >= 200 AND doc_id < 500
    GROUP BY lang
    """,
    tags=("N13", "E30", "R1"),
)
def streaming_snapshot_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot table AS A STREAMING SOURCE (Spark 4 Python
    DataSourceStreamReader, sources/pydatasource.py:
    SnapshotChangeFeedDataSource): offsets are snapshot VERSIONS, each
    micro-batch is the committed change feed between two manifests,
    each input partition one added data file (executor-parallel,
    exactly-once — committed file lists are immutable). A documents
    table is committed as v1 (<200) then appended twice (200-350,
    350-500); the stream starts AT v1 (``start_version``), so it must
    deliver exactly the post-v1 appends — the oracle states them from
    the id ranges. This closes the loop the change-feed faces opened:
    producers commit snapshot versions, and a downstream Structured
    Streaming job consumes them as a first-class source instead of a
    polling cursor."""
    import os
    import tempfile

    from mobility_etl_spark.operators.snapshots import (
        append_snapshot,
        commit_snapshot,
    )
    from mobility_etl_spark.sources.pydatasource import (
        SnapshotChangeFeedDataSource,
    )

    root = _SNAP_SRC_CACHE.get(sf_dir)
    if root is None:
        root = tempfile.mkdtemp(prefix="snap_src_")
        tbl = os.path.join(root, "tbl")
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        docs.filter(F.col("doc_id") < 200).write.parquet(tbl)
        commit_snapshot(spark, tbl, note="v1")
        append_snapshot(
            spark,
            tbl,
            docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)),
            note="v2",
        )
        append_snapshot(
            spark,
            tbl,
            docs.filter((F.col("doc_id") >= 350) & (F.col("doc_id") < 500)),
            note="v3",
        )
        spark.dataSource.register(SnapshotChangeFeedDataSource)
        out = os.path.join(root, "out")
        stream = (
            spark.readStream.format("snapshot_changes")
            .option("path", tbl)
            .option("start_version", "1")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _SNAP_SRC_CACHE[sf_dir] = root

    return (
        spark.read.parquet(os.path.join(root, "out"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


@register(
    "streaming_snapshot_source_agg",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id < 500
    GROUP BY lang
    """,
    tags=("N13", "E30", "E31"),
)
def streaming_snapshot_source_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The snapshot-table source feeding Spark's NATIVE stateful
    streaming aggregation: the same committed-version feed as
    streaming_snapshot_source, but from version 0 and with the
    maintenance done by the ENGINE — readStream → groupBy(lang) →
    complete-mode memory sink — instead of a hand-rolled fold. Each
    committed snapshot version arrives as one micro-batch of added
    files; the streaming agg's state IS the incrementally-maintained
    rollup, and the drained result must equal the from-scratch batch
    aggregate over everything committed (the oracle). Custom source +
    built-in stateful operator composing cleanly is the point: the
    snapshot log behaves like any other Spark stream."""
    import uuid as _uuid

    from mobility_etl_spark.sources.pydatasource import (
        SnapshotChangeFeedDataSource,
    )

    # ensure the committed fixture table exists (shared with the
    # sibling face's per-process cache)
    streaming_snapshot_source(spark, sf_dir)
    import os

    tbl = os.path.join(_SNAP_SRC_CACHE[sf_dir], "tbl")
    spark.dataSource.register(SnapshotChangeFeedDataSource)
    name = f"snap_src_agg_{_uuid.uuid4().hex[:10]}"
    q = (
        spark.readStream.format("snapshot_changes")
        .option("path", tbl)
        .load()
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table(name)
    out = spark.createDataFrame(drained.collect(), drained.schema)
    spark.catalog.dropTempView(name)  # memory sinks outlive the face
    return out


_SNAP_SRC_COMPACT_CACHE: dict[str, str] = {}


@register(
    "streaming_change_feed_compaction",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id >= 200 AND doc_id < 500
    GROUP BY lang
    """,
    tags=("N11", "N13", "E30"),
)
def streaming_change_feed_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The snapshot-table stream source RIDING THROUGH A COMPACTION
    (r11): same producer chain as ``streaming_snapshot_source`` but
    with a full tip rewrite between the two appends. The source's
    partitions come from operators/snapshots.py:changed_files — the
    op-typed lineage walk — so the replace commit contributes ZERO
    partitions (content-preserving) and the post-compaction append
    still arrives; the oracle states exactly the appended rows, so the
    hash equality proves nothing was lost, duplicated, or resurrected
    from the rewritten files. Before r11 this range raised
    "rewrite crossed"; a 100 TB deployment no longer has to schedule
    change-feed consumers between compactions."""
    import os
    import tempfile

    from mobility_etl_spark.operators.snapshots import (
        append_snapshot,
        commit_snapshot,
        compact_snapshot,
    )
    from mobility_etl_spark.sources.pydatasource import (
        SnapshotChangeFeedDataSource,
    )

    root = _SNAP_SRC_COMPACT_CACHE.get(sf_dir)
    if root is None:
        root = tempfile.mkdtemp(prefix="snap_src_cmp_")
        tbl = os.path.join(root, "tbl")
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        docs.filter(F.col("doc_id") < 200).write.parquet(tbl)
        commit_snapshot(spark, tbl, note="v1")
        append_snapshot(
            spark,
            tbl,
            docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)),
            note="v2",
        )
        # the rewrite the pre-r11 source refused to cross
        compact_snapshot(spark, tbl, target_file_bytes=1 << 30)
        append_snapshot(
            spark,
            tbl,
            docs.filter((F.col("doc_id") >= 350) & (F.col("doc_id") < 500)),
            note="v4",
        )
        spark.dataSource.register(SnapshotChangeFeedDataSource)
        out = os.path.join(root, "out")
        stream = (
            spark.readStream.format("snapshot_changes")
            .option("path", tbl)
            .option("start_version", "1")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _SNAP_SRC_COMPACT_CACHE[sf_dir] = root

    return (
        spark.read.parquet(os.path.join(root, "out"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )
