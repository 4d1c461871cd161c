"""Source/sink operators as oracle-checked queries (SURVEY.md §2.B
E1/E2/E4/E5, §2.A R4/R6/R10-R12/R16).

These queries exercise REAL I/O paths — CSV round-trips, Hive-style
partitioned writes with partition pruning on read-back, zip expansion
from genuine archive bytes, manifest anti-join incrementalization —
inside a leaked process-temp directory (tiny at test SF; the lake root
in production). The oracle computes the same answer straight from the
parquet tables, so any fidelity loss in the engine's storage round-trip
(type drift, float formatting, partition typing) becomes a hash
mismatch.
"""

from __future__ import annotations

import io
import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import dsum
from mobility_etl_spark.io import load_table
from mobility_etl_spark.registry import register
from mobility_etl_spark.operators.quality import check_constraints
from mobility_etl_spark.operators.rollup import (
    finalize_rollup,
    merge_rollups,
    partial_rollup,
)
from mobility_etl_spark.operators.scd import scd2_from_observations
from mobility_etl_spark.sources.manifest import changed_objects, with_content_hash
from mobility_etl_spark.sources.readers import (
    expand_zip_members,
    read_binary_files,
    read_csv_table,
)


def _tmpdir() -> str:
    return tempfile.mkdtemp(prefix="mes_io_")


@register(
    "csv_roundtrip_lineitem",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_orderkey < 1000
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("E1", "E2", "E5", "R10", "R16"),
)
def csv_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → CSV (header) → explicit-schema CSV scan → aggregate:
    the reference's format-conversion copy (R10/R16,
    dags/warsaw-gtfs.py:89-90, dags/warsaw-delays.py:196) with fidelity
    proven by hash-matching an aggregate computed off the original
    parquet. Doubles survive because Spark writes shortest-roundtrip
    decimal strings; the aggregate uses the exact-decimal pattern."""
    out = _tmpdir()
    cols = [
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_returnflag",
        "l_linestatus",
    ]
    src = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    src.select(*cols).write.option("header", True).mode("overwrite").csv(out)
    schema = src.select(*cols).schema
    back = read_csv_table(spark, out, schema)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
    )


@register(
    "partitioned_write_prune",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS dt,
           EXTRACT(hour FROM ts) AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE EXTRACT(hour FROM ts) BETWEEN 6 AND 12
    GROUP BY 1, 2
    """,
    tags=("E5", "R11", "R12"),
)
def partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-layout write + pruned read-back: events written
    ``partitionBy(dt, hour)`` (the reference's %Y/%m/%d/…-%H blob
    scheme, SURVEY.md §1.2), then read with a partition-column filter —
    at 100 TB the filter prunes directories before any file I/O
    (PartitionFilters in the scan, not a post-scan filter)."""
    out = _tmpdir()
    ev = load_table(spark, sf_dir, "events")
    (
        ev.withColumn("dt", F.to_date("ts"))
        .withColumn("hour", F.hour("ts"))
        .write.partitionBy("dt", "hour")
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("hour").between(6, 12))
    return back.groupBy(
        F.date_format(F.col("dt").cast("date"), "yyyy-MM-dd").alias("dt"),
        F.col("hour").cast("long").alias("hour"),
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value", "sum_value"),
    )


@register(
    "zip_member_expand",
    oracle="""
    SELECT lang || '.txt' AS member_name,
           CAST(SUM(strlen(text)) + COUNT(*) - 1 AS BIGINT) AS member_bytes,
           COUNT(*) AS n_docs
    FROM documents
    WHERE doc_id < 100
    GROUP BY lang
    """,
    tags=("E4", "R1", "R4"),
)
def zip_member_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real archive expansion: documents are packed into a genuine zip
    (one member per language, texts joined by newline in doc_id order),
    landed as a file, scanned with `binaryFile`, and expanded
    executor-side by the mapInPandas operator (R4 at scale). Member
    byte sizes must equal the oracle's UTF-8 arithmetic over the
    original rows — proving the bytes that went through the archive
    path are the bytes the table holds."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "lang", "text")
        .collect()  # bounded: builds the *fixture archive*, not the data path
    )
    by_lang: dict[str, list] = {}
    for r in sorted(docs, key=lambda r: r.doc_id):
        by_lang.setdefault(r.lang, []).append(r.text)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for lang, texts in by_lang.items():
            zf.writestr(f"{lang}.txt", "\n".join(texts))
    out = _tmpdir()
    zpath = os.path.join(out, "docs.zip")
    with open(zpath, "wb") as f:
        f.write(buf.getvalue())

    members = expand_zip_members(read_binary_files(spark, zpath))
    n_docs = F.size(F.split(F.col("content").cast("string"), "\n", -1))
    return members.select(
        "member_name",
        F.col("member_bytes").cast("long").alias("member_bytes"),
        n_docs.cast("long").alias("n_docs"),
    )


@register(
    "manifest_incremental",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_new
    FROM events
    WHERE event_id % 3 <> 0
    GROUP BY event_type
    """,
    tags=("R5", "R6", "R7"),
)
def manifest_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run memoization as an anti-join (the feed-hash
    short-circuit R6): a manifest of previously-ingested content
    digests (every third event, simulating the prior run) anti-joined
    against the incoming batch leaves exactly the new rows. The oracle
    states the same set directly — the engine must reach it through
    sha-256 digests and the broadcast anti-join, shuffling 32-byte
    hashes rather than payloads."""
    ev = with_content_hash(
        load_table(spark, sf_dir, "events"), ("event_id", "event_type", "props")
    )
    manifest = ev.filter(F.col("event_id") % 3 == 0).select(
        F.lit("events").alias("source"),
        F.col("event_id").cast("string").alias("object_key"),
        "content_sha256",
        F.col("ts").alias("ingest_ts"),
    )
    fresh = changed_objects(ev, manifest)
    return fresh.groupBy("event_type").agg(F.count("*").alias("n_new"))


@register(
    "json_scan_roundtrip",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value,
           COUNT(json_extract(props, '$.source')) AS n_with_source
    FROM events
    GROUP BY event_type
    """,
    tags=("E3", "E28", "R2"),
)
def json_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → JSON-lines → explicit-schema `spark.read.json` →
    aggregate (the IMGW-payload shape, reference dags/warsaw-weather.py:32-34):
    numeric fidelity through JSON text plus nested-field extraction
    from the embedded `props` JSON string, hash-checked against the
    original table."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out = _tmpdir()
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "props"
    )
    ev.write.mode("overwrite").json(out)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    back = spark.read.schema(schema).json(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        dsum("value", "sum_value"),
        F.count(F.get_json_object("props", "$.source")).alias("n_with_source"),
    )


@register(
    "orc_roundtrip_orders",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
               AS sum_price,
           MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_date
    FROM orders
    WHERE o_orderkey < 2000
    GROUP BY o_orderpriority
    """,
    tags=("E2", "E5", "R10"),
)
def orc_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → ORC → ORC scan → aggregate: the second columnar format
    the engine supports natively (both ride the same vectorized reader
    + predicate-pushdown machinery; the o_orderkey filter is pushed
    into the ORC scan). Fidelity proven by hash-matching the aggregate
    computed off the original parquet — doubles and timestamps survive
    the format round-trip bit-exactly."""
    out = _tmpdir()
    src = load_table(spark, sf_dir, "orders")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out).filter(F.col("o_orderkey") < 2000)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum("o_totalprice", "sum_price"),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_date"),
    )


@register(
    "scd2_user_state_history",
    oracle="""
    WITH changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER w AS prev_state
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        WHERE prev_state IS NULL OR event_type <> prev_state
    )
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           LEAD(ts) OVER w2 AS valid_to,
           (LEAD(ts) OVER w2 IS NULL) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("E17", "E18", "R7"),
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build (operators/scd.py): per-user state
    history with valid_from/valid_to intervals collapsed from the raw
    observation stream — the warehouse-native form of the reference's
    overwrite-latest state blob (R7, dags/warsaw-gtfs.py:73-80).
    Ordering is made total with the event_id tiebreak so interval
    bounds are engine-exact."""
    events = load_table(spark, sf_dir, "events")
    return scd2_from_observations(
        events.select("user_id", "event_type", "ts", "event_id"),
        key_col="user_id",
        ts_col="ts",
        state_col="event_type",
        tiebreak_col="event_id",
    )


@register(
    "pyds_weather_source",
    oracle="""
    SELECT CAST(i AS INTEGER) AS station_id,
           'ST_' || lpad(CAST(i AS VARCHAR), 3, '0') AS station,
           CAST(h // 24 + 1 AS INTEGER) AS obs_day,
           CAST(h % 24 AS INTEGER) AS obs_hour,
           ((i * 7 + h * 3) % 350) / 10.0 - 5.0 AS temp_c,
           CAST((i * 13 + h * 5) % 90 AS DOUBLE) AS wind_kmh,
           CAST((i * 11 + h * 7) % 101 AS DOUBLE) AS humidity_pct
    FROM generate_series(0, 39) s(i)
    CROSS JOIN generate_series(0, 23) t(h)
    """,
    tags=("R1", "R2", "E1"),
)
def pyds_weather_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IMGW feed as a REGISTERED PYTHON DATA SOURCE
    (sources/pydatasource.py): explicit schema, partition-split fetch
    units, typed rows — scanned with ordinary ``spark.read.format``.
    The deterministic stub is reproduced exactly by the oracle's
    generate_series arithmetic."""
    from mobility_etl_spark.sources.pydatasource import FakeWeatherDataSource

    spark.dataSource.register(FakeWeatherDataSource)
    return (
        spark.read.format("imgw_synop_fake")
        .option("n_stations", 40)
        .option("hours", 24)
        .load()
    )


@register(
    "dq_violations_orders",
    oracle="""
    SELECT o_orderkey, 'price_cap' AS constraint
    FROM orders WHERE NOT (o_totalprice <= 400000.0)
    UNION ALL
    SELECT o_orderkey, 'date_window'
    FROM orders WHERE NOT (o_orderdate < TIMESTAMP '2001-01-01')
    UNION ALL
    SELECT o_orderkey, 'fk_customer'
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
    tags=("E7", "E8", "R8"),
)
def dq_violations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level data-quality validation (operators/quality.py): three
    declared constraints — a numeric cap, a date window, and an
    FK-existence check phrased as a broadcast left-join flag — checked
    in ONE projection pass; violations come back long-form
    (order key, constraint). The bronze→silver gate the reference's
    'blob landed' pipelines never had."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    flagged = orders.join(
        F.broadcast(
            customer.select(F.col("c_custkey")).withColumn("__cust_ok", F.lit(True))
        ),
        orders["o_custkey"] == F.col("c_custkey"),
        "left",
    )
    _, violations = check_constraints(
        flagged,
        {
            "price_cap": F.col("o_totalprice") <= 400000.0,
            "date_window": F.col("o_orderdate") < "2001-01-01",
            "fk_customer": F.col("__cust_ok").isNotNull(),
        },
        key_cols=["o_orderkey"],
    )
    return violations


@register(
    "incremental_rollup_events",
    oracle="""
    SELECT event_type,
           strftime(ts, '%Y-%m-%d') AS dt,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*)
               AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("E13", "R6", "R7"),
)
def incremental_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance (operators/rollup.py): the first
    20 days are the stored base rollup, later days arrive as a delta;
    the result is merge(base_partials, delta_partials) — which the
    oracle proves EQUALS the full recompute, bit-for-bit, because the
    partials are counts + exact decimal sums (mergeable in any order).
    At 100 TB this replaces a full-history re-scan with |rollup|+|delta|."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    keys = ["event_type", "dt"]
    base = partial_rollup(events.filter(F.col("dt") <= "2024-01-20"), keys, "value")
    delta = partial_rollup(events.filter(F.col("dt") > "2024-01-20"), keys, "value")
    return finalize_rollup(merge_rollups(base, delta, keys))


@register(
    "cdc_merge_orders",
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
    tags=("R7", "E10", "E17"),
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-upsert (operators/merge.py): a replayed, out-of-order CDC
    feed — two update batches (the later overrides), deletes, and
    late-window inserts — applied to the pre-1999 orders snapshot.
    Last-writer-wins is decided by the feed's sequence number, not
    arrival order, and the oracle replays the same feed in pure SQL."""
    from mobility_etl_spark.operators.merge import apply_cdc

    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    target = orders.filter(F.col("o_orderdate") < "1999-01-01").select(*cols)

    def batch(df, price_mult, seq, op):
        return df.select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") * price_mult).alias("o_totalprice")
            if price_mult != 1.0
            else F.col("o_totalprice"),
            "o_orderstatus",
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
        )

    changes = (
        batch(target.filter(F.col("o_orderkey") % 7 == 0), 1.05, 1, "U")
        .unionByName(batch(target.filter(F.col("o_orderkey") % 14 == 0), 1.1, 2, "U"))
        .unionByName(batch(target.filter(F.col("o_orderkey") % 21 == 0), 1.0, 3, "D"))
        .unionByName(
            batch(
                orders.filter(F.col("o_orderdate") >= "1999-01-01").select(*cols),
                1.0,
                1,
                "I",
            )
        )
    )
    return apply_cdc(target, changes, keys=["o_orderkey"], seq_col="seq")


@register("zorder_layout_metrics", oracle=None, tags=("E5", "E20"))
def zorder_layout_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional clustering as a measurable layout property:
    write events z-ordered on (user_id, value), then report the mean
    per-file min/max span of each dimension as a fraction of its global
    span — the statistic parquet row-group pruning consumes. Rows-only
    driver check (file boundaries are range-sampling dependent);
    tests/test_scale.py gates the spans against a linear sort."""
    import pathlib
    import tempfile

    import pyarrow.parquet as pq

    from mobility_etl_spark.operators.scale import zorder_write

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    out = tempfile.mkdtemp(prefix="mes_zorder_")
    zorder_write(ev, out, ("user_id", "value"), n_files=16)

    def spans(col: str) -> float:
        per_file, lo, hi = [], [], []
        for f in pathlib.Path(out).rglob("*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            stats = [
                md.row_group(g).column(idx).statistics
                for g in range(md.num_row_groups)
            ]
            fmin, fmax = min(s.min for s in stats), max(s.max for s in stats)
            per_file.append(fmax - fmin)
            lo.append(fmin)
            hi.append(fmax)
        return (sum(per_file) / len(per_file)) / (max(hi) - min(lo))

    return spark.createDataFrame(
        [(len(list(pathlib.Path(out).rglob("*.parquet"))),
          float(spans("user_id")), float(spans("value")))],
        "n_files int, user_id_span double, value_span double",
    )


@register(
    "xml_roundtrip_nation",
    oracle="""
    SELECT n.n_regionkey,
           COUNT(*) AS n_nations,
           MIN(n.n_name) AS first_nation,
           CAST(SUM(strlen(n.n_name)) AS BIGINT) AS name_bytes
    FROM nation n
    GROUP BY n.n_regionkey
    """,
    tags=("E3", "R1", "R14"),
)
def xml_roundtrip_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion (Spark-4 built-in XML source): nation rows are
    serialized to XML documents and re-read with an explicit schema via
    ``spark.read.format("xml")``, then aggregated — hash-checked
    against the original table. Covers the feed format the engine's
    HTTP-source family (R1) would meet for GTFS-RT-like XML payloads;
    fidelity through markup (escaping, typed re-parse) is the point.
    """
    out = _tmpdir()
    nation = load_table(spark, sf_dir, "nation")
    (
        nation.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(out)
    )
    back = spark.read.format("xml").option("rowTag", "nation").schema(
        "n_nationkey bigint, n_name string, n_regionkey bigint"
    ).load(out)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.min("n_name").alias("first_nation"),
        F.sum(F.length("n_name")).cast("bigint").alias("name_bytes"),
    )


@register(
    "schema_evolution_merge",
    oracle="""
    WITH u AS (
        SELECT event_type, CAST(NULL AS VARCHAR) AS props
        FROM events WHERE event_id < 500
        UNION ALL
        SELECT event_type, props
        FROM events WHERE event_id >= 500 AND event_id < 1000
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(props) AS n_with_props,
           COUNT(*) - COUNT(props) AS n_nulls
    FROM u
    GROUP BY event_type
    """,
    tags=("E2", "E5"),
)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (E2 depth): an old batch written
    WITHOUT the ``props`` column and a new batch with it live in the
    same table directory; ``mergeSchema=true`` reconciles the footers
    and null-fills the missing column for old files — the add-a-column
    migration every long-lived lake table goes through, with no
    rewrite of historical data. The oracle models old rows as NULL
    props explicitly. (Schema merging is a footer-only planning cost:
    at 100 TB you pin the merged schema in a catalog instead of
    re-inferring per scan — this query is the semantics gate.)"""
    out = _tmpdir()
    ev = load_table(spark, sf_dir, "events")
    old_cols = [c for c in ev.columns if c != "props"]
    ev.filter(F.col("event_id") < 500).select(*old_cols).write.mode(
        "overwrite"
    ).parquet(out)
    ev.filter(
        (F.col("event_id") >= 500) & (F.col("event_id") < 1000)
    ).write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    return merged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("props").alias("n_with_props"),
        (F.count("*") - F.count("props")).alias("n_nulls"),
    )


@register(
    "source_csv_badrecords",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_rows
    FROM orders WHERE o_orderkey < 500
    GROUP BY o_orderstatus
    UNION ALL
    SELECT '__corrupt' AS o_orderstatus, 7 AS n_rows
    """,
    tags=("E1", "E3"),
)
def source_csv_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisoned-CSV drill (the feed-quality counterpart of
    json_corrupt_records_events): a CSV landing with 7 planted
    malformed lines is read in PERMISSIVE mode with an explicit schema
    + ``columnNameOfCorruptRecord`` — bad lines become NULL-typed rows
    carrying their raw text in the corrupt column instead of failing
    the scan (a single bad feed line must never kill an hourly load,
    reference R16's scraped-text reality). Valid rows aggregate
    normally; the corrupt count lands in its own bucket. The oracle
    models both populations exactly."""
    import pathlib

    out = _tmpdir()
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 500
    )
    orders.select("o_orderkey", "o_orderstatus", "o_totalprice").coalesce(
        1
    ).write.mode("overwrite").option("header", True).csv(out)
    # header=True consumes the FIRST line of EVERY file as a header,
    # so the bad file leads with a sacrificial pseudo-header line
    bad = "\n".join(
        ["o_orderkey,o_orderstatus,o_totalprice"]
        + [f"not-a-key-{i},garbage" for i in range(7)]
    )
    (pathlib.Path(out) / "zz_bad_lines.csv").write_text(bad + "\n")
    back = (
        spark.read.schema(
            "o_orderkey bigint, o_orderstatus string, o_totalprice double, "
            "_corrupt string"
        )
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(out)
    )
    back = back.cache()
    valid = (
        back.filter(F.col("_corrupt").isNull())
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_rows"))
    )
    corrupt = back.filter(F.col("_corrupt").isNotNull()).agg(
        F.count("*").alias("n_rows")
    ).select(F.lit("__corrupt").alias("o_orderstatus"), "n_rows")
    return valid.unionAll(corrupt)


#: zorder_exact_layout geometry: 8-bit cells per dimension, 16 files.
_ZX_BITS, _ZX_FILES = 8, 16


@register(
    "zorder_exact_layout",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
        FROM events
    ),
    st AS (
        SELECT CAST(MIN(user_id) AS DOUBLE) AS ulo,
               CAST(MAX(user_id) AS DOUBLE) AS uhi,
               MIN(value) AS vlo, MAX(value) AS vhi
        FROM ev
    ),
    q AS (
        SELECT event_id, user_id, value,
               CAST(LEAST({2**_ZX_BITS - 1}, FLOOR(
                   (CAST(user_id AS DOUBLE) - ulo) * {2**_ZX_BITS}.0
                   / (uhi - ulo))) AS BIGINT) AS xq,
               CAST(LEAST({2**_ZX_BITS - 1}, FLOOR(
                   (value - vlo) * {2**_ZX_BITS}.0
                   / (vhi - vlo))) AS BIGINT) AS yq
        FROM ev, st
    ),
    z AS (
        SELECT event_id, user_id, value,
               CAST(list_sum(list_transform(
                   generate_series(0, {_ZX_BITS - 1}), b ->
                   (((xq >> b) & 1) << (2 * b))
                   + (((yq >> b) & 1) << (2 * b + 1))
               )) AS BIGINT) AS zv
        FROM q
    ),
    f AS (
        SELECT *, NTILE({_ZX_FILES}) OVER (ORDER BY zv, event_id) AS fid
        FROM z
    ),
    spans AS (
        SELECT fid,
               CAST(MAX(user_id) - MIN(user_id) AS BIGINT) AS us,
               CAST(FLOOR((MAX(value) - MIN(value)) * 1000000.0)
                    AS BIGINT) AS vs
        FROM f GROUP BY fid
    ),
    g AS (
        SELECT CAST(MAX(user_id) - MIN(user_id) AS BIGINT) AS gu,
               CAST(FLOOR((MAX(value) - MIN(value)) * 1000000.0)
                    AS BIGINT) AS gv
        FROM ev
    )
    SELECT CAST(COUNT(*) AS INT) AS n_files,
           CAST(SUM(us) * 1000000000 // (COUNT(*) * (SELECT gu FROM g))
                AS BIGINT) AS user_id_span_fp,
           CAST(SUM(vs) * 1000000000 // (COUNT(*) * (SELECT gv FROM g))
                AS BIGINT) AS value_span_fp
    FROM spans
    """,
    tags=("E5", "E20", "N11"),
)
def zorder_exact_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering as a fully DETERMINISTIC logical
    layout — the exact-oracle sibling of zorder_layout_metrics (which
    measures the PHYSICAL write and stays rows-only because
    approxQuantile cutpoints and repartitionByRange sampling wobble
    file boundaries). Here every step is exact: value-quantized
    {_ZX_BITS}-bit cells from exact MIN/MAX (computed in-frame, same
    expression text both engines), bit-interleaved z-values (integer
    fold), file assignment by exact NTILE({_ZX_FILES}) over
    (z, event_id) via operators/sampling.partitioned_ntile (zero
    unpartitioned windows — the range-bucketed global rank), and the
    pruning statistic itself emitted as integers (per-file span sums
    div global span, 1e-9 units) so the cross-engine hash is exact.
    The statistic is what parquet row-group pruning consumes: both
    dimensions' mean per-file span fraction collapses far below the
    1.0 an unclustered layout gives."""
    from mobility_etl_spark.operators.sampling import partitioned_ntile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").cast("double").alias("value")
    )
    st = ev.agg(
        F.min("user_id").cast("double").alias("ulo"),
        F.max("user_id").cast("double").alias("uhi"),
        F.min("value").alias("vlo"),
        F.max("value").alias("vhi"),
    )
    top = 2**_ZX_BITS - 1
    q = ev.crossJoin(F.broadcast(st)).select(
        "event_id",
        "user_id",
        "value",
        F.expr(
            f"CAST(LEAST({top}, FLOOR((CAST(user_id AS DOUBLE) - ulo) "
            f"* {2**_ZX_BITS}.0 / (uhi - ulo))) AS BIGINT)"
        ).alias("xq"),
        F.expr(
            f"CAST(LEAST({top}, FLOOR((value - vlo) * {2**_ZX_BITS}.0 "
            f"/ (vhi - vlo))) AS BIGINT)"
        ).alias("yq"),
    )
    z = q.select(
        "event_id",
        "user_id",
        "value",
        F.expr(
            f"aggregate(sequence(0, {_ZX_BITS - 1}), 0L, (acc, b) -> "
            "acc + shiftleft(shiftright(xq, b) & 1, 2 * b) "
            "+ shiftleft(shiftright(yq, b) & 1, 2 * b + 1))"
        ).alias("zv"),
    )
    f = partitioned_ntile(z, _ZX_FILES, "zv", "event_id", col="fid")
    spans = f.groupBy("fid").agg(
        (F.max("user_id") - F.min("user_id")).cast("long").alias("us"),
        F.floor((F.max("value") - F.min("value")) * 1000000.0)
        .cast("long")
        .alias("vs"),
    )
    g = ev.agg(
        (F.max("user_id") - F.min("user_id")).cast("long").alias("gu"),
        F.floor((F.max("value") - F.min("value")) * 1000000.0)
        .cast("long")
        .alias("gv"),
    )
    return (
        spans.crossJoin(F.broadcast(g))
        .agg(
            F.count("*").cast("int").alias("n_files"),
            F.expr(
                "CAST((SUM(us) * 1000000000) div (COUNT(*) * FIRST(gu)) "
                "AS BIGINT)"
            ).alias("user_id_span_fp"),
            F.expr(
                "CAST((SUM(vs) * 1000000000) div (COUNT(*) * FIRST(gv)) "
                "AS BIGINT)"
            ).alias("value_span_fp"),
        )
    )
