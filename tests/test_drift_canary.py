"""Testdata-drift canary — MUST stay the loudest, fastest failure.

Round-2 lesson (VERDICT.md): the driver regenerated /root/testdata
after the last work commit, switching ``events.ts`` from int64-nanos
to parquet TIMESTAMP(µs). The batch loader survived (it branches on
the observed dtype, io.py:57-61); the streaming source had the old
encoding hardcoded and silently collapsed 30 days of events into ~43
minutes — 5 queries returned garbage that still "ran fine".

This module is the tripwire for the next regeneration:

* ``test_schema_snapshot`` pins the dtype of every column of every
  driver table against the encodings the engine is KNOWN to handle,
  and fails printing the observed dtype (table.column: got X, expected
  one of Y) the moment the driver changes any of them — any table, not
  just events.
* ``test_batch_stream_ts_parity`` streams the REAL testdata file (the
  round-2 self-staged tests survived the drift precisely because they
  never read it) and asserts the streaming source sees the same row
  count and the same [min(ts), max(ts)] span as the batch loader. A
  ts-unit mistake moves the span by ~1000x and fails instantly.
"""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.io import DRIVER_TABLES, load_table
from mobility_etl_spark.streaming.jobs import events_file_stream

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

#: dtypes (Spark simpleString) the engine's loaders/oracles are known
#: to handle, per table.column. A set = "any of these encodings is
#: fine, the code branches on the observed one" (io.py:57, jobs.py).
#: NOT listed here => new column or renamed column => fail loudly too.
EXPECTED_DTYPES: dict[str, dict[str, set[str]]] = {
    "region": {
        "r_regionkey": {"int", "bigint"},
        "r_name": {"string"},
    },
    "nation": {
        "n_nationkey": {"int", "bigint"},
        "n_name": {"string"},
        "n_regionkey": {"int", "bigint"},
    },
    "customer": {
        "c_custkey": {"bigint", "int"},
        "c_name": {"string"},
        "c_nationkey": {"int", "bigint"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"bigint", "int"},
        "s_name": {"string"},
        "s_nationkey": {"int", "bigint"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"bigint", "int"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int", "bigint"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"bigint", "int"},
        "o_custkey": {"bigint", "int"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp_ntz", "date"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint", "int"},
        "l_partkey": {"bigint", "int"},
        "l_suppkey": {"bigint", "int"},
        "l_linenumber": {"int", "bigint"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp_ntz", "date"},
    },
    "events": {
        "event_id": {"bigint", "int"},
        # THE round-2 drifting column: all encodings the source adapts
        # to (io.py:57 batch branch, streaming/jobs.py footer probe)
        "ts": {"bigint", "timestamp_ntz", "timestamp"},
        "user_id": {"bigint", "int"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"bigint", "int"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"bigint", "int"},
    },
    "embeddings": {
        "vec_id": {"bigint", "int"},
        "embedding": {"array<float>", "array<double>"},
        "label": {"int", "bigint"},
    },
}


@pytest.mark.parametrize("sf", SF_DIRS + ["/root/testdata/sf0.1"])
def test_schema_snapshot(spark, sf):
    """Every driver table's on-disk dtype must be one the engine's
    loaders handle. Fails with the exact observed dtype so a driver
    regeneration is diagnosed in one read of the pytest output."""
    problems: list[str] = []
    for table in DRIVER_TABLES:
        observed = dict(spark.read.parquet(f"{sf}/{table}.parquet").dtypes)
        expected = EXPECTED_DTYPES[table]
        for col, dtype in observed.items():
            allowed = expected.get(col)
            if allowed is None:
                problems.append(
                    f"{table}.{col}: NEW/RENAMED column (dtype {dtype}) — "
                    "driver regenerated testdata with a new layout"
                )
            elif dtype not in allowed:
                problems.append(
                    f"{table}.{col}: got {dtype}, engine handles only "
                    f"{sorted(allowed)} — ENCODING DRIFT, audit every "
                    f"loader/oracle that touches {table}.{col}"
                )
        for col in expected:
            if col not in observed:
                problems.append(f"{table}.{col}: column MISSING from testdata")
    assert not problems, "TESTDATA DRIFT at " + sf + ":\n" + "\n".join(problems)


@pytest.mark.parametrize("sf", SF_DIRS)
def test_batch_stream_ts_parity(spark, sf):
    """The streaming source must see the same rows and the same event-
    time span as the batch loader ON THE REAL testdata file. Catches
    any ts-unit mistake (ns-vs-µs moves the span ~1000×) and any
    streamed-schema drift, before the windowed queries can go wrong."""
    batch = load_table(spark, sf, "events")
    b = batch.agg(
        F.count("*").alias("n"),
        F.min("ts").cast("timestamp").alias("lo"),
        F.max("ts").cast("timestamp").alias("hi"),
    ).first()

    name = f"canary_{uuid.uuid4().hex[:12]}"
    stream = events_file_stream(spark, f"{sf}/events.parquet")
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        s = (
            spark.table(name)
            .agg(
                F.count("*").alias("n"),
                F.min("ts").cast("timestamp").alias("lo"),
                F.max("ts").cast("timestamp").alias("hi"),
            )
            .first()
        )
    assert s.n == b.n, f"row-count drift: stream {s.n} vs batch {b.n}"
    assert (s.lo, s.hi) == (b.lo, b.hi), (
        f"event-time span drift: stream [{s.lo} .. {s.hi}] vs "
        f"batch [{b.lo} .. {b.hi}] — ts encoding changed?"
    )
