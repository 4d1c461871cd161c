"""RocksDB state-store provider parity — the 100 TB streaming-state
posture made executable.

The default HDFSBackedStateStoreProvider keeps every key's state in
executor HEAP; a 100 TB stream (billions of windowed/deduped keys)
blows that long before compute is the bottleneck. OSS Spark ships
RocksDBStateStoreProvider (spilling state to local SSD with changelog
checkpointing) precisely for that regime — flipping the provider must
change WHERE state lives, never WHAT the query computes. These tests
pin that: the same watermarked tumbling aggregation and the same
within-watermark dedup produce bit-identical results under both
providers (the dedup replay also re-proves exactly-once under the
RocksDB provider's different commit path).
"""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.streaming.jobs import (
    events_file_stream,
    run_available_now,
    tumbling_hourly_agg,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _run_tumbling(spark, sf_dir, provider: str | None):
    old = spark.conf.get(PROVIDER_CONF, None)
    if provider is not None:
        spark.conf.set(PROVIDER_CONF, provider)
    try:
        name = f"rdb_{uuid.uuid4().hex[:12]}"
        stream = events_file_stream(spark, f"{sf_dir}/events.parquet")
        with tempfile.TemporaryDirectory(prefix="ckpt_rdb_") as ckpt:
            run_available_now(tumbling_hourly_agg(stream), name, ckpt)
        return sorted(
            (r.hour_ts, r.event_type, r.n_events, r.sum_value)
            for r in spark.table(name).collect()
        )
    finally:
        if provider is not None:
            if old is None:
                spark.conf.unset(PROVIDER_CONF)
            else:
                spark.conf.set(PROVIDER_CONF, old)


def test_rocksdb_provider_loads_and_matches_default(spark, sf_dir):
    """Same stateful aggregation, both providers, identical results —
    and the RocksDB run must actually engage the provider (it throws at
    query start if the JNI library or provider class is absent, so a
    green run IS the load proof)."""
    default_rows = _run_tumbling(spark, sf_dir, None)
    rocks_rows = _run_tumbling(spark, sf_dir, ROCKSDB)
    assert default_rows, "aggregation produced no windows"
    assert rocks_rows == default_rows


def test_rocksdb_dedup_exactly_once_under_replay(spark, sf_dir):
    """dropDuplicatesWithinWatermark with RocksDB-backed state: land
    the same batch twice (at-least-once replay), count per type must
    equal the single-copy batch answer — exactly-once survives the
    provider swap."""
    old = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    try:
        with tempfile.TemporaryDirectory(prefix="rdb_replay_") as landing:
            raw = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
                F.col("event_id") < 500
            )
            raw.write.mode("overwrite").parquet(landing)
            raw.write.mode("append").parquet(landing)

            stream = events_file_stream(spark, landing)
            deduped = stream.withWatermark(
                "ts", "1 hour"
            ).dropDuplicatesWithinWatermark(["event_id"])
            name = f"rdbd_{uuid.uuid4().hex[:12]}"
            with tempfile.TemporaryDirectory(prefix="ckpt_rdbd_") as ckpt:
                run_available_now(
                    deduped.groupBy("event_type").agg(F.count("*").alias("n")),
                    name,
                    ckpt,
                    output_mode="complete",
                )
            got = {r.event_type: r.n for r in spark.table(name).collect()}
            want = {
                r.event_type: r.n
                for r in raw.groupBy("event_type")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            assert got == want
    finally:
        if old is None:
            spark.conf.unset(PROVIDER_CONF)
        else:
            spark.conf.set(PROVIDER_CONF, old)


def test_avro_format_boundary_is_container_limited(spark, sf_dir):
    """Honest environment boundary (mirrors the protobuf skip): the
    avro DataSource is an EXTERNAL Spark module (spark-avro jar) that
    this container does not ship. If the jar is ever present this test
    exercises the full write/read roundtrip; until then it asserts the
    failure is the documented 'external module' signal — not some
    other breakage being mistaken for the known limit."""
    import tempfile

    from pyspark.errors.exceptions.captured import AnalysisException

    df = spark.range(3).selectExpr("id", "CAST(id AS STRING) AS s")
    with tempfile.TemporaryDirectory(prefix="avro_bound_") as d:
        try:
            df.write.mode("overwrite").format("avro").save(d)
        except AnalysisException as e:
            assert "avro" in str(e).lower() and "external data source" in str(e), e
            return
        back = spark.read.format("avro").load(d)
        assert back.count() == 3
