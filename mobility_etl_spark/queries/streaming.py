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

from mobility_etl_spark.registry import register
from mobility_etl_spark.streaming.jobs import (
    events_file_stream,
    run_available_now,
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
        run_available_now(result, name, ckpt)
    return spark.table(name)
