"""The reference's three Airflow DAGs, re-wired so every task body is
a Spark job (SURVEY.md §2.A R19–R20, §3.4; BASELINE.json
spark_approach: "DataFrame ops with Airflow orchestration").

DAG-for-DAG parity with the reference:

* ``warsaw_gtfs_spark``    ← warsaw-gtfs   (@daily,  dags/warsaw-gtfs.py:18-24)
* ``warsaw_delays_spark``  ← scrape_warsaw_traffic_data (@hourly,
                             dags/warsaw-delays.py:19-25)
* ``warsaw_weather_spark`` ← warsaw-weather (@hourly, dags/warsaw-weather.py:10-16)

What changes vs the reference (deliberately, SURVEY.md §3):

* Each ``@task`` body is ONE Spark job — the reference's per-task
  process boundaries, shared-/tmp handoffs, and the pickled-DataFrame
  XCom transfer (dags/warsaw-delays.py:199-200) become DataFrame
  lineage inside that job; only tiny control scalars cross XCom.
* Config resolves lazily inside tasks, not at DAG parse time (the
  reference builds a BlobServiceClient and reads env at import,
  dags/warsaw-gtfs.py:27 — an anti-pattern: parse-time failures and
  wall-clock path skew, dags/warsaw-weather.py:21).
* Short-circuits (hash check :60-71, exists check :26-28) are not
  Airflow control flow anymore — they're the manifest anti-joins
  INSIDE the jobs (sources/manifest.py), so a backfill of 1000 runs
  is 1000 idempotent no-ops, not 1000 skipped-task graphs.

Airflow is not installed in the dev container; this module is
import-gated and the DAG factories are exercised only when an Airflow
deployment imports it (the task bodies themselves are plain functions,
unit-tested without Airflow in tests/test_pipelines.py).
"""

from __future__ import annotations

import os
from datetime import datetime

try:  # pragma: no cover - exercised only under a real Airflow deployment
    from airflow.decorators import dag, task

    HAS_AIRFLOW = True
except Exception:  # pragma: no cover
    HAS_AIRFLOW = False

    def dag(*a, **k):  # type: ignore[misc]
        def deco(fn):
            return fn

        return deco

    def task(fn=None, **k):  # type: ignore[misc]
        def deco(f):
            return f

        return deco(fn) if fn else deco


LAKE_ROOT = lambda: os.environ.get("MOBILITY_LAKE_ROOT", "/tmp/mobility-lake")  # noqa: E731
MANIFEST = lambda: f"{LAKE_ROOT()}/manifest"  # noqa: E731


def _spark():
    from mobility_etl_spark.session import get_spark

    return get_spark("mobility-etl-airflow")


@dag(
    dag_id="warsaw_gtfs_spark",
    schedule="@daily",
    start_date=datetime(2024, 12, 1),
    catchup=False,
    tags=["mobility-etl-spark"],
)
def warsaw_gtfs_spark():
    """GTFS daily: download (edge I/O) then ONE Spark job that
    change-detects, expands, types, and lands 8 silver tables."""

    @task
    def fetch_feed() -> str:
        import urllib.request

        url = os.environ["GTFS_FEED_URL"]  # resolved at RUN time
        local = f"{LAKE_ROOT()}/landing/gtfs/feed.zip"
        os.makedirs(os.path.dirname(local), exist_ok=True)
        urllib.request.urlretrieve(url, local)  # noqa: S310
        return local

    @task
    def ingest(zip_path: str) -> dict:
        from mobility_etl_spark.sources.pipelines import gtfs_ingest

        return gtfs_ingest(
            _spark(), zip_path, f"{LAKE_ROOT()}/silver/gtfs", MANIFEST()
        )

    ingest(fetch_feed())


@dag(
    dag_id="warsaw_delays_spark",
    schedule="@hourly",
    start_date=datetime(2024, 12, 1),
    catchup=False,
    tags=["mobility-etl-spark"],
)
def warsaw_delays_spark():
    """Delays hourly: scrape at the edge (R3 stays an ingestion task —
    a DOM pagination loop is not a Spark workload), then one Spark job
    types and lands the batch idempotently."""

    @task
    def scrape_and_ingest() -> int:
        from mobility_etl_spark.sources.scrape import scrape_delays_batch
        from mobility_etl_spark.sources.pipelines import delays_ingest

        spark = _spark()
        raw = scrape_delays_batch(spark)  # pandas contract → DataFrame
        return delays_ingest(
            spark, raw, f"{LAKE_ROOT()}/silver/delays", MANIFEST()
        )

    scrape_and_ingest()


@dag(
    dag_id="warsaw_weather_spark",
    schedule="@hourly",
    start_date=datetime(2024, 12, 1),
    catchup=False,
    tags=["mobility-etl-spark"],
)
def warsaw_weather_spark():
    """Weather hourly: fetch the IMGW payload, parse against the
    explicit schema, land idempotently (the exists-guard is the
    manifest anti-join inside the job, not an Airflow short-circuit)."""

    @task
    def fetch_and_ingest() -> int:
        import urllib.request

        from mobility_etl_spark.sources.pipelines import weather_ingest
        from mobility_etl_spark.sources.readers import read_csv_table
        from mobility_etl_spark.sources.schemas import WEATHER_SCHEMA

        url = os.environ["WEATHER_API_URL"]
        local = f"{LAKE_ROOT()}/landing/weather/payload.csv"
        os.makedirs(os.path.dirname(local), exist_ok=True)
        urllib.request.urlretrieve(url, local)  # noqa: S310
        spark = _spark()
        raw = read_csv_table(spark, local, WEATHER_SCHEMA)
        return weather_ingest(
            spark, raw, f"{LAKE_ROOT()}/silver/weather", MANIFEST()
        )

    fetch_and_ingest()


if HAS_AIRFLOW:  # pragma: no cover
    warsaw_gtfs_spark()
    warsaw_delays_spark()
    warsaw_weather_spark()
