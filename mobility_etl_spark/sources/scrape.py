"""Scrape-edge adapter (SURVEY.md §2.A R3): the Selenium pagination
loop stays an ingestion task — its OUTPUT CONTRACT is what the engine
owns.

The reference's scraper (dags/warsaw-delays.py:27-187) returns a
pandas DataFrame with 8 hardcoded string columns (:182) plus a
timestamp (:186). This module pins that contract: any scraper
implementation (real Selenium, recorded fixture, deterministic fake)
must produce rows matching DELAYS_RAW_SCHEMA, and
:func:`to_spark_batch` is the single Arrow-backed crossing into the
engine. Selenium is not in this container, so the real scraper is
import-gated; the deterministic fake drives tests and local runs.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from mobility_etl_spark.sources.schemas import DELAYS_RAW_SCHEMA

RAW_COLUMNS = [f.name for f in DELAYS_RAW_SCHEMA.fields]


def to_spark_batch(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """The one pandas→Spark crossing (R3's XCom handoff replaced by an
    Arrow batch): validates the scrape contract, then builds a
    DataFrame with the explicit raw schema — no inference."""
    missing = [c for c in RAW_COLUMNS if c not in pdf.columns]
    if missing:
        raise ValueError(f"scrape batch missing columns: {missing}")
    return spark.createDataFrame(pdf[RAW_COLUMNS], DELAYS_RAW_SCHEMA)


def fake_scrape(n_rows: int = 200, ts: dt.datetime | None = None) -> pd.DataFrame:
    """Deterministic scraper fake: the reference's row shapes
    (chip/link/span cell text, dags/warsaw-delays.py:144-154) without
    a browser. Row i is fully determined by i, so tests are stable."""
    ts = ts or dt.datetime(2024, 12, 23, 10, 0, 0)
    rows = []
    for i in range(n_rows):
        minutes, seconds = i % 12, (i * 7) % 60
        delay = (
            f"{minutes} min {seconds} s"
            if i % 10 != 9
            else "awaria"  # ~10% unparseable, like real scraped text
        )
        rows.append(
            {
                "type": "BUS" if i % 3 else "TRAM",
                "vehicle_no": f"V{i:04d}",
                "brigade": str(i % 5 + 1),
                "route": str(100 + i % 50),
                "trip_headsign": f"Terminus {i % 20}",
                "delay": delay,
                "stop_name": f"Stop {i % 200:03d}",
                "outside": "Tak" if i % 7 == 0 else "Nie",
                "ingest_ts": ts,
            }
        )
    return pd.DataFrame(rows, columns=RAW_COLUMNS)


def scrape_delays_batch(spark: SparkSession) -> DataFrame:
    """Production entry: real Selenium scraper when available, the
    deterministic fake otherwise (this container has no browser)."""
    try:  # pragma: no cover - requires a Selenium Remote sidecar
        from mobility_etl_spark.sources._selenium_scraper import scrape  # noqa: F401

        pdf = scrape()
    except Exception:
        pdf = fake_scrape()
    return to_spark_batch(spark, pdf)
