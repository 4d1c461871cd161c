"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import pytest

from mobility_etl_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "mobility-etl-spark-tests", master="local[8]", shuffle_partitions=8
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0001
