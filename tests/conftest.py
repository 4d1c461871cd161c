"""Shared fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os

import pytest

from mobility_etl_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"

#: Core count for the shared test session (r15): overridable so the
#: suite's wall clock can be tuned to the verify budget without code
#: churn; results are core-count-invariant by the suite's own
#: parallelism-invariance gates.
TEST_CORES = int(os.environ.get("PYTEST_SPARK_CORES", "8"))


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "mobility-etl-spark-tests",
        master=f"local[{TEST_CORES}]",
        shuffle_partitions=TEST_CORES,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0001
