"""Replay the driver's t2 gate locally at sf0.001 (BASELINE.md).

One parametrized test per registered query: Spark result ≡ DuckDB
oracle (row count + column names + order-insensitive canonical values).
This is the primary correctness net — if it is green here it should be
green at the driver's sf0.01 gate (the queries contain no
SF-dependent logic).
"""

from __future__ import annotations

import pytest

from mobility_etl_spark.registry import load_all
from tests.oracle_check import compare_one, duck_connection

SPECS = load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    result = compare_one(spark, duck, SPECS[name], sf_dir)
    assert result.ok, result.detail


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_has_rows(spark, sf_dir, name):
    """Every registered query must return a non-degenerate result
    (anti-joins may legitimately be small, but never error)."""
    df = SPECS[name].builder(spark, sf_dir)
    assert df.columns, "query must project at least one column"
    df.limit(1).collect()  # executes the plan
