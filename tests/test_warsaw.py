"""Warsaw domain query pack tests (SURVEY.md §7 step 1; the queries a
reference user would run), on the same deterministic fixtures as
tests/test_pipelines.py."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark import warsaw
from mobility_etl_spark.sources.pipelines import (
    delays_silver,
    gtfs_silver,
    weather_silver,
)
from mobility_etl_spark.sources.schemas import DELAYS_RAW_SCHEMA, WEATHER_SCHEMA
from tests.test_pipelines import GTFS_MEMBERS, _delays_rows, _weather_rows


@pytest.fixture(scope="module")
def gtfs(spark, tmp_path_factory):
    import os

    from mobility_etl_spark.sources.readers import gtfs_tables_from_zip
    from tests.test_pipelines import _write_gtfs_zip

    p = str(tmp_path_factory.mktemp("gtfs") / "gtfs.zip")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    _write_gtfs_zip(p)
    raw = gtfs_tables_from_zip(spark, p)
    return {name: gtfs_silver(name, df) for name, df in raw.items()}


@pytest.fixture(scope="module")
def delays(spark):
    from pyspark.sql import functions as F

    base = delays_silver(
        spark.createDataFrame(_delays_rows(), DELAYS_RAW_SCHEMA)
    )
    return base.withColumn("dt", F.to_date("ingest_ts")).withColumn(
        "hour", F.hour("ingest_ts")
    )


@pytest.fixture(scope="module")
def weather(spark):
    return weather_silver(spark.createDataFrame(_weather_rows(), WEATHER_SCHEMA))


def test_mean_delay_by_route_hour(spark, delays):
    rows = {r.route: r for r in warsaw.mean_delay_by_route_hour(delays).collect()}
    # route 175: one parsed obs (330s) + one NULL (garbage) → avg over 1
    assert rows["175"].n_obs == 1
    assert rows["175"].mean_delay_s == 330.0
    assert rows["9"].mean_delay_s == 0.0


def test_worst_routes_with_weather(spark, delays, weather):
    out = warsaw.worst_routes_with_weather(delays, weather, k=5).collect()
    assert len(out) > 0
    worst = min(out, key=lambda r: r.rank)
    assert worst.route == "175"  # 330s beats 0s
    # weather join is left: columns exist even when the hour has no obs
    assert "mean_temp_c" in warsaw.worst_routes_with_weather(
        delays, weather
    ).columns


def test_delay_weather_asof_carries_latest_prior(spark, delays, weather):
    out = warsaw.delay_weather_asof(delays, weather).collect()
    assert len(out) == 3
    for r in out:
        # delays at 10:15 UTC; weather obs at 09:00/10:00 UTC (10/11 Warsaw)
        assert r.obs_ts_asof is not None
        assert r.obs_ts_asof <= r.ingest_ts


def test_trip_stop_profile_orders_and_flags_midnight(spark, gtfs):
    rows = {
        r.trip_id: r
        for r in warsaw.trip_stop_profile(
            gtfs["stop_times"], gtfs["stops"]
        ).collect()
    }
    t1 = rows["t1"]
    assert t1.n_stops == 2
    assert [s.stop_name for s in t1.stops_in_order] == ["Centrum 01", "Plac 02"]
    assert t1.crosses_midnight == 1  # the 25:10:00 arrival
    assert rows["t2"].crosses_midnight == 0


def test_shape_polylines(spark, gtfs):
    rows = {r.shape_id: r for r in warsaw.shape_polylines(gtfs["shapes"]).collect()}
    assert rows["s1"].n_points == 2
    assert [p.shape_pt_sequence for p in rows["s1"].points] == [1, 2]


def test_route_timetable_gtfs_clock_rendering(spark, gtfs):
    rows = warsaw.route_timetable(
        gtfs["trips"], gtfs["routes"], gtfs["stop_times"], gtfs["calendar_dates"]
    ).collect()
    by_route = {r.route_short_name: r for r in rows}
    # only service 'wd' has exception_type=1 (added); t1 runs route 175
    assert set(by_route) == {"175"}
    r = by_route["175"]
    assert r.n_trips == 1
    assert r.first_departure == "08:00:30"
    assert r.last_departure == "25:11:00"  # >24h preserved, not wrapped
    assert r.service_date == dt.date(2024, 12, 23)


def test_vehicle_delay_episodes(spark, delays):
    out = warsaw.vehicle_delay_episodes(delays).collect()
    assert {r.vehicle_no for r in out} == {"A123", "4501", "B777"}
    a = [r for r in out if r.vehicle_no == "A123"][0]
    assert a.n_obs == 1 and a.peak_delay_s == 330
