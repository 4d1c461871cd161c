"""Explicit StructTypes for every edge table (SURVEY.md §1.3).

The reference's schemas are fixed-by-convention and validated nowhere
(delays columns hardcoded at reference dags/warsaw-delays.py:182; GTFS
and IMGW schemas live only in their external specs). The engine rule is
schema-on-write: every CSV/JSON read passes an explicit StructType —
``inferSchema`` is nondeterministic and a full extra scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


#: GTFS static feed — 8 tables enumerated at reference
#: dags/warsaw-gtfs.py:30-39; columns per the public GTFS spec subset
#: (FIXTURES.md A3). `stop_times.arrival_time` stays STRING here: GTFS
#: clock strings may exceed 24:00:00 and are typed to
#: seconds-since-midnight in silver (functions/gtfs_time.py).
GTFS_SCHEMAS: dict[str, StructType] = {
    "agency": _st(
        ("agency_id", StringType()),
        ("agency_name", StringType()),
        ("agency_url", StringType()),
        ("agency_timezone", StringType()),
    ),
    "calendar_dates": _st(
        ("service_id", StringType()),
        ("date", StringType()),  # yyyyMMdd, typed in silver (E24)
        ("exception_type", IntegerType()),
    ),
    "feed_info": _st(
        ("feed_publisher_name", StringType()),
        ("feed_publisher_url", StringType()),
        ("feed_lang", StringType()),
        ("feed_start_date", StringType()),
        ("feed_end_date", StringType()),
    ),
    "routes": _st(
        ("route_id", StringType()),
        ("agency_id", StringType()),
        ("route_short_name", StringType()),
        ("route_long_name", StringType()),
        ("route_type", IntegerType()),
    ),
    "shapes": _st(
        ("shape_id", StringType()),
        ("shape_pt_lat", DoubleType()),
        ("shape_pt_lon", DoubleType()),
        ("shape_pt_sequence", IntegerType()),
    ),
    "stops": _st(
        ("stop_id", StringType()),
        ("stop_name", StringType()),
        ("stop_lat", DoubleType()),
        ("stop_lon", DoubleType()),
    ),
    "stop_times": _st(
        ("trip_id", StringType()),
        ("arrival_time", StringType()),
        ("departure_time", StringType()),
        ("stop_id", StringType()),
        ("stop_sequence", IntegerType()),
    ),
    "trips": _st(
        ("route_id", StringType()),
        ("service_id", StringType()),
        ("trip_id", StringType()),
        ("trip_headsign", StringType()),
        ("shape_id", StringType()),
    ),
}

#: Scraped delays snapshot, raw layer: the reference's 8 hardcoded
#: string columns (dags/warsaw-delays.py:182) + scrape timestamp
#: (:186), snake_cased.
DELAYS_RAW_SCHEMA = _st(
    ("type", StringType()),
    ("vehicle_no", StringType()),
    ("brigade", StringType()),
    ("route", StringType()),
    ("trip_headsign", StringType()),
    ("delay", StringType()),
    ("stop_name", StringType()),
    ("outside", StringType()),
    ("ingest_ts", TimestampType()),
)

#: IMGW weather observation, typed (FIXTURES.md A2; raw payload is the
#: verbatim API bytes, reference dags/warsaw-weather.py:32-34).
WEATHER_SCHEMA = _st(
    ("station_id", StringType()),
    ("station_name", StringType()),
    ("meas_date", DateType()),
    ("meas_hour", IntegerType()),
    ("temperature_c", DoubleType()),
    ("wind_speed_ms", DoubleType()),
    ("wind_dir_deg", IntegerType()),
    ("rel_humidity_pct", DoubleType()),
    ("precip_sum_mm", DoubleType()),
    ("pressure_hpa", DoubleType()),
)

#: Ingest manifest — the engine-native replacement for the reference's
#: `latest-feed-hash` state blob (dags/warsaw-gtfs.py:65,79-80) and its
#: exists-guard (dags/warsaw-weather.py:26-28); FIXTURES.md A4.
MANIFEST_SCHEMA = _st(
    ("source", StringType()),
    ("object_key", StringType()),
    ("content_sha256", StringType()),
    ("ingest_ts", TimestampType()),
)
