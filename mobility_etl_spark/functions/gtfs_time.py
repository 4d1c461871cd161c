"""GTFS service-time handling (SURVEY.md §1.3, §7 hard-part 1).

GTFS ``stop_times.arrival_time`` is ``HH:MM:SS`` where HH may exceed
24 (e.g. ``25:10:00`` = 1:10 am on the next service day — the GTFS
spec allows it; reference table list at dags/warsaw-gtfs.py:30-39).
That is NOT a valid Spark TimestampType, so the engine's canonical
representation is **seconds since service-day midnight** (int), with
render/derive helpers. All built-in expressions — codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HMS = r"^\s*(\d+):([0-5]?\d):([0-5]?\d)\s*$"


def gtfs_time_to_seconds(col: Column | str) -> Column:
    """``"HH:MM:SS"`` (HH unbounded) → seconds since service-day midnight.

    Total: NULL on malformed input, never throws.
    """
    col = F.col(col) if isinstance(col, str) else col
    h = F.regexp_extract(col, _HMS, 1)
    m = F.regexp_extract(col, _HMS, 2)
    s = F.regexp_extract(col, _HMS, 3)
    valid = h != ""
    return F.when(
        valid,
        h.cast("int") * 3600 + m.cast("int") * 60 + s.cast("int"),
    ).cast("int")


def seconds_to_gtfs_time(col: Column | str) -> Column:
    """Inverse render: seconds → zero-padded ``HH:MM:SS`` (HH may be >24)."""
    col = F.col(col) if isinstance(col, str) else col
    h = F.floor(col / 3600).cast("int")
    m = F.floor((col % 3600) / 60).cast("int")
    s = (col % 60).cast("int")
    return F.concat_ws(
        ":",
        F.lpad(h.cast("string"), 2, "0"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lpad(s.cast("string"), 2, "0"),
    )


def service_day_offset(seconds: Column | str) -> Column:
    """How many days past the service day the time falls (0 for <24:00)."""
    seconds = F.col(seconds) if isinstance(seconds, str) else seconds
    return F.floor(seconds / 86400).cast("int")


def wall_clock_seconds(seconds: Column | str) -> Column:
    """Fold a >24h service time onto the 0–24h wall clock."""
    seconds = F.col(seconds) if isinstance(seconds, str) else seconds
    return (seconds % 86400).cast("int")
