"""The Warsaw mobility query pack: the analyses the reference's data
model was built to answer (SURVEY.md §2.B rationale, §7 step 1),
expressed over the engine's silver tables.

A user of the reference lands GTFS + delays + weather and then wants:
worst-delayed routes, delay-vs-weather correlation, trip geometry,
service calendars. The reference defers all of it; this module is that
surface, runnable on any (gtfs silver dir, delays silver, weather
silver) produced by sources/pipelines.py.

Scale notes per query in the docstrings; every join that can broadcast
does, every aggregation uses the exact-decimal pattern
(functions/compat.py) so results are deterministic under any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mobility_etl_spark.functions.compat import davg
from mobility_etl_spark.operators.asof import asof_join


def mean_delay_by_route_hour(delays: DataFrame) -> DataFrame:
    """THE reference query (SURVEY.md §7 step 1): mean delay seconds
    per route per hour. Unparseable delay strings are NULL and drop out
    of avg (count excludes them) — the parser-totality contract."""
    return (
        delays.groupBy("dt", "hour", "route")
        .agg(
            F.count("delay_s").alias("n_obs"),
            davg("delay_s", "mean_delay_s"),
            F.max("delay_s").alias("worst_delay_s"),
        )
    )


def worst_routes_with_weather(
    delays: DataFrame, weather: DataFrame, k: int = 10
) -> DataFrame:
    """Worst-k routes per hour joined with that hour's temperature —
    the delays⋈weather time-bucket join (E11). The hourly weather side
    is tiny (stations × hours) and broadcasts; the delay fact side
    never shuffles for the join."""
    hourly = mean_delay_by_route_hour(delays)
    wx_local = F.from_utc_timestamp(F.col("obs_ts"), "Europe/Warsaw")
    wx = (
        weather.withColumn("dt", F.to_date(wx_local))
        .withColumn("hour", F.hour(wx_local))
        .groupBy("dt", "hour")
        .agg(
            davg("temperature_c", "mean_temp_c"),
            davg("precip_sum_mm", "mean_precip_mm"),
        )
    )
    ranked = hourly.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("dt", "hour").orderBy(
                F.col("mean_delay_s").desc(), "route"
            )
        ),
    ).filter(F.col("rank") <= k)
    return ranked.join(F.broadcast(wx), ["dt", "hour"], "left")


def delay_weather_asof(delays: DataFrame, weather: DataFrame) -> DataFrame:
    """Precision upgrade of the hour join (E12): each delay observation
    matched to the latest weather observation at-or-before its
    timestamp — weather is hourly, delays are intra-hour, so the exact
    as-of beats bucket matching at hour boundaries.

    City-wide weather = one observation stream, so the as-of key is a
    constant (the union-window sees one partition). With per-station
    weather at scale, key by station/region instead and the window
    partitions by it.
    """
    wx = (
        weather.groupBy("obs_ts")
        .agg(davg("temperature_c", "temperature_c"))
        .withColumn("_city", F.lit("warsaw"))
    )
    d = delays.select(
        "ingest_ts", "route", "vehicle_no", "delay_s"
    ).withColumn("_city", F.lit("warsaw"))
    return asof_join(
        d,
        wx,
        on=["_city"],
        left_ts="ingest_ts",
        right_ts="obs_ts",
        payload_cols=["temperature_c"],
    ).drop("_city")


def trip_stop_profile(stop_times: DataFrame, stops: DataFrame) -> DataFrame:
    """Stops per trip in sequence order (E29): ordered collect_list of
    (sequence, stop name, arrival seconds). stops is a dimension —
    broadcast; stop_times (the 100 TB-shaped fact) shuffles once for
    the per-trip grouping."""
    joined = stop_times.join(F.broadcast(stops), "stop_id")
    return (
        joined.groupBy("trip_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("stop_sequence", "stop_name", "arrival_s")
                )
            ).alias("stops_in_order"),
            F.count("*").alias("n_stops"),
            F.max("service_day_offset").alias("crosses_midnight"),
        )
    )


def shape_polylines(shapes: DataFrame) -> DataFrame:
    """Shape point sequences → ordered polylines (E27/E29)."""
    return shapes.groupBy("shape_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct("shape_pt_sequence", "shape_pt_lat", "shape_pt_lon")
            )
        ).alias("points"),
        F.count("*").alias("n_points"),
    )


def route_timetable(
    trips: DataFrame,
    routes: DataFrame,
    stop_times: DataFrame,
    calendar_dates: DataFrame,
) -> DataFrame:
    """The full GTFS star join (E9): per route and service date, first
    and last departure (rendered back to GTFS clock strings, >24:00:00
    preserved). Dims broadcast; stop_times drives."""
    from mobility_etl_spark.functions.gtfs_time import seconds_to_gtfs_time

    svc = calendar_dates.filter(F.col("exception_type") == 1).select(
        "service_id", F.col("date").alias("service_date")
    )
    t = trips.join(F.broadcast(routes), "route_id").join(
        F.broadcast(svc), "service_id"
    )
    st = stop_times.join(
        t.select("trip_id", "route_id", "route_short_name", "service_date"),
        "trip_id",
    )
    agg = st.groupBy("route_id", "route_short_name", "service_date").agg(
        F.min("departure_s").alias("first_dep_s"),
        F.max("departure_s").alias("last_dep_s"),
        F.countDistinct("trip_id").alias("n_trips"),
    )
    return agg.select(
        "route_id",
        "route_short_name",
        "service_date",
        "n_trips",
        seconds_to_gtfs_time("first_dep_s").alias("first_departure"),
        seconds_to_gtfs_time("last_dep_s").alias("last_departure"),
    )


def vehicle_delay_episodes(delays: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-vehicle delay episodes (the session-window shape E33 in
    batch): consecutive observations of one vehicle separated by less
    than ``gap_minutes`` form an episode; reports per-episode peak
    delay. One shuffle on vehicle_no for the session assignment."""
    w = Window.partitionBy("vehicle_no").orderBy("ingest_ts")
    gap_s = gap_minutes * 60
    sessions = (
        delays.withColumn("prev_ts", F.lag("ingest_ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (
                    F.unix_timestamp("ingest_ts") - F.unix_timestamp("prev_ts")
                    > gap_s
                )
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    return sessions.groupBy("vehicle_no", "session_id").agg(
        F.min("ingest_ts").alias("episode_start"),
        F.max("ingest_ts").alias("episode_end"),
        F.count("*").alias("n_obs"),
        F.max("delay_s").alias("peak_delay_s"),
    )
