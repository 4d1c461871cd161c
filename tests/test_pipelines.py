"""Bronze→silver pipeline tests on deterministic fixtures
(SURVEY.md §5.2–5.3: golden aggregates, partition layout, run-twice
idempotency, GTFS >24:00:00 times, parser totality on garbage).
"""

from __future__ import annotations

import datetime as dt
import io
import os
import zipfile

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.sources.manifest import (
    changed_objects,
    empty_manifest,
    latest_per_key,
    load_manifest,
    with_content_hash,
)
from mobility_etl_spark.sources.pipelines import (
    delays_ingest,
    delays_silver,
    gtfs_ingest,
    weather_ingest,
    weather_silver,
)
from mobility_etl_spark.sources.readers import (
    expand_zip_members,
    gtfs_tables_from_zip,
    read_binary_files,
    read_csv_table,
)
from mobility_etl_spark.sources.schemas import (
    DELAYS_RAW_SCHEMA,
    GTFS_SCHEMAS,
    WEATHER_SCHEMA,
)

# --------------------------------------------------------------------------
# fixtures
# --------------------------------------------------------------------------

GTFS_MEMBERS = {
    "agency.txt": (
        "agency_id,agency_name,agency_url,agency_timezone\n"
        "1,ZTM Warszawa,https://ztm.example,Europe/Warsaw\n"
    ),
    "routes.txt": (
        "route_id,agency_id,route_short_name,route_long_name,route_type\n"
        "175,1,175,Airport Line,3\n"
        "9,1,9,Tram Nine,0\n"
    ),
    "trips.txt": (
        "route_id,service_id,trip_id,trip_headsign,shape_id\n"
        "175,wd,t1,Metro Mlociny,s1\n"
        "9,we,t2,Gocławek,s2\n"
    ),
    "stops.txt": (
        "stop_id,stop_name,stop_lat,stop_lon\n"
        "c01,Centrum 01,52.23,21.01\n"
        "p02,Plac 02,52.24,21.02\n"
    ),
    # arrival past midnight (25:10:00) — SURVEY.md §7 hard-part 1
    "stop_times.txt": (
        "trip_id,arrival_time,departure_time,stop_id,stop_sequence\n"
        "t1,08:00:00,08:00:30,c01,1\n"
        "t1,25:10:00,25:11:00,p02,2\n"
        "t2,12:30:00,12:30:30,c01,1\n"
    ),
    "calendar_dates.txt": (
        "service_id,date,exception_type\n"
        "wd,20241223,1\n"
        "we,20241224,2\n"
    ),
    "shapes.txt": (
        "shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence\n"
        "s1,52.23,21.01,1\n"
        "s1,52.25,21.05,2\n"
    ),
    "feed_info.txt": (
        "feed_publisher_name,feed_publisher_url,feed_lang,feed_start_date,feed_end_date\n"
        "ZTM,https://ztm.example,pl,20241201,20250102\n"
    ),
}


def _write_gtfs_zip(path: str, members=GTFS_MEMBERS) -> None:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, body in members.items():
            zf.writestr(name, body)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


TS0 = dt.datetime(2024, 12, 23, 10, 15, 0)  # UTC scrape time


def _delays_rows():
    mk = lambda *a: a  # noqa: E731
    return [
        mk("BUS", "A123", "1", "175", "Metro Mlociny", "5 min 30 s", "Centrum 01", "Nie", TS0),
        mk("TRAM", "4501", "02", "9", "Gocławek", "0 min", "Plac 02", "Tak", TS0),
        mk("BUS", "B777", "3", "175", "Metro Mlociny", "not-a-delay", "Centrum 01", "Nie", TS0),
        mk("", "", "", "", "", "", "", "", TS0),  # fully-empty scrape row
    ]


def _weather_rows():
    d = dt.date(2024, 12, 23)
    return [
        ("12375", "Warszawa", d, 10, -1.5, 3.2, 270, 88.0, 0.1, 1013.2),
        ("12375", "Warszawa", d, 11, -1.0, 2.8, 260, 86.0, 0.0, 1013.6),
        ("12295", "Białystok", d, 10, -4.2, None, None, 91.0, None, 1015.0),
    ]


@pytest.fixture()
def gtfs_zip(tmp_path):
    p = str(tmp_path / "feed" / "gtfs.zip")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    _write_gtfs_zip(p)
    return p


# --------------------------------------------------------------------------
# readers (E1/E4/R4)
# --------------------------------------------------------------------------


def test_expand_zip_members(spark, gtfs_zip):
    rows = expand_zip_members(read_binary_files(spark, gtfs_zip)).collect()
    assert {r.member_name for r in rows} == set(GTFS_MEMBERS)
    by_name = {r.member_name: r for r in rows}
    assert bytes(by_name["agency.txt"].content).decode() == GTFS_MEMBERS["agency.txt"]
    assert all(
        r.member_bytes == len(GTFS_MEMBERS[r.member_name].encode()) for r in rows
    )


def test_gtfs_tables_from_zip_typed(spark, gtfs_zip):
    tables = gtfs_tables_from_zip(spark, gtfs_zip)
    assert set(tables) == set(GTFS_SCHEMAS)
    routes = {r.route_id: r for r in tables["routes"].collect()}
    assert routes["175"].route_type == 3 and routes["9"].route_type == 0
    stops = tables["stops"].collect()
    assert all(isinstance(r.stop_lat, float) for r in stops)


def test_read_csv_table_explicit_schema(spark, tmp_path):
    p = str(tmp_path / "w.csv")
    with open(p, "w") as f:
        f.write("station_id,station_name,meas_date,meas_hour,temperature_c,"
                "wind_speed_ms,wind_dir_deg,rel_humidity_pct,precip_sum_mm,pressure_hpa\n")
        f.write("12375,Warszawa,2024-12-23,10,-1.5,3.2,270,88.0,0.1,1013.2\n")
        f.write("12295,Bialystok,2024-12-23,10,,,,,,\n")  # NULL metrics
    df = read_csv_table(spark, p, WEATHER_SCHEMA)
    rows = {r.station_id: r for r in df.collect()}
    assert rows["12375"].temperature_c == -1.5
    assert rows["12295"].temperature_c is None
    assert rows["12375"].meas_date == dt.date(2024, 12, 23)


# --------------------------------------------------------------------------
# manifest (R5–R8)
# --------------------------------------------------------------------------


def test_changed_objects_anti_join(spark):
    inc = with_content_hash(
        spark.createDataFrame([("a",), ("b",)], "payload string"), ("payload",)
    )
    assert changed_objects(inc, empty_manifest(spark)).count() == 2
    seen = inc.limit(0)  # none seen
    manifest = inc.filter(F.col("payload") == "a").select(
        F.lit("s").alias("source"),
        F.col("payload").alias("object_key"),
        "content_sha256",
        F.current_timestamp().alias("ingest_ts"),
    )
    out = changed_objects(inc, manifest).collect()
    assert [r.payload for r in out] == ["b"]
    del seen


def test_latest_per_key(spark):
    t1 = dt.datetime(2024, 1, 1, 1)
    t2 = dt.datetime(2024, 1, 1, 2)
    m = spark.createDataFrame(
        [("s", "k", "h1", t1), ("s", "k", "h2", t2)],
        "source string, object_key string, content_sha256 string, ingest_ts timestamp",
    )
    rows = latest_per_key(m).collect()
    assert len(rows) == 1 and rows[0].content_sha256 == "h2"


# --------------------------------------------------------------------------
# gtfs pipeline (run-twice short-circuit, typed silver)
# --------------------------------------------------------------------------


def test_gtfs_ingest_and_short_circuit(spark, tmp_path, gtfs_zip):
    silver = str(tmp_path / "silver")
    manifest = str(tmp_path / "manifest")
    written = gtfs_ingest(spark, gtfs_zip, silver, manifest)
    assert written and written["stop_times"] == 3
    # >24:00:00 arrival typed to seconds-since-midnight + day offset
    st = spark.read.parquet(f"{silver}/stop_times")
    late = st.filter(F.col("arrival_time") == "25:10:00").collect()[0]
    assert late.arrival_s == 25 * 3600 + 10 * 60
    assert late.service_day_offset == 1
    cal = spark.read.parquet(f"{silver}/calendar_dates").collect()
    assert all(isinstance(r.date, dt.date) for r in cal)
    # unchanged feed → short-circuit, nothing written (R6)
    assert gtfs_ingest(spark, gtfs_zip, silver, manifest) == {}
    assert load_manifest(spark, manifest).count() == 1


# --------------------------------------------------------------------------
# delays pipeline (typed parse, empty-row guard, exists-guard)
# --------------------------------------------------------------------------


def test_delays_silver_and_idempotent_ingest(spark, tmp_path):
    raw = spark.createDataFrame(_delays_rows(), DELAYS_RAW_SCHEMA)
    silver = delays_silver(raw)
    rows = {r.vehicle_no: r for r in silver.collect()}
    assert len(rows) == 3  # empty scrape row dropped
    assert rows["A123"].delay_s == 330
    assert rows["4501"].delay_s == 0 and rows["4501"].outside_flag is True
    assert rows["B777"].delay_s is None  # garbage → NULL, never throws

    out = str(tmp_path / "delays")
    man = str(tmp_path / "man")
    assert delays_ingest(spark, raw, out, man) == 3
    # same hour re-scraped → exists-guard skips (R8)
    assert delays_ingest(spark, raw, out, man) == 0
    landed = spark.read.parquet(out)
    assert landed.count() == 3
    assert {"dt", "hour"} <= set(landed.columns)
    assert landed.select("hour").distinct().collect()[0].hour == 11  # 10:15 UTC → 11:15 Warsaw


def test_weather_ingest_idempotent(spark, tmp_path):
    raw = spark.createDataFrame(_weather_rows(), WEATHER_SCHEMA)
    assert weather_silver(raw).filter(F.col("obs_ts").isNull()).count() == 0
    out = str(tmp_path / "weather")
    man = str(tmp_path / "man")
    assert weather_ingest(spark, raw, out, man) == 3
    assert weather_ingest(spark, raw, out, man) == 0
    landed = spark.read.parquet(out)
    assert landed.count() == 3
    # obs hour partitions are Warsaw-local of the UTC obs_ts: local 10h/11h
    assert {r.hour for r in landed.select("hour").distinct().collect()} == {10, 11}


# --------------------------------------------------------------------------
# scrape contract (R3) + orchestration import-gate (R19/R20)
# --------------------------------------------------------------------------


def test_scrape_contract_end_to_end(spark, tmp_path):
    from mobility_etl_spark.sources.scrape import fake_scrape, to_spark_batch

    raw = to_spark_batch(spark, fake_scrape(100))
    assert raw.schema == DELAYS_RAW_SCHEMA
    n = delays_ingest(spark, raw, str(tmp_path / "d"), str(tmp_path / "m"))
    assert n == 100
    silver = spark.read.parquet(str(tmp_path / "d"))
    parsed = silver.filter(F.col("delay_s").isNotNull()).count()
    assert parsed == 90  # 10% unparseable by construction → NULL, not error


def test_scrape_contract_rejects_bad_batch(spark):
    import pandas as pd

    from mobility_etl_spark.sources.scrape import to_spark_batch

    with pytest.raises(ValueError, match="missing columns"):
        to_spark_batch(spark, pd.DataFrame({"vehicle_no": ["x"]}))


def test_orchestration_importable_without_airflow():
    from mobility_etl_spark.orchestration import dags

    assert dags.HAS_AIRFLOW is False  # container has no airflow
    # DAG factories are inert plain functions under the no-airflow gate
    assert callable(dags.warsaw_gtfs_spark)


# --------------------------------------------------------------------------
# incremental read + compaction (SURVEY §4 API-layer optimizations)
# --------------------------------------------------------------------------


def test_read_incremental_skips_processed(spark, tmp_path, sf_dir):
    from mobility_etl_spark.io import load_table, read_incremental
    from mobility_etl_spark.sources.manifest import record_ingest, with_content_hash

    landing = str(tmp_path / "landing")
    man = str(tmp_path / "man")
    ev = load_table(spark, sf_dir, "events").limit(0)  # schema only
    first = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    first.write.mode("overwrite").parquet(landing)
    del ev

    batch1 = read_incremental(spark, landing, man, "ev", ("event_id",))
    assert batch1.count() == first.count()
    record_ingest(
        spark, man, "ev",
        with_content_hash(first, ("event_id",)).select(
            F.col("event_id").cast("string").alias("object_key"),
            "content_sha256",
        ),
    )
    # second arrival appends new rows; incremental read sees ONLY them
    second = load_table(spark, sf_dir, "events").filter(
        F.col("event_id").between(500, 699)
    )
    second.write.mode("append").parquet(landing)
    batch2 = read_incremental(spark, landing, man, "ev", ("event_id",))
    assert batch2.count() == second.count()
    assert batch2.filter(F.col("event_id") < 500).count() == 0


@pytest.mark.slow  # r15: excluded from the default (driver-budget) run; see pytest.ini
def test_compact_partitions_reduces_files(spark, tmp_path, sf_dir):
    import pathlib

    from mobility_etl_spark.io import compact_partitions, load_table

    path = str(tmp_path / "lake")
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("dt", F.to_date("ts"))
        .withColumn("hour", F.hour("ts"))
    )
    # simulate 6 micro-batch appends → many small files per partition
    for i in range(6):
        ev.filter(F.col("event_id") % 6 == i).write.partitionBy(
            "dt", "hour"
        ).mode("append").parquet(path)
    before = sum(1 for _ in pathlib.Path(path).rglob("*.parquet"))
    n_rows = spark.read.parquet(path).count()
    after = compact_partitions(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert after < before
    assert spark.read.parquet(path).count() == n_rows  # lossless


def test_compact_partitions_is_partition_scoped(spark, tmp_path, sf_dir):
    """Compaction must touch ONLY partitions with small-file debt:
    healthy partitions stay byte-identical (same file names, same
    bytes), and the per-partition rewrite plans with no Exchange —
    at 100 TB the cost is the debt, never a whole-table shuffle."""
    import hashlib
    import pathlib

    from mobility_etl_spark.io import compact_partitions, load_table

    path = str(tmp_path / "lake")
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("dt", F.to_date("ts"))
        .withColumn("hour", F.hour("ts"))
    )
    hours = [r.hour for r in ev.select("hour").distinct().collect()]
    healthy_hour, fat_hour = sorted(hours)[0], sorted(hours)[1]
    # healthy partition: one file; fat partition: 6 micro-batch files
    ev.filter(F.col("hour") == healthy_hour).coalesce(1).write.partitionBy(
        "dt", "hour"
    ).mode("append").parquet(path)
    for i in range(6):
        ev.filter(
            (F.col("hour") == fat_hour) & (F.col("event_id") % 6 == i)
        ).write.partitionBy("dt", "hour").mode("append").parquet(path)

    def snapshot(hour):
        return {
            str(f.relative_to(path)): hashlib.md5(f.read_bytes()).hexdigest()
            for f in pathlib.Path(path).rglob("*.parquet")
            if f"hour={hour}" in str(f)
        }

    healthy_before = snapshot(healthy_hour)
    fat_before = snapshot(fat_hour)
    n_rows = spark.read.parquet(path).count()
    compact_partitions(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert snapshot(healthy_hour) == healthy_before  # byte-stable
    fat_files = snapshot(fat_hour)
    # every fat (dt, hour) leaf collapses from 6 small files to 1
    assert len(fat_files) < len(fat_before)
    leaves_after = {str(pathlib.Path(p).parent) for p in fat_files}
    assert len(fat_files) == len(leaves_after)
    assert spark.read.parquet(path).count() == n_rows  # lossless
    # the per-partition rewrite shape: read one leaf + coalesce → no Exchange
    leaf = next(
        f.parent
        for f in pathlib.Path(path).rglob("*.parquet")
        if f"hour={fat_hour}" in str(f)
    )
    plan = (
        spark.read.parquet(str(leaf))
        .coalesce(1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_compact_crash_recovery_files_mode(spark, tmp_path, sf_dir):
    """A crash ANYWHERE in the unpartitioned swap window (after the
    intent marker, mid trash-move, mid staged-rename) must self-heal
    on the next compact_partitions run: originals restored from
    .compaction_trash, partial staged renames dropped, then the rerun
    compacts normally — no manual restore, no silent under-report
    (ADVICE r11, io.py intent protocol)."""
    import json
    import pathlib
    import shutil

    from mobility_etl_spark.io import compact_partitions, load_table

    path = tmp_path / "flat"
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    for i in range(6):
        ev.filter(F.col("event_id") % 6 == i).write.mode("append").parquet(
            str(path)
        )
    n_rows = spark.read.parquet(str(path)).count()
    files = sorted(
        f.name for f in path.glob("*.parquet")
    )
    # simulate the crash state: intent published, 4 of 6 originals
    # already in trash, one staged output partially renamed in (a
    # duplicate of trashed data)
    token = "deadbeef0000"
    trash = path / ".compaction_trash"
    trash.mkdir()
    for name in files[:4]:
        (path / name).rename(trash / f"{token}-{name}")
    shutil.copy(trash / f"{token}-{files[0]}",
                path / f"compacted-{token}-00000.parquet")
    intent_dir = path / ".compaction_intent"
    intent_dir.mkdir()
    (intent_dir / f"{token}.json").write_text(json.dumps({
        "mode": "files",
        "originals": files,
        "staged": [f"compacted-{token}-{i:05d}.parquet" for i in range(2)],
    }))
    # mid-crash the live table under-reports
    assert spark.read.parquet(str(path)).count() < n_rows
    after = compact_partitions(
        spark, str(path), target_file_bytes=64 * 1024 * 1024
    )
    assert spark.read.parquet(str(path)).count() == n_rows  # healed
    assert after < 6  # and the rerun actually compacted
    assert not (path / ".compaction_intent" / f"{token}.json").exists()
    assert not list(pathlib.Path(path).glob(".compaction_trash/*"))


@pytest.mark.slow  # r15: excluded from the default (driver-budget) run; see pytest.ini
def test_compact_crash_recovery_dir_mode(spark, tmp_path, sf_dir):
    """Partitioned swap crash between leaf→trash and stage→leaf: the
    partition is MISSING from the live table until recovery. If the
    staged output survived the swap completes (roll-forward); here
    the stage is gone too, so recovery rolls back from trash."""
    import json

    from mobility_etl_spark.io import compact_partitions, load_table

    path = tmp_path / "lake"
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("dt", F.to_date("ts"))
        .withColumn("hour", F.hour("ts"))
    )
    for i in range(4):
        ev.filter(F.col("event_id") % 4 == i).write.partitionBy(
            "dt", "hour"
        ).mode("append").parquet(str(path))
    n_rows = spark.read.parquet(str(path)).count()
    leaf = next(d for d in path.rglob("hour=*") if d.is_dir())
    rel = leaf.relative_to(path)
    token = "cafebabe0000"
    aside = path / ".compaction_trash" / rel / token
    aside.parent.mkdir(parents=True)
    leaf.rename(aside)
    intent_dir = path / ".compaction_intent"
    intent_dir.mkdir()
    (intent_dir / f"{token}.json").write_text(
        json.dumps({"mode": "dir", "leaf": str(rel)})
    )
    assert spark.read.parquet(str(path)).count() < n_rows
    compact_partitions(spark, str(path), target_file_bytes=64 * 1024 * 1024)
    assert spark.read.parquet(str(path)).count() == n_rows  # healed


def test_concurrent_compactors_serialize_per_table(spark, tmp_path, sf_dir):
    """r13: compact_partitions runs are serialized by a per-table
    lockfile — two LIVE compactors swapping the same leaf would rename
    each other's originals mid-swap (the intent markers make such
    wrecks recoverable; the lock makes them not happen). Drill: 4
    threads compact the same small-file table concurrently; every call
    returns, rows are exact, no markers/trash/lock remain."""
    from concurrent.futures import ThreadPoolExecutor

    from mobility_etl_spark.io import compact_partitions, load_table

    path = tmp_path / "t"
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    for i in range(8):
        ev.filter(F.col("event_id") % 8 == i).write.mode("append").parquet(
            str(path)
        )
    n_rows = spark.read.parquet(str(path)).count()

    with ThreadPoolExecutor(max_workers=4) as pool:
        counts = list(
            pool.map(
                lambda _: compact_partitions(
                    spark, str(path), target_file_bytes=1 << 30
                ),
                range(4),
            )
        )
    assert all(isinstance(c, int) for c in counts)
    assert spark.read.parquet(str(path)).count() == n_rows
    assert min(counts) < 8  # at least one run actually compacted
    assert not (path / ".compaction.lock").exists()
    assert not list((path / ".compaction_intent").glob("*.json")) or not (
        path / ".compaction_intent"
    ).exists()
    assert not (path / ".compaction_trash").exists()


def test_compact_recovery_liveness_tiers(tmp_path):
    """ADVICE r12 (io.py PID-reuse): marker liveness is decided in
    tiers — (1) a marker older than the staleness window is recovered
    even when its PID is alive (PID reuse must not pin a partition
    mid-swap forever); (2) a same-PID marker is live only while its
    token is in this process's active registry (another THREAD
    mid-swap), so an exception-aborted earlier call in this process
    self-heals; (3) a fresh foreign-PID marker with a live holder is
    left alone."""
    import json
    import os
    import time

    from mobility_etl_spark import io as mio

    root = tmp_path / "t"
    trash = root / ".compaction_trash"
    intent = root / mio._INTENT_DIR
    intent.mkdir(parents=True)
    trash.mkdir(parents=True)

    def plant(token, pid, ts, original="orig.parquet"):
        (trash / f"{token}-{original}").write_bytes(b"x")
        (intent / f"{token}.json").write_text(
            json.dumps(
                {
                    "mode": "files",
                    "originals": [original],
                    "staged": [],
                    "pid": pid,
                    "ts": ts,
                }
            )
        )

    now = time.time()
    # tier 1: PID 1 is alive (and kill(1,0) succeeds as root) but the
    # marker is past the staleness window → recovered anyway
    plant("aaaa", pid=1, ts=now - mio._INTENT_STALE_S - 5, original="a.parquet")
    # tier 2a: our own PID, token NOT in the registry (aborted earlier
    # call in this same process) → recovered
    plant("bbbb", pid=os.getpid(), ts=now, original="b.parquet")
    # tier 2b: our own PID, token IS registered (live sibling thread)
    # → skipped untouched
    plant("cccc", pid=os.getpid(), ts=now, original="c.parquet")
    with mio._intent_lock():
        mio._INTENT_ACTIVE.add("cccc")
    # tier 3: fresh marker held by live foreign PID 1 → skipped
    plant("dddd", pid=1, ts=now, original="d.parquet")
    try:
        mio._recover_compaction(root, root / ".compaction_tmp", trash)
    finally:
        with mio._intent_lock():
            mio._INTENT_ACTIVE.discard("cccc")
    assert (root / "a.parquet").exists()  # stale+alive-pid: recovered
    assert not (intent / "aaaa.json").exists()
    assert (root / "b.parquet").exists()  # same-pid aborted: recovered
    assert not (intent / "bbbb.json").exists()
    assert not (root / "c.parquet").exists()  # same-pid live: skipped
    assert (intent / "cccc.json").exists()
    assert not (root / "d.parquet").exists()  # foreign live: skipped
    assert (intent / "dddd.json").exists()


def test_compact_recovery_recycled_pid_and_missing_ts(tmp_path):
    """VERDICT r13 #5 + ADVICE r13: two more liveness tiers —
    (a) a fresh foreign marker whose pid is ALIVE but whose recorded
    ``pid_start`` mismatches /proc (a recycled PID: the real holder
    is dead) is recovered immediately, not pinned until staleness;
    (b) a marker WITHOUT a ts (pre-r13 writer) is not treated as
    infinitely stale — a live pre-upgrade holder keeps its in-flight
    swap through a mixed-version window, while a dead one is still
    recovered via the PID tier."""
    import json
    import time

    from mobility_etl_spark import io as mio
    from mobility_etl_spark.locks import proc_start

    root = tmp_path / "t"
    trash = root / ".compaction_trash"
    intent = root / mio._INTENT_DIR
    intent.mkdir(parents=True)
    trash.mkdir(parents=True)

    def plant(token, original, **fields):
        (trash / f"{token}-{original}").write_bytes(b"x")
        (intent / f"{token}.json").write_text(
            json.dumps(
                {"mode": "files", "originals": [original], "staged": []}
                | fields
            )
        )

    now = time.time()
    # (a) recycled pid: PID 1 is alive but the recorded starttime is
    # a fabrication → provably not the holder → recovered while fresh
    plant("aaaa", "a.parquet", pid=1, pid_start="999999999", ts=now)
    # (a') genuine live holder: PID 1 with ITS OWN starttime → skipped
    plant("bbbb", "b.parquet", pid=1, pid_start=proc_start(1), ts=now)
    # (b) no ts, live pre-upgrade holder (PID 1, no pid_start either)
    # → skipped, NOT recovered as infinitely-stale
    plant("cccc", "c.parquet", pid=1)
    # (b') no ts, dead holder → recovered via the PID tier
    plant("dddd", "d.parquet", pid=2**22 + 11)
    mio._recover_compaction(root, root / ".compaction_tmp", trash)
    assert (root / "a.parquet").exists()  # recycled pid: recovered
    assert not (intent / "aaaa.json").exists()
    assert not (root / "b.parquet").exists()  # live holder: skipped
    assert (intent / "bbbb.json").exists()
    assert not (root / "c.parquet").exists()  # ts-less live: skipped
    assert (intent / "cccc.json").exists()
    assert (root / "d.parquet").exists()  # ts-less dead: recovered
    assert not (intent / "dddd.json").exists()


def test_compact_recovery_reclaims_staged_output(tmp_path):
    """ADVICE r13: recovery must delete the crashed swap's token-
    scoped stage dir once originals are restored — otherwise every
    crashed swap leaves a full compacted copy under .compaction_tmp
    forever. A legacy dir-mode marker with NO recorded stage path
    must leave the shared fallback dir untouched (it may hold an
    unrelated in-flight stage)."""
    import json

    from mobility_etl_spark import io as mio

    root = tmp_path / "t"
    stage_root = root / ".compaction_tmp"
    trash = root / ".compaction_trash"
    intent = root / mio._INTENT_DIR
    intent.mkdir(parents=True)
    trash.mkdir(parents=True)

    # files-mode crashed swap: stage dir holds the compacted output
    (stage_root / "tok1").mkdir(parents=True)
    (stage_root / "tok1" / "part-0.parquet").write_bytes(b"y")
    (trash / "tok1-orig.parquet").write_bytes(b"x")
    (intent / "tok1.json").write_text(
        json.dumps(
            {"mode": "files", "originals": ["orig.parquet"], "staged": []}
        )
    )
    # dir-mode crashed swap (r13+ marker records its stage)
    (stage_root / "tok2" / "dt=1").mkdir(parents=True)
    (stage_root / "tok2" / "dt=1" / "part-0.parquet").write_bytes(b"y")
    (root / "dt=1").mkdir()
    (root / "dt=1" / "part-0.parquet").write_bytes(b"x")
    (intent / "tok2.json").write_text(
        json.dumps(
            {"mode": "dir", "leaf": "dt=1", "stage": ".compaction_tmp/tok2/dt=1"}
        )
    )
    # legacy dir-mode marker: no recorded stage; the shared fallback
    # path holds what could be ANOTHER swap's in-flight stage
    (stage_root / "dt=2").mkdir(parents=True)
    (stage_root / "dt=2" / "part-0.parquet").write_bytes(b"z")
    (root / "dt=2").mkdir()
    (root / "dt=2" / "part-0.parquet").write_bytes(b"x")
    (intent / "tok3.json").write_text(
        json.dumps({"mode": "dir", "leaf": "dt=2"})
    )
    mio._recover_compaction(root, stage_root, trash)
    assert (root / "orig.parquet").exists()
    assert not (stage_root / "tok1").exists()  # files stage reclaimed
    assert (root / "dt=1" / "part-0.parquet").read_bytes() == b"x"
    assert not (stage_root / "tok2").exists()  # dir stage reclaimed
    assert (stage_root / "dt=2" / "part-0.parquet").exists()  # legacy kept
    assert not list(intent.glob("*.json"))


def test_lock_recycled_pid_steals_fast(tmp_path):
    """VERDICT r13 #5: a lockfile whose recorded pid is ALIVE but
    whose starttime token mismatches /proc (PID reuse — the real
    holder is dead) is stolen on the dead-holder fast path, without
    waiting out the staleness window. A bare-pid legacy payload with
    a live pid still waits (kill-only degradation), and our own
    payload round-trips through read→liveness as alive."""
    import os
    import time

    from mobility_etl_spark import locks

    # holder_payload round-trip: written identity reads back alive
    lock = str(tmp_path / "a.lock")
    with open(lock, "wb") as fh:
        fh.write(locks.holder_payload())
    assert locks._pid_dead(*locks._read_holder(lock)) is False

    # recycled pid: alive PID 1 + fabricated starttime → fast steal
    lock2 = str(tmp_path / "b.lock")
    with open(lock2, "wb") as fh:
        fh.write(b"1:999999999")
    t0 = time.monotonic()
    fd = locks.acquire_exclusive_lock(lock2, stale_s=300.0)
    assert time.monotonic() - t0 < 30.0  # window not waited out
    locks.release_exclusive_lock(lock2, fd)
    assert not os.path.exists(lock2)

    # legacy bare-pid payload, genuinely live holder: NOT stealable
    lock3 = str(tmp_path / "c.lock")
    with open(lock3, "wb") as fh:
        fh.write(b"1")
    assert locks._pid_dead(*locks._read_holder(lock3)) is False
    # and the full identity of live PID 1 is also not stealable
    lock4 = str(tmp_path / "d.lock")
    with open(lock4, "wb") as fh:
        fh.write(f"1:{locks.proc_start(1)}".encode())
    assert locks._pid_dead(*locks._read_holder(lock4)) is False


def test_compact_aborts_before_intent_when_lock_stolen_after_write(
    spark, tmp_path, sf_dir
):
    """ADVICE r13 (medium): the Spark rewrite is the one step that
    can stall past the staleness window, so ownership is re-verified
    AFTER the write and BEFORE _publish_intent — a zombie run whose
    lock was stolen mid-write must abort with the table untouched
    and no intent marker published, instead of racing the stealer's
    renames. Driven by making the post-write heartbeat observe a
    stolen lock (the lockfile is re-created with a different inode
    mid-run via the heartbeat seam on locks.heartbeat_lock)."""
    import os

    import pytest

    from mobility_etl_spark import locks
    from mobility_etl_spark.io import compact_partitions, load_table

    path = tmp_path / "flat"
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    for i in range(4):
        ev.filter(F.col("event_id") % 4 == i).write.mode("append").parquet(
            str(path)
        )
    n_rows = spark.read.parquet(str(path)).count()
    files = sorted(f.name for f in path.glob("*.parquet"))

    real_heartbeat = locks.heartbeat_lock
    calls = {"n": 0}

    def stealing_heartbeat(lock, fd):
        calls["n"] += 1
        if calls["n"] == 2:
            # simulate the steal landing during the rewrite: replace
            # the lockfile (new inode) so the post-write verify —
            # call #2 for the first leaf — sees a foreign lock; the
            # REAL heartbeat below then raises and compact aborts
            os.unlink(lock)
            with open(lock, "w") as fh:
                fh.write("1")
        real_heartbeat(lock, fd)

    locks.heartbeat_lock = stealing_heartbeat
    try:
        with pytest.raises(TimeoutError):
            compact_partitions(
                spark, str(path), target_file_bytes=1 << 30
            )
    finally:
        locks.heartbeat_lock = real_heartbeat
    assert calls["n"] == 2, "no post-write ownership re-verify ran"
    # nothing mutated: all originals in place, no intent marker
    assert sorted(f.name for f in path.glob("*.parquet")) == files
    assert spark.read.parquet(str(path)).count() == n_rows
    intent_dir = path / ".compaction_intent"
    assert not intent_dir.exists() or not list(intent_dir.glob("*.json"))
    (path / ".compaction.lock").unlink(missing_ok=True)


def test_lock_crashed_holder_releases_instantly(tmp_path):
    """r14 flock protocol: a CRASHED holder's lock costs waiters
    nothing — the kernel drops its flock on process death, so the
    next acquire succeeds immediately instead of waiting out the
    staleness window (the PID-reuse hazard VERDICT r13 #5 flagged is
    gone with the PID itself)."""
    import os
    import subprocess
    import sys
    import time

    from mobility_etl_spark import locks

    lock = str(tmp_path / "t.lock")
    # a real separate PROCESS acquires and dies holding the flock
    child = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, %r); "
            "from mobility_etl_spark import locks; "
            "locks.acquire_exclusive_lock(%r); "
            "import os; os._exit(9)" % ("/root/repo", lock),
        ],
        timeout=60,
    )
    assert child.returncode == 9
    assert os.path.exists(lock)  # the corpse's lockfile remains
    t0 = time.monotonic()
    fd = locks.acquire_exclusive_lock(lock, stale_s=300.0)
    assert time.monotonic() - t0 < 30.0  # no staleness wait
    locks.release_exclusive_lock(lock, fd)
    assert not os.path.exists(lock)


def test_lock_wedged_holder_is_broken_and_detected(tmp_path):
    """r14 flock protocol: a WEDGED-alive holder (flock held, no
    heartbeat past the staleness window) is broken by a waiter; the
    zombie's next heartbeat_lock raises so it aborts before further
    mutation, and its release is a no-op that leaves the new
    holder's lock intact."""
    import os
    import pytest
    import time

    from mobility_etl_spark import locks

    lock = str(tmp_path / "t.lock")
    fd_wedged = locks.acquire_exclusive_lock(lock, stale_s=1.0)
    # simulate the wedge: the holder stops heartbeating and its
    # mtime ages past the window
    old = time.time() - 3600
    os.utime(lock, (old, old))
    t0 = time.monotonic()
    fd_new = locks.acquire_exclusive_lock(lock, stale_s=1.0)
    assert time.monotonic() - t0 < 30.0
    # the zombie resumes: pre-mutation verify must abort it
    with pytest.raises(TimeoutError):
        locks.heartbeat_lock(lock, fd_wedged)
    locks.release_exclusive_lock(lock, fd_wedged)  # no-op: not ours
    assert os.path.exists(lock), "zombie release deleted the new lock"
    locks.heartbeat_lock(lock, fd_new)  # new holder unaffected
    locks.release_exclusive_lock(lock, fd_new)
    assert not os.path.exists(lock)
    assert not [
        f for f in os.listdir(tmp_path) if ".lock.steal-" in f
    ], "break artifacts leaked"


def test_lock_break_grace_spares_live_holder(tmp_path):
    """r14 flock protocol: the break path's double-stat grace — a
    holder that stamps/heartbeats between a waiter's staleness
    observation and the break attempt is NOT robbed (the re-stat
    sees a changed mtime and backs off)."""
    import os
    import time

    from mobility_etl_spark import locks

    lock = str(tmp_path / "t.lock")
    fd = locks.acquire_exclusive_lock(lock)
    stale = os.stat(lock)

    class Observed:
        st_ino = stale.st_ino
        st_mtime = time.time() - 3600  # what a lagging waiter saw

    # the holder heartbeats before the break lands
    locks.heartbeat_lock(lock, fd)
    locks._break_wedged(lock, Observed, stale_s=60.0)
    assert os.stat(lock).st_ino == stale.st_ino, "live holder robbed"
    locks.heartbeat_lock(lock, fd)  # still ours
    locks.release_exclusive_lock(lock, fd)


def test_check_constraints_valid_plus_violations_partition(spark):
    """operators/quality.py: valid ∪ violating == input; a row failing
    two rules appears twice in the long-form violations."""
    import pyspark.sql.functions as F

    from mobility_etl_spark.operators.quality import check_constraints

    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -5.0, "ok"), (3, -1.0, None), (4, 3.0, None)],
        "id int, amount double, status string",
    )
    valid, violations = check_constraints(
        df,
        {
            "amount_positive": F.col("amount") > 0,
            "status_present": F.col("status").isNotNull(),
        },
        key_cols=["id"],
    )
    assert sorted(r.id for r in valid.collect()) == [1]
    got = sorted((r.id, r.constraint) for r in violations.collect())
    assert got == [
        (2, "amount_positive"),
        (3, "amount_positive"),
        (3, "status_present"),
        (4, "status_present"),
    ]


def test_incremental_rollup_merge_equals_full(spark):
    """operators/rollup.py: merge(base, delta) == full recompute, and a
    second merge of an empty delta is a no-op (idempotent refresh)."""
    import pyspark.sql.functions as F

    from mobility_etl_spark.operators.rollup import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
    )

    df = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("b", 4.0), ("a", 3.0), ("b", 1.0)],
        "k string, v double",
    )
    base = partial_rollup(df.limit(3), ["k"], "v")
    delta = partial_rollup(df.subtract(df.limit(3)), ["k"], "v")
    merged = finalize_rollup(merge_rollups(base, delta, ["k"]))
    full = finalize_rollup(partial_rollup(df, ["k"], "v"))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    empty = partial_rollup(df.filter(F.lit(False)), ["k"], "v")
    again = finalize_rollup(merge_rollups(merge_rollups(base, delta, ["k"]), empty, ["k"]))
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, full.collect()))


def test_apply_cdc_last_writer_wins_and_delete(spark):
    """operators/merge.py: a reordered replayed feed — the max-seq
    change wins regardless of arrival order; deletes drop the key;
    inserts to unseen keys land; untouched rows survive verbatim."""
    from mobility_etl_spark.operators.merge import apply_cdc

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
    )
    # arrival order deliberately scrambled vs seq
    changes = spark.createDataFrame(
        [
            (2, "b2", 5, "U"),   # final state for 2
            (2, "b1", 1, "U"),   # stale, must lose
            (3, "c", 2, "D"),    # delete 3
            (4, "d", 1, "I"),    # insert new key
            (9, "x", 1, "D"),    # delete of a key target never had: no-op
        ],
        "id int, v string, seq int, op string",
    )
    got = sorted(map(tuple, apply_cdc(target, changes, ["id"], "seq").collect()))
    assert got == [(1, "a"), (2, "b2"), (4, "d")]


def test_gap_fill_forward_leading_and_interior_gaps(spark):
    """operators/timeseries.py: interior gaps carry the last true
    value and are flagged; leading gaps stay NULL; observed rows pass
    through untouched."""
    import datetime as dt

    from mobility_etl_spark.operators.timeseries import gap_fill_forward

    d = lambda day: dt.date(2024, 1, day)
    spine = spark.createDataFrame(
        [("a", d(1)), ("a", d(2)), ("a", d(3)), ("b", d(1)), ("b", d(2)), ("b", d(3))],
        "k string, d date",
    )
    observed = spark.createDataFrame(
        [("a", d(1), 1.0), ("a", d(3), 3.0), ("b", d(2), 2.0)],
        "k string, d date, v double",
    )
    got = {
        (r.k, r.d.day): (r.v, r.is_gap)
        for r in gap_fill_forward(observed, "k", "d", ["v"], spine).collect()
    }
    assert got == {
        ("a", 1): (1.0, False),
        ("a", 2): (1.0, True),   # interior gap: carried forward
        ("a", 3): (3.0, False),
        ("b", 1): (None, True),  # leading gap: nothing true to carry
        ("b", 2): (2.0, False),
        ("b", 3): (2.0, True),
    }


def test_observe_constraints_free_metrics(spark, tmp_path):
    """operators/quality.py:observe_constraints — violation counts
    arrive from the SAME action that consumed the data (here a parquet
    write), no second scan."""
    import pyspark.sql.functions as F

    from mobility_etl_spark.operators.quality import observe_constraints

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, -1.0), (4, 0.0)], "id int, amount double"
    )
    observed, obs = observe_constraints(
        df, {"amount_positive": F.col("amount") > 0}
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert obs.get == {"rows": 4, "viol_amount_positive": 3}
    assert spark.read.parquet(str(tmp_path / "out")).count() == 4


def test_lake_url_schemes():
    """Object-store URL fidelity: the reference's Azure blob layout
    (dags/warsaw-gtfs.py:27,65,96) maps to abfss URLs; s3a/gs/file
    cover the other lakes the same read/write API must accept."""
    from mobility_etl_spark.io import lake_url

    assert (
        lake_url("abfss", "lake", "wawmob", "gtfs/dt=2024-01-01")
        == "abfss://lake@wawmob.dfs.core.windows.net/gtfs/dt=2024-01-01"
    )
    assert lake_url("s3a", "lake", "ignored", "/gtfs") == "s3a://lake/gtfs"
    assert lake_url("gs", "lake", "x") == "gs://lake/"
    assert lake_url("file", "c", "a", "/tmp/x") == "file:///tmp/x"
    with pytest.raises(ValueError):
        lake_url("wasb", "lake", "acct")


def test_object_store_conf_and_apply(spark):
    """Config-only cloud binding: the produced keys are the public
    hadoop-azure/hadoop-aws ones, credentials never land in URLs, and
    apply_object_store_conf sets them on the LIVE session's Hadoop conf
    (FS keys are instantiation-time, not startup-frozen)."""
    from mobility_etl_spark.io import apply_object_store_conf, object_store_conf

    host = "wawmob.dfs.core.windows.net"
    keyed = object_store_conf("abfss", "wawmob", access_key="sekrit")
    assert keyed[f"fs.azure.account.auth.type.{host}"] == "SharedKey"
    assert keyed[f"fs.azure.account.key.{host}"] == "sekrit"
    ambient = object_store_conf("abfss", "wawmob")
    # OAuth must name a provider class or the ABFS connector cannot
    # initialize — ambient identity on Azure compute = MSI
    assert ambient == {
        f"fs.azure.account.auth.type.{host}": "OAuth",
        f"fs.azure.account.oauth.provider.type.{host}": (
            "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider"
        ),
    }
    s3 = object_store_conf("s3a", access_key="AKID:wont-tell")
    assert s3 == {"fs.s3a.access.key": "AKID", "fs.s3a.secret.key": "wont-tell"}
    with pytest.raises(ValueError):
        object_store_conf("abfss")  # account is mandatory

    apply_object_store_conf(spark, keyed)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get(f"fs.azure.account.key.{host}") == "sekrit"


def test_ledger_sink_two_phase_commit(spark, tmp_path):
    """Python DataSource WRITER (Spark 4): tasks stage jsonl parts,
    the driver publishes an atomic _LEDGER manifest naming exactly the
    staged files; total row count survives the round trip."""
    import json
    import os

    from mobility_etl_spark.sources.pydatasource import LedgerSinkDataSource

    spark.dataSource.register(LedgerSinkDataSource)
    path = str(tmp_path / "ledger")
    df = spark.range(100).selectExpr("id", "id * 2 AS doubled").repartition(4)
    df.write.format("ledger_sink").option("path", path).mode("append").save()

    manifest = json.load(open(os.path.join(path, "_LEDGER")))
    assert manifest["n_rows"] == 100
    staged = sorted(
        f for f in os.listdir(path) if f.startswith("part-")
    )
    assert staged == manifest["files"]
    rows = []
    for f in staged:
        with open(os.path.join(path, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert all(r["doubled"] == 2 * r["id"] for r in rows)


def test_ledger_sink_append_merges_and_overwrite_replaces(spark, tmp_path):
    """Path reuse semantics (review finding): append MERGES the prior
    manifest; overwrite publishes only the new files and reclaims the
    old parts."""
    import json
    import os

    from mobility_etl_spark.sources.pydatasource import LedgerSinkDataSource

    spark.dataSource.register(LedgerSinkDataSource)
    path = str(tmp_path / "ledger2")

    def manifest():
        return json.load(open(os.path.join(path, "_LEDGER")))

    spark.range(10).write.format("ledger_sink").option("path", path).mode(
        "append"
    ).save()
    first = manifest()
    spark.range(5).write.format("ledger_sink").option("path", path).mode(
        "append"
    ).save()
    merged = manifest()
    assert merged["n_rows"] == 15
    assert set(first["files"]) <= set(merged["files"])

    spark.range(3).write.format("ledger_sink").option("path", path).mode(
        "overwrite"
    ).save()
    replaced = manifest()
    assert replaced["n_rows"] == 3
    assert not (set(replaced["files"]) & set(merged["files"]))
    # old committed parts are reclaimed; staged files == manifest files
    on_disk = {f for f in os.listdir(path) if f.startswith("part-")}
    assert on_disk == set(replaced["files"])


def test_ledger_lock_steal_is_single_winner(tmp_path):
    """ADVICE r11: a STALE ledger lock (crashed holder) must be stolen
    by exactly one waiter — the atomic-rename steal closes the
    stat-then-unlink TOCTOU where two waiters could both 'steal' and
    re-enter the read-modify-write concurrently. Drill: pre-plant a
    stale lock, race 8 threads committing one staged part each
    (driver-side commit logic is pure file ops — threads exercise the
    same interleavings as processes on one FS), assert every part
    survives in the manifest and the lock dir is clean."""
    import json
    import os
    import time
    from concurrent.futures import ThreadPoolExecutor

    from mobility_etl_spark.sources.pydatasource import (
        LedgerWriter,
        _LedgerCommit,
    )

    path = str(tmp_path)
    os.makedirs(path, exist_ok=True)
    # a crashed holder's lock, older than the 60 s staleness window
    lock = os.path.join(path, "_LEDGER.lock")
    with open(lock, "w"):
        pass
    os.utime(lock, (time.time() - 3600, time.time() - 3600))

    def commit_one(i):
        name = f"part-w{i}.jsonl"
        with open(os.path.join(path, name), "w") as fh:
            fh.write(json.dumps({"i": i}) + "\n")
        w = LedgerWriter({"path": path}, overwrite=False)
        w.commit([_LedgerCommit(name, 1)])
        return name

    with ThreadPoolExecutor(max_workers=8) as pool:
        names = list(pool.map(commit_one, range(8)))

    manifest = json.loads(
        open(os.path.join(path, "_LEDGER")).read()
    )
    assert sorted(manifest["files"]) == sorted(names)  # none lost
    assert manifest["n_rows"] == 8
    assert not os.path.exists(lock)
    assert not [
        f for f in os.listdir(path) if ".lock.steal-" in f
    ], "steal artifacts leaked"


_CHAOS_CHILD = r"""
import os, pathlib, sys
root, mode, point, repo = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
sys.path.insert(0, repo)
from mobility_etl_spark import io as mio
from mobility_etl_spark.session import get_spark

def boom():
    os.kill(os.getpid(), 9)  # SIGKILL: no finally, no atexit, no flush

real_publish, real_clear = mio._publish_intent, mio._clear_intent
if point == "pre_marker":
    mio._publish_intent = lambda *a, **k: boom()
elif point == "post_marker":
    def _p(*a, **k):
        real_publish(*a, **k); boom()
    mio._publish_intent = _p
elif point == "pre_clear":
    mio._clear_intent = lambda *a, **k: boom()
elif point == "post_clear":
    def _c(*a, **k):
        real_clear(*a, **k); boom()
    mio._clear_intent = _c
elif point.startswith("rename"):
    n_kill, state = int(point.split("-")[1]), {"n": 0}
    real_rename = pathlib.Path.rename
    def _r(self, target):
        out = real_rename(self, target)
        state["n"] += 1
        if state["n"] >= n_kill:
            boom()
        return out
    pathlib.Path.rename = _r
spark = get_spark(f"chaos-{mode}-{point}", master="local[2]",
                  shuffle_partitions=2)
mio.compact_partitions(spark, os.path.join(root, "t"),
                       target_file_bytes=1 << 30)
print("NO-KILL", flush=True)  # reachable only if the point never fired
"""


@pytest.mark.slow
def test_compact_sigkill_chaos_drill(spark, tmp_path):
    """VERDICT r13 #2: the cross-process drills race HEALTHY
    processes; this one `kill -9`s a real compactor child at every
    distinct point of the swap protocol — pre-marker, post-marker/
    pre-rename, mid-rename (files: half the originals in trash;
    dir: leaf moved aside, stage not yet renamed in), pre-clear,
    post-clear/pre-trash-cleanup — then runs one healing
    compact_partitions pass and a full read-back. Every table must
    read exactly its original rows, be compacted, and carry zero
    orphaned marker/stage/trash/lock artifacts (io.py swap protocol +
    _sweep_unreferenced; locks.py flock releases on SIGKILL)."""
    import pathlib
    import subprocess
    import sys

    from mobility_etl_spark.io import compact_partitions

    cases = [
        ("files", "pre_marker"),
        ("files", "post_marker"),
        ("files", "rename-2"),
        ("files", "pre_clear"),
        ("files", "post_clear"),
        ("dir", "post_marker"),
        ("dir", "rename-1"),
        ("dir", "post_clear"),
    ]
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    expected = {}
    for mode, point in cases:
        case_root = tmp_path / f"{mode}-{point}"
        t = case_root / "t"
        for i in range(4):
            df = spark.range(i * 10, i * 10 + 5)
            if mode == "dir":
                df = df.withColumn("dt", F.lit("2024-01-01"))
                df.write.partitionBy("dt").mode("append").parquet(str(t))
            else:
                df.write.mode("append").parquet(str(t))
        expected[(mode, point)] = sorted(
            r.id for r in spark.read.parquet(str(t)).collect()
        )

    procs = {
        (mode, point): subprocess.Popen(
            [
                sys.executable, "-c", _CHAOS_CHILD,
                str(tmp_path / f"{mode}-{point}"), mode, point, repo,
            ],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for mode, point in cases
    }
    for (mode, point), p in procs.items():
        out, _ = p.communicate(timeout=300)
        assert p.returncode == -9, (
            f"{mode}/{point}: child exited {p.returncode} ({out}) — "
            "the kill point never fired"
        )
        assert "NO-KILL" not in out

    for mode, point in cases:
        case_root = tmp_path / f"{mode}-{point}"
        t = case_root / "t"
        # healing pass: recovery + orphan sweep + normal compaction
        n_files = compact_partitions(
            spark, str(t), target_file_bytes=1 << 30
        )
        got = sorted(r.id for r in spark.read.parquet(str(t)).collect())
        assert got == expected[(mode, point)], f"{mode}/{point} rows"
        assert n_files == 1, f"{mode}/{point}: not compacted"
        # zero orphans of any kind
        intent = t / ".compaction_intent"
        assert not intent.exists() or not list(intent.glob("*.json")), (
            f"{mode}/{point}: marker leaked"
        )
        for hidden in (".compaction_tmp", ".compaction_trash"):
            hdir = t / hidden
            leftovers = list(hdir.rglob("*")) if hdir.exists() else []
            assert not leftovers, f"{mode}/{point}: {hidden} leaked: {leftovers}"
        assert not (t / ".compaction.lock").exists(), (
            f"{mode}/{point}: lockfile leaked"
        )
        assert not list(t.glob("*.steal-*")), f"{mode}/{point}: steal leaked"
