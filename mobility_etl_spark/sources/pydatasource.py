"""Custom Python DataSource (Spark 4 ``spark.dataSource.register``):
the IMGW weather feed as an engine-native source.

The reference fetches the IMGW synop endpoint with driver-side
``requests`` and lands the raw payload (dags/warsaw-weather.py:30-34).
SURVEY.md §2.A R1 judged a custom source "possible but overkill" for
one URL — but the *API shape* matters for engine completeness: a
source that (a) declares an explicit schema, (b) splits itself into
input partitions so the fetch parallelizes across executors, and
(c) yields typed rows, makes any HTTP/paginated feed a first-class
scan instead of a driver-side download.

The network fetch is STUBBED with a deterministic synthetic feed
(integer arithmetic only — exactly reproducible by the DuckDB oracle;
the container has no network). The real implementation would issue
the HTTP GET inside ``read()`` per partition (one page/station range
per partition), which is exactly where it would run on a cluster.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

WEATHER_SOURCE_NAME = "imgw_synop_fake"

WEATHER_SOURCE_SCHEMA = StructType(
    [
        StructField("station_id", IntegerType()),
        StructField("station", StringType()),
        StructField("obs_day", IntegerType()),
        StructField("obs_hour", IntegerType()),
        StructField("temp_c", DoubleType()),
        StructField("wind_kmh", DoubleType()),
        StructField("humidity_pct", DoubleType()),
    ]
)


def synth_observation(i: int, h: int) -> tuple:
    """One deterministic synthetic observation (station i, hour-slot h).

    Integer arithmetic with at most two trailing IEEE double ops per
    value — bit-identical in any engine (see functions/compat.py).
    """
    return (
        i,
        f"ST_{i:03d}",
        h // 24 + 1,
        h % 24,
        ((i * 7 + h * 3) % 350) / 10.0 - 5.0,
        float((i * 13 + h * 5) % 90),
        float((i * 11 + h * 7) % 101),
    )


class _StationRange(InputPartition):
    def __init__(self, start: int, end: int, hours: int):
        self.start, self.end, self.hours = start, end, hours


class FakeWeatherReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_stations = int(options.get("n_stations", 40))
        self.hours = int(options.get("hours", 24))
        self.n_partitions = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        """Split the station id space — each partition is one
        independent fetch unit, so the scan parallelizes like any
        other (this is the piece the reference's driver-side GET
        cannot do)."""
        step = max(1, -(-self.n_stations // self.n_partitions))
        return [
            _StationRange(lo, min(lo + step, self.n_stations), self.hours)
            for lo in range(0, self.n_stations, step)
        ]

    def read(self, partition: _StationRange) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            for h in range(partition.hours):
                yield synth_observation(i, h)


class FakeWeatherStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same feed (R1 as a *continuous* source):
    offsets are hour watermarks, each micro-batch covers
    ``hours_per_batch`` hour-slots, and the feed reports caught-up
    (same offset back) past the ``hours`` horizon — so
    ``processAllAvailable``/availableNow drain it exactly once.
    ``readBetweenOffsets`` replays any committed range
    deterministically, which is what makes the source exactly-once
    under checkpoint recovery (same synthetic rows for the same
    offsets — the property a real paginated HTTP feed provides via
    page cursors)."""

    def __init__(self, options: dict):
        self.n_stations = int(options.get("n_stations", 40))
        self.hours = int(options.get("hours", 24))
        self.hours_per_batch = int(options.get("hours_per_batch", 6))

    def initialOffset(self) -> dict:
        return {"hour": 0}

    def read(self, start: dict):
        h0 = int(start["hour"])
        if h0 >= self.hours:
            return iter(()), start
        h1 = min(h0 + self.hours_per_batch, self.hours)
        return iter(self._rows(h0, h1)), {"hour": h1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["hour"]), int(end["hour"])))

    def _rows(self, h0: int, h1: int) -> list[tuple]:
        # A concrete list (wrapped in ``iter``) — the simple-reader
        # prefetch cache pickles/copies the batch iterator, which a
        # generator cannot survive.
        return [
            synth_observation(i, h)
            for i in range(self.n_stations)
            for h in range(h0, h1)
        ]


class FakeWeatherDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return WEATHER_SOURCE_NAME

    def schema(self) -> StructType:
        return WEATHER_SOURCE_SCHEMA

    def reader(self, schema: StructType) -> FakeWeatherReader:
        return FakeWeatherReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> FakeWeatherStreamReader:
        return FakeWeatherStreamReader(self.options)


# ------------------------------------------------------------------ writer

LEDGER_SINK_NAME = "ledger_sink"


class _LedgerCommit(WriterCommitMessage):
    """Per-task commit message: the staged file this task produced."""

    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


def _stage_part(path: str, iterator: Iterator) -> _LedgerCommit:
    """Executor-side: stage one `part-<uuid>.jsonl` file (shared by the
    batch and streaming writers so fixes apply to both)."""
    import json
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    filename = f"part-{uuid.uuid4().hex}.jsonl"
    n = 0
    with open(os.path.join(path, filename), "w") as fh:
        for row in iterator:
            fh.write(json.dumps(row.asDict()) + "\n")
            n += 1
    return _LedgerCommit(filename, n)


def _unlink_parts(path: str, messages) -> None:
    import os

    for m in messages:
        if m is not None:
            try:
                os.unlink(os.path.join(path, m.filename))
            except FileNotFoundError:
                pass


def _publish_manifest(path: str, name: str, manifest: dict) -> None:
    import json
    import os

    tmp = os.path.join(path, f".{name}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(path, name))  # atomic publish


# The lockfile protocol lives in mobility_etl_spark/locks.py (one
# spelling shared with io.py's compaction serialization — r13 review);
# these names remain the ledger sink's local spelling of it.
from mobility_etl_spark.locks import (  # noqa: E402
    acquire_exclusive_lock as _acquire_ledger_lock,
)
from mobility_etl_spark.locks import heartbeat_lock as _verify_ledger_lock  # noqa: E402
from mobility_etl_spark.locks import (  # noqa: E402
    release_exclusive_lock as _release_ledger_lock,
)


class LedgerWriter(DataSourceWriter):
    """Two-phase-commit JSON-lines sink (Spark 4 Python DataSource
    writer API) — the engine-native form of the reference's
    fan-out-upload edge (dags/warsaw-gtfs.py upload tasks): tasks
    stage `part-<uuid>.jsonl` files and return commit messages; the
    driver's ``commit`` atomically publishes a `_LEDGER` manifest
    listing the committed files (readers that honor the manifest never
    observe a torn write); ``abort`` removes staged files. Save-mode
    semantics on path reuse: append MERGES the prior manifest's files
    into the new one; overwrite publishes only the new files and
    unlinks the prior committed parts. The same stage-then-publish
    protocol as operators/snapshots.py, here exercised through Spark's
    own writer lifecycle."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path") or options["sink_path"]
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> _LedgerCommit:
        return _stage_part(self.path, iterator)

    def commit(self, messages) -> None:
        import json
        import os

        new_files = sorted(m.filename for m in messages if m is not None)
        n_rows = sum(m.n_rows for m in messages if m is not None)
        manifest_path = os.path.join(self.path, "_LEDGER")
        # The append path is a read-modify-write of one mutable file:
        # two concurrent committers that both read the same prior
        # ledger would each publish prior+own and the second rename
        # silently drops the first writer's files. Serialize with an
        # flock-held lockfile (mobility_etl_spark/locks.py). A
        # crashed holder cannot wedge the sink at all — the kernel
        # drops its flock on process death and the next waiter
        # acquires instantly; a WEDGED-alive holder (no heartbeat
        # past the staleness window) is broken by a verified rename
        # (see the locks module docstring).
        lock = manifest_path + ".lock"
        try:
            fd = _acquire_ledger_lock(lock)
        except TimeoutError as exc:
            raise TimeoutError(
                f"ledger commit: {exc} (a concurrent committer is "
                "wedged)"
            ) from None
        try:
            prior_files: list[str] = []
            prior_rows = 0
            if os.path.exists(manifest_path):
                with open(manifest_path) as fh:
                    prior = json.load(fh)
                prior_files = list(prior.get("files", []))
                prior_rows = int(prior.get("n_rows", 0))
            if self.overwrite:
                manifest = {"files": new_files, "n_rows": n_rows}
            else:
                manifest = {
                    "files": sorted(set(prior_files) | set(new_files)),
                    "n_rows": prior_rows + n_rows,
                }
            # re-verify ownership immediately before the mutation: a
            # commit that stalled past the staleness window has had
            # its lock broken, and publishing anyway would overwrite
            # the new holder's manifest (same pattern as the
            # compactor's post-write heartbeat, ADVICE r13)
            _verify_ledger_lock(lock, fd)
            _publish_manifest(self.path, "_LEDGER", manifest)
        finally:
            # (A stalled holder's own manifest write may still have
            # raced a stealer's — the staleness window is a liveness
            # escape hatch, sized far above any real commit duration,
            # not a correctness substitute.)
            _release_ledger_lock(lock, fd)
        if self.overwrite:
            # stale committed parts are invisible (not in the manifest)
            # the instant the rename lands; reclaim them afterwards
            for f in set(prior_files) - set(new_files):
                try:
                    os.unlink(os.path.join(self.path, f))
                except FileNotFoundError:
                    pass

    def abort(self, messages) -> None:
        _unlink_parts(self.path, messages)


class LedgerSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return LEDGER_SINK_NAME

    def writer(self, schema: StructType, overwrite: bool) -> LedgerWriter:
        return LedgerWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> LedgerStreamWriter:
        return LedgerStreamWriter(self.options)


class LedgerStreamWriter(DataSourceStreamWriter):
    """Streaming twin of :class:`LedgerWriter`: same staged-parts
    protocol, but ``commit`` is per-epoch — `_LEDGER.<batchId>`
    manifests accumulate, so a restarted query that REPLAYS an epoch
    overwrites that epoch's manifest idempotently instead of
    double-counting (the exactly-once contract the snapshot sink
    gates; here expressed through Spark's own streaming writer
    lifecycle). Readers take the union of manifests — epoch files not
    named by any manifest are invisible, so a mid-epoch crash leaves
    no torn output."""

    def __init__(self, options: dict):
        self.path = options.get("path") or options["sink_path"]

    def write(self, iterator: Iterator) -> "_LedgerCommit":
        return _stage_part(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        _publish_manifest(
            self.path,
            f"_LEDGER.{batchId}",
            {
                "batch": batchId,
                "files": sorted(m.filename for m in messages if m is not None),
                "n_rows": sum(m.n_rows for m in messages if m is not None),
            },
        )

    def abort(self, messages, batchId: int) -> None:
        _unlink_parts(self.path, messages)


# ------------------------------------- snapshot change-feed stream source

SNAPSHOT_CHANGES_SOURCE_NAME = "snapshot_changes"


def _arrow_to_spark_type(t):
    import pyarrow as pa
    from pyspark.sql import types as T

    if pa.types.is_int64(t):
        return T.LongType()
    if pa.types.is_int32(t):
        return T.IntegerType()
    if pa.types.is_float64(t):
        return T.DoubleType()
    if pa.types.is_float32(t):
        return T.FloatType()
    if pa.types.is_boolean(t):
        return T.BooleanType()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T.StringType()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return T.ArrayType(_arrow_to_spark_type(t.value_type))
    raise TypeError(f"snapshot_changes source: unmapped arrow type {t}")


class _SnapshotFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SnapshotChangeFeedStreamReader(DataSourceStreamReader):
    """The snapshot table AS A STREAMING SOURCE (Spark 4 Python
    DataSourceStreamReader): offsets are snapshot VERSIONS, each
    micro-batch is the change feed between two committed manifests,
    and each input partition is ONE newly-added data file — so the
    read is executor-parallel and exactly-once by construction (the
    file list between two versions is immutable once committed, the
    deterministic-replay property checkpoint recovery needs).

    ROW-APPEND CONTRACT: each micro-batch's partitions come from
    operators/snapshots.py:changed_files — the pure-append file diff
    or, across compactions, the op-typed lineage walk (r11), so the
    stream rides through content-preserving rewrites (a compaction
    contributes ZERO partitions — it adds no rows). Only an untyped /
    row-rewriting commit or a retention gap raises, telling the
    consumer to re-bootstrap from a full snapshot read. The
    snapshot-backed ledgers this engine streams (near-dup index,
    pretraining state) are all op-typed appends + compactions."""

    def __init__(self, options: dict, schema: StructType | None = None):
        self.table = options["path"]
        self.start_version = int(options.get("start_version", 0))
        # Spark maps yielded tuples onto the DECLARED schema
        # positionally, so rows must follow the resolved schema's
        # column order, not the parquet file's physical order — a
        # caller-supplied .schema() with reordered columns would
        # otherwise silently transpose values (ADVICE r10).
        self.columns = [f.name for f in schema] if schema else None

    def _versions(self) -> list[int]:
        from mobility_etl_spark.operators.snapshots import _list_versions

        return _list_versions(self.table)

    def _files(self, version: int) -> list[str]:
        if version == 0:
            return []
        import json as _json
        import pathlib as _pl

        mf = (
            _pl.Path(self.table)
            / "_snapshots"
            / f"v{version}.manifest.json"
        )
        try:
            return _json.loads(mf.read_text())["files"]
        except FileNotFoundError:
            raise ValueError(
                f"snapshot_changes source: retention expired for "
                f"offset v{version} (manifest vacuumed) — the consumer "
                "fell behind the table's keep_last horizon; "
                "re-bootstrap from a full snapshot read"
            ) from None

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        vs = self._versions()
        return {"version": vs[-1] if vs else self.start_version}

    def partitions(self, start: dict, end: dict):
        v0, v1 = int(start["version"]), int(end["version"])
        if v1 <= v0:
            return []
        import os as _os

        if v0 == 0:  # bootstrap: the whole first offset's snapshot
            new = self._files(v1)
        else:
            self._files(v0)  # surfaces the retention-expiry error
            from mobility_etl_spark.operators.snapshots import (
                changed_files,
            )

            new = changed_files(self.table, v0, v1)
            if new is None:
                raise ValueError(
                    f"snapshot_changes source: cannot resolve a "
                    f"file-level delta for v{v0}->v{v1} (an untyped or "
                    "row-rewriting commit, or a retention gap, crossed "
                    "the range; op-typed appends and compactions "
                    "stream fine) — re-bootstrap from a full snapshot "
                    "read"
                )
        return [
            _SnapshotFilePartition(_os.path.join(self.table, f))
            for f in new
        ]

    def read(self, partition: _SnapshotFilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        for batch in pq.ParquetFile(partition.path).iter_batches():
            if self.columns is not None:  # declared-schema order
                cols = [batch.column(name) for name in self.columns]
            else:
                cols = batch.columns
            yield from zip(*(c.to_pylist() for c in cols))

    def commit(self, end: dict) -> None:
        pass  # offsets are durable snapshot versions; nothing to ack

    def stop(self) -> None:
        pass


class SnapshotChangeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SNAPSHOT_CHANGES_SOURCE_NAME

    def schema(self) -> StructType:
        """Infer from the latest manifest's first data file footer —
        callers may also pass an explicit .schema() and skip this."""
        import json as _json
        import pathlib as _pl

        import pyarrow.parquet as pq

        table = self.options["path"]
        snapdir = _pl.Path(table) / "_snapshots"
        versions = sorted(
            int(p.name.split(".", 1)[0][1:])
            for p in snapdir.glob("v*.manifest.json")
        )
        if not versions:
            raise FileNotFoundError(
                f"snapshot_changes source: no committed snapshots at "
                f"{table} — commit one (or pass an explicit .schema()) "
                "before starting the stream"
            )
        files = _json.loads(
            (snapdir / f"v{versions[-1]}.manifest.json").read_text()
        )["files"]
        if not files:
            raise ValueError(
                f"snapshot_changes source: latest snapshot "
                f"v{versions[-1]} at {table} lists no data files — "
                "cannot infer a schema; pass an explicit .schema()"
            )
        sch = pq.ParquetFile(_pl.Path(table) / files[0]).schema_arrow
        return StructType(
            [
                StructField(f.name, _arrow_to_spark_type(f.type))
                for f in sch
            ]
        )

    def streamReader(self, schema: StructType):
        return SnapshotChangeFeedStreamReader(self.options, schema)
