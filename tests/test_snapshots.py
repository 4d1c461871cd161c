"""Manifest-commit snapshot layer gates (operators/snapshots.py):
time travel, reader-atomic compaction, vacuum safety."""

from __future__ import annotations

import pathlib
import tempfile

import pytest
from pyspark.sql import functions as F

from mobility_etl_spark.io import load_table
from mobility_etl_spark.operators.snapshots import (
    commit_snapshot,
    compact_snapshot,
    read_snapshot,
    snapshot_log,
    vacuum,
)


@pytest.fixture()
def table(spark, sf_dir):
    """A snapshot table: v1 = events id<500 (4 files), v2 = +500 more."""
    path = tempfile.mkdtemp(prefix="snaptbl_")
    ev = load_table(spark, sf_dir, "events")
    ev.filter(F.col("event_id") < 500).repartition(4).write.mode(
        "overwrite"
    ).parquet(path)
    v1 = commit_snapshot(spark, path, note="initial")
    ev.filter(
        (F.col("event_id") >= 500) & (F.col("event_id") < 1000)
    ).repartition(4).write.mode("append").parquet(path)
    v2 = commit_snapshot(spark, path, note="append")
    return path, v1, v2


def test_time_travel_counts(spark, table):
    path, v1, v2 = table
    assert read_snapshot(spark, path, v1).count() == 500
    assert read_snapshot(spark, path, v2).count() == 1000
    assert read_snapshot(spark, path).count() == 1000  # latest


def test_uncommitted_files_invisible(spark, sf_dir, table):
    path, v1, v2 = table
    load_table(spark, sf_dir, "events").filter(
        (F.col("event_id") >= 1000) | (F.col("event_id") % 2 == 0)
    ).write.mode("append").parquet(path)
    # no commit yet: both snapshots blind to the new files
    assert read_snapshot(spark, path, v2).count() == 1000
    v3 = commit_snapshot(spark, path)
    assert read_snapshot(spark, path, v3).count() > 1000


def test_compaction_is_reader_atomic(spark, table):
    path, v1, v2 = table
    before = read_snapshot(spark, path, v2)
    rows_before = sorted(r.event_id for r in before.select("event_id").collect())
    v3 = compact_snapshot(spark, path, target_file_bytes=1 << 30)
    # v3 is one file; v1/v2 still read their ORIGINAL files unchanged
    files_v3 = read_snapshot(spark, path, v3).inputFiles()
    assert len(files_v3) == 1
    assert read_snapshot(spark, path, v1).count() == 500
    rows_after = sorted(
        r.event_id
        for r in read_snapshot(spark, path, v3).select("event_id").collect()
    )
    assert rows_after == rows_before
    log = snapshot_log(path)
    assert [e["version"] for e in log] == [v1, v2, v3]


def test_vacuum_reclaims_only_unreferenced(spark, table):
    path, v1, v2 = table
    v3 = compact_snapshot(spark, path, target_file_bytes=1 << 30)
    deleted = vacuum(path, keep_last=1)
    assert deleted == 8  # the 8 pre-compaction files
    assert read_snapshot(spark, path, v3).count() == 1000
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, path, v1)
    # idempotent
    assert vacuum(path, keep_last=1) == 0


def test_vacuum_refuses_table_with_no_snapshots(spark, sf_dir):
    """ADVICE r03: vacuum before the first commit would have computed
    referenced=∅ and unlinked EVERY data file — it must refuse, and the
    data must survive."""
    path = tempfile.mkdtemp(prefix="snapraw_")
    load_table(spark, sf_dir, "events").limit(10).write.mode(
        "overwrite"
    ).parquet(path)
    n_files = len(list(pathlib.Path(path).glob("*.parquet")))
    assert n_files > 0
    with pytest.raises(FileNotFoundError):
        vacuum(path)
    assert len(list(pathlib.Path(path).glob("*.parquet"))) == n_files


def test_vacuum_rejects_nonpositive_keep_last(spark, table):
    path, v1, v2 = table
    with pytest.raises(ValueError):
        vacuum(path, keep_last=0)


def test_commit_is_put_if_absent(spark, table):
    """ADVICE r03: two committers racing to the same version must not
    both succeed with one commit lost. Simulate the race by
    pre-creating the manifest name a naive committer would claim: the
    commit must skip it and land at the NEXT version, never overwrite."""
    path, v1, v2 = table
    snapdir = pathlib.Path(path) / "_snapshots"
    # squat on v3 with a sentinel manifest (what a concurrent committer
    # that won the race would have written)
    sentinel = {"version": v2 + 1, "note": "winner", "files": [],
                "n_files": 0, "bytes": 0}
    import json as _json

    (snapdir / f"v{v2 + 1}.manifest.json").write_text(_json.dumps(sentinel))
    v_new = commit_snapshot(spark, path, note="loser-retries")
    assert v_new == v2 + 2  # retried past the squatted version
    # the squatted manifest is untouched
    kept = _json.loads((snapdir / f"v{v2 + 1}.manifest.json").read_text())
    assert kept["note"] == "winner"
    assert [e["version"] for e in snapshot_log(path)] == [
        v1, v2, v2 + 1, v2 + 2
    ]
    # no temp litter left behind
    assert not list(snapdir.glob(".tmp-*"))


def test_streaming_sink_exactly_once_under_replay(spark, sf_dir):
    """Crash/replay simulation for the exactly-once streaming sink:
    re-running the whole availableNow stream against the SAME table
    (fresh checkpoint = full replay of every batch) must not change
    the table's content — every batch id is recognized as committed
    and skipped."""
    import tempfile

    from pyspark.sql import functions as F

    from mobility_etl_spark.operators.snapshots import (
        read_snapshot,
        snapshot_log,
        streaming_snapshot_sink,
    )
    from mobility_etl_spark.streaming.jobs import events_file_stream

    landing = tempfile.mkdtemp(prefix="sinkland_")
    spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_id") < 500
    ).repartition(3).write.mode("overwrite").parquet(landing)
    table = tempfile.mkdtemp(prefix="sinktbl_")

    def run():
        stream = events_file_stream(
            spark, landing, options={"maxFilesPerTrigger": "1"}
        )
        with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
            streaming_snapshot_sink(stream, table, ckpt)

    run()
    first = read_snapshot(spark, table).count()
    log_first = snapshot_log(table)
    assert first == 500
    run()  # full replay with a fresh checkpoint: all batch ids known
    assert read_snapshot(spark, table).count() == 500
    assert snapshot_log(table) == log_first  # not even a new commit


def test_manifest_stats_prune_files_soundly(spark, sf_dir):
    """Manifest-level data skipping: a range-laid-out table committed
    with stats_cols must (a) plan a narrow range read over strictly
    fewer files, (b) return exactly the rows the unpruned read
    returns, (c) keep statless files (advisory semantics), and (d)
    yield a schema-stable empty frame when every file is pruned."""
    import tempfile

    from mobility_etl_spark.operators.snapshots import (
        commit_snapshot,
        read_snapshot,
    )

    path = tempfile.mkdtemp(prefix="snapstats_")
    ev = load_table(spark, sf_dir, "events")
    # range layout => disjoint per-file event_id spans (what zorder/
    # clustering produces); stats make the spans visible to the manifest
    ev.repartitionByRange(6, "event_id").write.mode("overwrite").parquet(path)
    v = commit_snapshot(spark, path, note="stats", stats_cols=("event_id",))

    full = read_snapshot(spark, path, v)
    n_files_full = len(full.inputFiles())
    assert n_files_full == 6

    lo, hi = 100, 300
    pruned = read_snapshot(spark, path, v, where=("event_id", lo, hi))
    assert 0 < len(pruned.inputFiles()) < n_files_full
    got = sorted(
        r.event_id
        for r in pruned.filter(F.col("event_id").between(lo, hi)).collect()
    )
    want = sorted(
        r.event_id
        for r in full.filter(F.col("event_id").between(lo, hi)).collect()
    )
    assert got == want and len(want) > 0

    # all files pruned -> empty, schema preserved
    nothing = read_snapshot(
        spark, path, v, where=("event_id", 10_000_000, 20_000_000)
    )
    assert nothing.count() == 0
    assert nothing.schema == full.schema

    # a column without committed stats never prunes
    unpruned = read_snapshot(spark, path, v, where=("user_id", 0, 1))
    assert len(unpruned.inputFiles()) == n_files_full


# ------------------------------------------------------------- catalog layer


def test_catalog_commit_binds_tables_atomically(spark, tmp_path):
    """A catalog version pins BOTH tables to the snapshots it was
    committed with: after a newer per-table snapshot lands WITHOUT a
    catalog commit, catalog readers still see the old consistent pair
    (no torn fact/dim read); binding the new pair in one catalog
    commit flips both together."""
    from mobility_etl_spark.operators.snapshots import (
        catalog_log,
        commit_catalog,
        commit_snapshot,
        read_catalog_table,
    )

    cat = str(tmp_path)
    facts = str(tmp_path / "facts")
    dims = str(tmp_path / "dims")
    spark.range(10).write.parquet(facts)
    f1 = commit_snapshot(spark, facts, note="facts day1")
    spark.createDataFrame([(0, "d1")], "k long, v string").write.parquet(dims)
    d1 = commit_snapshot(spark, dims, note="dims day1")
    cv1 = commit_catalog(cat, {"facts": (facts, f1), "dims": (dims, d1)})

    # day-2 facts land and snapshot, but the catalog is NOT committed
    spark.range(10, 25).write.mode("append").parquet(facts)
    f2 = commit_snapshot(spark, facts, note="facts day2")
    assert read_catalog_table(spark, cat, "facts").count() == 10
    assert read_catalog_table(spark, cat, "dims").collect()[0].v == "d1"

    # bind day-2 facts WITH the matching day-2 dims in one commit
    spark.createDataFrame(
        [(0, "d2")], "k long, v string"
    ).write.mode("append").parquet(dims)
    d2 = commit_snapshot(spark, dims, note="dims day2")
    cv2 = commit_catalog(cat, {"facts": (facts, f2), "dims": (dims, d2)})
    assert cv2 == cv1 + 1
    assert read_catalog_table(spark, cat, "facts").count() == 25
    # time travel: the old catalog version still reads the old pair
    assert (
        read_catalog_table(spark, cat, "facts", catalog_version=cv1).count()
        == 10
    )
    log = catalog_log(cat)
    assert [e["version"] for e in log] == [cv1, cv2]
    assert log[0]["tables"] == {"facts": f1, "dims": d1}


def test_catalog_commit_rejects_dangling_and_survives_races(spark, tmp_path):
    """A catalog commit referencing a snapshot that does not exist
    fails before staging anything; a lost put-if-absent race retries
    at the next version instead of overwriting the winner."""
    import json
    import pathlib

    import pytest

    from mobility_etl_spark.operators.snapshots import (
        commit_catalog,
        commit_snapshot,
        read_catalog_table,
    )

    cat = str(tmp_path)
    t = str(tmp_path / "t")
    spark.range(5).write.parquet(t)
    v1 = commit_snapshot(spark, t)

    with pytest.raises(FileNotFoundError):
        commit_catalog(cat, {"t": (t, v1 + 99)})

    cv1 = commit_catalog(cat, {"t": (t, v1)})
    # simulate a rival committer winning version cv1+1
    d = pathlib.Path(cat) / "_catalog"
    rival = {
        "version": cv1 + 1,
        "note": "rival",
        "tables": {"t": {"path": t, "version": v1}},
    }
    (d / f"v{cv1 + 1}.catalog.json").write_text(json.dumps(rival))
    cv_next = commit_catalog(cat, {"t": (t, v1)}, note="retried")
    assert cv_next == cv1 + 2  # did not clobber the rival
    assert (
        json.loads((d / f"v{cv1 + 1}.catalog.json").read_text())["note"]
        == "rival"
    )
    assert read_catalog_table(spark, cat, "t").count() == 5
    # a stale staged tmp file (crash simulation) is invisible to readers
    (d / ".tmp-deadbeef").write_text("{ partial")
    assert read_catalog_table(spark, cat, "t").count() == 5


def test_catalog_put_if_absent_linearizes_racing_committers(spark, tmp_path):
    """TRULY concurrent drill (VERDICT r5 item 7): 10 thread-pool
    committers race commit_catalog against the same catalog root with
    zero external coordination. Put-if-absent (hard-link) must
    linearize them: every committer succeeds, versions come out
    contiguous 1..10 with no gaps or clobbers, each manifest is intact
    JSON carrying exactly one committer's payload, every committer's
    payload survives exactly once, and no staging tmp files leak."""
    import json
    import pathlib
    from concurrent.futures import ThreadPoolExecutor

    from mobility_etl_spark.operators.snapshots import (
        catalog_log,
        commit_catalog,
        commit_snapshot,
    )

    cat = str(tmp_path)
    t = str(tmp_path / "t")
    spark.range(7).write.parquet(t)
    v1 = commit_snapshot(spark, t)

    n = 10
    with ThreadPoolExecutor(max_workers=n) as pool:
        got = list(
            pool.map(
                lambda i: commit_catalog(
                    cat, {"t": (t, v1)}, note=f"writer-{i}"
                ),
                range(n),
            )
        )
    assert sorted(got) == list(range(1, n + 1)), got  # no gap, no clobber
    log = catalog_log(cat)
    assert [e["version"] for e in log] == list(range(1, n + 1))
    d = pathlib.Path(cat) / "_catalog"
    notes = []
    for v in range(1, n + 1):
        m = json.loads((d / f"v{v}.catalog.json").read_text())  # intact
        assert m["version"] == v
        assert m["tables"] == {"t": {"path": t, "version": v1}}
        notes.append(m["note"])
    assert sorted(notes) == sorted(f"writer-{i}" for i in range(n))
    assert not list(d.glob(".tmp-*")), "staged tmp files leaked"


def test_snapshot_commit_linearizes_racing_committers(spark, tmp_path):
    """Same drill one level down: 8 concurrent commit_snapshot calls on
    one table, each publishing its own pre-landed data file, must
    produce contiguous versions with every writer's file set preserved
    exactly once — the optimistic loop may not lose or duplicate a
    commit. (The DATA writes land sequentially first: concurrent raw
    appends to one parquet dir share Hadoop's _temporary/0 staging and
    clobber each other — exactly why production writers land files
    under unique names and only the COMMIT races, which is the part
    drilled here.)"""
    import json
    import pathlib
    from concurrent.futures import ThreadPoolExecutor

    from mobility_etl_spark.operators.snapshots import (
        _data_files,
        commit_snapshot,
    )

    t = str(tmp_path / "t")
    spark.range(3).write.parquet(t)
    v1 = commit_snapshot(spark, t, note="base")

    n = 8
    file_sets: list[list[str]] = []
    for i in range(n):
        before = set(_data_files(t))
        spark.range(i * 100, i * 100 + 5).write.mode("append").parquet(t)
        file_sets.append([f for f in _data_files(t) if f not in before])

    with ThreadPoolExecutor(max_workers=n) as pool:
        got = list(
            pool.map(
                lambda i: commit_snapshot(
                    spark, t, note=f"w{i}", files=file_sets[i]
                ),
                range(n),
            )
        )
    assert sorted(got) == list(range(v1 + 1, v1 + 1 + n)), got
    d = pathlib.Path(t) / "_snapshots"
    notes = set()
    for v in got:
        m = json.loads((d / f"v{v}.manifest.json").read_text())
        assert m["version"] == v
        notes.add(m["note"])
    assert notes == {f"w{i}" for i in range(n)}


def test_catalog_vacuum_reclaims_only_unreachable_state(spark, tmp_path):
    """Catalog-level GC walks the exact reference chain (catalog
    version → table snapshot → data files): after keeping the last 2
    of 3 catalog versions, (a) both surviving versions still read
    correctly table-by-table, (b) the dropped version's exclusive
    snapshot + data files are gone, (c) snapshot versions NEWER than
    anything the surviving catalog binds survive (mid-publication
    safety), and (d) vacuuming everything down to keep_last=1 still
    leaves the latest version readable."""
    import pathlib

    import pytest

    from mobility_etl_spark.operators.snapshots import (
        _list_versions,
        catalog_vacuum,
        commit_catalog,
        commit_snapshot,
        read_catalog_table,
        _data_files,
    )

    cat = str(tmp_path)
    t = str(tmp_path / "t")

    def land(lo, hi, note):
        import json

        before = set(_data_files(t)) if pathlib.Path(t).exists() else set()
        spark.range(lo, hi).write.mode("append").parquet(t)
        mine = [f for f in _data_files(t) if f not in before]
        return commit_snapshot(spark, t, note=note, files=mine)

    v1 = land(0, 5, "s1")
    cv1 = commit_catalog(cat, {"t": (t, v1)}, note="c1")
    v2 = land(100, 103, "s2")
    cv2 = commit_catalog(cat, {"t": (t, v2)}, note="c2")
    v3 = land(200, 210, "s3")
    cv3 = commit_catalog(cat, {"t": (t, v3)}, note="c3")
    v4 = land(300, 301, "s4")  # committed but never cataloged

    stats = catalog_vacuum(cat, keep_last=2)
    assert stats["catalog_versions_dropped"] == 1
    assert stats["snapshots_dropped"] == 1  # v1 only
    assert stats["data_files_deleted"] >= 1  # s1's exclusive file(s)

    # survivors read intact, including the never-rebound newer snapshot
    assert read_catalog_table(spark, cat, "t", catalog_version=cv2).count() == 3
    assert read_catalog_table(spark, cat, "t", catalog_version=cv3).count() == 10
    assert sorted(_list_versions(t)) == [v2, v3, v4]
    with pytest.raises(FileNotFoundError):
        read_catalog_table(spark, cat, "t", catalog_version=cv1)

    catalog_vacuum(cat, keep_last=1)
    assert read_catalog_table(spark, cat, "t", catalog_version=cv3).count() == 10
    with pytest.raises(FileNotFoundError):
        read_catalog_table(spark, cat, "t", catalog_version=cv2)
    with pytest.raises(ValueError):
        catalog_vacuum(cat, keep_last=0)


def test_catalog_vacuum_reclaims_dropped_table_storage(spark, tmp_path):
    """Regression (ADVICE r6): a table present ONLY in dropped catalog
    versions — i.e. removed from the catalog before the retention
    horizon — used to keep all its snapshot manifests and data files
    forever, a permanent storage leak no later vacuum could reclaim.
    Now: (a) the orphaned table's snapshots + data are fully deleted,
    (b) tables still bound by survivors are untouched, and (c) a table
    that was committed but NEVER cataloged is left alone
    (mid-publication safety)."""
    import pathlib

    from mobility_etl_spark.operators.snapshots import (
        _data_files,
        _list_versions,
        catalog_vacuum,
        commit_catalog,
        commit_snapshot,
        read_catalog_table,
    )

    cat = str(tmp_path)
    keep_t = str(tmp_path / "keep_t")
    drop_t = str(tmp_path / "drop_t")
    uncat_t = str(tmp_path / "uncat_t")

    def land(path, lo, hi, note):
        before = (
            set(_data_files(path)) if pathlib.Path(path).exists() else set()
        )
        spark.range(lo, hi).write.mode("append").parquet(path)
        mine = [f for f in _data_files(path) if f not in before]
        return commit_snapshot(spark, path, note=note, files=mine)

    kv1 = land(keep_t, 0, 5, "k1")
    dv1 = land(drop_t, 0, 7, "d1")
    commit_catalog(cat, {"keep": (keep_t, kv1), "doomed": (drop_t, dv1)}, note="c1")
    kv2 = land(keep_t, 100, 104, "k2")
    # c2 and c3 drop the 'doomed' table from the catalog entirely
    cv2 = commit_catalog(cat, {"keep": (keep_t, kv2)}, note="c2")
    kv3 = land(keep_t, 200, 203, "k3")
    cv3 = commit_catalog(cat, {"keep": (keep_t, kv3)}, note="c3")
    land(uncat_t, 0, 2, "never-cataloged")

    stats = catalog_vacuum(cat, keep_last=2)
    assert stats["catalog_versions_dropped"] == 1
    # drop_t's single snapshot + keep_t's k1 snapshot both reclaimed
    assert stats["snapshots_dropped"] == 2
    assert stats["data_files_deleted"] >= 2

    # orphaned table: everything gone
    assert _list_versions(drop_t) == []
    assert _data_files(drop_t) == []
    # survivors read intact
    assert read_catalog_table(spark, cat, "keep", catalog_version=cv2).count() == 4
    assert read_catalog_table(spark, cat, "keep", catalog_version=cv3).count() == 3
    # never-cataloged table untouched (mid-publication safety)
    assert len(_list_versions(uncat_t)) == 1
    assert len(_data_files(uncat_t)) >= 1


@pytest.mark.slow  # r15: excluded from the default (driver-budget) run; see pytest.ini
def test_racing_compactors_vs_committers_lose_nothing(spark, tmp_path):
    """The one concurrency pair previously undrilled (VERDICT r6 #4 /
    r7 #3): 8 threads — 4 appenders (5 unique-id batches each) racing 4
    compactors (5 compaction attempts each) on one snapshot table. The
    fixed-list commit_snapshot CANNOT pass this drill: a compactor
    publishing "base − old + compacted" over an append that landed
    after its base read silently drops the append. The
    retry-with-reapply loop (commit_snapshot_update) must:

    * preserve every appended row exactly once in the FINAL snapshot,
    * keep EVERY intermediate version duplicate-free and content-
      monotonic (a version never loses a row an earlier one had),
    * let rival compactors of the same base ABORT rather than publish
      a second copy of the same rows (returned None + staged output
      reclaimed)."""
    from concurrent.futures import ThreadPoolExecutor

    from mobility_etl_spark.operators.snapshots import (
        append_snapshot,
        compact_snapshot,
        read_snapshot,
        snapshot_log,
    )

    t = str(tmp_path / "t")
    append_snapshot(spark, t, spark.range(0, 100), note="seed")

    def appender(k: int) -> str:
        for b in range(5):
            lo = 1000 * (k + 1) + 20 * b
            append_snapshot(
                spark, t, spark.range(lo, lo + 20), note=f"a{k}b{b}"
            )
        return f"appender{k}"

    aborts = []

    def compactor(k: int) -> str:
        for _ in range(5):
            if compact_snapshot(spark, t, target_file_bytes=1 << 30) is None:
                aborts.append(k)
        return f"compactor{k}"

    jobs = [lambda k=k: appender(k) for k in range(4)] + [
        lambda k=k: compactor(k) for k in range(4)
    ]
    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = [pool.submit(j) for j in jobs]
        for f in futs:
            f.result()

    want = set(range(100)) | {
        1000 * (k + 1) + 20 * b + i
        for k in range(4)
        for b in range(5)
        for i in range(20)
    }
    final = [r.id for r in read_snapshot(spark, t).collect()]
    assert len(final) == len(want) and set(final) == want

    log = snapshot_log(t)
    versions = [e["version"] for e in log]
    assert versions == list(range(1, len(versions) + 1))  # contiguous
    assert sum(e["note"] == "compaction" for e in log) >= 1
    # append commits: seed + 20 — none may be lost to a compactor race
    assert sum(e["note"].startswith(("a", "s")) for e in log) == 21

    prev: set[int] = set()
    for v in versions:
        ids = [r.id for r in read_snapshot(spark, t, version=v).collect()]
        assert len(ids) == len(set(ids)), f"v{v} has duplicate rows"
        assert prev <= set(ids), f"v{v} lost rows a prior version had"
        prev = set(ids)
    # staged output of aborted compactions was reclaimed: every data
    # file on disk is referenced by some retained manifest
    import json as _json
    import pathlib as _pl

    from mobility_etl_spark.operators.snapshots import _data_files

    referenced: set[str] = set()
    for v in versions:
        m = _json.loads(
            (_pl.Path(t) / "_snapshots" / f"v{v}.manifest.json").read_text()
        )
        referenced.update(m["files"])
    assert set(_data_files(t)) <= referenced


def test_snapshot_lifecycle_state_machine(spark, tmp_path):
    """Hypothesis-driven SEQUENTIAL lifecycle fuzz: random programs of
    append / compact / vacuum / time-travel-read against a plain-dict
    reference model. The concurrency drills above pin the racing
    commit protocol; this pins the single-writer ALGEBRA — content
    after any program equals the model, every retained version stays
    readable with exactly its as-of content, vacuum never changes any
    retained version's content, and compaction is always a no-op on
    content. Runs a fixed set of seeds (a full RuleBasedStateMachine
    with a live SparkSession is too slow per example; 6 programs × up
    to 12 ops each give the same edge interleavings: vacuum after
    compact-chains, compact of a 1-file table, keep_last > versions)."""
    import random

    from mobility_etl_spark.operators.snapshots import (
        append_snapshot,
        compact_snapshot,
        read_snapshot,
        snapshot_log,
        vacuum,
    )

    def run_program(seed: int, root: str) -> None:
        rng = random.Random(seed)
        t = f"{root}/t{seed}"
        next_id = 0
        model: dict[int, set] = {}  # version -> expected id set

        def do_append():
            nonlocal next_id
            n = rng.randint(1, 30)
            ids = set(range(next_id, next_id + n))
            next_id += n
            v = append_snapshot(
                spark, t, spark.range(min(ids), max(ids) + 1)
            )
            model[v] = (model[max(model)] if model else set()) | ids

        do_append()  # every program starts with content
        for _ in range(rng.randint(3, 11)):
            op = rng.choice(["append", "append", "compact", "vacuum",
                             "read"])
            if op == "append":
                do_append()
            elif op == "compact":
                v = compact_snapshot(spark, t, target_file_bytes=1 << 30)
                assert v is not None  # no rival: abort impossible
                model[v] = model[v - 1]  # content-identical
            elif op == "vacuum":
                keep = rng.randint(1, 3)
                vacuum(t, keep_last=keep)
                for dropped in sorted(model)[:-keep]:
                    model.pop(dropped)
            else:
                v = rng.choice(sorted(model))
                got = {r.id for r in
                       read_snapshot(spark, t, version=v).collect()}
                assert got == model[v], f"seed {seed} v{v}"

        # end-state audit: every retained version readable and exact
        log = snapshot_log(t)
        assert [e["version"] for e in log] == sorted(model)
        for v in sorted(model):
            got = {r.id for r in
                   read_snapshot(spark, t, version=v).collect()}
            assert got == model[v], f"seed {seed} final v{v}"

    for seed in (11, 23, 37, 58, 71, 94):
        run_program(seed, str(tmp_path))


# ------------------------------------------- vacuum grace period (r10)


def test_vacuum_grace_spares_inflight_writer_then_reclaims_orphans(
    spark, table
):
    """The slow-writer-vs-vacuum drill (VERDICT r9 #2): a writer that
    has renamed its staged data files into the table root but not yet
    won its manifest commit must survive a concurrent graced vacuum —
    its commit then succeeds and its rows are readable — while a file
    that truly died mid-commit falls out of grace and a later aged
    vacuum reclaims it."""
    import os
    import time

    from mobility_etl_spark.operators.snapshots import (
        commit_snapshot_update,
    )

    path, v1, v2 = table
    root = pathlib.Path(path)

    # slow writer: staged + renamed, commit not yet attempted
    stage = root / ".append-stage-slow"
    spark.range(0, 7).withColumnRenamed("id", "event_id").coalesce(
        1
    ).write.mode("overwrite").parquet(str(stage))
    inflight = "append-slowwriter-00000.parquet"
    os.rename(sorted(stage.glob("*.parquet"))[0], root / inflight)

    # concurrent vacuum WITH grace: the unreferenced in-flight file
    # is younger than grace_s and must survive
    deleted = vacuum(path, keep_last=2, grace_s=3600.0)
    assert (root / inflight).exists(), "graced vacuum ate an in-flight file"
    assert deleted == 0  # v1+v2 reference all other files

    # the slow writer's commit still succeeds and its rows are visible
    v3 = commit_snapshot_update(
        spark, path, lambda cur: cur + [inflight], note="slow-append"
    )
    assert read_snapshot(spark, path, v3).count() == 1007

    # a genuinely orphaned file (writer died after rename, never
    # committed) ages out of grace → the second vacuum reclaims it,
    # and ONLY it
    spark.range(0, 3).withColumnRenamed("id", "event_id").coalesce(
        1
    ).write.mode("overwrite").parquet(str(stage))
    orphan = "append-deadwriter-00000.parquet"
    os.rename(sorted(stage.glob("*.parquet"))[0], root / orphan)
    old = time.time() - 7200
    os.utime(root / orphan, (old, old))
    deleted = vacuum(path, keep_last=1, grace_s=3600.0)
    assert not (root / orphan).exists()
    assert (root / inflight).exists()  # committed: referenced by v3
    assert read_snapshot(spark, path, v3).count() == 1007


def test_commit_update_reraises_on_missing_own_file(spark, table):
    """ADVICE r12 (snapshots.py FileNotFoundError→continue): a
    vanished TIP file means a stale tip → reapply; but a missing file
    from the update's OWN newly-added set (bad name, or its staged
    file reclaimed by a racing vacuum) fails identically on every
    retry and must re-raise immediately — not burn 100 tip-reads and
    surface as a misleading 'lost 100 consecutive commit races'."""
    from mobility_etl_spark.operators.snapshots import (
        commit_snapshot_update,
    )

    path, v1, v2 = table
    calls = {"n": 0}

    def add_ghost(cur):
        calls["n"] += 1
        return cur + ["never-staged-00000.parquet"]

    with pytest.raises(FileNotFoundError, match="unretryable"):
        commit_snapshot_update(
            spark,
            path,
            add_ghost,
            note="ghost",
            stats_cols=("event_id",),
        )
    assert calls["n"] == 1, "unretryable miss must not loop"
    # stats_cols absent: the nbytes stat is the tripwire instead
    calls["n"] = 0
    with pytest.raises(FileNotFoundError, match="unretryable"):
        commit_snapshot_update(spark, path, add_ghost, note="ghost2")
    assert calls["n"] == 1


def test_vacuum_preserves_notes_of_dropped_manifests(spark, table):
    """Retention GC must not erase the idempotence ledger: notes of
    vacuumed manifests survive in snapshot_notes (the sidecar the
    streaming near-dup job's replay check reads) even after the
    manifests themselves are gone (ADVICE r9)."""
    from mobility_etl_spark.operators.snapshots import snapshot_notes

    path, v1, v2 = table
    compact_snapshot(spark, path, target_file_bytes=1 << 30)
    vacuum(path, keep_last=1)
    live_notes = {e["note"] for e in snapshot_log(path)}
    assert live_notes == {"compaction"}
    assert {"initial", "append", "compaction"} <= snapshot_notes(path)
    # a second vacuum is a no-op and must not duplicate/lose notes
    vacuum(path, keep_last=1)
    assert {"initial", "append", "compaction"} <= snapshot_notes(path)


def test_append_commit_exhaustion_reclaims_staged_files(
    spark, table, monkeypatch
):
    """ADVICE r9: if the commit loop exhausts its races and raises,
    append_snapshot must not leave its renamed-but-uncommitted data
    files in the table root as unreclaimable orphans."""
    from mobility_etl_spark.operators import snapshots as snapmod

    path, v1, v2 = table
    before = set(snapmod._data_files(path))

    def _exhausted(*a, **k):
        raise RuntimeError("simulated 100 lost commit races")

    monkeypatch.setattr(snapmod, "commit_snapshot_update", _exhausted)
    with pytest.raises(RuntimeError, match="lost commit races"):
        snapmod.append_snapshot(
            spark,
            path,
            spark.range(0, 5).withColumnRenamed("id", "event_id"),
        )
    assert set(snapmod._data_files(path)) == before
    assert read_snapshot(spark, path).count() == 1000


def test_catalog_vacuum_grace_spares_inflight_snapshot_writer(
    spark, tmp_path
):
    """catalog_vacuum with grace_s: a data file renamed into a LIVE
    (catalog-bound) table but not yet snapshot-committed survives the
    walk; after its commit + rebind it is referenced and a subsequent
    aged vacuum keeps it."""
    import os
    import time

    from mobility_etl_spark.operators.snapshots import (
        catalog_vacuum,
        commit_catalog,
        commit_snapshot,
        commit_snapshot_update,
        read_catalog_table,
    )

    cat = str(tmp_path / "cat")
    t = str(tmp_path / "t")
    spark.range(0, 10).write.parquet(t)
    v1 = commit_snapshot(spark, t, note="v1")
    commit_catalog(cat, {"t": (t, v1)}, note="c1")
    spark.range(10, 20).coalesce(1).write.mode("append").parquet(t)
    v2 = commit_snapshot(spark, t, note="v2")
    commit_catalog(cat, {"t": (t, v2)}, note="c2")
    commit_catalog(cat, {"t": (t, v2)}, note="c3")

    # in-flight writer: staged + renamed, not yet committed
    stage = tmp_path / "stage"
    spark.range(100, 105).coalesce(1).write.parquet(str(stage))
    inflight = "append-inflight-00000.parquet"
    os.rename(
        sorted(stage.glob("*.parquet"))[0],
        os.path.join(t, inflight),
    )

    res = catalog_vacuum(cat, keep_last=2, grace_s=3600.0)
    assert os.path.exists(os.path.join(t, inflight))
    assert res["data_files_deleted"] == 0  # v1+v2 files all referenced

    v3 = commit_snapshot_update(
        spark, t, lambda cur: cur + [inflight], note="v3"
    )
    commit_catalog(cat, {"t": (t, v3)}, note="c4")
    # aged: past grace, but now referenced — must survive
    old = time.time() - 7200
    os.utime(os.path.join(t, inflight), (old, old))
    catalog_vacuum(cat, keep_last=2, grace_s=3600.0)
    assert read_catalog_table(spark, cat, "t").count() == 25


def test_graced_vacuum_races_appenders_and_compactor(spark, tmp_path):
    """The hazard the r10 grace period was built for, under REAL
    concurrency: 3 appender threads and 1 compactor race 1 maintenance
    thread running vacuum(grace_s=3600) — every writer's
    staged-then-renamed files are unreferenced-by-every-manifest
    exactly while vacuum walks, and ONLY the grace keeps them alive.
    Invariants: no appended row lost or duplicated in the final
    snapshot, no append commit missing from the note ledger
    (snapshot_notes — live + preserved across manifest GC), and every
    surviving data file is referenced by a retained manifest.
    Retention (keep_last=6) deliberately exceeds any reader's
    in-flight window — the standard table-format rule that retention
    must outlive the longest concurrent reader/compactor."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    from mobility_etl_spark.operators.snapshots import (
        _data_files,
        append_snapshot,
        compact_snapshot,
        read_snapshot,
        snapshot_notes,
    )

    t = str(tmp_path / "t")
    append_snapshot(spark, t, spark.range(0, 100), note="seed")

    def appender(k: int) -> None:
        for b in range(4):
            lo = 1000 * (k + 1) + 20 * b
            append_snapshot(
                spark, t, spark.range(lo, lo + 20), note=f"a{k}b{b}"
            )

    def compactor() -> None:
        for _ in range(4):
            compact_snapshot(spark, t, target_file_bytes=1 << 30)
            time.sleep(0.05)

    deleted = []

    def maintenance() -> None:
        from mobility_etl_spark.operators.snapshots import vacuum

        for _ in range(3):
            time.sleep(0.4)
            deleted.append(vacuum(t, keep_last=6, grace_s=3600.0))

    jobs = [lambda k=k: appender(k) for k in range(3)]
    jobs.append(compactor)
    jobs.append(maintenance)
    with ThreadPoolExecutor(max_workers=5) as pool:
        for f in [pool.submit(j) for j in jobs]:
            f.result()

    want = set(range(100)) | {
        1000 * (k + 1) + 20 * b + i
        for k in range(3)
        for b in range(4)
        for i in range(20)
    }
    final = [r.id for r in read_snapshot(spark, t).collect()]
    assert len(final) == len(want) and set(final) == want

    # every append commit is in the ledger, even if its manifest was
    # GC'd (note preservation)
    notes = snapshot_notes(t)
    assert {"seed"} | {
        f"a{k}b{b}" for k in range(3) for b in range(4)
    } <= notes

    # During the race every file is younger than grace_s, so the
    # concurrent vacuums delete NOTHING (that is the point) — files
    # referenced only by since-dropped manifests may legitimately
    # linger. The contract completes with an AGED final vacuum: age
    # everything past the grace, reclaim, and THEN no unreferenced
    # file may remain while the tip still reads the full row set.
    import json as _json
    import os as _os
    import pathlib as _pl

    from mobility_etl_spark.operators.snapshots import (
        _list_versions,
        vacuum,
    )

    old = time.time() - 7200
    for f in _data_files(t):
        _os.utime(_pl.Path(t) / f, (old, old))
    vacuum(t, keep_last=2, grace_s=3600.0)

    referenced: set[str] = set()
    for v in _list_versions(t):
        m = _json.loads(
            (_pl.Path(t) / "_snapshots" / f"v{v}.manifest.json").read_text()
        )
        referenced.update(m["files"])
    assert set(_data_files(t)) <= referenced
    final2 = [r.id for r in read_snapshot(spark, t).collect()]
    assert set(final2) == want and len(final2) == len(want)


def test_snapshot_changes_pure_append_scans_only_new_files(spark, table):
    """Change-feed contract: between pure-append versions the plan
    reads EXACTLY the files the newer manifest added (O(delta) at any
    table size — inputFiles is the proof), the empty range returns a
    schema-stable zero-row frame, and invalid ranges fail loudly."""
    from mobility_etl_spark.operators.snapshots import (
        read_snapshot,
        snapshot_changes,
    )

    path, v1, v2 = table
    delta = snapshot_changes(spark, path, v1, v2)
    ids = sorted(r.event_id for r in delta.select("event_id").collect())
    assert len(ids) == 500 and ids[0] == 500 and ids[-1] == 999
    full = set(read_snapshot(spark, path, v2).inputFiles())
    old = set(read_snapshot(spark, path, v1).inputFiles())
    assert set(delta.inputFiles()) == full - old  # file-level delta

    assert snapshot_changes(spark, path, v2, v2).count() == 0
    with pytest.raises(ValueError):
        snapshot_changes(spark, path, v2, v1)
    with pytest.raises(FileNotFoundError):
        snapshot_changes(spark, path, v1, 99)


def test_snapshot_changes_rewrite_fallback_is_exact(spark, table):
    """When an UNTYPED commit (the table fixture's raw commit_snapshot
    v2 declares no op) plus a compaction cross the range, the change
    feed falls back to the exceptAll multiset difference — still
    exactly the appended rows (compaction is content-preserving, so
    its rewrites cancel)."""
    from mobility_etl_spark.operators.snapshots import (
        CHANGES_PATH_STATS,
        snapshot_changes,
    )

    path, v1, v2 = table
    v3 = compact_snapshot(spark, path, target_file_bytes=1 << 30)
    CHANGES_PATH_STATS.update(fast=0, lineage=0, full_diff=0)
    delta = snapshot_changes(spark, path, v1, v3)
    ids = sorted(r.event_id for r in delta.select("event_id").collect())
    assert len(ids) == 500 and ids[0] == 500 and ids[-1] == 999
    assert CHANGES_PATH_STATS["full_diff"] == 1


def test_snapshot_changes_lineage_walk_across_compactions(
    spark, sf_dir, tmp_path
):
    """VERDICT r10 #2: with op-typed manifests the change feed stays
    O(delta) ACROSS compactions — the walk sums append commits' added
    files and skips content-preserving replaces, scanning only the
    appended files (inputFiles is the proof); the full diff remains
    only for untyped commits, retention gaps, and vacuumed appends."""
    from mobility_etl_spark.operators.snapshots import (
        CHANGES_PATH_STATS,
        _snap_dir,
        append_snapshot,
        commit_snapshot,
        compact_snapshot,
        snapshot_changes,
    )

    path = str(tmp_path / "tbl")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    ev.filter(F.col("event_id") < 300).write.parquet(path)
    v1 = commit_snapshot(spark, path, note="v1")
    appended_files = []
    vs = [v1]
    # appends interleaved with compactions after EVERY one
    for i, (lo, hi) in enumerate(((300, 500), (500, 800), (800, 900))):
        vs.append(
            append_snapshot(
                spark,
                path,
                ev.filter(
                    (F.col("event_id") >= lo) & (F.col("event_id") < hi)
                ).coalesce(1),
                note=f"a{i}",
            )
        )
        vs.append(compact_snapshot(spark, path, target_file_bytes=1 << 30))

    CHANGES_PATH_STATS.update(fast=0, lineage=0, full_diff=0)
    delta = snapshot_changes(spark, path, v1, vs[-1])
    ids = sorted(r.event_id for r in delta.select("event_id").collect())
    assert len(ids) == 600 and ids[0] == 300 and ids[-1] == 899
    assert CHANGES_PATH_STATS == {"fast": 0, "lineage": 1, "full_diff": 0}
    # the scan touched ONLY the appended files, not the rewritten tip
    assert all("append-" in f for f in delta.inputFiles())
    assert len(delta.inputFiles()) == 3

    # a consumer inside the chain crossing one compaction: same walk
    delta2 = snapshot_changes(spark, path, vs[1], vs[3])
    assert delta2.count() == 300

    # mid-chain retention GAP (a vacuumed intermediate manifest could
    # hide an append) -> loud fallback to the full diff, still exact
    gap = _snap_dir(path) / f"v{vs[2]}.manifest.json"
    gap.unlink()
    CHANGES_PATH_STATS.update(fast=0, lineage=0, full_diff=0)
    delta3 = snapshot_changes(spark, path, v1, vs[-1])
    assert delta3.count() == 600
    assert CHANGES_PATH_STATS["full_diff"] == 1


def test_snapshot_lifecycle_state_machine_with_grace(spark, tmp_path):
    """Lifecycle fuzz EXTENDED with the r10 grace-period algebra:
    random programs of append / compact / in-flight-orphan injection /
    graced vacuum / orphan commit / aged vacuum against the dict
    model. Pins: a graced vacuum never touches a fresh orphan (the
    in-flight writer survives), committing an orphan folds its rows in
    exactly once, an AGED vacuum reclaims precisely the uncommitted
    orphans, and every retained version's content always equals the
    model."""
    import os
    import random
    import time

    from mobility_etl_spark.operators.snapshots import (
        _data_files,
        append_snapshot,
        commit_snapshot_update,
        compact_snapshot,
        read_snapshot,
        vacuum,
    )

    def run_program(seed: int, root: str) -> None:
        rng = random.Random(seed)
        t = f"{root}/g{seed}"
        next_id = 0
        model: dict[int, set] = {}
        pending: dict[str, set] = {}  # orphan file -> its id set

        def do_append():
            nonlocal next_id
            n = rng.randint(1, 20)
            ids = set(range(next_id, next_id + n))
            next_id += n
            v = append_snapshot(
                spark, t, spark.range(min(ids), max(ids) + 1)
            )
            model[v] = (model[max(model)] if model else set()) | ids

        def do_orphan():
            nonlocal next_id
            n = rng.randint(1, 10)
            ids = set(range(next_id, next_id + n))
            next_id += n
            stage = f"{t}/.orphan-stage-{len(pending)}"
            spark.range(min(ids), max(ids) + 1).coalesce(1).write.mode(
                "overwrite"
            ).parquet(stage)
            import pathlib as _pl

            name = f"append-inflight-{seed}-{len(pending):03d}.parquet"
            os.rename(
                sorted(_pl.Path(stage).glob("*.parquet"))[0],
                f"{t}/{name}",
            )
            pending[name] = ids

        def do_commit_orphan():
            if not pending:
                return
            name = sorted(pending)[0]
            ids = pending.pop(name)
            v = commit_snapshot_update(
                spark, t, lambda cur: cur + [name], note="slow-commit"
            )
            model[v] = model[max(k for k in model if k < v)] | ids

        do_append()
        for _ in range(rng.randint(4, 12)):
            op = rng.choice(
                ["append", "append", "compact", "orphan",
                 "commit_orphan", "graced_vacuum", "read"]
            )
            if op == "append":
                do_append()
            elif op == "compact":
                v = compact_snapshot(spark, t, target_file_bytes=1 << 30)
                assert v is not None
                model[v] = model[v - 1]
            elif op == "orphan":
                do_orphan()
            elif op == "commit_orphan":
                do_commit_orphan()
            elif op == "graced_vacuum":
                keep = rng.randint(1, 3)
                vacuum(t, keep_last=keep, grace_s=3600.0)
                for dropped in sorted(model)[:-keep]:
                    model.pop(dropped)
                # every fresh in-flight orphan survived
                for name in pending:
                    assert os.path.exists(f"{t}/{name}"), (seed, name)
            else:
                v = rng.choice(sorted(model))
                got = {r.id for r in
                       read_snapshot(spark, t, version=v).collect()}
                assert got == model[v], f"seed {seed} v{v}"

        # endgame: age everything, one aged vacuum — uncommitted
        # orphans reclaimed exactly, retained versions untouched
        old = time.time() - 7200
        for f in _data_files(t):
            os.utime(f"{t}/{f}", (old, old))
        vacuum(t, keep_last=1, grace_s=3600.0)
        for dropped in sorted(model)[:-1]:
            model.pop(dropped)
        for name in pending:
            assert not os.path.exists(f"{t}/{name}"), (seed, name)
        tip = max(model)
        got = {r.id for r in
               read_snapshot(spark, t, version=tip).collect()}
        assert got == model[tip], f"seed {seed} endgame"

    for seed in (7, 19, 42, 63, 88):
        run_program(seed, str(tmp_path))


def test_catalog_vacuum_preserves_notes_of_dropped_manifests(
    spark, tmp_path
):
    """ADVICE r10 (medium): catalog_vacuum's retention paths — BOTH the
    kept-table over-retention unlink and the dropped-only-table unlink
    — must preserve commit notes to _snapshots/.notes.log exactly like
    vacuum() does, or a stream replayed past the retention horizon
    against the same root (lost checkpoint) silently re-appends
    already-committed epochs."""
    from mobility_etl_spark.operators.snapshots import (
        append_snapshot,
        catalog_vacuum,
        commit_catalog,
        commit_snapshot,
        snapshot_notes,
    )

    cat = str(tmp_path / "cat")
    kept_t = str(tmp_path / "cat" / "kept")
    dropped_t = str(tmp_path / "cat" / "dropped")
    df = spark.range(0, 10).withColumnRenamed("id", "k")
    versions = {}
    for t in (kept_t, dropped_t):
        df.coalesce(1).write.parquet(t)
        versions[t] = commit_snapshot(spark, t, note="e0")
    # catalog v1 binds both tables; later versions bind only kept_t,
    # whose snapshots keep advancing via per-epoch-noted appends
    commit_catalog(
        cat,
        {"kept": (kept_t, versions[kept_t]),
         "dropped": (dropped_t, versions[dropped_t])},
        note="c1",
    )
    for epoch in (1, 2, 3, 4):
        v = append_snapshot(spark, kept_t, df, note=f"e{epoch}")
        commit_catalog(cat, {"kept": (kept_t, v)}, note=f"c{1+epoch}")

    catalog_vacuum(cat, keep_last=2)
    # kept table: e0..e2 manifests fell out of retention, notes live on
    assert {"e0", "e1", "e2", "e3", "e4"} <= snapshot_notes(kept_t)
    # dropped-only table: every manifest was reclaimed with its storage
    # — but its notes survive in the sidecar for replay idempotence
    assert "e0" in snapshot_notes(dropped_t)
    # idempotent: a second vacuum neither loses nor chokes on notes
    catalog_vacuum(cat, keep_last=2)
    assert {"e0", "e1", "e2"} <= snapshot_notes(kept_t)


def test_shingle_short_doc_oracle_parity(spark):
    """ADVICE r10 (low): Spark's shingles() emits an all-tokens-joined
    shingle for docs shorter than n (concat_ws skips the zip_with null
    padding); the DuckDB oracles now mirror that with concat_ws —
    assert the two engines agree ON short docs, which current SF
    fixtures never contain."""
    import duckdb

    from mobility_etl_spark.operators.dedup import shingles

    rows = [
        (1, "one"),
        (2, "two tokens"),
        (3, "exactly three tokens"),
        (4, "now four whole tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.shingle)
        for r in shingles(df, "text", "doc_id", n=3).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") AS t(doc_id, text)"
    )
    want = set(
        map(
            tuple,
            con.execute(
                """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents
        )
        SELECT DISTINCT doc_id,
               concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])
                   AS shingle
        FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 1)))
            AS g(i)
        """
            ).fetchall(),
        )
    )
    assert got == want
    assert (1, "one") in got and (2, "two tokens") in got


def test_ivm_face_folds_through_lineage_not_full_diff(spark, sf_dir):
    """VERDICT r10 #2 done-condition: the IVM face now interleaves a
    compaction before every consumed version; every delta it folds
    must resolve through the op-typed lineage walk (or the pure-append
    fast path) — the exceptAll fallback firing would mean the feed
    degraded to two full snapshot scans."""
    from mobility_etl_spark.operators.snapshots import CHANGES_PATH_STATS
    from mobility_etl_spark.queries.corpus_prep import (
        snapshot_change_feed_ivm,
    )

    CHANGES_PATH_STATS.update(fast=0, lineage=0, full_diff=0)
    out = snapshot_change_feed_ivm(spark, sf_dir)
    assert out.count() > 0
    out.collect()
    assert CHANGES_PATH_STATS["full_diff"] == 0
    assert CHANGES_PATH_STATS["lineage"] >= 2, dict(CHANGES_PATH_STATS)


_XPROC_WORKER = r"""
import os, pathlib, shutil, sys

root, wid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, sys.argv[3])
from mobility_etl_spark.operators.snapshots import (
    commit_catalog,
    commit_snapshot,
)
from mobility_etl_spark.session import get_spark

spark = get_spark(f"race-w{wid}", master="local[2]", shuffle_partitions=2)
t = os.path.join(root, "t")
for i in range(3):
    # land data under UNIQUE names first (concurrent raw appends to one
    # parquet dir clobber Hadoop's shared _temporary/0 staging — real
    # writers stage privately and only the COMMIT races)
    priv = os.path.join(root, f".stage-w{wid}-{i}")
    spark.range(wid * 1000 + i * 10, wid * 1000 + i * 10 + 5).write.parquet(priv)
    names = []
    for j, p in enumerate(sorted(pathlib.Path(priv).glob("*.parquet"))):
        name = f"w{wid}-b{i}-{j}.parquet"
        os.replace(p, os.path.join(t, name))
        names.append(name)
    shutil.rmtree(priv, ignore_errors=True)
    v = commit_snapshot(spark, t, note=f"w{wid}-b{i}", files=names)
    commit_catalog(root, {"t": (t, v)}, note=f"w{wid}-c{i}")
print("WORKER-OK")
spark.stop()
"""


@pytest.mark.slow  # r15: excluded from the default (driver-budget) run; see pytest.ini
def test_cross_process_commit_race(spark, tmp_path):
    """VERDICT r11 #4: the in-process racing-committer drills share one
    driver JVM/Python process; a real deployment has INDEPENDENT
    SparkSessions committing to one table root. Spawn 3 separate
    Python processes, each with its own local SparkSession, each
    landing private data files then racing commit_snapshot +
    commit_catalog 3 times against the same root. The put-if-absent
    protocol must linearize across PROCESSES exactly as it does across
    threads: contiguous versions, every commit's payload exactly once,
    every catalog entry resolving to an existing snapshot, no staged
    tmp leaks."""
    import json
    import pathlib
    import subprocess
    import sys

    from mobility_etl_spark.operators.snapshots import (
        _list_versions,
        catalog_log,
        commit_snapshot,
        snapshot_log,
    )

    root = str(tmp_path)
    t = str(tmp_path / "t")
    spark.range(3).write.parquet(t)
    v1 = commit_snapshot(spark, t, note="base")
    assert v1 == 1

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _XPROC_WORKER, root, str(w), repo],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for w in range(3)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert all("WORKER-OK" in o for o in outs)

    # snapshots: base + 9 worker commits, contiguous, no note lost
    assert _list_versions(t) == list(range(1, 11))
    notes = [e["note"] for e in snapshot_log(t)]
    expect = ["base"] + [f"w{w}-b{i}" for w in range(3) for i in range(3)]
    assert sorted(notes) == sorted(expect)
    # catalog: 9 commits, contiguous, each resolving to a live snapshot
    clog = catalog_log(root)
    assert [e["version"] for e in clog] == list(range(1, 10))
    assert sorted(e["note"] for e in clog) == sorted(
        f"w{w}-c{i}" for w in range(3) for i in range(3)
    )
    snap_versions = set(_list_versions(t))
    d = pathlib.Path(root) / "_catalog"
    for e in clog:
        m = json.loads((d / f"v{e['version']}.catalog.json").read_text())
        assert m["tables"]["t"]["version"] in snap_versions
    assert not list(d.glob(".tmp-*")), "catalog staging leaked"
    assert not list((pathlib.Path(t) / "_snapshots").glob(".tmp-*"))


_XPROC_BARRIER = r"""
# startup barrier shared by every drill worker: JVM startup skew would
# otherwise let the slow starters run AFTER the fast ones finished,
# and the drill would race nothing. Each worker signals ready-<name>
# once its session is up; the test writes `go` when all are ready.
import os, time
# timeout must EXCEED the test's own ready-wait deadline (180s), or
# startup skew in (worker_timeout, 180) makes fast workers give up
# before the test writes `go`
def barrier(root, name, timeout=240.0):
    open(os.path.join(root, f"ready-{name}"), "w").close()
    deadline = time.monotonic() + timeout
    while not os.path.exists(os.path.join(root, "go")):
        if time.monotonic() > deadline:
            raise TimeoutError("barrier: no go signal")
        time.sleep(0.05)
"""

_XPROC_APPENDER = _XPROC_BARRIER + r"""
import os, pathlib, sys
root, wid = sys.argv[1], int(sys.argv[2])
sys.path.insert(0, sys.argv[3])
from pyspark.sql import functions as F
from mobility_etl_spark.operators.snapshots import (
    _list_versions, append_snapshot, commit_catalog,
)
from mobility_etl_spark.session import get_spark

spark = get_spark(f"xa-{wid}", master="local[2]", shuffle_partitions=2)
t = os.path.join(root, "t")
spark.range(1).collect()  # session fully up before signalling ready
barrier(root, f"a{wid}")
for i in range(3):
    df = spark.range(wid * 1000 + i * 10, wid * 1000 + i * 10 + 5)
    append_snapshot(spark, t, df, note=f"w{wid}-b{i}")
    commit_catalog(root, {"t": (t, _list_versions(t)[-1])},
                   note=f"w{wid}-c{i}")
open(os.path.join(root, f"done-a{wid}"), "w").close()
print("APPENDER-OK")
spark.stop()
"""

_XPROC_COMPACTOR = _XPROC_BARRIER + r"""
import os, sys, time
root = sys.argv[1]
sys.path.insert(0, sys.argv[2])
from mobility_etl_spark.operators.snapshots import (
    _list_versions, commit_catalog, compact_snapshot,
)
from mobility_etl_spark.session import get_spark

spark = get_spark("xc", master="local[2]", shuffle_partitions=2)
t = os.path.join(root, "t")
spark.range(1).collect()
barrier(root, "c")
done = lambda: all(
    os.path.exists(os.path.join(root, f"done-a{w}")) for w in range(2)
)
n_ok = n_abort = 0
k = 0
while True:
    finished = done()
    v = compact_snapshot(spark, t, note=f"compact-{k}")
    k += 1
    if v is None:
        n_abort += 1
    else:
        n_ok += 1
        commit_catalog(root, {"t": (t, v)}, note=f"compact-c{k}")
    if finished:
        break
    time.sleep(0.2)
print(f"COMPACTOR-OK ok={n_ok} abort={n_abort}")
spark.stop()
"""

_XPROC_VACUUM = _XPROC_BARRIER + r"""
import os, sys, time
root = sys.argv[1]
sys.path.insert(0, sys.argv[2])
from mobility_etl_spark.operators.snapshots import catalog_vacuum, vacuum

t = os.path.join(root, "t")
barrier(root, "v")
done = lambda: all(
    os.path.exists(os.path.join(root, f"done-a{w}")) for w in range(2)
)
n = 0
while True:
    finished = done()
    vacuum(t, keep_last=3, grace_s=3600.0)
    try:
        catalog_vacuum(root, keep_last=3, grace_s=3600.0)
    except FileNotFoundError:
        pass  # no catalog commit has landed yet (vacuum started first)
    n += 1
    if finished:
        break
    time.sleep(0.15)
print(f"VACUUM-OK passes={n}")
"""


@pytest.mark.slow
def test_cross_process_compact_vacuum_race(spark, tmp_path):
    """VERDICT r12 #3: r12 proved 3-process COMMIT linearizability;
    the compactor-vs-committer and vacuum-vs-replay races were still
    thread-pool-only. Spawn independent OS processes — 2 appenders
    (3 append_snapshot + commit_catalog each), 1 compactor looping
    compact_snapshot + catalog rebinds, 1 vacuum looping
    vacuum(grace)+catalog_vacuum(grace) — all racing against one table
    root. Afterwards: the tip holds every appended row exactly once,
    every RETAINED version reads exactly (all referenced files exist,
    counts match the manifest stats chain), every appender note
    survives retention GC in snapshot_notes, and no staged tmp leaks."""
    import json
    import pathlib
    import subprocess
    import sys

    from mobility_etl_spark.operators.snapshots import (
        _list_versions,
        commit_snapshot,
        read_snapshot,
        snapshot_notes,
    )

    root = str(tmp_path)
    t = str(tmp_path / "t")
    spark.range(100000, 100003).write.parquet(t)
    assert commit_snapshot(spark, t, note="base") == 1

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _XPROC_APPENDER, root, str(w), repo],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for w in range(2)
    ] + [
        subprocess.Popen(
            [sys.executable, "-c", src, root, repo],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for src in (_XPROC_COMPACTOR, _XPROC_VACUUM)
    ]
    # startup barrier: release every worker only when ALL sessions are
    # up, so appends genuinely overlap the compactor and the vacuum
    import time as _time

    deadline = _time.monotonic() + 180
    names = ["a0", "a1", "c", "v"]
    while not all(
        (tmp_path / f"ready-{n}").exists() for n in names
    ):
        if _time.monotonic() > deadline:
            for p in procs:
                p.kill()
            raise TimeoutError("drill workers never became ready")
        _time.sleep(0.05)
    (tmp_path / "go").touch()
    results = [p.communicate(timeout=420) for p in procs]
    outs = [r[0] for r in results]
    assert all(p.returncode == 0 for p in procs), [
        (p.returncode, r[0], r[1][-2000:]) for p, r in zip(procs, results)
    ]
    for tag in ("APPENDER-OK", "COMPACTOR-OK", "VACUUM-OK"):
        assert any(tag in o for o in outs), (tag, outs)

    # exactly-once: tip = base + every appended id, no dup, no loss —
    # whatever interleaving of appends/compactions/vacuums occurred
    expect = sorted(
        [100000, 100001, 100002]
        + [w * 1000 + i * 10 + j for w in range(2) for i in range(3)
           for j in range(5)]
    )
    got = sorted(r.id for r in read_snapshot(spark, t).collect())
    assert got == expect

    # every retained version reads exactly: all referenced files
    # exist and the scan count matches the manifest byte-accounting
    snap_dir = pathlib.Path(t) / "_snapshots"
    for v in _list_versions(t):
        m = json.loads((snap_dir / f"v{v}.manifest.json").read_text())
        for f in m["files"]:
            assert (pathlib.Path(t) / f).exists(), (v, f)
        assert read_snapshot(spark, t, v).count() > 0

    # notes survive retention GC (vacuum-vs-replay contract)
    notes = snapshot_notes(t)
    for w in range(2):
        for i in range(3):
            assert f"w{w}-b{i}" in notes, (f"w{w}-b{i}", notes)

    # no staged leaks from any racer
    leaks = [
        p for p in pathlib.Path(t).iterdir()
        if p.name.startswith((".compact-stage-", ".append-stage-"))
    ]
    assert not leaks, leaks
    assert not list(snap_dir.glob(".tmp-*"))
    assert not list((pathlib.Path(root) / "_catalog").glob(".tmp-*"))


def test_streaming_sink_survives_compaction_no_duplication(spark, sf_dir):
    """r12 review finding: the sink used to commit via DIRECTORY
    LISTING, so after a compaction (old files retained for time
    travel) the next batch's manifest referenced both generations and
    every pre-compaction row doubled. Now the sink commits "tip +
    mine" op-typed: compact mid-stream, continue the stream, row
    counts stay exact and the op-typed chain keeps the change feed's
    file-level path alive across the rewrite."""
    import tempfile

    from pyspark.sql import functions as F

    from mobility_etl_spark.operators.snapshots import (
        _list_versions,
        changed_files,
        compact_snapshot,
        read_snapshot,
        streaming_snapshot_sink,
    )
    from mobility_etl_spark.streaming.jobs import events_file_stream

    landing = tempfile.mkdtemp(prefix="sinkland2_")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.filter(F.col("event_id") < 300).repartition(3).write.mode(
        "overwrite"
    ).parquet(landing)
    table = tempfile.mkdtemp(prefix="sinktbl2_")

    def run():
        stream = events_file_stream(
            spark, landing, options={"maxFilesPerTrigger": "1"}
        )
        with tempfile.TemporaryDirectory(prefix="ckpt2_") as ckpt:
            streaming_snapshot_sink(stream, table, ckpt)

    run()
    assert read_snapshot(spark, table).count() == 300
    v_pre = _list_versions(table)[-1]
    compact_snapshot(spark, table, target_file_bytes=1 << 30)
    # pre-compaction files are still on disk (time travel); the next
    # batches must NOT re-commit them
    ev.filter(F.col("event_id").between(300, 399)).coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    run()
    assert read_snapshot(spark, table).count() == 400  # not 700
    # op-typed commits: the file-level delta survives ACROSS the
    # rewrite (no full-diff fallback, no hard error)
    v_now = _list_versions(table)[-1]
    delta = changed_files(table, v_pre, v_now)
    assert delta is not None
    got = spark.read.parquet(
        *(f"{table}/{f}" for f in delta)
    ).count()
    assert got == 100


def test_commit_note_rejects_newlines(spark, tmp_path):
    """Notes persist line-delimited across vacuum; an embedded newline
    would split on read-back and break a replayed writer's
    idempotence check — rejected at commit time."""
    from mobility_etl_spark.operators.snapshots import (
        append_snapshot,
        commit_snapshot,
    )

    t = str(tmp_path / "t")
    spark.range(3).write.parquet(t)
    with pytest.raises(ValueError, match="newline"):
        commit_snapshot(spark, t, note="e1\nreplayed")
    commit_snapshot(spark, t, note="ok")
    with pytest.raises(ValueError, match="newline"):
        append_snapshot(spark, t, spark.range(2), note="a\rb")


def test_snapshot_changes_empty_snapshot_poll(spark, tmp_path):
    """r12 review finding: polling v==v against an EMPTY snapshot
    (schema-bearing 0-file init commit) used to crash in
    read_snapshot; the empty delta now derives its schema from the
    nearest non-empty retained version, or v_to itself once data
    lands."""
    from mobility_etl_spark.operators.snapshots import (
        append_snapshot,
        commit_snapshot,
        snapshot_changes,
    )

    t = str(tmp_path / "t")
    pathlib = __import__("pathlib")
    pathlib.Path(t).mkdir()
    v1 = commit_snapshot(spark, t, note="init", files=[])
    v2 = append_snapshot(spark, t, spark.range(5))
    # empty delta with a non-empty schema source
    assert snapshot_changes(spark, t, v2, v2).count() == 0
    # delta over the empty init
    assert snapshot_changes(spark, t, v1, v2).count() == 5


def test_preserve_notes_tolerates_racing_vacuum(spark, tmp_path):
    """r12 review finding: a second racing vacuum used to crash on
    FileNotFoundError mid-GC. _preserve_notes_then_drop (and the
    unlink paths) now treat an already-dropped manifest/file as the
    race it is."""
    from mobility_etl_spark.operators.snapshots import (
        _preserve_notes_then_drop,
        _snap_dir,
        commit_snapshot,
        snapshot_notes,
        vacuum,
    )

    t = str(tmp_path / "t")
    spark.range(3).write.parquet(t)
    for i in range(4):
        spark.range(i * 10, i * 10 + 2).write.mode("append").parquet(t)
        commit_snapshot(spark, t, note=f"c{i}")
    d = _snap_dir(t)
    # simulate the loser: one of the to-drop manifests already gone
    (d / "v1.manifest.json").unlink()
    dropped = _preserve_notes_then_drop(
        t, [d / "v1.manifest.json", d / "v2.manifest.json"]
    )
    assert dropped == 1  # only the one that still existed
    assert "c1" in snapshot_notes(t)  # note preserved by... the drop
    vacuum(t, keep_last=1)  # and a follow-up vacuum still succeeds


def test_catalog_vacuum_spares_republishing_dropped_table(spark, tmp_path):
    """r12 review finding: a table bound only by DROPPED catalog
    versions used to be wiped unconditionally — racing an in-flight
    re-publication (snapshot committed, commit_catalog mid-validation)
    into a permanently dangling binding. A snapshot NEWER than
    anything the dropped versions bound is evidence of that
    re-publication; the table is spared this run."""
    from mobility_etl_spark.operators.snapshots import (
        _list_versions,
        catalog_vacuum,
        commit_catalog,
        commit_snapshot,
        read_catalog_table,
    )

    cat = str(tmp_path)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(3).write.parquet(a)
    spark.range(4).write.parquet(b)
    va = commit_snapshot(spark, a, note="a1")
    vb = commit_snapshot(spark, b, note="b1")
    commit_catalog(cat, {"a": (a, va), "b": (b, vb)})  # v1: binds both
    for i in range(3):  # v2..v4 bind only b → a becomes dropped-only
        commit_catalog(cat, {"b": (b, vb)}, note=f"only-b-{i}")
    # in-flight re-publication of a: NEW snapshot committed, catalog
    # commit not yet landed
    spark.range(10, 14).write.mode("append").parquet(a)
    va2 = commit_snapshot(spark, a, note="a2")
    catalog_vacuum(cat, keep_last=2)
    # a survived: the re-binding can now land and resolve
    assert va2 in _list_versions(a)
    commit_catalog(cat, {"a": (a, va2), "b": (b, vb)}, note="rebind")
    assert read_catalog_table(spark, cat, "a").count() == 7
