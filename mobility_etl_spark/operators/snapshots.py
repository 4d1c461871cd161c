"""Minimal manifest-commit snapshot layer (N11 companion): the
table-format primitive that gives the lake reader-atomicity and time
travel without Delta/Iceberg on the classpath.

VERDICT r02 noted that directory-swap compaction (io.compact_partitions)
is only crash-safe, not reader-atomic — a scan that lists files while
the swap happens can see both generations. The fix every table format
uses is the same: scans never list directories; they read a MANIFEST
(an immutable, atomically-committed list of data files), and a commit
is one rename of a manifest file. This module is that protocol, kept
deliberately small:

* ``<table>/_snapshots/v{N}.manifest.json`` — immutable file list +
  row-count/bytes summary for snapshot N (relative paths, so the table
  directory is relocatable).
* ``commit_snapshot`` writes the manifest to a hidden temp name and
  ``os.rename``s it into place — atomic on POSIX and HDFS; on a
  rename-less object store this single small file is the only thing
  that needs a conditional-put.
* ``read_snapshot`` loads exactly the files of a given (or the
  latest) snapshot — concurrent compaction/appends are invisible
  until their own commit, and old snapshots stay readable (time
  travel) until vacuumed.
* ``vacuum`` deletes data files referenced by NO retained snapshot —
  the only deletion path, and it never touches the current manifest.

Scale notes: a manifest is O(files) JSON read once by the driver at
plan time (exactly what Spark's own file index does with a directory
listing, minus the eventual-consistency hazard); data files are opened
by executors as usual via an explicit path list. At 100 TB the
manifest would be chunked + summarized (Iceberg's manifest list); the
commit protocol — the part that matters for correctness — is
identical.
"""

from __future__ import annotations

import json
import os
import pathlib
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAPDIR = "_snapshots"


def _snap_dir(table_path: str) -> pathlib.Path:
    return pathlib.Path(table_path) / _SNAPDIR


def _stage_and_publish(
    df, root: pathlib.Path, stage: pathlib.Path, name_prefix: str,
    replace: bool = False,
) -> list[str]:
    """The shared stage-write → deterministic-rename publish step of
    append_snapshot / compact_snapshot / streaming_snapshot_sink: one
    spelling, so protocol fixes (ordering, cleanup, fsync policy)
    cannot drift between the three writers. Writes ``df`` to the
    hidden ``stage`` dir (invisible to readers — only committed
    manifests are scanned), moves each part to
    ``{name_prefix}{i:05d}.parquet`` under ``root`` (``os.replace``
    when ``replace`` — the sink's crash-replay path re-publishes the
    SAME names), cleans the stage, returns the published names."""
    import shutil

    df.write.mode("overwrite").parquet(str(stage))
    mv = os.replace if replace else os.rename
    names = []
    for i, staged in enumerate(sorted(stage.glob("*.parquet"))):
        name = f"{name_prefix}{i:05d}.parquet"
        mv(staged, root / name)
        names.append(name)
    shutil.rmtree(stage, ignore_errors=True)
    return names


def _validate_note(note: str) -> None:
    """Commit notes must be single-line: vacuum preserves dropped
    manifests' notes as newline-delimited sidecar lines
    (_preserve_notes_then_drop), so an embedded newline would SPLIT
    the note on read-back and a replayed writer's
    ``note in snapshot_notes(...)`` idempotence check would miss —
    re-appending rows, the exact duplicate the note exists to
    prevent. Reject at commit time, where the bug would be planted."""
    if "\n" in note or "\r" in note:
        raise ValueError(
            f"snapshot note {note!r} contains a newline — notes are "
            "persisted line-delimited across vacuum and must be "
            "single-line"
        )


def _list_versions(table_path: str) -> list[int]:
    d = _snap_dir(table_path)
    if not d.is_dir():
        return []
    out = []
    for p in d.glob("v*.manifest.json"):
        # skip stray non-integer names (e.g. a hand-copied
        # "vbackup.manifest.json") instead of breaking EVERY table
        # operation — same defense _cat_versions already has
        try:
            out.append(int(p.name.split(".", 1)[0][1:]))
        except ValueError:
            continue
    return sorted(out)


def _data_files(table_path: str) -> list[str]:
    """Current parquet data files, relative to the table root; hidden
    dirs (_snapshots, .compaction_tmp …) excluded — same filter as
    Spark's path listing.

    Walk discipline: hidden/underscore directories are PRUNED before
    descent (rglob merely filtered them from the results but still
    traversed them — racing a concurrent writer whose Spark job was
    deleting its ``.append-stage-*/_temporary`` tree mid-walk raised
    FileNotFoundError; caught by the r10 graced-vacuum concurrency
    drill), and a directory vanishing mid-walk is skipped, not fatal
    (os.walk's default onerror swallow)."""
    root = pathlib.Path(table_path)
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [
            d for d in dirnames if not d.startswith((".", "_"))
        ]
        rel_dir = pathlib.Path(dirpath).relative_to(root)
        for f in filenames:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                rel = rel_dir / f if str(rel_dir) != "." else pathlib.Path(f)
                out.append(str(rel))
    return sorted(out)


def _file_column_stats(
    root: pathlib.Path, files: list[str], cols: tuple[str, ...]
) -> dict:
    """Per-file [min, max] for the requested columns, read from parquet
    FOOTERS only (row-group statistics — no data scan), aggregated
    across row groups. Only JSON-stable scalar types are recorded;
    a column with no usable stats is simply absent for that file,
    which readers must treat as "file may match anything"."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for f in files:
        md = pq.ParquetFile(root / f).metadata
        # row count rides along under a reserved key (Iceberg's
        # record_count): a provably EMPTY file is prunable by every
        # reader regardless of which column it filters on
        per: dict[str, object] = {"_rows": md.num_rows}
        invalid: set[str] = set()
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in cols or name in invalid:
                    continue
                st = col.statistics
                if (
                    st is None
                    or not st.has_min_max
                    or not isinstance(st.min, (int, float, str))
                ):
                    # one statless row group poisons the whole file's
                    # span for this column — pruning on it would be
                    # unsound, so drop it entirely
                    invalid.add(name)
                    per.pop(name, None)
                    continue
                if name in per:
                    per[name] = [
                        min(per[name][0], st.min),
                        max(per[name][1], st.max),
                    ]
                else:
                    per[name] = [st.min, st.max]
        if per:
            out[f] = per
    return out


def commit_snapshot(
    spark: SparkSession,
    table_path: str,
    note: str = "",
    files: list[str] | None = None,
    stats_cols: tuple[str, ...] = (),
    op: str | None = None,
    added: list[str] | None = None,
) -> int:
    """Commit a snapshot: the table's current data files, or an
    explicit ``files`` list (relative paths) for operations like
    compaction that must publish only their own output.

    Returns the new version number. The write is staged then renamed —
    a reader either sees the complete new manifest or the old one,
    never a partial file.

    ``files=None`` (publish-the-directory) is a SINGLE-WRITER
    BOOTSTRAP convenience only: the listing sees every file on disk,
    including a concurrent appender's renamed-but-uncommitted output
    and pre-compaction base files a rewrite retained for time travel
    — committing either duplicates rows. Any table with concurrent
    writers or a compaction history must commit through
    :func:`append_snapshot` / :func:`commit_snapshot_update` /
    explicit ``files``.
    """
    root = pathlib.Path(table_path)
    _validate_note(note)
    if files is None:
        files = _data_files(table_path)
    stats = _file_column_stats(root, files, stats_cols) if stats_cols else {}
    d = _snap_dir(table_path)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".tmp-{uuid.uuid4().hex[:12]}"
    # Put-if-absent commit: os.rename overwrites silently on POSIX, so
    # two concurrent committers could both "succeed" with one commit
    # lost. os.link fails with EEXIST if the target manifest already
    # exists — the conditional-put every table format's commit needs —
    # so on collision we re-read the log and retry at the next version
    # (optimistic concurrency, same loop as Iceberg/Delta).
    try:
        for _ in range(100):
            version = (_list_versions(table_path) or [0])[-1] + 1
            manifest = {
                "version": version,
                "note": note,
                "files": files,
                "n_files": len(files),
                "bytes": sum((root / f).stat().st_size for f in files),
                "stats": stats,
                # operation typing (Iceberg's snapshot summary):
                # "append" commits declare exactly which files carry
                # their NEW rows; "replace" declares the commit
                # content-preserving — what lets snapshot_changes walk
                # a version chain ACROSS compactions at file level
                "op": op,
                "added": added,
            }
            tmp.write_text(json.dumps(manifest, indent=1))
            try:
                os.link(tmp, d / f"v{version}.manifest.json")
                return version
            except FileExistsError:
                continue  # lost the race; retry against the new log tip
        raise RuntimeError(
            f"commit_snapshot: lost 100 consecutive commit races at "
            f"{table_path}"
        )
    finally:
        tmp.unlink(missing_ok=True)


def commit_snapshot_update(
    spark: SparkSession,
    table_path: str,
    update_fn,
    note: str = "",
    stats_cols: tuple[str, ...] = (),
    op: str | None = None,
    added: list[str] | None = None,
) -> int | None:
    """Commit a CONTENT-AWARE update: ``update_fn(tip_files)`` maps the
    current snapshot's file list to the new one, and is RE-APPLIED to
    the fresh tip on every lost commit race — the Iceberg/Delta
    retry-with-reapply loop that :func:`commit_snapshot` (which retries
    a FIXED list) cannot give.

    Why it matters: an appender building "tip files + mine" and a
    compactor building "tip files − base + compacted" race; whichever
    loses the put-if-absent must rebuild its list against the winner's
    manifest, or it silently resurrects files the winner removed /
    drops files the winner added (the lost-update this module's
    racing compactor-vs-committer drill pins,
    tests/test_snapshots.py).

    ``update_fn`` may return ``None`` to ABORT (e.g. a compactor
    discovering its base files were already rewritten by a concurrent
    compaction — re-publishing its own copies would duplicate rows);
    the function then returns ``None`` and commits nothing. Column
    stats for retained files are carried over from the tip manifest;
    only new files are scanned.
    """
    root = pathlib.Path(table_path)
    _validate_note(note)
    d = _snap_dir(table_path)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".tmp-{uuid.uuid4().hex[:12]}"
    try:
        for _ in range(100):
            versions = _list_versions(table_path)
            tip_files: list[str] = []
            tip_stats: dict = {}
            if versions:
                tip = json.loads(
                    (d / f"v{versions[-1]}.manifest.json").read_text()
                )
                tip_files = tip["files"]
                tip_stats = tip.get("stats", {})
            new_files = update_fn(list(tip_files))
            if new_files is None:
                return None
            try:
                stats = {}
                if stats_cols:
                    carried = [f for f in new_files if f in tip_stats]
                    fresh = [f for f in new_files if f not in tip_stats]
                    stats = {f: tip_stats[f] for f in carried}
                    stats.update(
                        _file_column_stats(root, fresh, stats_cols)
                    )
                nbytes = sum(
                    (root / f).stat().st_size for f in new_files
                )
            except FileNotFoundError as exc:
                # A vanished TIP file means the tip we read is already
                # stale (concurrent compaction + vacuum reclaimed it):
                # reapply against the fresh one. But a vanished file
                # from the update's own NEWLY-ADDED set (staged file
                # reclaimed by a racing vacuum, or a bad name returned
                # by update_fn) fails identically on every retry —
                # re-raise instead of burning 100 tip-reads and
                # masking it as "lost 100 consecutive commit races".
                tip_set = set(tip_files)
                not_from_tip = [
                    f
                    for f in new_files
                    if f not in tip_set and not (root / f).exists()
                ]
                if not_from_tip:
                    raise FileNotFoundError(
                        f"commit_snapshot_update: update_fn returned "
                        f"file(s) that do not exist in {table_path} "
                        f"and were not part of the tip (unretryable): "
                        f"{not_from_tip}"
                    ) from exc
                continue
            version = (versions or [0])[-1] + 1
            manifest = {
                "version": version,
                "note": note,
                "files": new_files,
                "n_files": len(new_files),
                "bytes": nbytes,
                "stats": stats,
                "op": op,  # see commit_snapshot's manifest note
                "added": added,
            }
            tmp.write_text(json.dumps(manifest, indent=1))
            try:
                os.link(tmp, d / f"v{version}.manifest.json")
                return version
            except FileExistsError:
                continue  # lost the race; reapply against the new tip
        raise RuntimeError(
            f"commit_snapshot_update: lost 100 consecutive commit races "
            f"at {table_path}"
        )
    finally:
        tmp.unlink(missing_ok=True)


def append_snapshot(
    spark: SparkSession,
    table_path: str,
    df: DataFrame,
    note: str = "append",
    stats_cols: tuple[str, ...] = (),
) -> int:
    """Append ``df`` as new data files and commit "tip + mine" with
    retry-with-reapply — safe against concurrent appenders AND a
    concurrent compactor (either interleaving preserves every row
    exactly once).

    Files are staged in a private directory then renamed to unique
    names, so concurrent appenders never share Spark's ``_temporary/0``
    (concurrent ``.write.mode("append")`` to one directory clobbers
    it); only the manifest commit is contended.
    """
    root = pathlib.Path(table_path)
    root.mkdir(parents=True, exist_ok=True)
    token = uuid.uuid4().hex[:12]
    new_files = _stage_and_publish(
        df, root, root / f".append-stage-{token}", f"append-{token}-"
    )
    try:
        v = commit_snapshot_update(
            spark,
            table_path,
            lambda cur: cur + new_files,
            note=note,
            stats_cols=stats_cols,
            op="append",
            added=new_files,
        )
    except RuntimeError:
        # commit-race exhaustion: our renamed-but-never-committed files
        # would otherwise sit in the table root as orphans
        # indistinguishable from a mid-commit writer's (only a later
        # aged vacuum could reclaim them) — unlink them before
        # propagating, exactly like compact_snapshot's abort path.
        for f in new_files:
            (root / f).unlink(missing_ok=True)
        raise
    assert v is not None  # append never aborts
    return v


def append_snapshot_files(
    spark: SparkSession,
    table_path: str,
    new_files: list[str],
    note: str = "append",
    stats_cols: tuple[str, ...] = (),
) -> int:
    """Commit ALREADY-WRITTEN data files (relative names under the
    table root, unique — e.g. ``append-{token}-*.parquet``) as an
    append — the driver-resident-payload path (r14): a micro-batch-
    bounded payload the driver already holds can be written with
    pyarrow directly (no Spark job) and committed here with the same
    retry-with-reapply + orphan-cleanup discipline as
    :func:`append_snapshot`. Uncommitted files are invisible to
    readers (only manifests are scanned), so no staging dir is needed
    when names are unique."""
    root = pathlib.Path(table_path)
    try:
        v = commit_snapshot_update(
            spark,
            table_path,
            lambda cur: cur + list(new_files),
            note=note,
            stats_cols=stats_cols,
            op="append",
            added=list(new_files),
        )
    except RuntimeError:
        for f in new_files:
            (root / f).unlink(missing_ok=True)
        raise
    assert v is not None  # append never aborts
    return v


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    where: tuple[str, object, object] | None = None,
) -> DataFrame:
    """Read the table AS OF a snapshot (latest when version is None).

    The scan is planned over the manifest's explicit file list: files
    added, rewritten, or compacted after this snapshot's commit are
    invisible, which is what makes concurrent compaction safe and old
    versions reproducible.

    ``where=(col, lo, hi)`` enables manifest-level data skipping: files
    whose committed [min, max] span for ``col`` (see
    ``commit_snapshot(stats_cols=...)``) cannot intersect [lo, hi] are
    dropped from the plan before Spark ever opens a footer — the
    Iceberg/Delta file-pruning shape, where at 100 TB the win is
    skipping whole files (and their object-store requests), a layer
    above parquet's own row-group pruning. Semantics are advisory:
    files without stats for ``col`` are always kept, and the caller
    still applies the actual row filter — pruning only removes files
    that provably contain no matching row.
    """
    versions = _list_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no snapshots committed at {table_path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"snapshot v{v} not found (have {versions})")
    manifest = json.loads(
        (_snap_dir(table_path) / f"v{v}.manifest.json").read_text()
    )
    root = pathlib.Path(table_path)
    files = manifest["files"]
    if not files:
        raise ValueError(f"snapshot v{v} is empty")
    if where is not None:
        col, lo, hi = where
        stats = manifest.get("stats", {})
        kept = [
            f
            for f in files
            if stats.get(f, {}).get("_rows") != 0
            and (
                (span := stats.get(f, {}).get(col)) is None
                or (span[0] <= hi and span[1] >= lo)
            )
        ]
        if not kept:  # provably empty: schema-stable zero-row frame
            return spark.read.parquet(
                *(str(root / f) for f in files)
            ).limit(0)
        files = kept
    return spark.read.parquet(*(str(root / f) for f in files))


#: Which snapshot_changes path served each call (observability only):
#: "fast" = pure-append file diff, "lineage" = op-typed walk across
#: rewrites, "full_diff" = two-snapshot exceptAll. Tests reset + read.
CHANGES_PATH_STATS = {"fast": 0, "lineage": 0, "full_diff": 0}


def snapshot_changes(
    spark: SparkSession, table_path: str, v_from: int, v_to: int
) -> DataFrame:
    """Incremental CHANGE FEED between two committed snapshots: the
    rows ADDED after ``v_from`` up to and including ``v_to`` — what a
    downstream incremental consumer (the reference's hourly
    consumers, a streaming backfill, an index maintainer) reads
    instead of rescanning the table.

    Fast path — PURE APPENDS (every ``v_from`` file still referenced
    by ``v_to``): the delta is exactly the files ``v_to`` references
    that ``v_from`` does not, so the plan is a scan of the NEW files
    only — file-level accounting, no data comparison, O(delta) at any
    table size. This is the path the append-only state tables
    (streaming near-dup index, the pretraining capstone's ledgers)
    always hit.

    Fast path — OPERATION-TYPED CHAIN (r11, Iceberg's incremental-read
    move): when a compaction rewrote ``v_from`` files, the delta is
    still file-level if every manifest in ``(v_from, v_to]`` declares
    its operation — "append" commits contribute exactly their
    ``added`` files (which stay on disk until vacuum even after later
    rewrites de-reference them, because earlier manifests and the
    grace chain keep them), "replace" commits are content-preserving
    and contribute nothing. The scan is the union of appended files:
    O(delta) ACROSS compactions.

    Fallback — an untyped or genuinely row-rewriting commit crossed
    the range, or retention already reclaimed an appended file: file
    identity no longer maps to row identity, so the delta is the exact
    multiset difference ``read(v_to) exceptAll read(v_from)`` — still
    correct (rewrites are content-preserving, so they cancel in the
    difference), but costed by the two snapshots instead of the delta.
    All three paths are gated in tests/test_snapshots.py against the
    same oracle rows; ``CHANGES_PATH_STATS`` records which one ran.
    """
    versions = _list_versions(table_path)
    for v in (v_from, v_to):
        if v not in versions:
            raise FileNotFoundError(
                f"snapshot v{v} not found (have {versions})"
            )
    if v_from > v_to:
        raise ValueError(f"v_from {v_from} > v_to {v_to}")
    root = pathlib.Path(table_path)
    delta_files = changed_files(table_path, v_from, v_to)
    if delta_files is not None:
        if not delta_files:
            # empty delta: a zero-row frame in the table's schema. If
            # v_to itself has no files (a schema-less empty snapshot),
            # derive the schema from the nearest retained NON-EMPTY
            # version instead of crashing a legitimate empty poll —
            # read_snapshot refuses empty manifests by design.
            d = _snap_dir(table_path)
            for v in sorted(versions, reverse=True):
                has = json.loads(
                    (d / f"v{v}.manifest.json").read_text()
                )["files"]
                if has:
                    return read_snapshot(
                        spark, table_path, v
                    ).limit(0)
            raise ValueError(
                f"snapshot_changes: every retained snapshot of "
                f"{table_path} is empty — no schema source for the "
                "empty change feed"
            )
        return spark.read.parquet(
            *(str(root / f) for f in delta_files)
        )
    CHANGES_PATH_STATS["full_diff"] += 1
    return read_snapshot(spark, table_path, v_to).exceptAll(
        read_snapshot(spark, table_path, v_from)
    )


def changed_files(
    table_path: str, v_from: int, v_to: int
) -> list[str] | None:
    """The FILE-LEVEL delta between two committed snapshots — the list
    of data files whose rows were appended in ``(v_from, v_to]`` — or
    ``None`` when only a full multiset diff is sound (an untyped or
    row-rewriting commit in the range, a retention gap in the manifest
    chain, or an appended file already reclaimed). Shared by
    :func:`snapshot_changes` and the streaming change-feed source
    (sources/pydatasource.py), which turns each returned file into one
    input partition. Both endpoint manifests must exist."""
    d = _snap_dir(table_path)
    files_from = json.loads(
        (d / f"v{v_from}.manifest.json").read_text()
    )["files"]
    files_to = json.loads((d / f"v{v_to}.manifest.json").read_text())[
        "files"
    ]
    from_set = set(files_from)
    if from_set <= set(files_to):
        CHANGES_PATH_STATS["fast"] += 1
        return [f for f in files_to if f not in from_set]
    # lineage walk: sum the appended files of every op-typed commit in
    # the range; any untyped commit, already-vacuumed file, or GAP in
    # the retained chain (a vacuumed intermediate manifest could hide
    # an append) → caller falls back to the full diff
    versions = _list_versions(table_path)
    in_range = [v for v in versions if v_from < v <= v_to]
    if in_range != list(range(v_from + 1, v_to + 1)):
        return None
    chain: list[str] = []
    for v in in_range:
        try:
            m = json.loads((d / f"v{v}.manifest.json").read_text())
        except FileNotFoundError:
            return None  # retention raced us mid-walk
        op = m.get("op")
        if op == "append":
            chain.extend(m.get("added") or [])
        elif op != "replace":
            return None  # untyped or row-rewriting commit
    root = pathlib.Path(table_path)
    if not all((root / f).is_file() for f in chain):
        return None
    CHANGES_PATH_STATS["lineage"] += 1
    return chain


def snapshot_tip(table_path: str) -> dict:
    """Summary of ONLY the latest snapshot — one manifest read. The
    per-batch maintenance loops poll the tip every micro-batch;
    going through :func:`snapshot_log` there parses EVERY retained
    manifest, O(versions) JSON reads per batch -> O(N^2) over a
    stream's life when vacuum is off."""
    vs = _list_versions(table_path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {table_path}")
    m = json.loads(
        (_snap_dir(table_path) / f"v{vs[-1]}.manifest.json").read_text()
    )
    return {k: m[k] for k in ("version", "note", "n_files", "bytes")}


def snapshot_log(table_path: str) -> list[dict]:
    """The commit log: one summary dict per retained snapshot."""
    out = []
    for v in _list_versions(table_path):
        m = json.loads(
            (_snap_dir(table_path) / f"v{v}.manifest.json").read_text()
        )
        out.append(
            {k: m[k] for k in ("version", "note", "n_files", "bytes")}
        )
    return out


def compact_snapshot(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    note: str = "compaction",
    stats_cols: tuple[str, ...] = (),
    layout_col: str | None = None,
    layout_files: int | None = None,
    layout_secondary: tuple[str, ...] = (),
    max_file_rows: int | None = None,
) -> int | None:
    """Table-format-style compaction: rewrite the LATEST snapshot's
    data into right-sized files and commit them as a new snapshot —
    the reader-atomic answer to io.compact_partitions' directory swap.

    Old data files are NOT touched: earlier snapshots keep reading
    them (time travel) until :func:`vacuum` reclaims them, so a
    concurrent reader planned against any committed manifest is never
    broken mid-scan.

    Concurrency (the compactor-vs-committer race): the commit is a
    retry-with-reapply update — "current tip − my base + my output".
    An append landing between the base read and the commit is KEPT (it
    survives in the reapplied list); a concurrent compaction that
    already rewrote this base ABORTS this one (publishing a second
    copy of the same rows would duplicate them), deleting its staged
    output and returning ``None``. Returns the new version otherwise.
    """
    import math
    import shutil

    root = pathlib.Path(table_path)
    versions = _list_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no snapshots committed at {table_path}")
    manifest = json.loads(
        (_snap_dir(table_path) / f"v{versions[-1]}.manifest.json").read_text()
    )
    base = set(manifest["files"])
    n_target = max(1, math.ceil(manifest["bytes"] / target_file_bytes))
    token = uuid.uuid4().hex[:12]
    stage = root / f".compact-stage-{token}"
    tip = read_snapshot(spark, table_path, version=manifest["version"])
    if layout_col is not None:
        # LAYOUT-PRESERVING compaction (Iceberg's sort-order rewrite):
        # range-partition + sort on the clustering column so each
        # output file covers a contiguous span of it — the property
        # the manifest-stats file pruning (read_snapshot where=,
        # similarity.prune_probe_files) depends on; a coalesce here
        # would interleave cells and destroy every file's span.
        #
        # Skew handling (VERDICT r11 #2): real corpora are Zipf-skewed
        # — one hot cell can hold 30-50% of the table, making the
        # survivor scan one giant file and its stats one giant span.
        # ``max_file_rows`` caps file size in ROWS (one control-plane
        # count decides the partition count), and ``layout_secondary``
        # lets the range partitioner SPLIT a hot layout_col value by a
        # secondary column (e.g. ccos for the stored-IVF index): each
        # of the hot cell's files then covers a contiguous ccos
        # sub-range, so its min-ccos stat — the probe's θ bound — is
        # strictly tighter than the whole cell's. Pruning soundness is
        # untouched (per-file stats stay true whatever the split).
        n_target = max(n_target, layout_files or 1)
        if max_file_rows is not None:
            # row count from the manifest's per-file _rows stats when
            # every file carries them (stats-committed tables do) —
            # zero Spark jobs; the count() scan is only the fallback
            # for stats-less manifests
            fstats = manifest.get("stats") or {}
            if all(
                "_rows" in fstats.get(f, {}) for f in manifest["files"]
            ):
                n_rows = sum(
                    fstats[f]["_rows"] for f in manifest["files"]
                )
            else:
                n_rows = tip.count()
            n_target = max(n_target, math.ceil(n_rows / max_file_rows))
        cols = [layout_col, *layout_secondary]
        tip = tip.repartitionByRange(
            n_target, *cols
        ).sortWithinPartitions(*cols)
    else:
        tip = tip.coalesce(n_target)
    new_files = _stage_and_publish(
        tip, root, stage, f"compacted-{token}-"
    )

    def _reapply(cur: list[str]) -> list[str] | None:
        if not base <= set(cur):
            return None  # base already rewritten by a rival compactor
        return [f for f in cur if f not in base] + new_files

    try:
        v = commit_snapshot_update(
            spark,
            table_path,
            _reapply,
            note=note,
            stats_cols=stats_cols,
            op="replace",  # content-preserving rewrite: adds no rows
            added=[],
        )
    except RuntimeError:
        for f in new_files:  # race exhaustion: reclaim unpublished output
            (root / f).unlink(missing_ok=True)
        raise
    if v is None:
        for f in new_files:  # aborted: reclaim our unpublished output
            (root / f).unlink(missing_ok=True)
    return v


_NOTESLOG = ".notes.log"


def snapshot_notes(table_path: str) -> set[str]:
    """Every non-empty commit note ever seen at this table: notes of
    LIVE manifests plus notes :func:`vacuum` preserved before dropping
    their manifests (``_snapshots/.notes.log``). Idempotence checks
    ("was chunk e{N}c{M} already committed?") must consult this, not
    :func:`snapshot_log`, because vacuum reclaims old manifests — a
    note's disappearance would otherwise make a replayed writer append
    its rows a second time (the streaming near-dup job's replay
    contract, streaming/jobs.py)."""
    notes = {
        e["note"] for e in snapshot_log(table_path) if e["note"]
    } if _list_versions(table_path) else set()
    log = _snap_dir(table_path) / _NOTESLOG
    if log.is_file():
        notes.update(
            ln for ln in log.read_text().splitlines() if ln
        )
    return notes


def vacuum(
    table_path: str, keep_last: int = 2, grace_s: float = 0.0
) -> int:
    """Drop manifests older than the last ``keep_last`` snapshots and
    delete data files no retained snapshot references. Returns the
    number of data files deleted. The current manifest is never
    touched, so readers of retained snapshots are unaffected.

    A table with zero committed snapshots has nothing safe to reclaim:
    ``referenced`` would be empty and the loop would unlink EVERY data
    file, so that case is a hard error (mirrors read_snapshot), not a
    silent table wipe. ``keep_last`` must retain at least the current
    snapshot.

    ORPHAN-FILE GRACE PERIOD (``grace_s``): a writer that has renamed
    its staged data files into the table root but not yet won its
    manifest commit (append_snapshot / compact_snapshot between their
    rename and commit steps) owns files unreferenced by every manifest
    — exactly what vacuum reclaims. ``grace_s > 0`` is Iceberg's
    remedy: unreferenced files whose mtime is younger than ``grace_s``
    seconds survive this vacuum (an in-flight commit completes; truly
    orphaned files — e.g. a writer that died after renaming — fall out
    of grace and a later vacuum reclaims them). The default 0.0 keeps
    the single-writer inline semantics (the streaming jobs call vacuum
    in the same thread as their own commits, so no in-flight writer
    can exist); ANY deployment where vacuum and writers run
    concurrently must pass a grace longer than the longest plausible
    stage-rename-commit window. Drilled in tests/test_snapshots.py:
    slow-writer-vs-vacuum race.

    Commit NOTES of dropped manifests are preserved in an append-only
    sidecar (``_snapshots/.notes.log``) so :func:`snapshot_notes`-based
    idempotence checks survive retention GC."""
    import time

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = _list_versions(table_path)
    if not versions:
        raise FileNotFoundError(
            f"no snapshots committed at {table_path}; refusing to vacuum "
            f"(every data file would be unreferenced and deleted)"
        )
    drop, keep = versions[:-keep_last], versions[-keep_last:]
    root = pathlib.Path(table_path)
    referenced: set[str] = set()
    for v in keep:
        m = json.loads(
            (_snap_dir(table_path) / f"v{v}.manifest.json").read_text()
        )
        referenced.update(m["files"])
    now = time.time()
    deleted = 0
    for f in _data_files(table_path):
        if f in referenced:
            continue
        if grace_s > 0:
            try:
                if now - (root / f).stat().st_mtime < grace_s:
                    continue  # possibly a mid-commit writer's file
            except FileNotFoundError:
                continue  # raced with its own writer/another vacuum
        try:
            (root / f).unlink()
            deleted += 1
        except FileNotFoundError:
            pass  # a racing second vacuum reclaimed it first
    _preserve_notes_then_drop(
        table_path,
        [_snap_dir(table_path) / f"v{v}.manifest.json" for v in drop],
    )
    return deleted


def _preserve_notes_then_drop(
    table_path: str, manifest_paths: list
) -> int:
    """Append the non-empty commit notes of ``manifest_paths`` to the
    table's ``.notes.log`` sidecar, THEN unlink the manifests — in
    that order, so a crash between the two steps can only leave a
    duplicate sidecar line (harmless: :func:`snapshot_notes` returns a
    set), never a lost note (which would break a replayed writer's
    idempotence check — ADVICE r10). Every retention path that drops
    snapshot manifests (:func:`vacuum` and both of
    :func:`catalog_vacuum`'s) must go through this. Returns the number
    of manifests dropped."""
    notes = []
    dropped = 0
    for mf in manifest_paths:
        try:
            note = json.loads(mf.read_text()).get("note", "")
        except FileNotFoundError:
            continue  # a racing second vacuum already processed it
        if note:
            notes.append(note)
    if notes:
        # O_APPEND single-write: atomic enough for one-line notes even
        # under a racing second vacuum
        with open(_snap_dir(table_path) / _NOTESLOG, "a") as fh:
            fh.write("".join(n + "\n" for n in notes))
    for mf in manifest_paths:
        try:
            mf.unlink()
            dropped += 1
        except FileNotFoundError:
            pass  # the racing vacuum dropped it first — same outcome
    return dropped


def streaming_snapshot_sink(
    result, table_path: str, checkpoint_dir: str
) -> None:
    """Exactly-once streaming sink ON TOP OF the manifest layer — the
    transactional upgrade of streaming/jobs.py:write_stream_idempotent
    (whose dynamic-partition overwrite is idempotent only per
    partition): each micro-batch stages its files, moves them to
    DETERMINISTIC names (``batch-<id>-<i>.parquet``), and commits one
    manifest noting the batch id.

    Replay safety, case by case:
    * batch replayed after its commit → the note is in the log, skip;
    * crash between file-move and commit → the replay re-stages and
      ``os.replace``s the SAME file names (no duplicates), then
      commits;
    * reader concurrency → readers only ever see committed manifests,
      so a half-written batch is invisible (the property the
      append-then-hope file sink lacks).
    """
    import shutil

    # Note-set cache: loaded once (per stream (re)start) from
    # snapshot_notes — which parses every RETAINED manifest plus the
    # vacuum sidecar — then maintained incrementally, so the per-batch
    # idempotence check is O(1) instead of O(retained versions) per
    # batch (which compounds to O(N²) over an unvacuumed stream's
    # life). Sound because this sink is the table's only writer (the
    # checkpoint serializes batches).
    done_cache: dict = {"notes": None}

    def _apply(batch_df, batch_id: int) -> None:
        note = f"batch-{batch_id}"
        root = pathlib.Path(table_path)
        root.mkdir(parents=True, exist_ok=True)
        if done_cache["notes"] is None:
            try:
                done_cache["notes"] = set(snapshot_notes(table_path))
            except FileNotFoundError:
                done_cache["notes"] = set()
        if note in done_cache["notes"]:
            return  # exactly-once: this batch already committed
        stage = root / f".stage-{note}"
        shutil.rmtree(stage, ignore_errors=True)
        # drop leftovers of a crashed earlier attempt before
        # publishing — a replay that repartitions into FEWER files
        # must not leave stale batch-N-000xx files behind as orphans
        # (they were never committed, so readers can't see them, but
        # only an aged vacuum would reclaim them)
        for stale in root.glob(f"{note}-*.parquet"):
            stale.unlink()
        batch_files = _stage_and_publish(
            batch_df, root, stage, f"{note}-", replace=True
        )
        # Commit "tip + mine" through the retry-with-reapply path, NOT
        # a directory listing: after a compaction of this table the
        # listing would see both the retained pre-compaction files and
        # their compacted replacements (time travel keeps both) and
        # publish every old row twice. op-typing the commit also keeps
        # the change-feed source's O(delta) lineage walk alive across
        # rewrites (an untyped commit forces the full-diff fallback).
        commit_snapshot_update(
            batch_df.sparkSession,
            table_path,
            lambda cur: cur + [f for f in batch_files if f not in cur],
            note=note,
            op="append",
            added=batch_files,
        )
        done_cache["notes"].add(note)

    q = (
        result.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --------------------------------------------------------------- catalog

_CATDIR = "_catalog"


def _cat_dir(catalog_path: str) -> pathlib.Path:
    return pathlib.Path(catalog_path) / _CATDIR


def _cat_versions(catalog_path: str) -> list[int]:
    d = _cat_dir(catalog_path)
    if not d.is_dir():
        return []
    out = []
    for f in d.glob("v*.catalog.json"):
        try:
            out.append(int(f.name[1:].split(".", 1)[0]))
        except ValueError:
            continue
    return sorted(out)


def commit_catalog(
    catalog_path: str,
    tables: dict[str, tuple[str, int]],
    note: str = "",
) -> int:
    """Atomically bind a set of tables to specific snapshot versions:
    ``tables`` maps name -> (table_path, snapshot_version). This is the
    multi-table transaction a single-table manifest cannot give you —
    e.g. committing a fact table and its dimension together so no
    reader ever joins new facts against old dims. Protocol is the same
    optimistic put-if-absent loop as commit_snapshot (stage, hard-link,
    retry on EEXIST), one level up: per-table snapshots commit first
    (each atomic on its own), then ONE catalog manifest makes the pair
    visible — readers resolving through the catalog see the old set or
    the new set, never a mix. Every referenced snapshot is validated to
    exist before staging, so a catalog version can never dangle."""
    for name, (tpath, tver) in tables.items():
        if tver not in _list_versions(tpath):
            raise FileNotFoundError(
                f"catalog commit references {name}@v{tver} but "
                f"{tpath} has versions {_list_versions(tpath)}"
            )
    d = _cat_dir(catalog_path)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".tmp-{uuid.uuid4().hex[:12]}"
    try:
        for _ in range(100):
            version = (_cat_versions(catalog_path) or [0])[-1] + 1
            manifest = {
                "version": version,
                "note": note,
                "tables": {
                    name: {"path": tpath, "version": tver}
                    for name, (tpath, tver) in sorted(tables.items())
                },
            }
            tmp.write_text(json.dumps(manifest, indent=1))
            try:
                os.link(tmp, d / f"v{version}.catalog.json")
                return version
            except FileExistsError:
                continue  # lost the race; retry against the new tip
        raise RuntimeError(
            f"commit_catalog: lost 100 consecutive commit races at "
            f"{catalog_path}"
        )
    finally:
        tmp.unlink(missing_ok=True)


def read_catalog_table(
    spark: SparkSession,
    catalog_path: str,
    name: str,
    catalog_version: int | None = None,
    where: tuple[str, object, object] | None = None,
) -> DataFrame:
    """Read ``name`` AS OF a catalog version (latest when None): the
    catalog pins the table to the snapshot it was committed with, so a
    multi-table reader that resolves every table through the SAME
    catalog version gets a transactionally consistent set, regardless
    of newer per-table snapshots that have not been bound yet.
    Resolution is delegated to :func:`catalog_table_entry` — ONE
    spelling of the version/lookup logic, not two that drift."""
    path, ver = catalog_table_entry(catalog_path, name, catalog_version)
    return read_snapshot(spark, path, ver, where=where)


def catalog_table_entry(
    catalog_path: str, name: str, catalog_version: int | None = None
) -> tuple[str, int]:
    """Resolve ``name`` through a catalog version to its bound
    ``(table_path, snapshot_version)`` — for callers that need the
    pinned snapshot's MANIFEST (file-pruning stats, change feeds), not
    just its rows."""
    versions = _cat_versions(catalog_path)
    if not versions:
        raise FileNotFoundError(f"no catalog commits at {catalog_path}")
    v = versions[-1] if catalog_version is None else catalog_version
    if v not in versions:
        raise FileNotFoundError(f"catalog v{v} not found (have {versions})")
    manifest = json.loads(
        (_cat_dir(catalog_path) / f"v{v}.catalog.json").read_text()
    )
    entry = manifest["tables"].get(name)
    if entry is None:
        raise KeyError(
            f"table {name!r} not in catalog v{v} "
            f"(has {sorted(manifest['tables'])})"
        )
    return entry["path"], entry["version"]


def catalog_log(catalog_path: str) -> list[dict]:
    """One summary dict per catalog commit."""
    out = []
    for v in _cat_versions(catalog_path):
        m = json.loads(
            (_cat_dir(catalog_path) / f"v{v}.catalog.json").read_text()
        )
        out.append(
            {
                "version": m["version"],
                "note": m["note"],
                "tables": {
                    n: e["version"] for n, e in m["tables"].items()
                },
            }
        )
    return out


def catalog_vacuum(
    catalog_path: str, keep_last: int = 2, grace_s: float = 0.0
) -> dict:
    """Retention GC one level up from :func:`vacuum`: drop catalog
    manifests older than the last ``keep_last`` catalog versions, then
    for every table referenced by ANY surviving catalog version, drop
    the snapshot manifests no survivor references and the data files
    no surviving snapshot references. The reference chain — catalog
    version → (table, snapshot) → data files — is walked exactly, so
    a reader of any SURVIVING catalog version is untouched, including
    older per-table snapshots that a newer catalog never rebound.

    Snapshot versions NEWER than anything the surviving catalog binds
    are also retained (they may be mid-publication: committed but not
    yet cataloged — deleting them would race an in-flight
    commit_catalog that already validated their existence).

    Tables present ONLY in dropped catalog versions (i.e. removed from
    the catalog before the retention horizon) are fully vacuumed —
    every snapshot manifest and data file goes — otherwise a dropped
    table's storage leaks forever, since no future catalog version can
    ever reference it again.  Tables never cataloged at all are NOT
    touched (they may be mid-publication: committed but not yet bound
    by an in-flight commit_catalog).

    ``grace_s`` extends :func:`vacuum`'s orphan-file grace period to
    the catalog walk: unreferenced DATA files younger than ``grace_s``
    seconds survive (a concurrent writer between its staged-rename and
    snapshot commit). Manifest/catalog JSON files are not graced —
    they are only dropped when provably outside the retained reference
    chain — and neither are dropped-only tables' files (a table
    removed from the catalog has no legitimate in-flight writer; see
    the inline note).

    Returns ``{"catalog_versions_dropped", "snapshots_dropped",
    "data_files_deleted"}``.
    """
    import time

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = _cat_versions(catalog_path)
    if not versions:
        raise FileNotFoundError(f"no catalog commits at {catalog_path}")
    drop, keep = versions[:-keep_last], versions[-keep_last:]
    d = _cat_dir(catalog_path)
    now = time.time()

    def _graced(p: pathlib.Path) -> bool:
        if grace_s <= 0:
            return False
        try:
            return now - p.stat().st_mtime < grace_s
        except FileNotFoundError:
            return True  # raced with its writer/another vacuum: skip

    # (table path) -> set of snapshot versions referenced by survivors
    referenced: dict[str, set[int]] = {}
    for v in keep:
        m = json.loads((d / f"v{v}.catalog.json").read_text())
        for entry in m["tables"].values():
            referenced.setdefault(entry["path"], set()).add(entry["version"])

    # Table paths bound only by DROPPED catalog versions are orphans:
    # no surviving (or future) catalog version can reference them, so
    # everything under their snapshot chain is reclaimable.
    dropped_only: set[str] = set()
    for v in drop:
        m = json.loads((d / f"v{v}.catalog.json").read_text())
        for entry in m["tables"].values():
            if entry["path"] not in referenced:
                dropped_only.add(entry["path"])

    # Highest snapshot version any DROPPED catalog version bound, per
    # dropped-only table: a snapshot NEWER than that is evidence of an
    # in-flight RE-PUBLICATION (commit_snapshot already succeeded, the
    # re-binding commit_catalog may be mid-validation) — wiping the
    # table now would leave the new catalog version dangling forever,
    # violating commit_catalog's never-dangles guarantee. Skip such
    # tables this run; if the re-publication stalls, a later vacuum
    # (after its catalog commit lands or its snapshots age past the
    # dropped bindings) reclaims or retains correctly.
    dropped_bound: dict[str, int] = {}
    for v in drop:
        m = json.loads((d / f"v{v}.catalog.json").read_text())
        for entry in m["tables"].values():
            if entry["path"] in dropped_only:
                dropped_bound[entry["path"]] = max(
                    dropped_bound.get(entry["path"], 0),
                    entry["version"],
                )

    snapshots_dropped = 0
    files_deleted = 0
    for tpath in sorted(dropped_only):
        tvers = _list_versions(tpath)
        if tvers and tvers[-1] > dropped_bound.get(tpath, 0):
            continue  # newer snapshot: a re-publication is in flight
        # No grace here, deliberately: a table bound ONLY by dropped
        # catalog versions was removed from the catalog before the
        # retention horizon — no legitimate writer can be mid-commit
        # against it (appending to a dropped table is a protocol
        # violation, and gracing its files while deleting the
        # manifests that reach them would orphan them permanently).
        root = pathlib.Path(tpath)
        snapshots_dropped += _preserve_notes_then_drop(
            tpath,
            [
                _snap_dir(tpath) / f"v{sv}.manifest.json"
                for sv in sorted(tvers)
            ],
        )
        for f in _data_files(tpath):
            try:
                (root / f).unlink()
                files_deleted += 1
            except FileNotFoundError:
                pass  # racing vacuum got it first
    for tpath, keep_snaps in referenced.items():
        newest_bound = max(keep_snaps)
        keep_files: set[str] = set()
        over_retention = []
        for sv in sorted(_list_versions(tpath)):
            if sv in keep_snaps or sv > newest_bound:
                m = json.loads(
                    (_snap_dir(tpath) / f"v{sv}.manifest.json").read_text()
                )
                keep_files.update(m["files"])
            else:
                over_retention.append(
                    _snap_dir(tpath) / f"v{sv}.manifest.json"
                )
        snapshots_dropped += _preserve_notes_then_drop(
            tpath, over_retention
        )
        root = pathlib.Path(tpath)
        for f in _data_files(tpath):
            if f not in keep_files:
                if _graced(root / f):
                    continue
                try:
                    (root / f).unlink()
                    files_deleted += 1
                except FileNotFoundError:
                    pass  # racing vacuum got it first
    for v in drop:
        try:
            (d / f"v{v}.catalog.json").unlink()
        except FileNotFoundError:
            pass  # racing catalog_vacuum dropped it first
    return {
        "catalog_versions_dropped": len(drop),
        "snapshots_dropped": snapshots_dropped,
        "data_files_deleted": files_deleted,
    }
