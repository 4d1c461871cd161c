"""Shared O_EXCL lockfile primitive with stale-steal.

One spelling of the advisory-lockfile protocol used by BOTH the
ledger sink's manifest commit (sources/pydatasource.py) and the lake
compactor's per-table serialization (io.py:compact_partitions) —
promoted out of the DataSource module once it grew a second consumer
(r13 review).

Protocol: put-if-absent via ``os.open(O_CREAT|O_EXCL)``; locks whose
mtime is older than the staleness window are STOLEN by atomic rename
(exactly one winner), with two forgery guards on the stolen file:
its inode must match the one observed by the staleness stat (the
stat-then-rename TOCTOU — another stealer may have removed the stale
lock and a new holder recreated a fresh one in between) AND it must
still be stale-aged (inode equality alone is forgeable by inode
reuse: ext4 hands the lowest free inode back). A mistakenly-stolen
fresh lock is restored under its original name via ``os.link`` —
which, unlike rename-back, cannot clobber a lock an even-newer
holder created in the absence window.

Long-running holders must refresh the lock's mtime (``heartbeat``)
more often than the staleness window, or a waiter will legitimately
steal a live lock.
"""

from __future__ import annotations

DEFAULT_STALE_S = 60.0

#: Seam for tests: the staleness stat inside acquire_exclusive_lock.
#: The fresh-lock-steal protection (inode verify + link-restore) is a
#: nanosecond-window interleave that cannot be driven from outside;
#: tests monkeypatch this to make the waiter observe a lying stat.
_lock_stat = None  # None → os.stat


def acquire_exclusive_lock(
    lock: str, stale_s: float = DEFAULT_STALE_S
) -> int:
    """Acquire the lockfile, stealing locks older than ``stale_s``.
    Returns the open fd (close via :func:`release_exclusive_lock`).
    Raises TimeoutError after ``stale_s`` + 30 s of contention."""
    import os
    import time
    import uuid as _uuid

    stat = _lock_stat or os.stat
    deadline = time.monotonic() + stale_s + 30.0
    while time.monotonic() < deadline:
        try:
            return os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                st = stat(lock)
            except FileNotFoundError:
                continue  # holder released between open and stat
            if time.time() - st.st_mtime > stale_s:
                steal = f"{lock}.steal-{os.getpid()}-{_uuid.uuid4().hex}"
                try:
                    os.rename(lock, steal)  # atomic: one winner
                except FileNotFoundError:
                    continue  # another stealer won; race for O_EXCL
                stolen = os.stat(steal)
                if (
                    stolen.st_ino != st.st_ino
                    or time.time() - stolen.st_mtime <= stale_s
                ):
                    # stole a FRESH lock (recreated after another
                    # stealer removed the stale one, possibly on the
                    # recycled inode): put it back. FileExistsError =
                    # an even-newer lock occupies the name; that
                    # microsecond interleave is then unrecoverable —
                    # vs. the old unconditional unlink that released
                    # EVERY fresh lock it caught.
                    try:
                        os.link(steal, lock)
                    except FileExistsError:
                        pass
                    os.unlink(steal)
                    time.sleep(0.05)
                    continue
                os.unlink(steal)
                continue
            time.sleep(0.05)
    raise TimeoutError(
        f"could not acquire {lock} — a concurrent holder is wedged"
    )


def heartbeat_lock(lock: str) -> None:
    """Refresh the lock's mtime so a live long-running holder is never
    mistaken for a crashed one. Call between units of work whose
    individual duration stays under the staleness window."""
    import os

    try:
        os.utime(lock)
    except FileNotFoundError:
        pass  # stolen (holder exceeded the window anyway) — the
        # release's inode check will decline to unlink the new
        # holder's lock


def release_exclusive_lock(lock: str, fd: int) -> None:
    """Release ONLY if the lock on disk is still OURS: a holder that
    stalled past the staleness window may have had its lock stolen —
    blindly unlinking would delete the STEALER's fresh lock and reopen
    the race. Inode equality (same fs) proves ownership; a stolen
    lock is simply left to its new holder."""
    import os

    try:
        if os.stat(lock).st_ino == os.fstat(fd).st_ino:
            os.unlink(lock)
    except FileNotFoundError:
        pass
    os.close(fd)
