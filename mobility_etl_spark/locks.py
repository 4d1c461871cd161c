"""Shared O_EXCL lockfile primitive with stale-steal.

One spelling of the advisory-lockfile protocol used by BOTH the
ledger sink's manifest commit (sources/pydatasource.py) and the lake
compactor's per-table serialization (io.py:compact_partitions) —
promoted out of the DataSource module once it grew a second consumer
(r13 review).

Protocol: put-if-absent via ``os.open(O_CREAT|O_EXCL)``; the holder's
PID is written into the file. A lock is STEALABLE when its mtime is
older than the staleness window OR its recorded holder PID is
provably dead (same-host ``os.kill(pid, 0)`` — the fast path that
keeps a crashed holder from blocking reruns for the whole window;
PID reuse merely delays the steal until staleness, never blocks it).
The steal is an atomic rename (exactly one winner) with forgery
guards on the stolen file: its inode must match the one observed by
the staleness stat (the stat-then-rename TOCTOU) AND it must either
still be stale-aged or still carry the observed dead holder's PID —
inode equality alone is forgeable by inode reuse (ext4 hands the
lowest free inode back). A mistakenly-stolen fresh lock is restored
under its original name via ``os.link`` — which, unlike rename-back,
cannot clobber a lock an even-newer holder created in the absence
window.

Long-running holders must :func:`heartbeat_lock` more often than the
staleness window; the heartbeat verifies the lock is still OWNED
(inode match against the holder's fd) and raises if it was stolen,
so a stalled-then-resumed holder aborts before its next mutation
instead of silently racing the stealer.

Known bounded liveness quirk: if a holder RELEASES (unlinks) while a
mistaken stealer holds the renamed file, the stealer's link-restore
resurrects a holder-less lock; waiters then wait it out — the dead-
PID fast path or the staleness window reclaims it, so the stall is
bounded by ``stale_s``, never a deadlock, and no correctness window
opens (nobody holds an fd to it). Waiters treat an ADVANCING
lock mtime as proof of liveness and extend their acquire deadline,
so a healthy multi-window run never produces a spurious
"holder is wedged" timeout. Same-host scope (local-filesystem rename
semantics + PID liveness), like the compaction swap protocol itself.
"""

from __future__ import annotations

DEFAULT_STALE_S = 60.0

#: Seam for tests: the staleness stat inside acquire_exclusive_lock.
#: The fresh-lock-steal protection (inode verify + link-restore) is a
#: nanosecond-window interleave that cannot be driven from outside;
#: tests monkeypatch this to make the waiter observe a lying stat.
_lock_stat = None  # None → os.stat


def _read_pid(path: str):
    try:
        with open(path, "rb") as fh:
            return int(fh.read(32).decode() or "x")
    except (OSError, ValueError):
        return None


def _pid_dead(pid) -> bool:
    import os

    if pid is None:
        return False
    try:
        os.kill(pid, 0)
        return False  # alive (or recycled — staleness still applies)
    except ProcessLookupError:
        return True
    except PermissionError:
        return False  # alive under another uid


def acquire_exclusive_lock(
    lock: str, stale_s: float = DEFAULT_STALE_S
) -> int:
    """Acquire the lockfile; returns the open fd (close via
    :func:`release_exclusive_lock`). Steals stale or dead-holder
    locks; raises TimeoutError only after the observed lock has gone
    ``stale_s`` + 30 s WITHOUT an mtime advance (heartbeats extend
    the wait — a live long holder is contention, not a wedge)."""
    import os
    import time
    import uuid as _uuid

    stat = _lock_stat or os.stat
    deadline = time.monotonic() + stale_s + 30.0
    last_mtime = None
    while time.monotonic() < deadline:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            return fd
        except FileExistsError:
            try:
                st = stat(lock)
            except FileNotFoundError:
                continue  # holder released between open and stat
            if last_mtime is None or st.st_mtime > last_mtime:
                # heartbeat observed: the holder is alive — restart
                # the patience clock instead of timing out on a
                # healthy multi-window run
                last_mtime = st.st_mtime
                deadline = time.monotonic() + stale_s + 30.0
            observed_pid = _read_pid(lock)
            is_stale = time.time() - st.st_mtime > stale_s
            if is_stale or _pid_dead(observed_pid):
                steal = f"{lock}.steal-{os.getpid()}-{_uuid.uuid4().hex}"
                try:
                    os.rename(lock, steal)  # atomic: one winner
                except FileNotFoundError:
                    continue  # another stealer won; race for O_EXCL
                stolen = os.stat(steal)
                still_stale = time.time() - stolen.st_mtime > stale_s
                same_dead_holder = (
                    not is_stale
                    and _read_pid(steal) == observed_pid
                )
                if stolen.st_ino != st.st_ino or not (
                    still_stale or same_dead_holder
                ):
                    # stole a FRESH lock (recreated after another
                    # stealer removed the old one, possibly on the
                    # recycled inode): put it back. FileExistsError =
                    # an even-newer lock occupies the name; that
                    # microsecond interleave is then unrecoverable —
                    # vs. an unconditional unlink that would release
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


def heartbeat_lock(lock: str, fd: int) -> None:
    """Refresh the lock's mtime so a live long-running holder is never
    mistaken for a crashed one — after VERIFYING the lock on disk is
    still this holder's (inode match against ``fd``). A stolen lock
    raises TimeoutError so the losing run aborts before its next
    mutation instead of silently racing the new holder (and
    refreshing THE STEALER's lock for it)."""
    import os

    try:
        if os.stat(lock).st_ino != os.fstat(fd).st_ino:
            raise TimeoutError(
                f"lock {lock} was stolen (holder exceeded the "
                "staleness window) — aborting before further mutation"
            )
        os.utime(lock)
    except FileNotFoundError:
        raise TimeoutError(
            f"lock {lock} vanished (stolen and released) — aborting "
            "before further mutation"
        ) from None


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
