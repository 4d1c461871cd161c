"""Shared exclusive-lockfile primitive: flock ownership + wedge-break.

One spelling of the advisory-lock protocol used by BOTH the ledger
sink's manifest commit (sources/pydatasource.py) and the lake
compactor's per-table serialization (io.py:compact_partitions) —
promoted out of the DataSource module once it grew a second consumer
(r13 review).

Protocol (r14 — rebuilt on ``flock`` after the rename-steal design's
absence window was observed producing two concurrent critical
sections under thread load):

* **Ownership is the kernel's.** ``acquire`` opens the lockfile
  (``O_CREAT``, no ``O_EXCL``) and takes ``flock(LOCK_EX|LOCK_NB)``
  on it; holding the flock on the inode that IS the path's current
  inode (verified post-flock) is what "holding the lock" means. Two
  openers share the inode, so the kernel serializes them — there is
  no create/steal/restore dance in the common path, hence no window
  where the lock name is absent and a third party can self-appoint.
* **Crashed holders cost nothing.** The kernel drops a dead
  process's flock instantly, so the next waiter's probe succeeds the
  moment the holder dies — no staleness window to wait out, no PID
  liveness probing, no PID-reuse hazard at all (VERDICT r13 #5,
  solved by removing the PID from the protocol rather than
  strengthening it). The fd is ``O_CLOEXEC`` so spawned children
  cannot prolong a parent's lock.
* **Wedged-alive holders are broken by staleness.** A holder that is
  alive but stalled holds its flock, so waiters fall back to mtime:
  the holder refreshes mtime on acquire and on every
  :func:`heartbeat_lock`; a lock whose flock fails AND whose mtime
  is past ``stale_s`` is wedged. Breaking is a verified atomic
  rename of the observed inode to a unique name (one winner), with
  a double-stat grace — the inode must be observed stale, still be
  the path's inode with an UNCHANGED stale mtime ~200 ms later, and
  still be both after the rename — so a just-acquired holder that
  has not yet stamped its mtime cannot be robbed. A mistaken break
  (the re-check raced) is restored via ``os.link``, which cannot
  clobber a newer lock. The broken holder's own next
  :func:`heartbeat_lock` sees the inode mismatch and raises, so a
  resumed zombie aborts before its next mutation instead of racing
  the new holder.
* A released-while-mistakenly-held lock can no longer stall waiters
  (the r13 "holder-less resurrection" quirk): liveness is the flock
  probe, not mtime, so a restored holder-less file is acquired on
  the next probe instead of being waited out.

Waiters treat an ADVANCING lock mtime as proof of liveness and
extend their acquire deadline, so a healthy multi-window run never
produces a spurious "holder is wedged" timeout. Same-host scope
(flock + local-filesystem rename semantics), like the compaction
swap protocol itself.

``holder_payload``/``proc_start``/``_pid_dead`` remain exported for
the compaction INTENT-MARKER liveness tiers (io.py), which have no
held fd to flock: markers record ``pid:starttime`` (/proc field 22,
the kernel's per-incarnation identity) so a recycled PID is provably
not the holder and recovery proceeds immediately.
"""

from __future__ import annotations

DEFAULT_STALE_S = 60.0

#: Grace between the two break-path stats: a LIVE holder stamps its
#: mtime within microseconds of acquiring; only a genuinely wedged
#: holder leaves it stale across this window.
_BREAK_GRACE_S = 0.2


def proc_start(pid) -> str | None:
    """The process's starttime (ticks since boot) from
    ``/proc/<pid>/stat`` field 22 — the kernel's per-incarnation
    identity for a PID. None off-Linux or when the process is gone;
    parsed after the last ``)`` because comm may contain spaces."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            stat = fh.read()
        return stat.rsplit(b")", 1)[1].split()[19].decode()
    except (OSError, IndexError):
        return None


def _read_holder(path: str):
    """(pid, starttime|None) recorded in a lockfile or marker;
    (None, None) when unreadable. Accepts a bare-pid payload."""
    try:
        with open(path, "rb") as fh:
            raw = fh.read(64).decode()
        pid_s, _, start = raw.partition(":")
        return int(pid_s or "x"), (start or None)
    except (OSError, ValueError):
        return None, None


def holder_payload() -> bytes:
    """This process's identity payload: ``pid:starttime``. Written
    into the lockfile for diagnostics and into compaction intent
    markers for recovery-time liveness (io.py)."""
    import os

    pid = os.getpid()
    start = proc_start(pid)
    return f"{pid}:{start}".encode() if start else str(pid).encode()


def _pid_dead(pid, start=None) -> bool:
    """Provably dead: the PID is gone, OR it is alive but its current
    starttime differs from the recorded one (a recycled PID — the
    recorded holder is dead). ``start=None`` (bare-pid payloads,
    non-Linux) degrades to the kill-only check, where a recycled PID
    delays recovery until staleness rather than blocking it. Used by
    the intent-marker recovery tiers; the lockfile protocol itself
    needs no PID (flock liveness)."""
    import os

    if pid is None:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return True
    except PermissionError:
        return False  # alive under another uid
    if start is not None:
        now = proc_start(pid)
        # the holder exited between kill(0) and the /proc read → dead;
        # starttime mismatch → recycled pid, recorded holder dead
        return now is None or now != start
    return False  # alive (or recycled bare-pid — staleness applies)


def acquire_exclusive_lock(
    lock: str, stale_s: float = DEFAULT_STALE_S
) -> int:
    """Acquire the lockfile; returns the open fd (close via
    :func:`release_exclusive_lock`). A crashed holder's lock is
    acquired instantly (the kernel released its flock); a WEDGED
    holder — alive, flock held, mtime past ``stale_s`` — is broken.
    Raises TimeoutError only after the observed lock has gone
    ``stale_s`` + 30 s WITHOUT an mtime advance (heartbeats extend
    the wait — a live long holder is contention, not a wedge)."""
    import fcntl
    import os
    import time

    deadline = time.monotonic() + stale_s + 30.0
    last_mtime = None
    while time.monotonic() < deadline:
        fd = os.open(lock, os.O_CREAT | os.O_RDWR | os.O_CLOEXEC)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except BlockingIOError:
            # a LIVE holder owns this inode's flock
            st = os.fstat(fd)
            os.close(fd)
            if last_mtime is None or st.st_mtime > last_mtime:
                # heartbeat observed: the holder is alive — restart
                # the patience clock instead of timing out on a
                # healthy multi-window run
                last_mtime = st.st_mtime
                deadline = time.monotonic() + stale_s + 30.0
            if time.time() - st.st_mtime > stale_s:
                _break_wedged(lock, st, stale_s)
            time.sleep(0.05)
            continue
        # flock held — but only the path's CURRENT inode counts as
        # the lock; a breaker/releaser may have unlinked this one
        # between our open and our flock
        try:
            cur_ino = os.stat(lock).st_ino
        except FileNotFoundError:
            cur_ino = None
        if cur_ino != os.fstat(fd).st_ino:
            os.close(fd)
            continue
        # stamp IMMEDIATELY: a stale pre-existing mtime (e.g. a
        # crashed holder's file we just adopted) would otherwise make
        # a waiter's break path rob us before our first heartbeat
        os.ftruncate(fd, 0)
        os.write(fd, holder_payload())
        return fd
    raise TimeoutError(
        f"could not acquire {lock} — a concurrent holder is wedged"
    )


def _break_wedged(lock, observed, stale_s: float) -> None:
    """Remove a wedged-alive holder's lock inode so waiters can
    re-create and contend. Double-stat grace + verified atomic
    rename: act only on the EXACT inode observed stale, and only if
    its mtime is still the same stale value after ``_BREAK_GRACE_S``
    — a live just-acquired holder stamps its mtime within
    microseconds, so it cannot be robbed. Exactly one breaker wins
    the rename; a mistaken steal (the re-check itself raced) is
    restored via ``os.link``, which cannot clobber a newer lock."""
    import os
    import time
    import uuid as _uuid

    time.sleep(_BREAK_GRACE_S)
    try:
        st2 = os.stat(lock)
    except FileNotFoundError:
        return  # released/broken meanwhile
    if (
        st2.st_ino != observed.st_ino
        or st2.st_mtime != observed.st_mtime
        or time.time() - st2.st_mtime <= stale_s
    ):
        return  # replaced, or the holder stamped/heartbeat — live
    steal = f"{lock}.steal-{os.getpid()}-{_uuid.uuid4().hex}"
    try:
        os.rename(lock, steal)  # atomic: one winner
    except FileNotFoundError:
        return
    stolen = os.stat(steal)
    if stolen.st_ino != observed.st_ino or (
        time.time() - stolen.st_mtime <= stale_s
    ):
        # renamed a FRESH lock (the name changed hands inside the
        # stat→rename gap): put it back. FileExistsError = an even
        # newer lock occupies the name; that microsecond interleave
        # is unrecoverable for THIS inode's holder, whose next
        # heartbeat aborts it.
        try:
            os.link(steal, lock)
        except FileExistsError:
            pass
    os.unlink(steal)


def heartbeat_lock(lock: str, fd: int) -> None:
    """Refresh the lock's mtime so a live long-running holder is never
    mistaken for a wedged one — after VERIFYING the lock on disk is
    still this holder's (inode match against ``fd``). A broken lock
    raises TimeoutError so the losing run aborts before its next
    mutation instead of silently racing the new holder (and
    refreshing THE NEW HOLDER's lock for it)."""
    import os

    try:
        if os.stat(lock).st_ino != os.fstat(fd).st_ino:
            raise TimeoutError(
                f"lock {lock} was broken (holder exceeded the "
                "staleness window) — aborting before further mutation"
            )
        os.utime(lock)
    except FileNotFoundError:
        raise TimeoutError(
            f"lock {lock} vanished (broken mid-release) — aborting "
            "before further mutation"
        ) from None


def release_exclusive_lock(lock: str, fd: int) -> None:
    """Release ONLY if the lock on disk is still OURS: a holder that
    stalled past the staleness window may have had its lock broken —
    blindly unlinking would delete the NEW holder's lock and reopen
    the race. Inode equality (same fs) proves ownership; a broken
    lock is simply left to its new holder. Closing the fd drops the
    flock either way."""
    import os

    try:
        if os.stat(lock).st_ino == os.fstat(fd).st_ino:
            os.unlink(lock)
    except FileNotFoundError:
        pass
    os.close(fd)
