"""Cross-process single-writer lock on an index directory.

The reference serializes writers with in-process mutexes only
(/root/reference/indexer/segment_updater.go:43-136 — sync.Mutex around
meta swaps): TWO writer processes pointed at one directory interleave
commits and corrupt the opstamp sequence. Lucene's answer is
``write.lock`` (LockFactory); this is that, shaped for the environments
a Spark index lives in (shared POSIX filesystems, long-running driver
processes that can die without cleanup):

- **Acquire** is an atomic ``O_CREAT|O_EXCL`` create of
  ``<index>/write.lock`` holding {lock_id, owner, pid, host, heartbeat}.
- **Liveness** is a heartbeat: a daemon thread refreshes the file every
  ``heartbeat`` seconds while the lock is held. A holder that dies
  stops heartbeating.
- **Stale-breaking**: a contender may break a lock whose holder pid is
  dead on this same host, or whose heartbeat is older than
  ``stale_after``. Breaking is race-safe — the stale file is
  ``os.rename``d to a contender-unique name first (exactly one
  concurrent stealer wins the rename; losers re-enter the acquire loop).
- **Reentrant per process**: public write entry points all take the
  lock, and they compose (update = delete + append build), so a
  process-local registry counts depth — the outermost acquire owns the
  file. This mirrors the reference's model of one IndexWriter owning
  many internal operations.
- **Release** unlinks only if the file still carries our lock_id
  (never deletes a lock a slow heartbeat lost and someone else validly
  re-acquired).

Driver-side only: executors never touch the lock — Spark tasks write
segment data under task-unique names and the single driver performs
every commit, so the driver process is the correct lock scope.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time
import uuid
from contextlib import contextmanager

LOCK_NAME = "write.lock"


class LockHeldError(RuntimeError):
    """Another live writer holds the index's write lock."""


def _lock_path(index_dir: str) -> str:
    return os.path.join(index_dir, LOCK_NAME)


def _pid_alive_here(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


# per-thread reentrancy (RLock semantics): realpath ->
# [lock_id, depth, (stop_event, thread), owner_thread_ident]. A DIFFERENT
# thread of this process is a distinct writer and is refused via the
# file path like any foreign process.
_HELD: dict[str, list] = {}
_HELD_MU = threading.Lock()


def _read(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None  # vanished or mid-write — caller retries


def _write_payload(path: str, payload: dict) -> None:
    # the lock file itself is the mutex; refresh rewrites it in place
    # via temp+rename so readers never see a torn write
    tmp = f"{path}.hb-{payload['pid']}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


@contextmanager
def write_lock(
    index_dir: str,
    owner: str = "",
    stale_after: float = 600.0,
    heartbeat: float = 15.0,
    wait: float = 0.0,
):
    """Hold the index's single-writer lock for the block. Raises
    ``LockHeldError`` if a live writer holds it (after waiting up to
    ``wait`` seconds). Reentrant within this process."""
    os.makedirs(index_dir, exist_ok=True)
    key = os.path.realpath(index_dir)
    with _HELD_MU:
        held = _HELD.get(key)
        if held is not None and held[3] == threading.get_ident():
            held[1] += 1
            reentered = True
        else:
            reentered = False
    if reentered:
        try:
            yield
        finally:
            with _HELD_MU:
                # decrement the SAME list object captured at entry — a
                # re-lookup could hit a different thread's entry if ours
                # was displaced by a (wrongly) broken-and-reacquired race
                held[1] -= 1
        return

    path = _lock_path(index_dir)
    lock_id = uuid.uuid4().hex
    me = {
        "lock_id": lock_id,
        "owner": owner,
        "pid": os.getpid(),
        "host": socket.gethostname(),
        "acquired_at": time.time(),
        "heartbeat_at": time.time(),
    }
    deadline = time.monotonic() + wait
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            cur = _read(path)
            if cur is None:
                continue  # being created/broken right now — retry
            dead = (
                cur.get("host") == me["host"]
                and isinstance(cur.get("pid"), int)
                and not _pid_alive_here(cur["pid"])
            )
            stale = time.time() - cur.get("heartbeat_at", 0) > stale_after
            if dead or stale:
                # exactly one concurrent breaker wins this rename
                broken = f"{path}.broken-{me['pid']}-{lock_id[:8]}"
                try:
                    os.rename(path, broken)
                except OSError:
                    continue
                moved = _read(broken)
                if moved is not None and moved.get("lock_id") != cur.get(
                    "lock_id"
                ):
                    # TOCTOU: between our staleness read and the rename,
                    # another breaker removed the stale lock and a NEW
                    # live holder appeared — we just stole a live lock.
                    # Restore it atomically-if-absent; if a third
                    # contender recreated the path meanwhile, the
                    # displaced holder loses its lease (its heartbeat
                    # notices the foreign lock_id and its release never
                    # unlinks a foreign lock).
                    try:
                        os.link(broken, path)
                    except OSError:
                        pass
                    os.unlink(broken)
                    continue
                os.unlink(broken)
                continue
            if time.monotonic() < deadline:
                time.sleep(min(0.2, heartbeat))
                continue
            raise LockHeldError(
                f"index {index_dir!r} is locked by "
                f"{cur.get('owner') or 'writer'} (pid {cur.get('pid')} on "
                f"{cur.get('host')}, heartbeat "
                f"{time.time() - cur.get('heartbeat_at', 0):.0f}s ago); "
                f"stale takeover after {stale_after:.0f}s without heartbeat"
            )
        with os.fdopen(fd, "w") as f:
            json.dump(me, f)
            f.flush()
            os.fsync(f.fileno())
        break

    stop = threading.Event()

    def _beat() -> None:
        while not stop.wait(heartbeat):
            cur = _read(path)
            if cur is None:
                continue  # transient (mid-break/restore) — never write a
                # resurrection; just skip this beat and look again
            if cur.get("lock_id") != lock_id:
                return  # genuinely lost the lock — stop refreshing
            cur["heartbeat_at"] = time.time()
            _write_payload(path, cur)

    t = threading.Thread(target=_beat, daemon=True, name=f"ostrich-lock-{lock_id[:8]}")
    t.start()
    ent = [lock_id, 1, (stop, t), threading.get_ident()]
    with _HELD_MU:
        _HELD[key] = ent
    try:
        yield
    finally:
        with _HELD_MU:
            ent[1] -= 1
            done = ent[1] == 0
            if done and _HELD.get(key) is ent:
                del _HELD[key]
        if done:
            stop.set()
            cur = _read(path)
            if cur is not None and cur.get("lock_id") == lock_id:
                try:
                    os.unlink(path)
                except OSError:
                    pass


def lock_info(index_dir: str) -> dict | None:
    """Current lock holder's payload, or None when unlocked."""
    return _read(_lock_path(index_dir))


def locked_writer(owner: str):
    """Decorator: hold the directory's write lock across the function.
    The wrapped function must take ``index_dir``. Reentrancy makes
    composition free (update = delete + build under one lock)."""
    import functools
    import inspect

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            with write_lock(str(bound.arguments["index_dir"]), owner=owner):
                return fn(*args, **kwargs)

        return wrapper

    return deco
