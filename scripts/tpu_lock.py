"""Advisory lock for the single TPU chip (CLAUDE.md: one process may
hold the axon attachment at a time — concurrent holders wedge or skew
every measurement).

Convention: ``/tmp/pgv_tpu.lock`` holds the owner PID + a label. A lock
whose PID is dead is stale and silently reclaimed. Scripts that run TPU
work for minutes+ (training protocols, bench captures, the armed
sampler) take the lock; quick interactive probes may skip it.
"""

from __future__ import annotations

import contextlib
import os
import pathlib
import time

LOCK_PATH = pathlib.Path("/tmp/pgv_tpu.lock")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def holder() -> tuple:
    """(pid, label) of the current live holder, or (None, None)."""
    try:
        pid_s, _, label = LOCK_PATH.read_text().partition(" ")
        pid = int(pid_s)
    except (OSError, ValueError):
        return None, None
    if not _pid_alive(pid):
        return None, None
    return pid, label.strip()


def _try_acquire(label: str) -> bool:
    """One atomic acquisition attempt: O_CREAT|O_EXCL so two waiters
    polling the same release instant cannot BOTH conclude the chip is
    free and write over each other (two live holders wedge the chip —
    the exact failure the lock exists to prevent). Stale files (dead
    holder PID) are unlinked and the create retried once."""
    for _ in range(2):
        try:
            fd = os.open(LOCK_PATH, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            pid, _ = holder()
            if pid is not None:  # live holder (or our own re-entry)
                return False
            with contextlib.suppress(OSError):
                LOCK_PATH.unlink()  # stale: dead PID
            continue
        with os.fdopen(fd, "w") as f:
            f.write(f"{os.getpid()} {label}")
        return True
    return False


_depth = 0  # same-process nesting depth; only depth 0 -> 1 -> 0 touches
# the file (an inner ``with`` exiting must NOT release the outer hold)


@contextlib.contextmanager
def tpu_lock(label: str, wait_s: float = 0.0, poll_s: float = 30.0):
    """Acquire the chip lock (reclaiming stale ones), yield, release.
    Raises ``TimeoutError`` if a live holder persists past ``wait_s``.
    Re-entrant within one process (depth-counted)."""
    global _depth
    deadline = time.time() + wait_s
    while True:
        pid, _who = holder()
        if pid == os.getpid():
            break  # re-entry by the same process keeps the lock
        if _try_acquire(label):
            break
        pid, who = holder()
        if time.time() >= deadline:
            raise TimeoutError(
                f"TPU lock held by pid {pid} ({who}); retry later"
            )
        time.sleep(poll_s)
    _depth += 1
    try:
        yield
    finally:
        _depth -= 1
        if _depth == 0:
            p, _ = holder()
            if p == os.getpid():
                with contextlib.suppress(OSError):
                    LOCK_PATH.unlink()


def locked_out() -> bool:
    """True when another live process holds the chip."""
    pid, _ = holder()
    return pid is not None and pid != os.getpid()
