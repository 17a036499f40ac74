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


@contextlib.contextmanager
def tpu_lock(label: str, wait_s: float = 0.0, poll_s: float = 30.0):
    """Acquire the chip lock (reclaiming stale ones), yield, release.
    Raises ``TimeoutError`` if a live holder persists past ``wait_s``."""
    deadline = time.time() + wait_s
    while True:
        pid, who = holder()
        if pid is None or pid == os.getpid():
            break
        if time.time() >= deadline:
            raise TimeoutError(
                f"TPU lock held by pid {pid} ({who}); retry later"
            )
        time.sleep(poll_s)
    LOCK_PATH.write_text(f"{os.getpid()} {label}")
    try:
        yield
    finally:
        p, _ = holder()
        if p == os.getpid():
            with contextlib.suppress(OSError):
                LOCK_PATH.unlink()


def locked_out() -> bool:
    """True when another live process holds the chip."""
    pid, _ = holder()
    return pid is not None and pid != os.getpid()
