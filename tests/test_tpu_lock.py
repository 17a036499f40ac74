"""Tests for the advisory single-chip lock (scripts/tpu_lock.py).

Round 5 made acquisition atomic (O_CREAT|O_EXCL): with two chains
queued on the chip (train -> fresh-process salvage eval, plus the armed
bench sampler), two waiters polling the same release instant must not
BOTH conclude the chip is free — two live holders wedge the axon
attachment (CLAUDE.md: one process may hold it at a time).
"""

import multiprocessing as mp
import os
import pathlib
import sys
import time

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import scripts.tpu_lock as tl


@pytest.fixture()
def scratch_lock(tmp_path, monkeypatch):
    monkeypatch.setattr(tl, "LOCK_PATH", tmp_path / "pgv_tpu.lock")
    return tl.LOCK_PATH


def _hold(lock_path, q, hold_s):
    import scripts.tpu_lock as tl2

    tl2.LOCK_PATH = pathlib.Path(lock_path)
    with tl2.tpu_lock("holder"):
        q.put("held")
        time.sleep(hold_s)


def test_locked_out_and_timeout(scratch_lock):
    q = mp.Queue()
    p = mp.Process(target=_hold, args=(str(scratch_lock), q, 3.0))
    p.start()
    try:
        assert q.get(timeout=10) == "held"
        assert tl.locked_out()
        with pytest.raises(TimeoutError):
            with tl.tpu_lock("me", wait_s=0.0, poll_s=0.1):
                pass
    finally:
        p.join()


def test_acquire_after_release_reentry_and_cleanup(scratch_lock):
    q = mp.Queue()
    p = mp.Process(target=_hold, args=(str(scratch_lock), q, 1.0))
    p.start()
    assert q.get(timeout=10) == "held"
    with tl.tpu_lock("me", wait_s=15.0, poll_s=0.1):
        assert int(scratch_lock.read_text().split()[0]) == os.getpid()
        with tl.tpu_lock("me-again"):  # same-process re-entry keeps it
            pass
        assert scratch_lock.exists()
    assert not scratch_lock.exists()
    p.join()


def test_stale_dead_pid_reclaimed(scratch_lock):
    scratch_lock.write_text("999999 ghost")
    with tl.tpu_lock("me", wait_s=1.0, poll_s=0.1):
        assert int(scratch_lock.read_text().split()[0]) == os.getpid()


def test_atomic_create_beats_concurrent_writer(scratch_lock):
    # direct probe of the primitive: once a live holder's file exists,
    # _try_acquire must refuse — never overwrite
    scratch_lock.write_text(f"{os.getpid()} someone-alive")
    # a different label from another "process" (simulated: file already
    # present with a LIVE pid) must not be clobbered
    assert tl.holder()[0] == os.getpid()
    # a second acquisition attempt by a hypothetical racer is the
    # O_EXCL branch: FileExistsError -> live holder -> False
    assert tl._try_acquire("racer") is False
    assert scratch_lock.read_text().endswith("someone-alive")
