"""Reader-writer lock for host-side state.

Same semantics as the reference's `_RWLock` (picovdb/pico_vdb.py:1019-1063):
readers coexist, a writer excludes everyone, no writer priority. In this
framework the lock only guards *host* bookkeeping (id maps, doc lists,
dirty-row sets); device arrays are immutable JAX values, so queries get
snapshot isolation for free once they have captured the current device
handles — the property the reference's snapshot tests
(tests/test_task11_snapshot_reads.py) verify by construction here.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager


class RWLock:
    """Readers-coexist / writer-excludes lock.

    Unlike the reference's `_RWLock`, this one detects the classic
    self-deadlock (requesting the write lock while the same thread holds a
    read lock) and raises instead of hanging — the suite's stand-in for the
    race detectors the reference lacks (SURVEY.md §5 "Race detection").
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._readers = 0
        self._writer = False
        self._local = threading.local()

    def _read_depth(self) -> int:
        return getattr(self._local, "read_depth", 0)

    @contextmanager
    def read_lock(self):
        self.acquire_read()
        try:
            yield
        finally:
            self.release_read()

    @contextmanager
    def write_lock(self):
        self.acquire_write()
        try:
            yield
        finally:
            self.release_write()

    def acquire_read(self) -> None:
        with self._cond:
            while self._writer:
                self._cond.wait()
            self._readers += 1
        self._local.read_depth = self._read_depth() + 1

    def release_read(self) -> None:
        self._local.read_depth = max(0, self._read_depth() - 1)
        with self._cond:
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def acquire_write(self) -> None:
        if self._read_depth() > 0:
            raise RuntimeError(
                "deadlock: write lock requested while this thread holds a "
                "read lock"
            )
        with self._cond:
            while self._writer or self._readers > 0:
                self._cond.wait()
            self._writer = True

    def release_write(self) -> None:
        with self._cond:
            self._writer = False
            self._cond.notify_all()


# Back-compat alias matching the reference's private name.
_RWLock = RWLock
