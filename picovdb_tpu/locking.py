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
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._readers = 0
        self._writer = False

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

    def release_read(self) -> None:
        with self._cond:
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def acquire_write(self) -> None:
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
