"""Per-dataset mutual exclusion.

The reference wraps each import in a Redis lock keyed
``sync-hyperfile-{id}`` so concurrent syncs of one file can't interleave
(app/utils/onadata_utils.py:203, prefix app/common_tags.py:5). Here: an
O_EXCL lockfile (single-host; swap for Redis/ZooKeeper on a cluster —
the interface is the context manager, not the backend).

Stale-lock recovery mirrors the reference lock's expiry semantics: the
holder's PID is stored in the file, and a contender reclaims the lock
when that process no longer exists (kill -9 / OOM between enter and
exit) or the file is unreadable and older than ``stale_ttl`` seconds."""

from __future__ import annotations

import os
import time
from pathlib import Path


class LockHeld(RuntimeError):
    pass


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


class DatasetLock:
    PREFIX = "sync-dataset-"  # mirrors common_tags.py:5

    def __init__(self, lock_dir: str | Path, dataset_id: str, stale_ttl: float = 3600.0):
        self._path = Path(lock_dir) / f"{self.PREFIX}{dataset_id}.lock"
        self._fd: int | None = None
        self._stale_ttl = stale_ttl

    def _is_stale(self) -> bool:
        try:
            raw = self._path.read_text().strip()
            return not _pid_alive(int(raw))
        except FileNotFoundError:
            return False  # holder released between EXCL failure and here
        except (ValueError, OSError):
            # Unreadable / partial write: fall back to an mtime TTL.
            try:
                return time.time() - self._path.stat().st_mtime > self._stale_ttl
            except FileNotFoundError:
                return False

    def __enter__(self) -> "DatasetLock":
        for attempt in range(2):
            try:
                self._fd = os.open(self._path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if attempt == 0 and self._is_stale():
                    # Dead holder: reclaim and retry the O_EXCL create once.
                    # A concurrent reclaimer racing us loses the second
                    # O_EXCL and raises LockHeld — never two holders.
                    self._path.unlink(missing_ok=True)
                    continue
                raise LockHeld(f"sync already in progress: {self._path.name}") from None
        os.write(self._fd, str(os.getpid()).encode())
        return self

    def __exit__(self, *exc) -> None:
        if self._fd is not None:
            os.close(self._fd)
            self._path.unlink(missing_ok=True)
