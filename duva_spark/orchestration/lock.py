"""Per-dataset mutual exclusion.

The reference wraps each import in a Redis lock keyed
``sync-hyperfile-{id}`` so concurrent syncs of one file can't interleave
(app/utils/onadata_utils.py:203, prefix app/common_tags.py:5). Here: an
O_EXCL lockfile (single-host; swap for Redis/ZooKeeper on a cluster —
the interface is the context manager, not the backend)."""

from __future__ import annotations

import os
from pathlib import Path


class LockHeld(RuntimeError):
    pass


class DatasetLock:
    PREFIX = "sync-dataset-"  # mirrors common_tags.py:5

    def __init__(self, lock_dir: str | Path, dataset_id: str):
        self._path = Path(lock_dir) / f"{self.PREFIX}{dataset_id}.lock"
        self._fd: int | None = None

    def __enter__(self) -> "DatasetLock":
        try:
            self._fd = os.open(self._path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise LockHeld(f"sync already in progress: {self._path.name}") from None
        os.write(self._fd, str(os.getpid()).encode())
        return self

    def __exit__(self, *exc) -> None:
        if self._fd is not None:
            os.close(self._fd)
            self._path.unlink(missing_ok=True)
