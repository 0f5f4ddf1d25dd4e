"""Dataset lifecycle state machine + failure tracking.

Reference behavior reproduced:
- 5 lifecycle states (app/schemas/hyperfile.py:11-16):
  queued → syncing → {file_available | latest_sync_failed |
  file_unavailable};
- per-job failure counter in meta_data["sync-failures"], reset on
  success, auto-deactivate at ≥3 consecutive failures
  (app/utils/hyper_utils.py:222-268, threshold :254);
- status transitions written before/after each import
  (app/crud/crud_hyperfile.py:55-62, app/core/importer.py:129-131,
  :196-225).

The store is a pluggable dict-backed catalog (swap for Postgres/Delta in
production); the engine only needs get/put semantics.
"""

from __future__ import annotations

import enum
import json
import os
import tempfile
import threading
import time
from dataclasses import asdict, dataclass
from pathlib import Path

FAILURE_CAP = 3  # app/utils/hyper_utils.py:254

# Catalog schema version — the JSON-store analogue of the reference's
# alembic migration chain (app/alembic/versions/, 8 revisions). The
# store file stamps its version; on load, older versions are upgraded
# in sequence through _UPGRADES and FUTURE versions are refused (the
# reference's `alembic upgrade head` contract: old data migrates
# forward, a new-schema DB is never opened by old code).
SCHEMA_VERSION = 2


class MetadataSchemaError(RuntimeError):
    """Store file written by a NEWER schema than this code understands."""


def _upgrade_v1_to_v2(doc: dict) -> dict:
    """v1 → v2: v1 was the bare {dataset_id: row} mapping with no
    version stamp; v2 wraps it in {"schema_version", "rows"} and
    backfills fields added after v1 shipped (dataclass defaults), so a
    v2 reader never sees a partial row."""
    from dataclasses import fields

    defaults = {
        f.name: f.default for f in fields(DatasetState) if f.name != "dataset_id"
    }
    rows = {rid: {**defaults, **raw} for rid, raw in doc.items()}
    return {"schema_version": 2, "rows": rows}


_UPGRADES = {1: _upgrade_v1_to_v2}


class FileStatus(str, enum.Enum):
    QUEUED = "Sync Queued"
    SYNCING = "Syncing file"
    LATEST_SYNC_FAILED = "Latest Sync Failed"
    FILE_AVAILABLE = "File available"
    FILE_UNAVAILABLE = "File unavailable"


@dataclass
class DatasetState:
    dataset_id: str
    file_status: str = FileStatus.QUEUED.value
    is_active: bool = True
    sync_failures: int = 0
    last_updated: float | None = None
    failure_reason: str | None = None
    job_id: str | None = None


class MetadataStore:
    """JSON-file-backed catalog of DatasetState rows (the duva Postgres
    HyperFile table, minus auth)."""

    def __init__(self, path: str | Path):
        self._path = Path(path)
        self._rows: dict[str, DatasetState] = {}
        # Handlers of the stdlib ThreadingHTTPServer mutate the store from
        # multiple threads; one re-entrant lock serializes row mutation +
        # flush so updates can't interleave or get lost.
        self._mu = threading.RLock()
        if self._path.exists():
            doc = json.loads(self._path.read_text())
            # v1 files are the bare row mapping — no version stamp.
            version = doc.get("schema_version", 1) if isinstance(doc, dict) else 1
            if not isinstance(version, int):
                version = 1
            if version > SCHEMA_VERSION:
                raise MetadataSchemaError(
                    f"store {self._path} is schema v{version}; this build "
                    f"understands ≤ v{SCHEMA_VERSION} — refuse rather than "
                    "silently drop newer fields"
                )
            upgraded = version < SCHEMA_VERSION
            while version < SCHEMA_VERSION:
                doc = _UPGRADES[version](doc)
                version = doc["schema_version"]
            # Post-upgrade, a well-formed doc ALWAYS carries "rows"; a
            # v2-stamped file without it is corrupt — refuse loudly
            # rather than iterating the envelope into a TypeError.
            rows = doc.get("rows")
            if not isinstance(rows, dict):
                raise MetadataSchemaError(
                    f"store {self._path} is stamped v{version} but has no "
                    '"rows" mapping — file is malformed'
                )
            for rid, raw in rows.items():
                self._rows[rid] = DatasetState(**raw)
            if upgraded:
                self._flush()  # persist the migrated form immediately

    def _flush(self) -> None:
        # Atomic: write a temp file in the same directory, then os.replace
        # — a crash mid-write can never leave a truncated store behind.
        payload = json.dumps(
            {
                "schema_version": SCHEMA_VERSION,
                "rows": {rid: asdict(s) for rid, s in self._rows.items()},
            },
            indent=1,
        )
        fd, tmp = tempfile.mkstemp(dir=self._path.parent or ".", suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            os.replace(tmp, self._path)
        except BaseException:
            Path(tmp).unlink(missing_ok=True)
            raise

    def get(self, dataset_id: str) -> DatasetState:
        with self._mu:
            if dataset_id not in self._rows:
                self._rows[dataset_id] = DatasetState(dataset_id)
            return self._rows[dataset_id]

    def ids(self) -> list[str]:
        with self._mu:
            return sorted(self._rows)

    def exists(self, dataset_id: str) -> bool:
        with self._mu:
            return dataset_id in self._rows

    def delete(self, dataset_id: str) -> bool:
        with self._mu:
            if dataset_id not in self._rows:
                return False
            del self._rows[dataset_id]
            self._flush()
            return True

    def update_status(self, dataset_id: str, status: FileStatus) -> None:
        with self._mu:
            self.get(dataset_id).file_status = status.value
            self._flush()

    def record_success(self, dataset_id: str) -> None:
        with self._mu:
            s = self.get(dataset_id)
            s.file_status = FileStatus.FILE_AVAILABLE.value
            s.sync_failures = 0  # reset on success (hyper_utils.py:241-246)
            s.failure_reason = None
            s.last_updated = time.time()
            self._flush()

    def record_failure(self, dataset_id: str, reason: str, unavailable: bool = False) -> None:
        """Increment the consecutive-failure counter; deactivate at the cap
        (cancelling any schedule is the caller's concern, as in
        hyper_utils.py:254-263)."""
        with self._mu:
            s = self.get(dataset_id)
            s.file_status = (
                FileStatus.FILE_UNAVAILABLE if unavailable else FileStatus.LATEST_SYNC_FAILED
            ).value
            s.sync_failures += 1
            s.failure_reason = reason
            if s.sync_failures >= FAILURE_CAP:
                s.is_active = False
            self._flush()
