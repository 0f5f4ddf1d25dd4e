"""Orchestration: the reference's control plane re-expressed around a
SparkSession — dataset lifecycle states, consecutive-failure tracking
with auto-deactivation, per-dataset mutual exclusion, and the composite
sync job (C1–C7 in SURVEY §2a)."""

from duva_spark.orchestration.state import (
    FAILURE_CAP,
    DatasetState,
    FileStatus,
    MetadataStore,
)
from duva_spark.orchestration.lock import DatasetLock, LockHeld
from duva_spark.orchestration.scheduler import (
    DEFAULT_CRON,
    BadCronExpression,
    CronSchedule,
    SyncScheduler,
    UniqueJobScheduler,
)
from duva_spark.orchestration.sync import SyncJob

__all__ = [
    "FileStatus",
    "DatasetState",
    "MetadataStore",
    "FAILURE_CAP",
    "DatasetLock",
    "LockHeld",
    "SyncJob",
    "CronSchedule",
    "BadCronExpression",
    "UniqueJobScheduler",
    "SyncScheduler",
    "DEFAULT_CRON",
]
