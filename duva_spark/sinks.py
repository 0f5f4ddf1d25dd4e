"""Sinks: full-refresh Parquet datasets mirroring duva's drop-and-recreate
semantics, partitioned writes, and the S3 artifact layout.

Reference behavior reproduced:
- full refresh: CREATE_AND_REPLACE drop-and-recreate per sync — schema
  drift between syncs is tolerated (app/core/importer.py:242-249) →
  ``mode("overwrite")`` here;
- COPY returns the loaded row count, the only metric duva reports
  (app/core/importer.py:251-256) → returned from full_refresh;
- artifact key layout ``{server_id}/{username}/{form_id}_{filename}``
  (app/crud/crud_hyperfile.py:84-85) → dataset_path.

Scale: writes go through Spark's committer (task-level parallel write,
atomic job commit). `partition_by` exposes hive-style partitioning so a
100 TB dataset prunes on read; the overwrite is dynamic-partition-aware
when `dynamic=True` (only touched partitions replaced — the incremental
upgrade duva never had).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dataset_path(root: str, server_id: str | int, username: str, form_id: str | int) -> str:
    return f"{root.rstrip('/')}/{server_id}/{username}/{form_id}"


def full_refresh(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    dynamic: bool = False,
) -> int:
    """Overwrite the dataset at `path`; returns the row count loaded
    (duva's COPY contract). One distributed pass — the count is taken
    from the same scan that feeds the write via an observation."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("full_refresh")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    writer = observed.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)
    return int(obs.get["n_rows"])


def merge_upsert(
    spark,
    new_df: DataFrame,
    path: str,
    key: str,
) -> int:
    """Incremental upsert keyed on `key` — the improvement duva never had
    (it drop-and-recreates every sync, app/core/importer.py:242-246; the
    natural key is the OnaData `_id`/`_uuid` system column).

    Without a table format that supports MERGE (Delta/Iceberg jars absent
    here), the portable emulation is: existing ⟕anti⟕ new → union → write
    to a staging dir → atomic swap. At scale the swap is a metastore
    pointer flip or a Delta MERGE — the dataflow (one anti-join shuffle on
    the key) is identical. Returns the resulting row count.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    if not os.path.exists(path):
        return full_refresh(new_df, path)
    existing = spark.read.parquet(path)
    keep = existing.join(new_df.select(key), on=key, how="left_anti")
    merged = keep.unionByName(new_df, allowMissingColumns=True)
    staging = f"{path}__staging"
    n = full_refresh(merged, staging)
    backup = f"{path}__old"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return n
