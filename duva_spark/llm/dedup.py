"""Exact deduplication via content hashing.

At 100 TB the only viable exact-dedup plan is hash → shuffle by hash →
keep one row per hash: one shuffle, map-side partial aggregation, no
sort. We hash the content (md5 here; swap for xxhash64 when cross-engine
reproducibility isn't needed — it's faster) rather than grouping by the
full text so shuffle keys are fixed-width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash(df: DataFrame, cols: list[str], out: str = "content_hash") -> DataFrame:
    """Fixed-width md5 over the concatenated (null-safe) column values."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    return df.withColumn(out, F.md5(F.concat_ws("\x1f", *parts)))


def dedup_exact(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep the row with the smallest id per duplicate group.

    Deterministic (unlike dropDuplicates, which keeps an arbitrary row),
    so results are stable across runs/cluster sizes.
    """
    hashed = content_hash(df, cols)
    keep = hashed.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    return hashed.join(keep, ["content_hash", id_col], "left_semi").drop("content_hash")


def duplicate_groups(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """(content_hash, n_dups, keeper_id) per group with ≥ 1 row."""
    return (
        content_hash(df, cols)
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
    )
