"""Slowly-changing-dimension Type 2 apply: versioned dimension history.

The reference can only drop-and-recreate a dataset per sync
(app/core/importer.py:242-246) — any attribute change silently
overwrites history. SCD2 is the warehouse answer: when a tracked
attribute changes, CLOSE the current row (set ``valid_to`` and clear
``is_current``) and OPEN a new version; unchanged rows pass through
untouched; unseen keys insert as new current rows. Downstream as-of
joins (operators/asof.py) can then reconstruct the dimension as of any
date.

Dataflow (one full-outer join on the key + unions, everything
key-partitioned — no windows, no collects, scales with the dimension):

    current ⟗ updates on key
      ├─ changed   (both sides, tracked attrs differ)  → closed + opened
      ├─ unchanged (both sides, attrs equal, or no update row) → kept
      └─ new       (update side only)                  → opened

Change detection is null-safe equality over the tracked columns, so a
NULL→value or value→NULL transition counts as a change (plain ``<>``
would silently miss both).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"  # sentinel for "still current" (avoids NULL-date churn)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    batch_date: str,
    order_col: str | None = None,
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension table.

    ``dim`` carries ``key``, ``tracked``, ``valid_from``, ``valid_to``
    (string dates, OPEN_END = current) and ``is_current`` (int 0/1);
    ``updates`` carries ``key`` + ``tracked``. Returns the new history
    frame with the same schema.

    PRECONDITION: ``updates`` must hold at most ONE row per key —
    duplicate keys fan out the full-outer join and silently corrupt the
    history with multiple versions sharing the same (key, valid_from)
    (ADVICE r3). Pass ``order_col`` to have the batch deduplicated
    last-wins deterministically (highest ``order_col`` per key, ties to
    the higher tracked tuple); without it the caller owns uniqueness.
    """
    if order_col is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy(key).orderBy(
            F.desc(order_col), *[F.desc(c) for c in tracked]
        )
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    hist = dim.filter(F.col("is_current") == 0)
    cur = dim.filter(F.col("is_current") == 1).withColumn("_has_cur", F.lit(1))
    upd = updates.select(
        F.col(key), *[F.col(c).alias(f"_u_{c}") for c in tracked]
    ).withColumn("_has_upd", F.lit(1))
    j = cur.join(upd, key, "full_outer")
    same = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_u_{c}")) for c in tracked],
    )
    # presence markers, not value-nullability: a legitimately all-NULL
    # update row must still count as an arriving update
    has_cur = F.col("_has_cur").isNotNull()
    has_upd = F.col("_has_upd").isNotNull()
    # rows of the existing current set that survive untouched: no update
    # row arrived, or the update carries identical tracked values
    kept = j.filter(has_cur & (~has_upd | same)).select(
        key, *tracked, "valid_from", "valid_to", "is_current"
    )
    changed = j.filter(has_cur & has_upd & ~same)
    closed = changed.select(
        key,
        *tracked,
        "valid_from",
        F.lit(batch_date).alias("valid_to"),
        F.lit(0).alias("is_current"),
    )
    opened_changed = changed.select(
        key,
        *[F.col(f"_u_{c}").alias(c) for c in tracked],
        F.lit(batch_date).alias("valid_from"),
        F.lit(OPEN_END).alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    inserted = j.filter(~has_cur).select(
        key,
        *[F.col(f"_u_{c}").alias(c) for c in tracked],
        F.lit(batch_date).alias("valid_from"),
        F.lit(OPEN_END).alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    return (
        hist.select(key, *tracked, "valid_from", "valid_to", "is_current")
        .unionByName(kept)
        .unionByName(closed)
        .unionByName(opened_changed)
        .unionByName(inserted)
    )


def scd2_initial(df: DataFrame, key: str, tracked: list[str], load_date: str) -> DataFrame:
    """Initial SCD2 load: every row current as of ``load_date``."""
    return df.select(
        key,
        *tracked,
        F.lit(load_date).alias("valid_from"),
        F.lit(OPEN_END).alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
