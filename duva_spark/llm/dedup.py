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


def gram_keys(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 8
) -> DataFrame:
    """(id_col, gh) rows: each doc's DISTINCT word k-grams hashed to
    60-bit ints — the single definition of the gram-key contract
    (per-doc distinct via word_shingles, md5-derived 60-bit key,
    explode drops docs shorter than k words) shared by the dup-span
    pass, the novelty curve, and the repeated-n-gram censuses, and
    mirrored in SQL by the _GRAM8 macro. Grams never shuffle as
    strings."""
    from duva_spark.llm import minhash

    ws = F.split(F.col(text_col), " ")
    return df.select(
        id_col, F.explode(minhash.word_shingles(ws, k)).alias("gram")
    ).select(id_col, minhash.md5_hash60(F.col("gram")).alias("gh"))


def dup_span_counts(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Per-document duplicated-span counts — the removal/annotation pass
    of exact-substring dedup (Lee et al. 2022, bounded to fixed-width
    word k-grams instead of suffix arrays).

    Returns (id_col, n_grams, n_dup): for each doc with >= k words, the
    number of distinct word k-grams and how many of those grams occur in
    at least ``min_df`` documents corpus-wide.

    Scale shape (shared by q_dup_span_ratio and the scale sweep): grams
    travel as 60-bit ints, never strings — one count shuffle for the
    global gram doc-frequency, one int-keyed LEFT join back carrying a
    dup marker, one per-doc aggregation. The marker join (not a window
    over gh) is deliberate: a viral boilerplate gram streams through a
    hash-join probe, where a count-over-window would buffer the whole
    hot partition group.
    """
    # word_shingles is per-doc distinct, so COUNT(*) per gh == doc freq.
    grams = gram_keys(df, id_col, text_col, k)
    dup = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("gh", F.lit(1).alias("_dup"))
    )
    return (
        grams.join(dup, "gh", "left")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.count("_dup").alias("n_dup"))
    )
