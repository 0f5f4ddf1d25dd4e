"""Count-Min Sketch (Cormode & Muthukrishnan 2005) over a token stream.

Completes the sketch inventory next to HLL (approx distinct), Bloom
(membership) and MinHash (similarity): CMS answers FREQUENCY point
queries in sublinear space with a one-sided error — estimates never
undercount, and overcount by at most ``eps·N`` (eps = e/W) with
probability ``1 − δ`` (δ = e^−D).

Spark-first shape: the sketch IS a (row, bucket, count) table of at
most ``D × W`` rows — the token stream map-side-combines into it in ONE
narrow shuffle (the same aggregation pattern as a word count, but onto
a FIXED key universe, so the exchange is bounded by D·W regardless of
corpus size — the whole point at 100 TB, where the word count's
near-unique tail dominates its shuffle). Point queries join a
driver-bounded key set against the sketch and take the per-key MIN
across rows.

Determinism: the affine row hashes reuse ``minhash.hash_params`` (the
SQL oracle inlines the same constants), all counts are exact integers,
and MIN is order-free — bit-identical across engines by construction.

Reference parity: none — onaio/duva has no sketch surface; this extends
the beyond-reference inventory (SURVEY.md §2c).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duva_spark.llm.minhash import MERSENNE_P, base_hash, hash_params

CMS_D = 4  # hash rows (δ = e^-4 ≈ 1.8%)
CMS_W = 1024  # buckets per row (eps = e/1024 ≈ 0.27% of stream length)

# Width grid for the sketch-config error curve: small enough that the
# corpus vocabulary actually collides (the regime where conservative
# update visibly beats plain CMS).
CU_WIDTHS = (4, 8, 16, 32)


def cms_bucket(col: Column, i: int, w: int = CMS_W) -> Column:
    """Row-``i`` bucket of a string key: affine hash over the shared
    60-bit md5 base hash, mod P mod w — ``(a_i·h + b_i)`` stays under
    2^63 because both factors are < P = 2^31 − 1.

    The parameter family is prefix-stable (``hash_params(n)[i]`` is a
    pure function of ``i``), so deriving row ``i``'s pair as
    ``hash_params(i + 1)[i]`` is value-identical to the old
    ``hash_params(CMS_D)[i]`` for ``i < CMS_D`` while staying valid for
    ANY row index — callers passing ``d > CMS_D`` to the sketch
    builders no longer hit an IndexError at plan-build time (r10
    ADVICE)."""
    a, b = hash_params(i + 1)[i]
    return (base_hash(col) * a + b) % MERSENNE_P % w


def cms_sketch(
    tokens: DataFrame, token_col: str = "word", d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """(row, bucket, c): the D×W sketch table in one pass — each token
    contributes one count to its bucket in every row; partial
    aggregation collapses each map task to ≤ D·W rows before the
    exchange."""
    t = F.col(token_col)
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), cms_bucket(t, i, w).alias("bucket")
            )
            for i in range(d)
        ]
    )
    return (
        tokens.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """keys + ``cms_est``: the point-query estimate (min across the D
    rows) for each key — the key set is broadcast-bounded by contract
    (heavy-hitter candidates, not the corpus)."""
    t = F.col(key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), cms_bucket(t, i, w).alias("bucket")
                    )
                    for i in range(d)
                ]
            )
        ).alias("e"),
    ).select(key_col, F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"))
    return (
        probes.join(sketch, ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").cast("long").alias("cms_est"))
    )


def cms_sketch_widths(
    word_counts: DataFrame,
    word_col: str = "word",
    cnt_col: str = "c",
    widths: tuple[int, ...] = CU_WIDTHS,
    d: int = CMS_D,
) -> DataFrame:
    """(width, row, bucket, v): plain CMS sketches for EVERY width in one
    pass over the (key, count) table — the q_lsh_band_load config-sweep
    pattern. Each bucket value is the exact integer sum of the counts of
    the keys hashing into it, so the table is order-free and bounded by
    ``d * sum(widths)`` rows regardless of key-set size."""
    t = F.col(word_col)
    entries = F.array(
        *[
            F.struct(
                F.lit(w).alias("width"),
                F.lit(i).alias("row"),
                cms_bucket(t, i, w).alias("bucket"),
            )
            for w in widths
            for i in range(d)
        ]
    )
    return (
        word_counts.select(F.col(cnt_col).alias("_c"), F.explode(entries).alias("e"))
        .groupBy(
            F.col("e.width").alias("width"),
            F.col("e.row").alias("row"),
            F.col("e.bucket").alias("bucket"),
        )
        .agg(F.sum("_c").cast("long").alias("v"))
    )


def cms_cu_sketch(
    word_counts: DataFrame,
    word_col: str = "word",
    cnt_col: str = "c",
    widths: tuple[int, ...] = CU_WIDTHS,
    d: int = CMS_D,
) -> DataFrame:
    """(width, row, bucket, v): conservative-update CMS (Estan &
    Varghese 2002, "New directions in traffic measurement") under the
    CANONICAL BATCH ORDER — keys ascending, each key's full count as one
    consecutive batch.

    Conservative update increments only the buckets currently at the
    key's minimum, so it is inherently sequential; to make the sketch
    deterministic across runs AND engines we pin the stream order. For
    ``c`` consecutive updates of one key the sequential rule collapses
    to a closed form (each update raises the current minimum by exactly
    1): ``M = min_i v[i][b_i] + c; v[i][b_i] <- max(v[i][b_i], M)`` —
    which is what the fold applies per key. The DuckDB oracle replays
    the identical fold as a recursive CTE; all arithmetic is integer.

    Scale posture: the fold runs as ONE Arrow task per width over the
    aggregated (key, count) table — bounded by the DISTINCT-key count,
    not the corpus (the corpus-sized work is the upstream word count,
    a map-side-combined aggregation). For open-vocabulary corpora where
    the key table itself is huge, conservative update is a
    streaming-ingest construct; the batch engine's job is this AUDIT of
    a sketch configuration's error on a bounded key universe, and the
    kernel raises if the contract is violated rather than spilling.
    """
    import hashlib

    import pandas as pd

    params = hash_params(d)
    max_keys = 2_000_000  # fail-closed bound: audit contract, not a spill path

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_keys:
            raise ValueError(
                f"cms_cu_sketch: {len(pdf)} keys exceeds the {max_keys} audit bound"
            )
        w = int(pdf["width"].iloc[0])
        st = [[0] * w for _ in range(d)]
        for word, c in sorted(zip(pdf[word_col], pdf[cnt_col])):
            base = (
                int(hashlib.md5(word.encode("utf-8")).hexdigest()[:15], 16)
                % MERSENNE_P
            )
            bs = [(base * a + b) % MERSENNE_P % w for a, b in params]
            m = min(st[i][bs[i]] for i in range(d)) + int(c)
            for i in range(d):
                if st[i][bs[i]] < m:
                    st[i][bs[i]] = m
        out = [
            (w, i, b, st[i][b])
            for i in range(d)
            for b in range(w)
            if st[i][b] > 0
        ]
        return pd.DataFrame(out, columns=["width", "row", "bucket", "v"])

    widened = word_counts.select(
        word_col, F.col(cnt_col).cast("long").alias(cnt_col)
    ).withColumn("width", F.explode(F.array(*[F.lit(w) for w in widths])))
    return widened.groupBy("width").applyInPandas(
        fold, schema="width int, row int, bucket int, v long"
    )
