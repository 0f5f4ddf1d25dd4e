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


def cms_bucket(col: Column, i: int, w: int = CMS_W) -> Column:
    """Row-``i`` bucket of a string key: affine hash over the shared
    60-bit md5 base hash, mod P mod w — ``(a_i·h + b_i)`` stays under
    2^63 because both factors are < P = 2^31 − 1."""
    a, b = hash_params(CMS_D)[i]
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
