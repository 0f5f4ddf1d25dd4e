"""SimHash document fingerprints.

simhash(doc) packs, for each bit position j, the majority vote of bit j
across the (md5-derived) hashes of the document's words: bit_j = 1 iff
Σ_w (2·((h(w)>>j)&1) − 1) > 0.

Implementation is explode-free: one `aggregate` (fold) over the words
array accumulates all per-bit counters as an array<int> inside codegen —
no shuffle at all for signature computation. Near-dup pairs then use
banded sub-hashes exactly like MinHash-LSH (hamming-similar docs share a
band with high probability).

Default 32 bits: bit 63 would risk signed-overflow in the final pack on
engines without unsigned 64-bit ints (the DuckDB oracle among them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from duva_spark.llm.minhash import md5_hash60


def simhash(words: Column, n_bits: int = 32) -> Column:
    """SimHash of a words array, packed into a long.

    Bit positions are unrolled in Python (shift amounts must be literals
    for the JVM shift intrinsics); the per-word fold stays a single
    `aggregate` over the array — no explode, no shuffle.
    """

    def bit_deltas(w: Column) -> Column:
        h = md5_hash60(w)
        return F.array(*[(F.shiftright(h, j) % 2) * 2 - 1 for j in range(n_bits)])

    counters = F.aggregate(
        words,
        F.array_repeat(F.lit(0).cast("long"), n_bits),
        lambda acc, w: F.zip_with(acc, bit_deltas(w), lambda a, d: a + d),
    )
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(n_bits)])
    packed_bits = F.zip_with(
        counters, powers, lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(packed_bits, F.lit(0).cast("long"), lambda acc, v: acc + v)


def with_simhash(
    df: DataFrame, text_col: str = "text", out: str = "simhash", n_bits: int = 32
) -> DataFrame:
    return df.withColumn(out, simhash(F.split(F.col(text_col), " "), n_bits))


def hamming_distance(a: Column, b: Column, n_bits: int = 32) -> Column:
    """Popcount of a XOR b via bit_count (JVM intrinsic)."""
    return F.bit_count(a.bitwiseXOR(b))
