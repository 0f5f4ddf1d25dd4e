"""Bloom-filter prefilter: broadcastable set membership for
decontamination and incremental dedup at corpus scale.

The pattern is Spark's own runtime bloom-filter join pruning
(``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``,
InjectRuntimeFilter) lifted to the API level, for the places the
optimizer cannot inject it: probing a key set produced by an earlier
pipeline stage, pre-filtering before a Python DataSource sink, or
gating an expensive verify stage (MinHash, embedding distance) behind
a cheap membership test.

Why it scales: the build side is never collected as rows — keys map to
``k`` bit positions (double hashing over two independent xxhash64
streams), and the *distinct positions* are what reaches the driver,
bounded by ``m_bits`` by construction (default 1 Mi bits = 128 KiB
bitset) no matter how many build keys exist.  The probe side reads the
bitset from a task-shared broadcast inside an Arrow-batched pandas
UDF — zero shuffle of the probe corpus, no join until the candidate
set (true matches + the small false-positive tail) is known.

Exactness: a Bloom filter has no false negatives, so
``prefilter_semi_join`` / ``prefilter_anti_join`` compose the bloom
probe with an exact confirm join over the surviving candidates — the
result is value-identical to the plain semi/anti join, the bloom only
prunes the rows that reach the shuffle.  False positives only cost
work; they never change the answer.

The reference engine has no sketch surface at all (SURVEY §2b gap);
this mirrors what its users run decontamination with elsewhere
(GPT-3/PaLM-style n-gram membership gates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_M_BITS = 1 << 20
DEFAULT_K_HASHES = 7  # ~m/n=10 optimum ln2*10 ≈ 6.9


def _hash_pair(key: Column) -> tuple[Column, Column]:
    """Two independent 64-bit hash streams for double hashing
    (Kirsch–Mitzenmacher: pos_i = h1 + i*h2 simulates k independent
    hashes with no loss in the false-positive bound)."""
    return F.xxhash64(key), F.xxhash64(key, F.lit("duva-bloom-h2"))


def _positions(h1: Column, h2: Column, m_bits: int, k_hashes: int) -> Column:
    """Array of the k bit positions for one key, all in [0, m_bits).

    Both hashes are reduced mod m BEFORE combining — identical result
    to ``(h1 + i*h2) mod m`` in exact arithmetic, but ``i * (h2 mod m)``
    stays ≤ k·m, so the sum can't overflow a long under ANSI mode."""
    r1 = F.pmod(h1, F.lit(m_bits))
    r2 = F.pmod(h2, F.lit(m_bits))
    return F.array(
        *[
            F.pmod(r1 + F.lit(i) * r2, F.lit(m_bits)).cast("long")
            for i in range(k_hashes)
        ]
    )


def build_bits(
    keys: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> np.ndarray:
    """Build the bitset (uint8 array of m_bits/8 bytes) from a key frame.

    Distributed build: bit positions are OR-folded into 64-bit words on
    the executors (``groupBy(word) .agg(bit_or)`` — map-side partial
    aggregation collapses duplicates before the shuffle), so the driver
    receives at most m_bits/64 (word, bits) rows — exactly the bitset's
    own size, 64× fewer rows than collecting distinct positions.  The
    build never materializes the key set driver-side: a billion-key
    build moves the same ≤ m_bits/64 words as a thousand-key build."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    h1, h2 = _hash_pair(F.col(key_col))
    p = F.explode(_positions(h1, h2, m_bits, k_hashes)).alias("p")
    words = (
        keys.select(p)
        .select(
            F.shiftright("p", 6).alias("w"),
            # F.shiftleft needs a literal count; SQL's accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    arr = np.zeros(m_bits // 64, dtype=np.int64)
    for r in words:
        arr[r["w"]] = r["bits"]
    # little-endian int64 words viewed as bytes: global bit i lands in
    # byte i>>3 at bit i&7 — the exact layout the probe indexes
    return arr.view(np.uint8)


def might_contain_udf(
    spark: SparkSession,
    bits: np.ndarray,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
):
    """Vectorized membership probe over the two hash columns.

    The bitset rides a SparkContext broadcast (one copy per executor,
    not per task); the UDF is numpy over Arrow batches — per-row cost
    is k array lookups, no Python-level loop over rows."""
    bc = spark.sparkContext.broadcast(bits)

    @pandas_udf("boolean")
    def might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        b = bc.value
        # mod-m reduction before combining mirrors _positions exactly:
        # numpy % with a positive divisor is non-negative like F.pmod,
        # and i * (h2 % m) ≤ k·m never overflows int64.
        r1 = h1.to_numpy(dtype=np.int64) % m_bits
        r2 = h2.to_numpy(dtype=np.int64) % m_bits
        hit = np.ones(len(r1), dtype=bool)
        for i in range(k_hashes):
            p = (r1 + np.int64(i) * r2) % m_bits
            hit &= (b[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
        return pd.Series(hit)

    return might_contain


def candidates(
    probe: DataFrame,
    probe_key: str,
    bits: np.ndarray,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """Rows of ``probe`` whose key *might* be in the built set: all true
    members plus the false-positive tail (rate ≈ (1-e^(-kn/m))^k)."""
    spark = probe.sparkSession
    mc = might_contain_udf(spark, bits, m_bits, k_hashes)
    h1, h2 = _hash_pair(F.col(probe_key))
    # hash expressions feed the UDF call directly — no temp withColumn
    # names that could silently shadow and drop same-named probe columns
    # (ADVICE r4)
    return probe.filter(mc(h1, h2))


def _check_key_types(probe, probe_key, build, build_key) -> None:
    """xxhash64 is TYPE-sensitive where an equi-join would cast-coerce:
    hashing long 123 and string '123' gives different bits, which would
    silently break the no-false-negative guarantee. Fail loudly."""
    pt = dict(probe.dtypes)[probe_key]
    bt = dict(build.dtypes)[build_key]
    if pt != bt:
        raise ValueError(
            f"bloom prefilter requires identical key types (probe "
            f"{probe_key}: {pt}, build {build_key}: {bt}) — cast one "
            f"side first; hash-based membership cannot coerce like an "
            f"equi-join would"
        )


def prefilter_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """Exact LEFT SEMI join with a bloom prefilter on the probe side.

    Value-identical to ``probe.join(build, on, "left_semi")`` (no false
    negatives → no lost matches; the exact confirm join removes false
    positives), but only the candidate sliver of the probe corpus
    reaches the confirm join's shuffle."""
    build_key = build_key or probe_key
    _check_key_types(probe, probe_key, build, build_key)
    bits = build_bits(build, build_key, m_bits, k_hashes)
    cand = candidates(probe, probe_key, bits, m_bits, k_hashes)
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return cand.join(keys, probe_key, "left_semi")


def prefilter_anti_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """Exact LEFT ANTI join with a bloom fast path.

    Rows the bloom rejects are *definitely* absent from the build side
    (no false negatives) and pass straight through with no join at all;
    only bloom candidates — true members plus the FP tail — go through
    the exact anti join to be confirmed or rescued.  This is the
    incremental-dedup shape: new docs vs. a corpus bloom, where almost
    everything is new and skips the shuffle entirely.

    Plan notes (verified via explain): the probe is scanned twice (once
    per union branch) because Spark has no cross-branch subplan reuse —
    the deliberate trade is two scan-level passes + a sliver-sized
    shuffle instead of one pass + a full-corpus shuffle, the right side
    of that trade whenever shuffle >> scan (always, at 100 TB).  And
    Catalyst's constraint propagation pushes the (deterministic) bloom
    predicate through the anti-join equality onto the BUILD side too,
    so the build keys' distinct-shuffle also shrinks to bloom-positive
    keys — a free bonus, correct because equal keys hash identically."""
    build_key = build_key or probe_key
    _check_key_types(probe, probe_key, build, build_key)
    bits = build_bits(build, build_key, m_bits, k_hashes)
    spark = probe.sparkSession
    mc = might_contain_udf(spark, bits, m_bits, k_hashes)
    h1, h2 = _hash_pair(F.col(probe_key))
    # the membership probe is inlined into each branch's filter rather
    # than staged through _h1/_h2/_maybe withColumns — fixed temp names
    # would silently shadow and then drop same-named probe columns
    # (ADVICE r4); each branch re-evaluates the UDF on its own scan,
    # which the two-pass plan (docstring above) was already paying for.
    maybe = mc(h1, h2)
    definite = probe.filter(~maybe)
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    rescued = probe.filter(maybe).join(keys, probe_key, "left_anti")
    return definite.unionByName(rescued)
