"""Bloom prefilter: no false negatives, exactness of the composed
semi/anti joins, bounded build, FP-rate sanity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duva_spark.llm import bloom


def _keys(spark, prefix, n):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("k")
    )


@pytest.mark.slow
def test_no_false_negatives(spark):
    build = _keys(spark, "key-", 500)
    bits = bloom.build_bits(build, "k", m_bits=1 << 14, k_hashes=5)
    got = bloom.candidates(build, "k", bits, m_bits=1 << 14, k_hashes=5).count()
    assert got == 500  # every inserted key must probe positive


def test_fp_rate_within_theory(spark):
    m, k, n = 1 << 14, 5, 500
    bits = bloom.build_bits(_keys(spark, "in-", n), "k", m_bits=m, k_hashes=k)
    probe = _keys(spark, "out-", 4000)  # disjoint prefix → all non-members
    fp = bloom.candidates(probe, "k", bits, m_bits=m, k_hashes=k).count()
    theory = (1 - np.exp(-k * n / m)) ** k
    assert fp / 4000 < max(5 * theory, 0.02)


@pytest.mark.slow
def test_prefilter_semi_join_is_exact(spark):
    # overlapping ranges: probe 0..999, build 500..1499 → matches 500..999
    probe = spark.range(1000).select(F.col("id").cast("string").alias("k"), F.col("id"))
    build = spark.range(500, 1500).select(F.col("id").cast("string").alias("k"))
    got = bloom.prefilter_semi_join(probe, build, "k", m_bits=1 << 13)
    want = probe.join(build, "k", "left_semi")
    assert got.count() == 500
    assert got.select("k").subtract(want.select("k")).count() == 0
    assert want.select("k").subtract(got.select("k")).count() == 0


@pytest.mark.slow
def test_prefilter_anti_join_is_exact(spark):
    probe = spark.range(1000).select(F.col("id").cast("string").alias("k"), F.col("id"))
    build = spark.range(500, 1500).select(F.col("id").cast("string").alias("k"))
    # tiny filter → heavy false positives → exercises the rescue path
    got = bloom.prefilter_anti_join(probe, build, "k", m_bits=64, k_hashes=2)
    want = probe.join(build, "k", "left_anti")
    assert got.count() == 500
    assert got.select("k").subtract(want.select("k")).count() == 0
    assert want.select("k").subtract(got.select("k")).count() == 0


@pytest.mark.slow
def test_probe_columns_named_like_temps_survive(spark):
    """Probe frames owning columns named _h1/_h2/_maybe must pass
    through untouched — the previous implementation staged the hash and
    membership flags in fixed withColumn names, silently overwriting and
    dropping same-named user data (ADVICE r4)."""
    probe = spark.range(100).select(
        F.col("id").cast("string").alias("k"),
        F.col("id").alias("_h1"),
        (F.col("id") * 2).alias("_h2"),
        (F.col("id") % 3).alias("_maybe"),
    )
    build = spark.range(50, 150).select(F.col("id").cast("string").alias("k"))
    for got, want in [
        (
            bloom.prefilter_anti_join(probe, build, "k", m_bits=64, k_hashes=2),
            probe.join(build, "k", "left_anti"),
        ),
        (
            bloom.prefilter_semi_join(probe, build, "k", m_bits=1 << 13),
            probe.join(build, "k", "left_semi"),
        ),
    ]:
        assert set(got.columns) == {"k", "_h1", "_h2", "_maybe"}
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_distinct_build_keys_not_required(spark):
    dup = spark.range(100).select((F.col("id") % 10).cast("string").alias("k"))
    bits = bloom.build_bits(dup, "k", m_bits=1 << 10, k_hashes=3)
    probe = spark.range(10).select(F.col("id").cast("string").alias("k"))
    assert bloom.candidates(probe, "k", bits, m_bits=1 << 10, k_hashes=3).count() == 10


def test_bitset_size_bounded_by_m():
    # the driver-side artifact is m/8 bytes regardless of key count
    assert bloom.build_bits.__doc__  # documented contract
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom.build_bits(None, "k", m_bits=72)


def test_bitset_bytes(spark):
    bits = bloom.build_bits(_keys(spark, "x", 10), "k", m_bits=1 << 12)
    assert bits.nbytes == (1 << 12) // 8


def test_prefilter_rejects_mismatched_key_types(spark):
    probe = spark.range(10).select(F.col("id").alias("k"))  # bigint
    build = spark.range(10).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="identical key types"):
        bloom.prefilter_anti_join(probe, build, "k")
    with pytest.raises(ValueError, match="identical key types"):
        bloom.prefilter_semi_join(probe, build, "k")
