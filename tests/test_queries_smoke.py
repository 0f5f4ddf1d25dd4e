"""Every registered query runs at smoke scale and returns a stable,
non-degenerate result; oracle coverage is tracked explicitly."""

from __future__ import annotations

import pytest

from duva_spark.queries import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.columns, f"{name} returned no columns"
    df.limit(5).collect()  # executes the plan


def test_oracle_coverage():
    missing = [n for n, q in REGISTRY.items() if q.oracle is None]
    # only sketch-output queries are allowed to skip the oracle
    assert missing == ["q_agg_approx_distinct"]


def test_headline_queries_marked():
    heads = [n for n, q in REGISTRY.items() if q.headline]
    assert len(heads) >= 5
