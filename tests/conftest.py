from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from duva_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Test-session-only tuning (r12 verdict item 2: the 22-minute suite
    # overruns the driver's window, so tests_ok reads false on a green
    # tree). The suite runs 708 tests over sf0.001 (hundreds of rows);
    # at that size every shuffle's reduce fan-out is pure scheduler
    # overhead, so the TEST session pins a small shuffle fan-out. Query
    # results are partition-count independent (every comparison here is
    # order-insensitive or explicitly sorted), and bench.py/driver runs
    # keep the production default (cores, AQE-coalesced).
    s = get_spark(
        "duva_spark_tests",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
