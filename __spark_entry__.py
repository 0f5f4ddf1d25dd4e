"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are defined in duva_spark/queries/ (one module per operator
family: relational, shaping, LLM-pipeline, streaming); this file just
adapts the registry to the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from duva_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    registry = load_all()
    return registry["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _previously_checked() -> set[str]:
    """Query names already GREEN in a prior round's CORRECTNESS file.
    A red or errored row does not count — that query rotates back to the
    front so the driver rechecks it next round."""
    import json

    seen: set[str] = set()
    for f in Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json"):
        try:
            for name, row in json.loads(f.read_text()).items():
                if not isinstance(row, dict):
                    seen.add(name)  # unknown shape: assume checked
                elif row.get("err") == "no_oracle":
                    # By-design rows-only query (no oracle_sql entry): the
                    # driver can never mark it green, so count the rows-only
                    # check as "seen" or it would burn one of the ~50 driver
                    # sample slots every round forever (r11 verdict item 1).
                    seen.add(name)
                elif row.get("err") is None and row.get("rows_match", True) and row.get(
                    "schema_match", True
                ) and row.get("hash_match", True):
                    seen.add(name)
        except (OSError, ValueError):
            pass
    return seen


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries NOT yet covered by a previous round's driver
    correctness file come first: the driver samples the first N entries,
    so rotation gets every query a driver-green row across rounds (the
    full set is still verified every round by tools/check_oracle.py).
    """
    registry = load_all()
    seen = _previously_checked()

    def rank(name: str) -> int:
        # 0 = never driver-checked (rotate into the sample first);
        # 1 = previously green (rotate behind the unchecked);
        # 2 = by-design rows-only AND already rows-only-checked — sort
        #     LAST: it can never turn green, so inside the driver's
        #     ~50-row sample window it would burn a slot every round
        #     (r11 verdict item 1; seen-marking alone left it at
        #     alphabetical position ~31, still inside the window).
        if name in seen:
            return 2 if registry[name].oracle is None else 1
        return 0

    ordered = sorted(registry, key=lambda name: (rank(name), name))
    return {name: registry[name].fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    genuinely non-SQL-expressible ops → driver records rows-only)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
