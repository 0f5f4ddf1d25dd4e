"""Named-query registry: the SURVEY §2 operator inventory as executable,
oracle-checked queries.

Each query is a (Spark callable, DuckDB oracle SQL) pair. The Spark side is
the engine under test — declarative DataFrame/SQL so Catalyst owns the
physical plan; the oracle side is plain ANSI SQL the driver runs in DuckDB
over the same parquet views. Column names/aliases match on both sides
because the driver's comparator sorts columns by name before hashing.

Queries marked ``headline=True`` are the bench set (run by bench.py at
sf0.1).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def money_cents(col: Column, scale: int = 100) -> Column:
    """Exact scaled-integer conversion of a fixed-decimal money double:
    ``floor(x*scale + 0.5)`` as a LONG.

    Chosen over ``F.round(x).cast("long")`` because Spark's ROUND on a
    double goes through a per-row BigDecimal allocation — a measured
    1.5× slowdown of the whole q01 aggregate at sf0.1 — while floor is
    pure FP inside codegen. Exactness: the input is a fixed-decimal
    value, so ``x*scale`` is within float-epsilon of an integer and the
    ``+0.5`` can never land on a true rounding tie (holds for negative
    values too: floor(n - eps + 0.5) == n)."""
    return F.floor(col * scale + F.lit(0.5))


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records weaker rows-only check
    headline: bool = False
    description: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, headline: bool = False, description: str = ""):
    """Decorator registering fn(spark, sf_dir) -> DataFrame under `name`."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline, description=description)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return
    the registry."""
    from duva_spark.queries import (  # noqa: F401
        llm_q,
        pipeline_q,
        relational,
        shaping_q,
        streaming_q,
        warehouse_q,
    )

    return REGISTRY
