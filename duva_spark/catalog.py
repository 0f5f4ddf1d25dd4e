"""Dataset catalog: name → parquet path for the driver's testdata layout.

Mirrors the control-plane role of duva's HyperFile/Configuration models
(app/models/hyperfile.py:41-62) minus auth: the engine resolves logical
table names to storage locations. Here the storage is the deterministic
TPC-H-ish parquet under /root/testdata/sf*/ (see TESTDATA.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables that are always small enough to broadcast (region has 5
# rows, nation 25 at any TPC-H scale factor) — at 100 TB these stay
# broadcast-able; customer/supplier/part grow with SF so they are left to
# AQE's dynamic broadcast decision instead of a hard hint.
ALWAYS_BROADCAST = {"region", "nation"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # parquet reader rejects; read nanos as long (runtime-settable
        # legacy conf) and convert to a microsecond TimestampType column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so queries can be written in SQL.

    Catalyst produces the same plan for SQL and DataFrame declarations; we
    use whichever reads better per operator.
    """
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
