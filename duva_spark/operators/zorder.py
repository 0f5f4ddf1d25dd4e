"""Z-order (Morton) clustering keys for multi-dimensional data skipping.

Sorting a 100 TB table by one column gives perfect min/max pruning on
that column and none on any other; interleaving the bits of several
columns into one Morton key gives useful pruning on ALL of them at once
(the Delta/Iceberg OPTIMIZE ZORDER technique). The key is a pure
codegen Column expression — shiftleft/or over per-bit extractions — so
computing it costs one projection at scan speed, and `repartitionByRange
+ sortWithinPartitions` on the key produces the clustered layout.

No counterpart in the duva reference (it stores flat Postgres tables);
this is part of the large-scale layout surface alongside
`duva_spark/layout.py` bucketing.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low `bits` bits of each column (long exprs,
    already range-normalized by the caller) into one sortable long.

    With d columns, bit i of column j lands at position i*d + j; total
    width d*bits must stay < 63. Columns must be non-negative.
    """
    d = len(cols)
    if d < 2:
        raise ValueError("zorder_key needs >= 2 columns")
    if d * bits >= 63:
        raise ValueError(f"{d} cols x {bits} bits overflows a signed long")
    parts = [
        F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * d + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_key_sql(col_names: list[str], bits: int = 16) -> str:
    """The identical arithmetic as ANSI/DuckDB SQL (generated from the
    same constants, the shared-constant oracle pattern used by minhash)."""
    d = len(col_names)
    parts = [
        f"((({c} >> {i}) & 1) << {i * d + j})"
        for j, c in enumerate(col_names)
        for i in range(bits)
    ]
    return "(" + " | ".join(parts) + ")"


def cluster_by_zorder(
    df: DataFrame, cols: list[Column], bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Cluster rows for multi-dim skipping: range-partition then sort by
    the Morton key. Writing the result produces files whose per-column
    min/max ranges are tight on every interleaved dimension."""
    keyed = df.withColumn("_zkey", zorder_key(cols, bits))
    parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        keyed.repartitionByRange(int(parts), "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")  # layout helper only — never part of the output schema
    )
