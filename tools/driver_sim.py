"""True driver simulation: a VANILLA SparkSession (none of
duva_spark.session's confs — the driver won't set them either), import
__spark_entry__, run entry() plus every queries() entry against its
oracle_sql() on DuckDB. Catches anything that silently depends on our
session defaults (UTC, AQE knobs, shuffle partitions).

    python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--only a,b]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()

    import __spark_entry__ as entrymod
    from tools.check_oracle import compare_one, make_duckdb

    res = entrymod.entry(spark)
    print(f"entry(): {res.count()} rows, cols {res.columns}")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = make_duckdb(args.sf)
    names = args.only.split(",") if args.only else list(queries)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        status, detail = compare_one(
            spark, con, args.sf, name, queries[name], oracles.get(name)
        )
        if status == "fail":
            n_fail += 1
            print(f"FAIL {name}: {detail}")
        elif status == "rows-only":
            n_rows_only += 1
        else:
            n_pass += 1
    print(f"{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only (vanilla session)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
