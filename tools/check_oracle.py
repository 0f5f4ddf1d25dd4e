"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive value hash. Use while iterating:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
import traceback

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from duva_spark.catalog import TABLES, table_path  # noqa: E402
from duva_spark.queries import load_all  # noqa: E402
from duva_spark.session import get_spark  # noqa: E402


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact: queries must round on BOTH sides themselves
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def make_duckdb(sf: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf, t)}')")
    return con


def compare_one(spark, con, sf: str, name: str, fn, oracle: str | None):
    """Run one Spark query and its oracle, return (status, detail) where
    status is 'pass' | 'fail' | 'rows-only'. Shared by check_oracle and
    driver_sim so both gates use the identical comparator."""
    t0 = time.time()
    try:
        sdf = fn(spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
    except Exception:
        return "fail", "spark error:\n" + traceback.format_exc()
    dt = time.time() - t0
    if oracle is None:
        return "rows-only", f"{len(srows)} rows ({dt:.1f}s)"
    try:
        ores = con.sql(oracle)
        ocols = [c.lower() for c in ores.columns]
        orows = ores.fetchall()
    except Exception:
        return "fail", "duckdb error:\n" + traceback.format_exc()
    scols_l = [c.lower() for c in scols]
    problems = []
    if sorted(scols_l) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols_l)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if not problems:
        h1, h2 = value_hash(scols_l, srows), value_hash(ocols, orows)
        if h1 != h2:
            problems.append("value-hash mismatch")
            sset = {tuple(_norm_cell(v) for v in r) for r in srows}
            oset = {tuple(_norm_cell(v) for v in r) for r in orows}
            for r in list(sset - oset)[:3]:
                problems.append(f"spark-only: {r}")
            for r in list(oset - sset)[:3]:
                problems.append(f"oracle-only: {r}")
    if problems:
        return "fail", "; ".join(problems)
    return "pass", f"{len(srows)} rows ({dt:.1f}s)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    spark = get_spark("oracle-check")
    con = make_duckdb(args.sf)
    registry = load_all()
    names = args.only.split(",") if args.only else list(registry)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        q = registry[name]
        status, detail = compare_one(spark, con, args.sf, name, q.fn, q.oracle)
        if status == "pass":
            print(f"PASS {name}: {detail}")
            n_pass += 1
        elif status == "rows-only":
            print(f"ROWS-ONLY {name}: {detail}")
            n_rows_only += 1
        else:
            print(f"FAIL {name}: {detail}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
