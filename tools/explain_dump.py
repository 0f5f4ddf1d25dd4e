"""Dump ``explain("formatted")`` for named queries to plans/<tag>/.

Optimization-round evidence tool: captures the physical plan of each
query BEFORE and AFTER a change so plan claims in OPTIMIZATION_r*.md
("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin") are checkable
without running Spark.

    python tools/explain_dump.py --only q_doremi_weights,q_semdedup_prune \
        --suffix before [--sf /root/testdata/sf0.1] [--dir plans/r12]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, ".")

from duva_spark.queries import load_all  # noqa: E402
from duva_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", required=True)
    ap.add_argument("--suffix", required=True, help="before | after")
    ap.add_argument("--dir", default="plans/r12")
    args = ap.parse_args()

    spark = get_spark("explain-dump")
    registry = load_all()
    out_dir = Path(args.dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in args.only.split(","):
        name = name.strip()
        df = registry[name].fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
