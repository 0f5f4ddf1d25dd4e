"""Full-registry Spark-side timing sweep (r10 verdict item 2).

The 2x perf gate is measured on the ~38 headliners; this tool times
EVERY registered query at a given SF (default sf0.1) with the same
methodology as bench.py (noop sink = full computation, no driver-side
collect; cache cleared between queries) so a scale-killer hiding in the
non-headline tail shows up as a wall-clock outlier. One run per query:
the output feeds an adjudication pass (justify or fix everything above
~5 s), not the perf gate itself.

    python tools/time_sweep.py [--sf DIR] [--only a,b] [--out FILE]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from duva_spark.queries import load_all  # noqa: E402
from duva_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark("time-sweep")
    registry = load_all()
    names = args.only.split(",") if args.only else sorted(registry)

    # Warm the JVM + parquet footers once (bench.py's warmup contract).
    registry["q01_pricing_summary"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    lines: list[str] = []
    total = 0.0
    n_err = 0
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        err = None
        try:
            registry[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 — sweep must finish
            err = f"{type(e).__name__}: {e}"[:300].replace("\n", " ")
            n_err += 1
        dt = round(time.perf_counter() - t0, 3)
        total += dt
        line = f"{dt:9.3f}s  {name}" + (f"  ERROR {err}" if err else "")
        print(line, flush=True)
        lines.append(line)

    summary = f"\nTOTAL {round(total, 3)}s over {len(names)} queries, {n_err} errors"
    print(summary, flush=True)
    lines.append(summary)
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())
