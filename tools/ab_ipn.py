"""A/B the AQE fan-out posture (r9 verdict item 1).

Runs the full headline set at sf0.1 via bench.py in a fresh subprocess
(own JVM) per initialPartitionNum multiplier, then prints a per-query
comparison table. Usage:

    python tools/ab_ipn.py [mult ...]     # default: 0 4 16
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_config(mult: int, sf_dir: str, runs: int = 2) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_NO_REF="1",
        SPARK_GRAFT_IPN_MULT=str(mult),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_RUNS=str(runs),
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench.py (mult={mult}):\n{out.stderr[-2000:]}")


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [0, 4, 16]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = {}
    for m in mults:
        results[m] = run_config(m, sf_dir)
        print(f"mult={m}: total={results[m]['value']}s "
              f"r1_subset={results[m].get('r1_subset_sec')}s", flush=True)
    base = results[mults[0]]["queries"]
    names = sorted(base)
    header = "query".ljust(40) + "".join(f"m={m}".rjust(10) for m in mults)
    print(header)
    for n in names:
        row = n.ljust(40)
        for m in mults:
            row += f"{results[m]['queries'].get(n, float('nan')):10.3f}"
        print(row)
    print("TOTAL".ljust(40) + "".join(
        f"{results[m]['value']:10.3f}" for m in mults))
    (REPO / "tools" / "ab_ipn_results.json").write_text(
        json.dumps({str(m): r for m, r in results.items()}, indent=1))


if __name__ == "__main__":
    main()
