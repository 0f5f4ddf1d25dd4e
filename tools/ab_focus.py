"""Focused interleaved cross-round A/B for a handful of queries.

Alternates fresh-subprocess runs of the SAME query list between two
worktrees (A,B,A,B,...). Each pass imports the worktree's registry,
runs each query once cold then reports per-query wall seconds to the
noop sink. Min-of-N per side adjudicates small deltas the full-bench
A/B cannot (it pays 38 queries of noise per pass).

    python tools/ab_focus.py --a .ab_HEAD --b .ab_1d579dc \
        --queries q_pipeline_funnel --passes 4
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
from duva_spark.session import get_spark
names = sys.argv[1].split(",")
reps = int(sys.argv[2])
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
spark = get_spark()
import __spark_entry__ as em
qs = em.queries()
out = {}
for n in names:
    times = []
    for _ in range(reps):
        t0 = time.monotonic()
        qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.monotonic() - t0, 3))
    out[n] = times
print("ABFOCUS " + json.dumps(out))
"""


def _steal() -> tuple[int, int]:
    parts = Path("/proc/stat").read_text().splitlines()[0].split()[1:]
    vals = [int(x) for x in parts]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def _pass(wd: Path, names: str, sf: str, reps: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf)
    s0, t0 = _steal()
    out = subprocess.run(
        [sys.executable, "-c", CHILD, names, str(reps)],
        cwd=wd, env=env, capture_output=True, text=True, timeout=900,
    )
    s1, t1 = _steal()
    stl = 100.0 * (s1 - s0) / max(1, t1 - t0)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("ABFOCUS "):
            return json.loads(line[8:]), stl
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    wa, wb = REPO / args.a, REPO / args.b
    runs_a, runs_b = [], []
    for i in range(args.passes):
        ra, sa = _pass(wa, args.queries, args.sf, args.reps)
        print(f"pass {i+1} A: {ra}  [steal {sa:.1f}%]", flush=True)
        runs_a.append(ra)
        rb, sb = _pass(wb, args.queries, args.sf, args.reps)
        print(f"pass {i+1} B: {rb}  [steal {sb:.1f}%]", flush=True)
        runs_b.append(rb)
    names = args.queries.split(",")
    for n in names:
        # warm min: ignore each session's first rep (scan/codegen warmup)
        wa_min = min(t for r in runs_a for t in r[n][1:]) if args.reps > 1 else min(r[n][0] for r in runs_a)
        wb_min = min(t for r in runs_b for t in r[n][1:]) if args.reps > 1 else min(r[n][0] for r in runs_b)
        ca = min(r[n][0] for r in runs_a)
        cb = min(r[n][0] for r in runs_b)
        print(f"{n}: cold min A={ca:.2f} B={cb:.2f} ({ca/cb:.3f})  "
              f"warm min A={wa_min:.2f} B={wb_min:.2f} ({wa_min/wb_min:.3f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
