"""Interleaved cross-round bench A/B (r11 verdict item 2).

Replays TWO pinned commits' bench.py alternately (A,B,A,B,...) on a
quiet host, each pass a fresh subprocess JVM with the nested reference
replay disabled, and reports the shared-headline-set ratio three ways:
min-of-N per side, median of per-pass pair ratios, and the per-query
min deltas. Alternation cancels slow host drift; min-of-N cancels
spikes; same-session pairing cancels everything slower than a pass.

    python tools/ab_rounds.py --a 1d579dc --b 13ec3c0 --passes 3
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _worktree(commit: str) -> Path:
    wd = REPO / f".ab_{commit}"
    if not (wd / "bench.py").exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(wd), commit],
            cwd=REPO, check=True, capture_output=True, timeout=120,
        )
    return wd


def _cpu_stat() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat — lets each pass
    report how much CPU the hypervisor stole from the guest while it
    ran (the invisible confounder on shared hosts)."""
    parts = Path("/proc/stat").read_text().splitlines()[0].split()[1:]
    vals = [int(x) for x in parts]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _bench_pass(wd: Path, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_NO_REF="1",
        SPARK_GRAFT_BENCH_RUNS="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=wd, env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            payload = json.loads(line)
            qs = payload.get("queries") or {}
            # the guard may have shrunk the stdout map — prefer detail
            det = wd / "bench_detail_last.json"
            if det.exists():
                try:
                    qs = json.loads(det.read_text())["payload"].get("queries") or qs
                    qs = {
                        k: v
                        for k, v in json.loads(det.read_text())["detail"][
                            "queries"
                        ].items()
                    }
                except Exception:
                    pass
            return qs
    raise RuntimeError(f"no JSON line from bench in {wd}:\n{out.stdout[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="commit A (newer round HEAD)")
    ap.add_argument("--b", required=True, help="commit B (older round HEAD)")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    wa, wb = _worktree(args.a), _worktree(args.b)
    # One DISCARDED warmup pass per side: the first pass in a fresh
    # worktree pays worktree checkout, parquet first-touch, and JIT —
    # without this, whichever side runs first absorbs a ~3x cold-start
    # and min-of-N is asymmetric (measured: 308s cold vs 87s warm).
    for wd in (wa, wb):
        t = _bench_pass(wd, args.sf)
        print(f"warmup {wd.name}: {round(sum(t.values()), 2)}s (discarded)", flush=True)
    runs_a: list[dict] = []
    runs_b: list[dict] = []
    for i in range(args.passes):
        for side, wd, acc in (("A", wa, runs_a), ("B", wb, runs_b)):
            s0, t0 = _cpu_stat()
            qs = _bench_pass(wd, args.sf)
            s1, t1 = _cpu_stat()
            steal_pct = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 1)
            acc.append(qs)
            print(
                f"pass {i + 1} {side} ({wd.name}): total "
                f"{round(sum(qs.values()), 2)}s over {len(qs)} queries"
                f"  [cpu steal {steal_pct}%]",
                flush=True,
            )

    shared = sorted(set(runs_a[0]) & set(runs_b[0]))
    min_a = {q: min(r[q] for r in runs_a) for q in shared}
    min_b = {q: min(r[q] for r in runs_b) for q in shared}
    tot_a, tot_b = sum(min_a.values()), sum(min_b.values())
    pair_ratios = [
        sum(ra[q] for q in shared) / sum(rb[q] for q in shared)
        for ra, rb in zip(runs_a, runs_b)
    ]
    deltas = sorted(
        ((q, round(min_a[q] - min_b[q], 3)) for q in shared),
        key=lambda t: -abs(t[1]),
    )
    print(json.dumps({
        "a": args.a,
        "b": args.b,
        "passes": args.passes,
        "shared_queries": len(shared),
        "min_total_a_sec": round(tot_a, 3),
        "min_total_b_sec": round(tot_b, 3),
        "min_ratio_a_over_b": round(tot_a / tot_b, 4),
        "pair_ratios": [round(r, 4) for r in pair_ratios],
        "median_pair_ratio": round(statistics.median(pair_ratios), 4),
        "top_min_deltas": deltas[:8],
    }, indent=1))
    (REPO / "ab_rounds_detail.json").write_text(json.dumps({
        "a": args.a, "b": args.b,
        "min_a": min_a, "min_b": min_b,
        "runs_a": runs_a, "runs_b": runs_b,
    }, indent=1))


if __name__ == "__main__":
    main()
