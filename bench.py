"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect of large results). Run: python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from duva_spark.queries import load_all  # noqa: E402
from duva_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("duva_spark_bench")

    registry = load_all()
    headline = {name: q for name, q in registry.items() if q.headline}

    # Warm the JVM + parquet footers once with the flagship query so
    # per-query numbers measure execution, not first-touch JIT.
    registry["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Two timed runs per query, report the min: the host shows ±30%
    # run-to-run interference (documented in BASELINE.md), and min-of-2
    # is the standard estimator of steady-state runtime under external
    # noise. Both samples are emitted for transparency.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    samples: dict[str, list[float]] = {name: [] for name in headline}
    for _ in range(runs):
        for name, q in sorted(headline.items()):
            spark.catalog.clearCache()  # no cross-query cache flattery
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))

    timings = {name: min(ts) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "method": f"min of {runs} runs per query (host noise mitigation)",
                "samples": samples,
            }
        )
    )


if __name__ == "__main__":
    main()
