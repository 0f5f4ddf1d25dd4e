"""A/B for the 10M-doc trigram count-shuffle spill class (r10 verdict
item 7 — one more scoped look, then close).

The standing `weak` item: `_kn3_frame`'s t3cnt = trigrams.groupBy(w1,
w2, w3).count() spills its exchange on a single host at 10M synthetic
docs. This measures three forms of the COUNT STAGE in isolation (the
class under adjudication — the rest of the KN plan was already fixed by
the r10 broadcast hints):

  A  baseline     groupBy(w1,w2,w3).count() — Spark's own partial
                  (map-side) aggregation is already two-level.
  B  two-level    explicit per-partition pre-aggregation
                  (groupBy(keys, spark_partition_id) -> groupBy(keys))
                  — the verdict's literal suggestion. Expected ~neutral
                  or worse: it adds a second exchange over the same key
                  universe; Spark's hash-agg partial pass already
                  collapses within-partition duplicates.
  C  hash-keyed   groupBy(xxhash64(w1,w2,w3)).count() — a LOWER BOUND
                  on what dictionary/hash-encoding the shuffle key
                  could buy (8-byte key rows instead of three
                  strings). NOT a drop-in (the scoring joins and
                  marginals need the words back; recovering them costs
                  a distinct over the same universe) — measured to
                  quantify the ceiling of the encoding idea.

Alternating order, min-of-2 per form, spill_fanout posture matching the
sweeps. Run: python tools/ab_t3cnt.py [--n 10000000] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from duva_spark.session import default_parallelism, get_spark  # noqa: E402
from tools.scale_sweep import _docs, _force  # noqa: E402


def trigram_stream(spark, n: int):
    docs = _docs(spark, n)
    return docs.select(F.split("text", " ").alias("ws")).select(
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 3 THEN "
                "transform(sequence(0, size(ws) - 3),"
                " i -> struct(ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3)) "
                "ELSE array() END"
            )
        ).alias("t")
    ).select("t.w1", "t.w2", "t.w3")


def form_a(spark, n: int) -> None:
    _force(trigram_stream(spark, n).groupBy("w1", "w2", "w3").count())


def form_b(spark, n: int) -> None:
    tri = trigram_stream(spark, n).withColumn("p", F.spark_partition_id())
    pre = tri.groupBy("w1", "w2", "w3", "p").agg(F.count("*").alias("c"))
    _force(pre.groupBy("w1", "w2", "w3").agg(F.sum("c").alias("c3")))


def form_c(spark, n: int) -> None:
    tri = trigram_stream(spark, n).select(
        F.xxhash64("w1", "w2", "w3").alias("gh3")
    )
    _force(tri.groupBy("gh3").count())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark("ab-t3cnt")
    key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    spark.conf.set(key, str(16 * default_parallelism()))

    forms = {"A_baseline": form_a, "B_two_level": form_b, "C_hash_keyed": form_c}
    # warm
    form_a(spark, 100_000)
    samples: dict[str, list[float]] = {k: [] for k in forms}
    for _ in range(args.runs):
        for name, fn in forms.items():  # alternating across runs
            t0 = time.perf_counter()
            fn(spark, args.n)
            dt = round(time.perf_counter() - t0, 2)
            samples[name].append(dt)
            print(f"{name}: {dt}s", flush=True)
    result = {k: {"samples": v, "min": min(v)} for k, v in samples.items()}
    print("AB_T3CNT " + json.dumps({"n": args.n, **result}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
