"""A/B/C microbench: gram-key construction cost on the documents table.

The dup-span/contamination family builds word 8-grams as strings
(7 chained zip_with concats) and hashes them with md5 (60-bit key).
Where the key is a PURE internal equality key (never an output value,
never a sampling/sketch input the oracle replays), the hash function is
free to change. This measures what that freedom is worth:

  A  zip_with strings -> md5_hash60        (current)
  B  zip_with strings -> xxhash64(string)  (isolates the md5 cost)
  C  xxhash64(slice(ws, i+1, k)) per pos   (no gram strings at all)

Each variant runs the SAME downstream shape: per-doc distinct grams,
explode, groupBy(gh).count (the doc-frequency shuffle every caller
feeds), noop sink. Interleaved min-of-N so host drift cancels.

    python tools/ab_gramhash.py [--sf /root/testdata/sf0.1] [--runs 3]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from duva_spark.catalog import load_table  # noqa: E402
from duva_spark.llm import minhash  # noqa: E402
from duva_spark.session import get_spark  # noqa: E402

K = 8


def variant_a(docs):
    ws = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", F.explode(minhash.word_shingles(ws, K)).alias("gram"))
        .select(minhash.md5_hash60(F.col("gram")).alias("gh"))
        .groupBy("gh")
        .count()
    )


def variant_b(docs):
    ws = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", F.explode(minhash.word_shingles(ws, K)).alias("gram"))
        .select(F.xxhash64(F.col("gram")).alias("gh"))
        .groupBy("gh")
        .count()
    )


def variant_c(docs):
    # hash the k-word slice arrays directly; per-doc distinct on hashes
    shingles = F.expr(
        f"CASE WHEN size(split(text, ' ')) >= {K} THEN "
        f"array_distinct(transform(sequence(0, size(split(text, ' ')) - {K}), "
        f"i -> xxhash64(slice(split(text, ' '), i + 1, {K})))) "
        f"ELSE array() END"
    )
    return (
        docs.select("doc_id", F.explode(shingles).alias("gh"))
        .groupBy("gh")
        .count()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("ab-gramhash")
    docs = load_table(spark, args.sf, "documents")
    variants = {"A_md5_strings": variant_a, "B_xx_strings": variant_b, "C_xx_slices": variant_c}

    # warmup each once
    for fn in variants.values():
        fn(docs).write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(args.runs):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))

    counts = {name: fn(docs).count() for name, fn in variants.items()}
    for name in variants:
        print(f"{name}: min {min(times[name]):.3f}s  all {times[name]}  distinct_gh {counts[name]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
