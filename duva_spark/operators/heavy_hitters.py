"""Exact distributed heavy hitters without shuffling the long tail.

``groupBy(value).count().filter(cnt > n/k)`` computes heavy hitters by
shuffling EVERY distinct value — at 100 TB the long tail (billions of
near-unique values) dominates the exchange and the map-side hash tables,
all to produce a result with at most k-1 rows. The classic two-pass
scheme bounds the work by k instead:

1. **Candidate generation** — one ``mapInPandas`` pass runs a
   Misra-Gries(cap) summary per partition (vectorized: merge each Arrow
   batch's ``value_counts`` into the summary, then decrement by the
   (cap+1)-th largest count and drop non-positives — the standard MG
   merge). MG guarantees any item with partition frequency > N_p/(cap+1)
   survives; an item with GLOBAL frequency > N/k must exceed N_p/k ≥
   N_p/(cap+1) in at least one partition (pigeonhole), so the union of
   per-partition survivors is a superset of every global heavy hitter.
   Output: ≤ cap rows per partition.
2. **Exact recount** — broadcast-semi-join the corpus against the tiny
   candidate set and count ONLY those values; the map-side partial agg
   reduces each partition to ≤ |candidates| rows, so the exchange
   carries O(partitions × candidates), never O(distinct). The n/k
   threshold is applied with the total row count carried as a 1-row
   cross-joined frame (no driver collect).

The result is EXACT (not sketch-approximate): pass 1 can only
over-generate candidates, pass 2 counts them exactly. No reference
counterpart (duva has no aggregates at all — SURVEY §2a-iii).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, col: str, k: int, cap: int | None = None) -> DataFrame:
    """Values of ``col`` with count > n/k, with their exact counts.

    ``cap`` is the Misra-Gries summary size per partition (default 4k —
    over-provisioning cuts false candidates, which only cost recount
    width, never correctness). The superset guarantee needs the MG
    survival threshold N_p/(cap+1) to be ≤ the heavy-hitter threshold
    N_p/k, i.e. cap ≥ k-1 — smaller caps are clamped up (an
    under-provisioned summary can MISS a true hitter, silently).
    Returns columns ``(col, cnt)``.
    """
    import pandas as pd  # noqa: PLC0415

    cap = max(cap or 4 * k, k - 1)
    field = df.schema[col]

    def mg_partition(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > cap:
                # MG merge: subtract the (cap+1)-th largest count, drop <=0
                cut = sorted(counters.values(), reverse=True)[cap]
                counters = {v: c - cut for v, c in counters.items() if c - cut > 0}
        yield pd.DataFrame({col: pd.Series(list(counters), dtype=object)})

    candidates = (
        df.select(col)
        .mapInPandas(mg_partition, schema=f"`{col}` {field.dataType.simpleString()}")
        .distinct()
    )
    total = df.agg(F.count("*").alias("_n"))
    counts = (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("_n") / k)
        .drop("_n")
    )
