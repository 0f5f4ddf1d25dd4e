"""Greedy k-center coreset selection (farthest-point traversal).

Public technique: the 2-approximation greedy for the k-center problem
(Gonzalez 1985), used for diversity-aware training-data curation and
active-learning coresets (Sener & Savarese 2018, "Active Learning for
Convolutional Neural Networks: A Core-Set Approach"). Pick the point
farthest from the current selection, repeat k times — the selected set
covers the corpus with the smallest max-distance ball among greedy
choices.

Spark-first shape: each of the k rounds is ONE linear scan — the ≤k
selected vectors inline as Column literals, so the per-row min-distance
is pure whole-stage-codegen arithmetic (no UDF, no join, no shuffle),
and the round's winner comes back through a TakeOrderedAndProject
(per-partition top-1, driver receives one row). Driver state is k
vectors; corpus never shuffles. At 100 TB the cost is k scans — the
same bounded-iteration contract as the Lloyd KMeans in this package —
and each scan is embarrassingly parallel.

Determinism contract (the oracle's): distances round to 6 decimals
BEFORE the arg-max so sub-ulp cross-engine summation drift cannot flip
a winner, and exact ties break toward the smallest id — the same
round-then-rank rule as ``assign.assign_nearest``.

Reference parity: none — onaio/duva has no embedding surface at all;
this is part of the beyond-reference similarity/curation inventory
(SURVEY.md §2c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dist_to(vec_col: str, center: list[float]) -> F.Column:
    """L2 distance from ``vec_col`` to a literal center, as a codegen
    fold over zip_with (summation in index order, matching the oracle's
    list_aggregate)."""
    # one array Literal, not CreateArray over dim literal nodes — the
    # optimizer re-walks every node per AQE re-optimization and k-center
    # chains build one of these per center (values identical)
    lit = F.lit([float(x) for x in center])
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                lit,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def kcenter_select(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    round_dp: int = 6,
) -> list[tuple[int, object, float]]:
    """Greedy k-center over ``df``: returns [(sel_rank, id, sel_dist)]
    where ``sel_dist`` is the (rounded) distance from the picked point
    to the selection at the time it was picked (0.0 for the seed — the
    smallest-id row, a deterministic choice).

    The driver holds only the ≤k selected vectors; each round is one
    scan + TakeOrderedAndProject."""
    seed = df.orderBy(F.col(id_col).asc()).limit(1).collect()[0]
    picked = [(1, seed[id_col], 0.0)]
    centers = [list(seed[vec_col])]
    for rank in range(2, k + 1):
        mind = F.round(
            F.least(*[_dist_to(vec_col, c) for c in centers])
            if len(centers) > 1
            else _dist_to(vec_col, centers[0]),
            round_dp,
        )
        win = (
            df.select(id_col, vec_col, mind.alias("mind"))
            .orderBy(F.col("mind").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()[0]
        )
        picked.append((rank, win[id_col], float(win["mind"])))
        centers.append(list(win[vec_col]))
    return picked


def kcenter_frame(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """The selection as a DataFrame (sel_rank, id_col, sel_dist) —
    k rows, built from the driver-side picks (bounded by k)."""
    spark = df.sparkSession
    rows = [
        (int(r), i, float(d)) for r, i, d in kcenter_select(df, id_col, vec_col, k)
    ]
    return spark.createDataFrame(rows, f"sel_rank long, {id_col} long, sel_dist double")
