"""Connected components over the near-duplicate pair graph.

Fuzzy dedup produces PAIRS (LSH candidates that verified); production
dedup needs CLUSTERS — one surviving representative per transitively
connected group. This is the step between `minhash.near_duplicates`
and the keep-list.

Algorithm: distributed min-label propagation. Every node starts as its
own component; each round every node adopts the minimum label among
itself and its neighbors. A round is one shuffle (groupBy on the edge
source); the loop runs until a fixpoint (no label decreased), which
takes O(component diameter) rounds. Near-dup clusters are dense and
shallow (a dup cluster's diameter is almost always ≤ 3 hops), so 3–4
rounds settle real corpora. For adversarial high-diameter graphs the
documented upgrade is the large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond"), which converges
in O(log n) rounds with the same per-round plan shape.

Scale notes: per-round lineage is cut with localCheckpoint (otherwise
the plan doubles every iteration and Catalyst analysis time explodes —
the classic iterative-algorithm trap); the convergence check is a
COUNT aggregate, not a collect; edge orientation is symmetrized once
and persisted. The driver loop iterates O(diameter) times over
fixed-size bookkeeping — never over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, a: str = "id_a", b: str = "id_b", max_iter: int = 30
) -> DataFrame:
    """(id, component) for every node in the pair graph; component is the
    minimum node id of the transitively connected group (deterministic —
    the fixpoint is unique, independent of iteration order)."""
    sym = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint()
    converged = False
    try:
        for _ in range(max_iter):
            nbr_min = (
                sym.join(labels, sym.dst == labels.id)
                .groupBy("src")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            new_labels = (
                labels.join(nbr_min, labels.id == nbr_min.src, "left")
                .select(
                    labels.id.alias("id"),
                    F.least(
                        labels.comp, F.coalesce(F.col("nbr_comp"), labels.comp)
                    ).alias("comp"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.select(F.col("id"), F.col("comp").alias("old_comp")), "id")
                .filter(F.col("comp") < F.col("old_comp"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            # Silent non-convergence would split one real cluster into
            # several and silently keep duplicates — fail loudly instead.
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds "
                "(component diameter exceeds max_iter); raise max_iter or "
                "switch to the large-star/small-star variant"
            )
        return labels
    finally:
        sym.unpersist()


def dedup_clusters(pairs: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """(id, component, n_members): components plus cluster sizes. The
    keep-list is `filter(id == component)` (min-id representative), the
    drop-list its complement."""
    from pyspark.sql import Window as W

    comp = connected_components(pairs, a, b)
    return comp.select(
        "id",
        "comp",
        F.count("*").over(W.partitionBy("comp")).alias("n_members"),
    )
