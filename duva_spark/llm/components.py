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
    from pyspark.sql import Observation

    sym = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .persist()
    )
    # Round 1 folds into the init: least(src, min(dst)) IS the label a
    # full propagation round would produce from the identity labeling,
    # so the loop starts one round ahead for the same fixpoint (saves a
    # distinct pass plus one whole join round of jobs — guide §1.2).
    labels = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("_mn"), F.col("src")).alias("comp"),
        )
        .localCheckpoint()
    )
    converged = False
    try:
        for i in range(max_iter):
            nbr_min = (
                sym.join(labels, sym.dst == labels.id)
                .groupBy("src")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            # the change flag is computed inside the update projection —
            # no second join of old vs new labels per round (labels only
            # ever decrease, so `new < old` is the complete change test);
            # the flag reaches the driver as an observed metric of the
            # checkpoint job itself, not a second per-round action.
            obs = Observation(f"cc_chg_{i}")
            new_labels = (
                labels.join(nbr_min, labels.id == nbr_min.src, "left")
                .select(
                    labels.id.alias("id"),
                    F.least(
                        labels.comp, F.coalesce(F.col("nbr_comp"), labels.comp)
                    ).alias("comp"),
                    (F.coalesce(F.col("nbr_comp"), labels.comp) < labels.comp).alias(
                        "_chg"
                    ),
                )
                .observe(obs, F.sum(F.col("_chg").cast("int")).alias("n_changed"))
                .localCheckpoint()
            )
            changed = (obs.get["n_changed"] or 0) > 0
            labels = new_labels.drop("_chg")
            if not changed:
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


def connected_components_star(
    pairs: DataFrame, a: str = "id_a", b: str = "id_b", max_iter: int = 25
) -> DataFrame:
    """(id, comp) via alternating large-star/small-star rounds (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — converges in
    O(log n) rounds regardless of component diameter, where min-label
    propagation needs O(diameter) rounds. Same output contract as
    ``connected_components``: comp = min node id of the group.

    Per round: large-star hooks every neighbor v > u onto u's local min
    (keeps high-degree stars shallow); small-star re-hooks the small side
    of each edge onto the per-node min. Both are one groupBy(min) + one
    equi-join — the same shuffle shape as a label-propagation round, just
    exponentially fewer of them on path-like graphs. Edge frames shrink
    toward n-1 star edges; each round localCheckpoints to cut lineage."""
    edges = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = (
        edges.select(F.col("u").alias("id"))
        .union(edges.select(F.col("v").alias("id")))
        .distinct()
        .persist()
    )
    edges = edges.localCheckpoint()
    try:
        prev = None
        for _ in range(max_iter):
            # large-star: connect strictly-larger neighbors to the local min
            sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
            mu = (
                sym.groupBy("u")
                .agg(F.min("v").alias("mn"))
                .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
            )
            ls = (
                sym.join(mu, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )
            # small-star: orient (big, small), re-hook every small neighbor
            # (and the center) onto the per-center min
            e2 = ls.select(
                F.greatest(F.col("u"), F.col("v")).alias("u"),
                F.least(F.col("u"), F.col("v")).alias("v"),
            )
            mu2 = e2.groupBy("u").agg(F.min("v").alias("m"))
            ss = (
                e2.join(mu2, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(mu2.select(F.col("u"), F.col("m").alias("v")))
                .filter(F.col("u") != F.col("v"))
                .distinct()
                .localCheckpoint()
            )
            # fixpoint test on the orientation-normalized edge set.
            # norm is a projection of the already-checkpointed ss, so it
            # needs no materialization of its own; the set equality runs
            # as ONE tagged symmetric-difference job (a groupBy over the
            # union) instead of two subtract().count() passes.
            norm = ss.select(
                F.greatest(F.col("u"), F.col("v")).alias("u"),
                F.least(F.col("u"), F.col("v")).alias("v"),
            )
            if prev is not None:
                diff = (
                    norm.distinct().withColumn("_s", F.lit(1))
                    .unionByName(prev.distinct().withColumn("_s", F.lit(-1)))
                    .groupBy("u", "v")
                    .agg(F.sum("_s").alias("_d"))
                    .filter(F.col("_d") != 0)
                )
                if diff.isEmpty():
                    edges = ss
                    break
            prev = norm
            edges = ss
        else:
            raise RuntimeError(
                f"connected_components_star did not converge in {max_iter} rounds"
            )
        # at the fixpoint every edge is (node -> component min); nodes
        # missing from the left side are the roots themselves
        comp_map = edges.groupBy(F.col("u").alias("id")).agg(F.min("v").alias("comp"))
        return nodes.join(comp_map, "id", "left").select(
            "id", F.coalesce(F.col("comp"), F.col("id")).alias("comp")
        )
    finally:
        nodes.unpersist()
