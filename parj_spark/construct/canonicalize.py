"""Stage 3: canonicalization — distributed union-find (connected components).

Iterative min-label propagation over DataFrame self-joins with checkpointed
frontiers (``localCheckpoint`` cuts lineage each round, per SURVEY.md §7.1
step 4). Convergence is O(graph diameter) rounds; coref alias chains have
diameter <= ~3, so 2-4 rounds in practice. For adversarial long-chain
components at 10^12-doc scale the published fix is hash-to-min / alternating
large-star+small-star (Kiveris et al., "Connected Components in MapReduce"),
which drops rounds to O(log n); the loop below is structured so that swap is
a local change (replace the ``prop`` propagation expression).

The reference has no equivalent (its dictionary is built offline by
`rdf-exp`); this stage is mandated by BASELINE.json north_rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
) -> tuple[DataFrame, int]:
    """(node, component) for every node in ``edges``; component = min member label.

    ``edges`` must have columns (src, dst); undirected semantics.
    Returns (labels_df, iterations_run).

    Engineered for minimum job count: the loop runs exactly ONE Spark action
    per iteration (the changed-count, which also materializes the new label
    cache), because on short coref chains the iteration cost is pure
    scheduling overhead, not compute. AQE handles shuffle partition sizing;
    lineage is cut every 5 iterations for adversarially deep components.
    """
    # duplicates in sym are harmless under min-aggregation -> skip distinct
    # (saves a full shuffle of the edge set)
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .persist()
    )
    labels.count()

    it = 0
    for it in range(1, max_iter + 1):
        prop = (
            sym.join(labels, sym.dst == labels.node)
            .select(sym.src.alias("node"), "component")
        )
        new_labels = (
            labels.select("node", "component")
            .union(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .persist()
        )
        # one action per iteration: the changed-count materializes new_labels
        # into the cache as a side effect (no separate checkpoint job)
        changed = (
            labels.alias("a")
            .join(new_labels.alias("b"), "node")
            .filter(F.col("a.component") != F.col("b.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if it % 5 == 0:
            # cut logical lineage for adversarially deep components
            labels = labels.localCheckpoint()
        if changed == 0:
            break
    sym.unpersist()
    return labels, it


def canonical_map(labels: DataFrame, priority: DataFrame) -> DataFrame:
    """Pick the canonical representative per component.

    ``priority`` maps (node, rank) — lower rank wins (rank 0 = canonical
    surface form). Returns (node, canon) for every node. Ties broken by
    lexicographic node order (deterministic).
    """
    members = labels.join(priority, "node", "left").fillna({"rank": 9})
    reps = members.groupBy("component").agg(
        F.min_by("node", F.struct("rank", "node")).alias("canon")
    )
    return labels.join(reps, "component").select("node", "canon")
