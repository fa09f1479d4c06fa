"""Graph operators for dedup-cluster formation.

Near-dup detection yields PAIRS; curation needs CLUSTERS (keep one
document per connected component). This is the standard iterative
min-label propagation on DataFrames:

  label(v) := v
  repeat: label(v) := min(label(v), min over neighbors' labels)
  until fixpoint

Each iteration is one equi-join + one partial-aggregatable groupBy
(shuffle on vertex id); convergence takes O(component diameter)
rounds — near-dup components are tiny (dups of one document), so in
practice 2-4 rounds. The driver loop checks a changed-count each
round (a count() action on a cached frame — the loop state is one
narrow (id, label) table, never the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components of the undirected graph given by edge
    pairs. Returns (id, component) where component = min vertex id
    reachable. Vertices are the ids appearing in any edge."""
    # materialize the symmetric edge list ONCE: every propagation
    # round joins against it, and without the checkpoint each round
    # re-executes the ENTIRE upstream pair-generation pipeline (the
    # near-dup join is far more expensive than the propagation —
    # measured 8 s → 3.5 s at sf0.1 for jaccard-pair clustering)
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy(F.col("u").alias("id2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == F.col("id2"), "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("component"))
                    < F.col("component")
                ).cast("long").alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = updated.agg(F.sum("changed")).collect()[0][0] or 0
        labels = updated.select("id", "component").localCheckpoint(eager=True)
        if n_changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs -> (doc_id, cluster_root, is_kept): every member
    of each duplicate cluster labeled with the cluster's min id; the
    min id is the canonical keeper (deterministic survivor policy)."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_root"),
        (F.col("id") == F.col("component")).alias("is_kept"),
    )
