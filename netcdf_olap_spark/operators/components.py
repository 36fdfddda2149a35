"""Connected components over a pair list — near-dup PAIRS → dedup
CLUSTERS (training-data pipeline: the step that turns `jaccard_pairs`
/ `minhash_lsh_pairs` / `simhash_pairs` edges into one canonical
keeper per duplicate group).

Algorithm: iterative minimum-label propagation. Every node starts
labeled with its own id; each round, a node adopts the smallest label
in its closed neighborhood. Converges in O(diameter) rounds —
near-dup clusters are small and dense (diameter ≤ a few hops), so the
default iteration cap is generous. Each round is one join + one
aggregation on the node id: at corpus scale both shuffle on the same
key, and AQE coalesces the (tiny relative to the corpus) edge/label
tables. No driver-side state — the loop is over PLANS, not data;
``localCheckpoint`` after each round truncates the growing lineage so
round N+1 does not replay rounds 1..N.

Termination is data-driven (count of label changes == 0); the final
labels are deterministic: label(v) = min(component ids) regardless of
execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 20,
) -> DataFrame:
    """Returns (id, component) — component = min node id reachable.

    ``edges`` is an undirected pair list; isolated nodes absent from
    it simply keep their own id and need no rows here.
    """
    e = edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
    # symmetrize once: propagation below only needs neighbor -> node
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # smallest label among neighbors, joined against own label
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                    "comp"
                ),
                (F.col("nbr_comp") < F.col("comp")).alias("changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = new_labels.where(F.col("changed")).count()
        labels = new_labels.select("id", "comp")
        if n_changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "doc_id",
    src: str = "id1",
    dst: str = "id2",
) -> DataFrame:
    """Cluster every document: near-dup groups get their component's
    min id as ``keeper_id``; documents in no pair keep themselves.
    Output: (doc_id, keeper_id, is_keeper)."""
    comp = connected_components(pairs, src, dst)
    return (
        all_ids.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("comp", "doc_id").alias("keeper_id"),
            (F.coalesce("comp", "doc_id") == F.col("doc_id")).alias("is_keeper"),
        )
    )
