"""Connected components over near-duplicate pair lists, and
representative selection — the step that turns pairwise dedup output
(:func:`~.dedup.minhash_lsh_pairs` et al.) into per-cluster keep/drop
decisions for a training corpus.

Min-label propagation: every node repeatedly adopts the smallest label in
its closed neighborhood until fixpoint.  Iterations = graph diameter;
near-dup clusters are small and dense, so this converges in a handful of
rounds.  Each round is one join + one aggregate (two shuffles) over the
edge list; ``localCheckpoint`` truncates the growing lineage so round N
doesn't replay rounds 1..N-1.  This is iterative and data-dependent —
not expressible as one SQL query (driver records the rows-only check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["near_dup_groups", "dedup_keep_best"]


def near_dup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """(id, group_id) for every id appearing in ``pairs``; ``group_id`` is
    the smallest id of the connected component.

    ``reliable_checkpoint=True`` truncates lineage with HDFS-backed
    ``checkpoint()`` instead of ``localCheckpoint()`` (the caller must
    ``spark.sparkContext.setCheckpointDir(...)`` first).  Local checkpoints
    live in executor block storage — losing one executor mid-computation
    kills the job; on a 1000-node cluster use the reliable flavor.

    Raises if the label propagation hasn't converged after
    ``max_iterations`` rounds (returning silently would hand back WRONG
    group labels for any component whose diameter exceeds the cap)."""

    def _ckpt(df: DataFrame, eager: bool) -> DataFrame:
        if reliable_checkpoint:
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    edges = _ckpt(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct(),
        eager=False,
    )
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__m"))
        .select(F.col("src").alias("id"), F.least("src", "__m").alias("label"))
    )
    changed = -1
    for _ in range(max_iterations):
        # candidate labels: own label + each neighbor's label; adopt the min
        nbr = (
            edges.join(labels.withColumnsRenamed({"id": "dst", "label": "nbr_label"}), "dst")
            .groupBy("src")
            .agg(F.min("nbr_label").alias("nbr_label"))
        )
        new_labels = _ckpt(
            labels.join(nbr.withColumnsRenamed({"src": "id"}), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            ),
            eager=True,
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"near_dup_groups did not converge within {max_iterations} "
            "iterations — component diameter exceeds the cap; raise "
            "max_iterations"
        )
    return labels.select("id", F.col("label").alias("group_id"))


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality: Column | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop near-duplicates, keeping one representative per connected
    component: the highest ``quality`` row (ties → smallest id).  Rows in
    no pair are kept unchanged.  ``quality`` defaults to the
    :func:`~..functions.text.quality_score` of ``text``."""
    if quality is None:
        from ..functions.text import quality_score

        quality = quality_score(F.col("text"))
    groups = near_dup_groups(pairs, id_a=id_a, id_b=id_b)
    joined = df.join(
        groups.withColumnsRenamed({"id": id_col}), id_col, "left"
    ).withColumn("__grp", F.coalesce(F.col("group_id"), F.col(id_col)))
    w = Window.partitionBy("__grp").orderBy(quality.desc(), F.asc(id_col))
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__grp", "group_id")
    )
