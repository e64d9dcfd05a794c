"""Cache-lifecycle helpers: release persisted intermediates instead of
leaking them for the life of the SparkSession.

Spark never auto-releases a ``persist()``-ed dataset or the block-storage
backing a ``localCheckpoint()``.  An operator that persists an intermediate
for multi-consumer fan-out (e.g. an exploded shingle index feeding both
sides of a self-join) and returns a *lazy* result therefore leaks that
cache: in a long-lived application — a 100 TB pipeline driver, a notebook,
a benchmark harness — every operator call grows executor storage until
eviction churn and GC pressure dominate.  The pattern here: eagerly
materialize the operator's (orders-of-magnitude smaller) output, then
unpersist the working set.

``localCheckpoint`` blocks are NOT registered in the SQL cache manager, so
``DataFrame.unpersist()`` cannot free them; they are only reachable through
``SparkContext.getPersistentRDDs``.  ``checkpoint_tracked`` captures the
RDD ids a checkpoint call registers so iterative operators can free round
N-1's blocks once round N is materialized (freeing the *final* round would
destroy the result — local checkpoints truncate lineage, so the blocks are
the only copy).

Id capture diffs the persistent-RDD registry around the checkpoint call
under a module lock, so concurrent driver threads using THIS module can't
misattribute each other's ids; checkpoints made directly (outside
``checkpoint_tracked``) during that window would still be swept into the
diff — rare, and the cost is early release of a cache another thread just
created, never corruption of this module's own tracking.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

__all__ = ["checkpoint_tracked", "unpersist_ids", "materialize_release"]

# serializes the registry-diff around a checkpoint call so concurrent
# driver threads can't misattribute each other's RDD ids
_TRACK_LOCK = threading.Lock()


def _persistent_ids(spark: SparkSession) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def checkpoint_tracked(
    df: DataFrame, reliable: bool = False, eager: bool = True
) -> tuple[DataFrame, set[int]]:
    """Checkpoint ``df`` and return (checkpointed df, newly-registered RDD
    ids).  The ids are handles for :func:`unpersist_ids` once no live
    DataFrame depends on the blocks.  Reliable (HDFS-file) checkpoints
    register no persistent RDDs — the returned set is empty and cleanup is
    ``spark.cleaner.referenceTracking.cleanCheckpoints``'s job."""
    spark = df.sparkSession
    with _TRACK_LOCK:
        before = _persistent_ids(spark)
        out = (
            df.checkpoint(eager=eager) if reliable else df.localCheckpoint(eager=eager)
        )
        return out, _persistent_ids(spark) - before


def unpersist_ids(spark: SparkSession, ids: set[int], blocking: bool = False) -> None:
    """Free the block storage behind previously tracked checkpoint ids.
    Ids no longer registered are skipped."""
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in jmap.keySet().toArray():
        if i in ids:
            jmap.get(i).unpersist(blocking)


def materialize_release(
    out: DataFrame, *intermediates: DataFrame, release: bool = True
) -> DataFrame:
    """Eagerly materialize ``out`` (local checkpoint) and unpersist the
    ``persist()``-ed intermediates that fed it.

    For operators whose result is orders of magnitude smaller than their
    working set — candidate-pair lists vs an exploded n-gram index — this
    swaps a session-lifetime leak of the big dataset for block storage of
    the small one.  Pass ``release=False`` to keep the fully lazy plan
    (composing into a larger pipeline that manages its own caching)."""
    if not release:
        return out
    # conf kill-switch (mirrors spark.sparkplug.spread.enabled): plan
    # audits need the full lazy pipeline plan, not a post-materialization
    # ExistingRDD scan
    if (
        out.sparkSession.conf.get("spark.sparkplug.release.enabled", "true")
        == "false"
    ):
        return out
    out = out.localCheckpoint(eager=True)
    for df in intermediates:
        df.unpersist()
    return out
