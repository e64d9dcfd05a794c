"""Partition-layout helpers.

A scan of a small single-row-group parquet file (our local test data, or a
badly-written upstream table) yields ONE input partition, so every narrow
CPU-bound stage after it — shingling, hashing, signature computation, pair
scoring — serializes on one core no matter how many the cluster has.

:func:`spread` rebalances ONLY when the plan's partition count is below the
session's default parallelism.  At production scale (100 TB = tens of
thousands of splits) the check fails and it is a zero-cost no-op; on
under-partitioned inputs it trades one tiny round-robin shuffle for full
cluster utilization of everything downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread"]


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff ``df`` has fewer partitions than
    ``min_partitions`` (default: ``sparkContext.defaultParallelism``).

    Inspects the physical plan's partitioning (no job is triggered), but
    the ``.rdd`` probe does force an RDD conversion per call — measurable
    on plans with thousands of nodes.  Production jobs whose inputs are
    known to be well-split should disable the helper globally with
    ``spark.conf.set("spark.sparkplug.spread.enabled", "false")``, making
    every call a zero-cost pass-through.

    Streaming DataFrames pass through untouched (no ``.rdd`` there; a
    micro-batch source's parallelism is governed by its own options)."""
    if df.isStreaming:
        return df
    sess = df.sparkSession
    if sess.conf.get("spark.sparkplug.spread.enabled", "true") == "false":
        return df
    target = min_partitions or sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
