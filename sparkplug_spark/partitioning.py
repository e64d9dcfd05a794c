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

    Inspects the physical plan's partitioning (no job is triggered).
    Streaming DataFrames pass through untouched (no ``.rdd`` there; a
    micro-batch source's parallelism is governed by its own options)."""
    if df.isStreaming:
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
