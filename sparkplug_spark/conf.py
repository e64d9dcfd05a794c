"""Cluster-tuning presets: the shuffle/partition/AQE settings this
engine's operators assume at scale, derived from input size and executor
shape instead of guessed.

The knobs and their failure modes:

- ``spark.sql.shuffle.partitions``: too low → shuffle partitions exceed
  executor memory and spill (or OOM); too high → scheduler overhead and
  tiny files.  Target ~128 MB of shuffle data per partition, then let AQE
  coalesce the small ones at runtime.
- ``spark.sql.files.maxPartitionBytes``: read-side split size; 128-256 MB
  keeps scan tasks substantial without starving parallelism.
- AQE (+ skew join): runtime re-plan is load-bearing for the self-join
  operators here (band buckets and chunk tables are data-dependent);
  ``skewedPartitionFactor`` splits hot buckets that slip past
  ``max_key_freq`` caps.
- Broadcast threshold: the dedup/decontaminate operators broadcast hot-key
  and eval-index sides explicitly via ``F.broadcast``; the implicit
  threshold only needs to cover dimension tables.
"""

from __future__ import annotations

__all__ = ["recommended_conf"]

_MB = 1 << 20
_GB = 1 << 30


def recommended_conf(
    input_bytes: int,
    executor_memory_bytes: int = 8 * _GB,
    executor_cores: int = 4,
    num_executors: int | None = None,
    target_shuffle_partition_bytes: int = 128 * _MB,
) -> dict[str, str]:
    """Session conf for a job reading ~``input_bytes`` of source data.

    Returns plain ``{conf_key: value}`` to apply via
    ``SparkSession.builder.config(map=...)`` or ``spark.conf.set``.
    Assumes post-scan data volume is of the same order as the input —
    multiply ``input_bytes`` down first when aggressive filters prune
    early (the plan audit shows whether pushdown actually happens)."""
    if input_bytes <= 0:
        raise ValueError("input_bytes must be positive")

    shuffle_parts = max(1, input_bytes // target_shuffle_partition_bytes)
    if num_executors:
        # at least 2 waves of tasks per core so stragglers overlap
        shuffle_parts = max(shuffle_parts, 2 * executor_cores * num_executors)

    # a shuffle partition must fit comfortably in a task's share of the
    # executor heap (~60% usable / cores); warn-by-construction: widen
    # partitions only while they stay under that bound
    per_task_budget = int(executor_memory_bytes * 0.6) // max(executor_cores, 1)
    if target_shuffle_partition_bytes > per_task_budget:
        shuffle_parts = max(
            shuffle_parts, 1 + input_bytes // max(per_task_budget, 1)
        )
    # hard cap LAST so the memory-pressure widening can never exceed it
    shuffle_parts = min(shuffle_parts, 200_000)
    # advisory size must not advertise more than a task can hold
    advisory = min(target_shuffle_partition_bytes, per_task_budget)

    return {
        "spark.sql.shuffle.partitions": str(int(shuffle_parts)),
        "spark.sql.files.maxPartitionBytes": str(256 * _MB),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(advisory),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * _MB),
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    }
