"""Deterministic stream replay: drive a Structured Streaming operator
with a FIXED sequence of micro-batches and return the final sink as a
plain batch DataFrame.

Why: streaming operators are otherwise only contract-testable — the same
DuckDB oracle machinery that value-hashes every batch operator can't
attach to a live stream.  Replay closes that gap: batches are written as
one parquet file each with strictly increasing modification times (the
file source orders by mtime; explicit ``os.utime`` beats the
sleep-between-writes trick — no wall-clock in the loop), the query runs
with ``maxFilesPerTrigger=1`` under ``Trigger.AvailableNow`` (one
micro-batch per file, then clean shutdown), and the sink is read back,
checkpointed, and the scratch space deleted.

Choosing a sink mode:

- ``mode="append"`` — row-stream operators (dedup, filters, joins): rows
  append to a parquet sink as they are emitted.
- ``mode="complete"`` — windowed aggregations: ``foreachBatch``
  overwrites the sink with the full aggregate state each micro-batch, so
  the final sink IS the end-of-stream aggregate (append mode would hold
  back windows the watermark hasn't closed at shutdown — the classic
  availableNow + append pitfall).

Determinism contract for oracle use: the caller makes batch CONTENT
deterministic and (for stateful first-wins semantics) ensures a key
appears at most once per batch — within a micro-batch, which duplicate
survives depends on partition processing order.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["replay_file_stream", "replay_foreach_batch"]


def _write_batches(tmp: str, name: str, batches: Sequence[DataFrame]) -> str:
    src = os.path.join(tmp, name)
    os.makedirs(src)
    t0 = os.path.getmtime(tmp)
    for i, b in enumerate(batches):
        stage = os.path.join(tmp, f"stage_{name}_{i}")
        # ONE file per logical batch, else part-files arrive as
        # separate unordered micro-batches
        b.coalesce(1).write.parquet(stage)
        part = next(
            f for f in os.listdir(stage)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        dst = os.path.join(src, f"batch_{i:04d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        shutil.rmtree(stage)
        # mtime is the file source's ordering key: pin it explicitly
        os.utime(dst, (t0 + i, t0 + i))
    return src


def replay_file_stream(
    spark: SparkSession,
    batches: Sequence[DataFrame],
    build_query: Callable[..., DataFrame],
    mode: str = "append",
    batches2: Sequence[DataFrame] | None = None,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Replay ``batches`` (one micro-batch each, in order) through
    ``build_query(stream_df)`` and return the sink contents as a batch
    DataFrame (localCheckpoint'ed; all scratch directories are removed
    before returning).  Pass ``batches2`` for TWO-source operators
    (stream-stream joins): ``build_query`` then receives two streaming
    DataFrames; batch i of each source shares the same mtime slot, so
    the sources advance together.

    ``shuffle_partitions`` temporarily overrides
    ``spark.sql.shuffle.partitions`` for the replayed query (restored on
    return).  Stateful streaming cost scales with partitions × batches —
    every micro-batch opens/commits one state store PER shuffle
    partition — and a replay's state is fixture-sized, so 8 partitions
    beat a batch-tuned 32 by ~2x on stream-stream joins while results
    are partition-count-independent (the operators' contract).  The
    override is session-scoped: don't run concurrent queries on the same
    session while a replay with an override is in flight."""
    if not batches:
        raise ValueError("need at least one batch")
    if mode not in ("append", "complete"):
        raise ValueError("mode must be 'append' or 'complete'")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        if shuffle_partitions < 1:
            raise ValueError("shuffle_partitions must be >= 1")
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(int(shuffle_partitions))
        )
    # pid-scoped prefix: concurrent test processes each replaying must
    # be able to reason about THEIR scratch dirs (a bare shared prefix
    # made "all scratch removed" assertions flake under parallel runs)
    tmp = tempfile.mkdtemp(prefix=f"sparkplug_replay_{os.getpid()}_")
    sink = os.path.join(tmp, "sink")
    chk = os.path.join(tmp, "chk")
    try:
        src = _write_batches(tmp, "src", batches)
        stream = (
            spark.readStream.schema(batches[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        if batches2 is not None:
            src2 = _write_batches(tmp, "src2", batches2)
            stream2 = (
                spark.readStream.schema(batches2[0].schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src2)
            )
            out = build_query(stream, stream2)
        else:
            out = build_query(stream)
        if mode == "complete":
            writer = (
                out.writeStream.outputMode("complete")
                .foreachBatch(
                    lambda df, _eid: df.write.mode("overwrite").parquet(sink)
                )
            )
        else:
            writer = (
                out.writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink)
            )
        q = (
            writer.option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = spark.read.parquet(sink)
        # detach from the scratch files before deleting them
        return result.localCheckpoint(eager=True)
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
        shutil.rmtree(tmp, ignore_errors=True)


def replay_foreach_batch(
    spark: SparkSession,
    batches: Sequence[DataFrame],
    attach: Callable[[DataFrame], "object"],
    shuffle_partitions: int | None = None,
) -> None:
    """Replay ``batches`` (one micro-batch each, pinned mtime order)
    through a foreachBatch MAINTENANCE writer: ``attach(stream_df)``
    returns the ``DataStreamWriter`` (e.g.
    ``streaming_pagerank_store(stream, path)``), which runs with
    ``availableNow`` until the source drains.  The sibling of
    :func:`replay_file_stream` for store-maintenance tiers whose output
    IS the store: nothing is returned; scratch (source files +
    checkpoint) is removed, the maintained store — which lives wherever
    the caller pointed it — is not touched."""
    if not batches:
        raise ValueError("need at least one batch")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        if shuffle_partitions < 1:
            raise ValueError("shuffle_partitions must be >= 1")
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(int(shuffle_partitions))
        )
    tmp = tempfile.mkdtemp(prefix=f"sparkplug_replay_{os.getpid()}_")
    try:
        src = _write_batches(tmp, "src", batches)
        stream = (
            spark.readStream.schema(batches[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            attach(stream)
            .option("checkpointLocation", os.path.join(tmp, "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
        shutil.rmtree(tmp, ignore_errors=True)
