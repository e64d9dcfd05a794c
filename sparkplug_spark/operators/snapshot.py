"""Snapshot diff: what changed between two versions of a keyed dataset.

Incremental corpus maintenance needs a cheap answer to "what did this
ingestion run actually change" — rows added, removed, or modified since
the last snapshot — both for audit and to drive incremental downstream
recompute (re-embed only changed docs, re-shard only touched sources).

Plan shape: each side collapses to ``(key, digest)`` where the digest is
an md5 over the compared columns (16 bytes/row regardless of how wide
the row is — document text never shuffles), then ONE full-outer
shuffle join on the key.  At 100 TB both sides are scans + narrow
projections; storing snapshots bucketed by the key makes the join
shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "scd2_merge", "scd2_apply_changes", "scd2_asof"]

# unit/field separators make the digest injective over column boundaries;
# NUL marks null (distinct from empty string)
_SEP = "\x1f"
_NULL = "\x00"


def _digest(cols: Sequence[str]) -> Column:
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Keyed diff of two snapshots: one output row per key present in
    either side, with ``status`` in ``added`` (key only in new),
    ``removed`` (only in old), ``changed`` (both, compared columns
    differ), ``unchanged`` (both, identical — emitted only with
    ``include_unchanged=True``).

    Comparison is by md5 digest of ``compare_cols`` (string-cast,
    null-aware).  Cross-engine caveat: float string rendering differs
    between engines — digest integer/string/decimal columns, or
    pre-round floats, when the diff must reproduce outside Spark.
    Duplicate keys within a side violate the snapshot contract and raise
    would be a scan — instead each side is reduced with ``max(digest)``
    per key, so exact-duplicate keys behave as one row and conflicting
    duplicates deterministically pick one digest."""
    keys = list(keys)
    compare_cols = list(compare_cols)
    if not keys or not compare_cols:
        raise ValueError("keys and compare_cols must be non-empty")
    o = old.select(*keys, _digest(compare_cols).alias("__od")).groupBy(
        *keys
    ).agg(F.max("__od").alias("__od"))
    n = new.select(*keys, _digest(compare_cols).alias("__nd")).groupBy(
        *keys
    ).agg(F.max("__nd").alias("__nd"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__od").isNull(), F.lit("added"))
        .when(F.col("__nd").isNull(), F.lit("removed"))
        .when(F.col("__od") != F.col("__nd"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(*keys, status.alias("status"))
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def scd2_merge(
    history: DataFrame,
    snapshot: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    as_of: int,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    release: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) merge: fold a new full
    ``snapshot`` into a versioned ``history`` table at time ``as_of``.

    ``history`` carries ``keys + compare_cols + valid_from + valid_to``
    (null ``valid_to`` = currently open).  The merge closes open rows
    whose key disappeared or whose compared values changed
    (``valid_to = as_of``), opens rows for new and changed keys
    (``valid_from = as_of``), and passes unchanged open rows and all
    already-closed rows through untouched.  ``as_of`` is caller-supplied
    (epoch integer recommended) so re-runs are deterministic.

    Plan: one :func:`snapshot_diff` (digest-reduced, one full-outer
    join) classifies every key, then three key-joins route the
    open/snapshot rows — all on the same key partitioning, so AQE reuses
    exchanges; history stored bucketed by the key makes the whole merge
    shuffle-free.  The status table feeds three consumers, so it is
    ``persist()``-ed and released once the result materializes
    (``release=False`` keeps the lazy plan for composition — callers
    then manage the triple re-evaluation themselves)."""
    from ..caching import materialize_release

    keys = list(keys)
    compare_cols = list(compare_cols)
    closed = history.filter(F.col(valid_to).isNotNull())
    open_ = history.filter(F.col(valid_to).isNull())
    snap_cols = keys + compare_cols
    status = snapshot_diff(
        open_.select(*snap_cols),
        snapshot.select(*snap_cols),
        keys,
        compare_cols,
        include_unchanged=True,
    )
    if release:
        status = status.persist()
    keep = open_.join(
        status.filter(F.col("status") == "unchanged").select(*keys), keys, "left_semi"
    )
    close = open_.join(
        status.filter(F.col("status").isin("removed", "changed")).select(*keys),
        keys,
        "left_semi",
    ).withColumn(valid_to, F.lit(as_of).cast(history.schema[valid_to].dataType))
    opened = snapshot.select(*snap_cols).join(
        status.filter(F.col("status").isin("added", "changed")).select(*keys),
        keys,
        "left_semi",
    ).select(
        *snap_cols,
        F.lit(as_of).cast(history.schema[valid_from].dataType).alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
    )
    cols = history.columns
    out = (
        closed.select(*cols)
        .unionByName(keep.select(*cols))
        .unionByName(close.select(*cols))
        .unionByName(opened.select(*cols))
    )
    if not release:
        return out
    return materialize_release(out, status)


def scd2_apply_changes(
    history: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    as_of: int,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    order_col: str | None = None,
    release: bool = True,
) -> DataFrame:
    """CDC-style SCD2 delta apply: fold a PARTIAL batch of upserts into a
    versioned history at ``as_of``.

    Unlike :func:`scd2_merge` (which needs a FULL snapshot and closes
    keys absent from it), keys absent from ``changes`` stay untouched —
    the semantics of applying a change feed, where absence means "no
    news", not "deleted".  Deletions must arrive as explicit tombstones
    handled upstream, or use a full-snapshot merge.

    A change feed legitimately carries several events per key per batch,
    so ``changes`` is first reduced to ONE row per key: last-wins by
    ``order_col`` descending when given (pass the event-time/sequence
    column), else by the largest value digest — deterministic either
    way, never the max-digest coin-flip of feeding duplicates straight
    into the diff.

    New keys open; changed keys close-and-reopen; changes identical to
    the open row are no-ops (re-delivered events don't churn history).
    One digest classification + key-routed left-semi/anti joins, same
    exchange-reuse shape as :func:`scd2_merge`.  For per-epoch loops
    (foreachBatch history maintenance) prefer ``release=False`` plus
    ``caching.checkpoint_tracked``/``unpersist_ids`` so epoch N-1's
    materialization blocks are freed — tested recipe in
    ``tests/test_semistructured_snapshot.py``."""
    from ..caching import materialize_release

    keys = list(keys)
    compare_cols = list(compare_cols)
    closed = history.filter(F.col(valid_to).isNotNull())
    open_ = history.filter(F.col(valid_to).isNull())
    snap_cols = keys + compare_cols
    order_by = (
        [F.desc(order_col)] if order_col else [F.desc(_digest(compare_cols))]
    )
    w = Window.partitionBy(*keys).orderBy(*order_by)
    changes = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    status = snapshot_diff(
        open_.select(*snap_cols),
        changes.select(*snap_cols),
        keys,
        compare_cols,
        include_unchanged=True,
    )
    if release:
        status = status.persist()
    touched = status.filter(F.col("status") == "changed").select(*keys)
    keep = open_.join(touched, keys, "left_anti")
    close = open_.join(touched, keys, "left_semi").withColumn(
        valid_to, F.lit(as_of).cast(history.schema[valid_to].dataType)
    )
    opened = changes.select(*snap_cols).join(
        status.filter(F.col("status").isin("added", "changed")).select(*keys),
        keys,
        "left_semi",
    ).select(
        *snap_cols,
        F.lit(as_of).cast(history.schema[valid_from].dataType).alias(valid_from),
        F.lit(None).cast(history.schema[valid_to].dataType).alias(valid_to),
    )
    cols = history.columns
    out = (
        closed.select(*cols)
        .unionByName(keep.select(*cols))
        .unionByName(close.select(*cols))
        .unionByName(opened.select(*cols))
    )
    if not release:
        return out
    return materialize_release(out, status)


def scd2_asof(
    history: DataFrame,
    as_of: int,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    keep_validity: bool = False,
) -> DataFrame:
    """Time-travel read of an SCD2 history: the dimension exactly as it
    stood at ``as_of`` — rows with ``valid_from <= as_of`` and
    (``valid_to`` null or ``valid_to > as_of``), i.e. versions open at
    that instant (a version closed AT ``as_of`` was already replaced by
    the merge that closed it, matching :func:`scd2_merge`'s half-open
    [valid_from, valid_to) convention).

    A pure filter — Catalyst pushes both predicates into the scan, and a
    history stored sorted/partitioned on ``valid_from`` prunes whole
    files (`write_sorted`'s data-skipping applies).  ``keep_validity``
    retains the validity columns; default drops them so the result has
    the snapshot's own schema and diffs cleanly against one."""
    vf, vt = F.col(valid_from), F.col(valid_to)
    out = history.filter(
        (vf <= F.lit(as_of)) & (vt.isNull() | (vt > F.lit(as_of)))
    )
    return out if keep_validity else out.drop(valid_from, valid_to)
