"""Mergeable distinct-count sketch tables (Apache DataSketches HLL).

The pattern that makes 100 TB dashboards cheap: aggregate the raw log
ONCE into per-(fine-grained key) HLL sketches — a table of kilobyte
binary columns — then answer every coarser distinct-count rollup by
UNIONING stored sketches, never rescanning raw data.  Exact distincts
don't compose this way (distinct users per day can't be summed into
distinct users per week); sketches do, with a published error bound
(~1.04/√2^lg_k relative standard error).

Built on Spark's native `hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate` (JVM DataSketches, map-side combined, no UDFs).
Estimates are engine-specific (DuckDB's HLL differs) — queries built on
these are rows-only; the error gate lives in pytest against exact
counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_distinct_sketches", "rollup_distinct_sketches"]


def build_distinct_sketches(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Per-key HLL sketch table: (key_cols..., sketch BINARY, n_est
    BIGINT).  ``lg_k=14`` → ~0.8% RSE at ~16 KiB max per sketch; store
    the result (partitioned by a coarse key prefix) as the reusable
    rollup source.

    Plan: one map-side-combined aggregate — sketches merge on the
    combiner, so the shuffle carries one sketch per (partition, key),
    never raw values."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k)))
    return df.groupBy(*[F.col(c) for c in key_cols]).agg(
        sk.alias("sketch")
    ).withColumn(
        "n_est", F.hll_sketch_estimate("sketch").cast("long")
    )


def rollup_distinct_sketches(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge a stored sketch table up to a coarser grain:
    (group_cols..., n_est BIGINT).  Pass ``group_cols=[]`` for the grand
    total (one row).  Input rows are kilobytes, so this aggregates the
    SKETCH table — the raw log is never touched again."""
    merged = F.hll_union_agg(F.col(sketch_col))
    if group_cols:
        out = sketches.groupBy(*[F.col(c) for c in group_cols]).agg(
            merged.alias("__m")
        )
    else:
        out = sketches.agg(merged.alias("__m"))
    return out.select(
        *group_cols, F.hll_sketch_estimate("__m").cast("long").alias("n_est")
    )
