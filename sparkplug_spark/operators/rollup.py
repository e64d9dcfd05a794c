"""Continuous-aggregate rollup store: the hypertable/materialized-rollup
maintenance pattern for event streams.

A 100 TB event table is unqueryable interactively; the standing fix is a
small MERGEABLE aggregate table bucketed by day that is (a) refreshed
incrementally — only the day partitions an increment touches are
rewritten — and (b) re-aggregated to any coarser grain (month, year) at
query time, because every stored statistic is a commutative monoid
(count/sum/min/max over exact integers).

Engine-exactness: ``value`` doubles are quantized ONCE at ingest to
integer micros (``floor(v·10⁶ + 0.5)``), so every downstream sum is an
exact BIGINT — order- and partitioning-independent, and reproducible by
a SQL oracle running the same quantization over the raw events.  (A
double ``sum()`` would be order-dependent and engine-divergent.)

Scale shape: the build is one map-side-combinable groupBy of the raw
events; a refresh aggregates ONLY the increment, reads back ONLY the
affected day partitions (partition pruning on ``bucket_date``), merges
by integer addition, and rewrites ONLY those partitions via dynamic
partition overwrite (``sources.overwrite_partitions``).  The query path
never touches raw events: it scans the tiny aggregate table and folds
day → requested grain.

No reference counterpart (the reference delegates all SQL to Spark);
this is the E-series maintenance tier next to E53/E61/E92 sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["build_rollup_store", "refresh_rollup", "rollup_query"]

_STATS = ("n", "sum_micros", "min_micros", "max_micros")


def _bucket_agg(
    df: DataFrame, ts_col: str, key_col: str, value_col: str
) -> DataFrame:
    """Fold raw events to one row per (day, key) of mergeable integer
    stats.  Quantization to micros happens HERE and only here."""
    micros = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        df.select(
            F.to_date(F.col(ts_col)).alias("bucket_date"),
            F.col(key_col).alias("agg_key"),
            micros.alias("__v"),
        )
        .groupBy("bucket_date", "agg_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__v").alias("sum_micros"),
            F.min("__v").alias("min_micros"),
            F.max("__v").alias("max_micros"),
        )
    )


def _merge(df: DataFrame) -> DataFrame:
    """Merge partial rollup rows that share (bucket_date, agg_key):
    counts/sums add, mins min, maxes max — the monoid fold reused by
    both refresh and the grain-change query path."""
    return df.groupBy("bucket_date", "agg_key").agg(
        F.sum("n").alias("n"),
        F.sum("sum_micros").alias("sum_micros"),
        F.min("min_micros").alias("min_micros"),
        F.max("max_micros").alias("max_micros"),
    )


def build_rollup_store(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> None:
    """Initial materialization: aggregate the full input once and write
    it partitioned by ``bucket_date`` so refreshes and grain queries can
    prune to the days they need."""
    agg = _bucket_agg(df, ts_col, key_col, value_col)
    agg.write.mode("overwrite").partitionBy("bucket_date").parquet(path)


def refresh_rollup(
    spark: SparkSession,
    increment: DataFrame,
    path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> int:
    """Fold an increment into the store, touching only affected days.

    The increment is aggregated first (it is the small side), its day
    set is collected (bounded: one row per distinct day in the
    increment), the store is read back FILTERED to those days (parquet
    partition pruning — the 100 TB-safe part), and the merged rows are
    written with dynamic partition overwrite so untouched days keep
    their files byte-for-byte.  Returns the number of rewritten days.

    At-least-once safety is the caller's job (same discipline as the
    streaming sketch stores): an increment must not be replayed, since
    counters add.
    """
    from ..sources import overwrite_partitions

    inc = _bucket_agg(increment, ts_col, key_col, value_col).persist()
    days = [r[0] for r in inc.select("bucket_date").distinct().collect()]
    if not days:
        inc.unpersist()
        return 0
    existing = spark.read.parquet(path).filter(F.col("bucket_date").isin(days))
    merged = _merge(existing.unionByName(inc))
    overwrite_partitions(merged, path, ["bucket_date"])
    inc.unpersist()
    return len(days)


def rollup_query(
    spark: SparkSession,
    path: str,
    grain: str = "month",
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """Serve an aggregate at ``grain`` ('day'|'week'|'month'|'year')
    from the store alone.  Optional [start, end) date bounds become
    partition-pruning filters on ``bucket_date``.  Returns
    (grain_start DATE, agg_key, n, sum_micros, min_micros, max_micros).
    """
    from ..sources import read_store

    # manifest-aware: the streaming tier publishes versioned stores; the
    # batch partitioned store reads directly (legacy fallback)
    store = read_store(spark, path)
    if start is not None:
        store = store.filter(F.col("bucket_date") >= F.lit(start).cast("date"))
    if end is not None:
        store = store.filter(F.col("bucket_date") < F.lit(end).cast("date"))
    if grain == "day":
        keyed = store.withColumn("grain_start", F.col("bucket_date"))
    else:
        keyed = store.withColumn(
            "grain_start", F.date_trunc(grain, F.col("bucket_date")).cast("date")
        )
    return (
        keyed.groupBy("grain_start", "agg_key")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_micros").alias("sum_micros"),
            F.min("min_micros").alias("min_micros"),
            F.max("max_micros").alias("max_micros"),
        )
        .select(
            "grain_start", "agg_key", "n", "sum_micros", "min_micros", "max_micros"
        )
    )
