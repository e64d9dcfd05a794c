"""Structured Streaming support.

Rule application is stateless per row (one narrow projection), so the same
``SparkPlug.plug`` works unchanged on a streaming DataFrame — no state
store, no watermark needed (SURVEY §2.3).  This module adds the readStream
entry point and a windowed rule-impact aggregation for monitoring
(watermark + tumbling window, handles late events).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import SparkPlug
from ..models import DEFAULT_PLUG_DETAILS_COLUMN, PlugRule

__all__ = ["plug_stream", "streaming_impact_counts"]


def plug_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    rules: Iterable[PlugRule],
    plug_details_column: str | None = DEFAULT_PLUG_DETAILS_COLUMN,
    validate: bool = True,
) -> DataFrame:
    """Apply rules to a streaming DataFrame.  Validation runs eagerly
    against the stream schema (driver-side, no job); metrics/checkpoint
    knobs are intentionally absent — use ``observe`` on the query or the
    sink's own checkpointing."""
    builder = SparkPlug.builder(spark)
    if plug_details_column is not None:
        builder = builder.enable_plug_details(column=plug_details_column)
    if validate:
        builder = builder.enable_rules_validation()
    return builder.create().plug(stream_df, rules)


def streaming_impact_counts(
    plugged_stream: DataFrame,
    time_col: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "10 minutes",
    details_column: str = DEFAULT_PLUG_DETAILS_COLUMN,
) -> DataFrame:
    """Per-window, per-rule changed-row counts over a plugged stream.
    Watermarked tumbling window → safe state eviction with late data."""
    return (
        plugged_stream.withWatermark(time_col, watermark_delay)
        .select(F.col(time_col), F.explode(F.col(details_column)).alias("detail"))
        .groupBy(
            F.window(F.col(time_col), window_duration).alias("w"),
            F.col("detail.name").alias("rule_name"),
        )
        .agg(F.count(F.lit(1)).alias("rows_changed"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "rule_name",
            "rows_changed",
        )
    )
