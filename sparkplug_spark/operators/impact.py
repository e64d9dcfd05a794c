"""Rule-impact reporting: which rules changed how many rows/fields.

The reference only counted changed rows (accumulator, SparkPlug.scala:52-62);
this aggregates the plug-details audit column into a per-rule report —
explode + groupBy, one shuffle over (rule, version)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..models import DEFAULT_PLUG_DETAILS_COLUMN

__all__ = ["rule_impact_report"]


def rule_impact_report(
    plugged: DataFrame, details_column: str = DEFAULT_PLUG_DETAILS_COLUMN
) -> DataFrame:
    """Per-rule impact: rows changed + total field writes.

    Input: output of ``SparkPlug.plug`` with plug details enabled."""
    d = F.explode(F.col(details_column)).alias("detail")
    return (
        plugged.select(d)
        .groupBy(
            F.col("detail.name").alias("rule_name"),
            F.col("detail.version").alias("rule_version"),
        )
        .agg(
            F.count(F.lit(1)).alias("rows_changed"),
            F.sum(F.size("detail.fieldNames")).alias("field_writes"),
        )
    )
