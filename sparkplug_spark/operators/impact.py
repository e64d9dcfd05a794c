"""Rule-impact reporting: which rules changed how many rows/fields.

The reference only counted changed rows (accumulator, SparkPlug.scala:52-62);
this aggregates the plug-details audit column into a per-rule report —
explode + groupBy, one shuffle over (rule, version)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..models import DEFAULT_PLUG_DETAILS_COLUMN

__all__ = ["rule_impact_report", "rule_selectivity"]


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


def rule_selectivity(df: DataFrame, rules) -> DataFrame:
    """Pre-flight selectivity report for a rule set BEFORE running it:
    per rule (rule_name, rule_version, n_match, match_ppm, n_exclusive)
    plus an ``__any__`` summary row — how much of the table each
    condition touches, and how much only THAT rule touches (the overlap
    signal that predicts sequential-fold interactions, since rule k+1
    observes rule k's writes).

    ``n_exclusive`` counts rows matched by exactly one rule (for the
    ``__any__`` row: rows matched by exactly one rule overall).  NULL
    conditions count as no-match, mirroring the engine's filter
    semantics.

    Plan: ONE scan — every condition evaluates as a boolean projection
    and all counts come from a single aggregate; no shuffle at all
    beyond the 1-row final aggregation.  This is the cheap preflight
    the 100 TB fold wants before touching any data."""
    if not rules:
        raise ValueError("rules must be non-empty")
    flags = [
        F.coalesce(F.expr(r.condition).cast("boolean"), F.lit(False)).alias(
            f"__m{i}"
        )
        for i, r in enumerate(rules)
    ]
    base = df.select(*flags)
    k = sum(F.col(f"__m{i}").cast("int") for i in range(len(rules)))
    base = base.withColumn("__k", k)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(len(rules)):
        aggs.append(F.sum(F.col(f"__m{i}").cast("long")).alias(f"__c{i}"))
        aggs.append(
            F.sum(
                (F.col(f"__m{i}") & (F.col("__k") == 1)).cast("long")
            ).alias(f"__x{i}")
        )
    aggs.append(F.sum((F.col("__k") >= 1).cast("long")).alias("__cany"))
    aggs.append(F.sum((F.col("__k") == 1).cast("long")).alias("__xany"))
    tot = base.agg(*aggs)
    parts = []
    for i, r in enumerate(rules):
        parts.append(
            tot.select(
                F.lit(r.name).alias("rule_name"),
                F.lit(r.version).alias("rule_version"),
                F.col(f"__c{i}").alias("n_match"),
                F.expr(f"__c{i} * 1000000L div __n").alias("match_ppm"),
                F.col(f"__x{i}").alias("n_exclusive"),
            )
        )
    parts.append(
        tot.select(
            F.lit("__any__").alias("rule_name"),
            F.lit("").alias("rule_version"),
            F.col("__cany").alias("n_match"),
            F.expr("__cany * 1000000L div __n").alias("match_ppm"),
            F.col("__xany").alias("n_exclusive"),
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
