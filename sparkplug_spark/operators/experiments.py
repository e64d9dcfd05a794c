"""Experiment (A/B) readout in engine-exact integer components.

One aggregation pass over the assigned metric log yields, per variant,
the sufficient statistics any test statistic needs — count, exact-micros
sum/mean, and the sum of squares at a caller-chosen integer scale —
plus the mean difference against the control variant.  Emitting exact
integer COMPONENTS instead of a floating t/z statistic keeps the result
bit-reproducible across engines and lets the consumer pick the test
(Welch, z, CUPED adjustment) without another scan; the float division
happens in whoever reads the table.

Scale plan: one map-side-combined groupBy on the variant column
(cardinality = number of arms, so the shuffle is trivial); the control
row joins back by broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ab_test_report"]


def ab_test_report(
    df: DataFrame,
    variant_col: str,
    metric_col: str,
    control: str,
    scale: int = 1,
) -> DataFrame:
    """Per-variant sufficient statistics for a two-sample readout.

    Output, one row per variant (BIGINT throughout):

    - ``n`` — observations
    - ``sum_micros`` — Σ metric in exact micro-units (`DECIMAL(28,6) *
      1e6` — integer-valued, so the long cast is lossless both engines)
    - ``mean_micros`` — ``sum_micros div n`` (truncating)
    - ``ssq_scaled`` — Σ ``floor(metric · scale)²``: the square sum over
      scale-quantized values (``floor``, not cast — double→long casts
      truncate in Spark but round in DuckDB).  Pick ``scale`` so
      ``n · (scale · max|metric|)² < 2^63``: quantization at the right
      scale is the price of overflow-free exact variance components at
      any row count
    - ``diff_vs_control_micros`` — ``mean_micros - control's
      mean_micros`` (0 for the control row)

    A ``control`` value with no rows yields NULL
    ``diff_vs_control_micros`` on every arm — checked lazily so
    validation never costs a second scan of the input.  Callers who want
    a loud failure pin it with an expectation
    (``expectations.check_expectations``) on the output.

    Plan note: the control mean is lifted out of the SAME arms-count
    aggregate by an unpartitioned window (arms-count rows — trivially
    single-partition), so the input is scanned exactly once and nothing
    needs persisting or releasing."""
    v = F.col(metric_col).cast("decimal(28,6)")
    q = F.floor(v * F.lit(int(scale))).cast("long")
    per = (
        df.groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((v * F.lit(1000000)).cast("long")).cast("long").alias(
                "sum_micros"
            ),
            F.sum(q * q).cast("long").alias("ssq_scaled"),
        )
        .withColumn("mean_micros", F.expr("sum_micros div n").cast("long"))
    )
    from pyspark.sql import Window

    ctrl_mean = F.max(
        F.when(F.col("variant") == control, F.col("mean_micros"))
    ).over(Window.partitionBy())
    return per.select(
        "variant",
        "n",
        "sum_micros",
        "mean_micros",
        "ssq_scaled",
        (F.col("mean_micros") - ctrl_mean)
        .cast("long")
        .alias("diff_vs_control_micros"),
    )
