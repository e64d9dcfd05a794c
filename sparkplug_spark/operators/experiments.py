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

__all__ = ["ab_test_report", "bootstrap_ci", "poisson_cutoffs", "cuped_adjust"]


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


def poisson_cutoffs(lam: float = 1.0, k_max: int = 12) -> list[int]:
    """Integer inverse-CDF table for Poisson(``lam``), 2^60-scaled — the
    md5-coin weight generator of :func:`bootstrap_ci` (Poisson
    bootstrap: Chamandy et al. 2012).  ``k_max=12`` leaves < 1e-12 tail
    mass at λ=1 (folded into the last bucket).  Computed once
    driver-side; the literals ARE the mechanism, so both engines draw
    identical weights with zero libm at query time (the
    ``privacy.discrete_laplace_cutoffs`` discipline)."""
    import math

    if lam <= 0:
        raise ValueError("lam must be positive")
    if k_max < 1:
        raise ValueError("k_max must be >= 1")
    pmf = [math.exp(-lam)]
    for k in range(1, k_max + 1):
        pmf.append(pmf[-1] * lam / k)
    cum = 0.0
    cutoffs = []
    for p in pmf:
        cum += p
        cutoffs.append(min(int(math.floor(cum * (1 << 60))), 1 << 60))
    cutoffs[-1] = 1 << 60
    return cutoffs


def bootstrap_ci(
    df: DataFrame,
    metric_col: str,
    by: "tuple[str, ...] | list[str]" = (),
    id_col: str = "doc_id",
    n_boot: int = 200,
    alpha: float = 0.025,
    seed: int = 42,
) -> DataFrame:
    """Nonparametric confidence interval for the per-group MEAN via the
    Poisson bootstrap — the uncertainty layer :func:`ab_test_report`'s
    sufficient statistics feed into, computed distributed and
    DETERMINISTICALLY: each (row, replicate) draws a Poisson(1) weight
    from ``md5(seed, group, id, replicate)`` through an integer
    inverse-CDF table, so the same release reproduces on any engine,
    run, or partitioning (no RNG state, no libm at query time).

    Per group: ``mean_micros`` (full-sample, exact integer sum / count —
    one IEEE division), ``ci_lo_micros`` / ``ci_hi_micros`` — the
    floor-quantized replicate means at exact ranks ``floor(α·B)+1`` and
    ``B − floor(α·B)`` (ties by replicate id), i.e. a (1−2α) percentile
    interval — and ``n_boot``.

    Scale shape: the replicate explode multiplies ROWS ×B before the
    partial aggregation, but the SHUFFLE is only (group, replicate)
    integer partials (map-side combined) — ~B·|groups| keyed rows; CPU
    scales with B, so bound B or bootstrap a sampled/pre-aggregated
    table at the 100 TB tier.  Metric values quantize to exact micros
    up front; replicate sums/counts are exact BIGINTs."""
    from pyspark.sql import Window

    from ..functions.text import cutoff_bucket, hash60
    from ..partitioning import spread

    by = list(by)
    if n_boot < 2:
        raise ValueError("n_boot must be >= 2")
    if not (0 < alpha < 0.5):
        raise ValueError("alpha must be in (0, 0.5)")
    cutoffs = poisson_cutoffs(1.0)
    v = F.floor(F.col(metric_col).cast("double") * F.lit(1e6) + F.lit(0.5)).cast(
        "long"
    )
    base = spread(df).select(
        *by,
        F.col(id_col).alias("__id"),
        v.alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(int(n_boot) - 1))).alias(
            "__b"
        ),
    )
    key = F.concat_ws(
        "\x1f",
        F.lit(str(int(seed))),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in by
        ],
        F.col("__id").cast("string"),
        F.col("__b").cast("string"),
    )
    # materialize the md5 coin ONCE per row, then bucket it with the flat
    # CASE WHEN inverse-CDF (cutoff_bucket): the transform/array_position
    # form allocated a per-row array outside whole-stage codegen and
    # dominated the whole operator (measured 7.7 s of its 9.9 s aggregate
    # stage at sf0.1; the chain computes identical values)
    base = base.withColumn("__u", hash60(key))
    w = cutoff_bucket(F.col("__u"), cutoffs)
    reps = (
        base.withColumn("__w", w)
        .groupBy(*by, "__b")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).cast("long").alias("__s"),
            F.sum("__w").cast("long").alias("__n"),
        )
        .select(
            *by,
            "__b",
            # an (astronomically rare at B rows/replicate) all-zero-weight
            # replicate contributes a 0 mean rather than a NULL
            (
                F.col("__s").cast("double")
                / F.greatest(F.col("__n"), F.lit(1)).cast("double")
            ).alias("__m"),
        )
    )
    win = Window.partitionBy(*by).orderBy(F.asc("__m"), F.asc("__b"))
    r_lo = int(alpha * n_boot) + 1
    r_hi = n_boot - int(alpha * n_boot)
    ranked = reps.withColumn("__rk", F.row_number().over(win))
    picks = ranked.filter(
        (F.col("__rk") == r_lo) | (F.col("__rk") == r_hi)
    ).groupBy(*by).agg(
        F.min(F.when(F.col("__rk") == r_lo, F.col("__m"))).alias("__lo"),
        F.min(F.when(F.col("__rk") == r_hi, F.col("__m"))).alias("__hi"),
    )
    point = df.groupBy(*[F.col(c) for c in by]).agg(
        (
            F.sum(v).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double")
        ).alias("__pm")
    )
    join_on = by if by else None
    out = (
        point.join(picks, on=join_on) if by else point.crossJoin(picks)
    )
    return out.select(
        *by,
        F.floor(F.col("__pm")).cast("long").alias("mean_micros"),
        F.floor(F.col("__lo")).cast("long").alias("ci_lo_micros"),
        F.floor(F.col("__hi")).cast("long").alias("ci_hi_micros"),
        F.lit(int(n_boot)).cast("long").alias("n_boot"),
    )


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    variant_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013) — the standard
    trick that makes A/B tests decisive weeks earlier: regress the
    experiment metric on a PRE-EXPERIMENT covariate (the same metric
    last month, a pre-period engagement score) and analyze the residual
    ``y − θ(x − x̄)``, which has the same treatment effect but
    ``(1 − ρ²)`` of the variance.

    Engine-exact: x and y quantize to integer micros up front; the
    pooled moments accumulate as DECIMAL(38,0)/HUGEINT (micros products
    overflow int64) so both engines hold the IDENTICAL exact integers;
    θ is one IEEE division of those integers; per-row adjusted values
    floor back to integer micros before the per-variant sums.  Output
    per variant: (variant, n, mean_micros, mean_adj_micros,
    var_reduction_ppm, theta_nano) — the adjusted means you compare,
    the variance reduction actually achieved, and θ for audit.

    Scale shape: one pooled-moment aggregate (5 numbers) + one
    per-variant aggregate over a narrow integer projection; no joins
    except the 1-row θ broadcast.  Headroom: the DECIMAL(38)/HUGEINT
    moments need ``n² · max|v_micro|² < 10^38`` — fine to ~10^9 rows at
    micro quantization; quantize coarser (or CUPED a uniform sample)
    beyond that."""
    from ..partitioning import spread

    q = lambda c: F.floor(  # noqa: E731
        F.col(c).cast("double") * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    base = spread(df).select(
        F.col(variant_col).alias("__var"),
        q(metric_col).alias("__y"),
        q(covariate_col).alias("__x"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = base.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(dec("__x")).alias("__sx"),
        F.sum(dec("__y")).alias("__sy"),
        F.sum(dec("__x") * dec("__x")).alias("__sxx"),
        F.sum(dec("__x") * dec("__y")).alias("__sxy"),
    ).select(
        (
            (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
            .cast("double")
            / F.greatest(
                (
                    F.col("__n") * F.col("__sxx")
                    - F.col("__sx") * F.col("__sx")
                ).cast("double"),
                F.lit(1.0),
            )
        ).alias("__theta"),
        (F.col("__sx").cast("double") / F.col("__n").cast("double")).alias(
            "__mx"
        ),
    )
    adj = base.crossJoin(F.broadcast(mom)).select(
        "__var",
        "__y",
        F.floor(
            F.col("__y").cast("double")
            - F.col("__theta")
            * (F.col("__x").cast("double") - F.col("__mx"))
        ).cast("long").alias("__ya"),
        "__theta",
    )
    return adj.groupBy("__var").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(dec("__y")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__my"),
        (
            F.sum(dec("__ya")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__mya"),
        F.sum(dec("__y") * dec("__y")).alias("__syy"),
        F.sum(dec("__ya") * dec("__ya")).alias("__syaya"),
        F.sum(dec("__y")).alias("__sy2"),
        F.sum(dec("__ya")).alias("__sya2"),
        F.min("__theta").alias("__th"),
    ).select(
        F.col("__var").alias(variant_col),
        "n",
        F.floor(F.col("__my")).cast("long").alias("mean_micros"),
        F.floor(F.col("__mya")).cast("long").alias("mean_adj_micros"),
        # var = (n·Σv² − (Σv)²) / n² — exact integer numerators, one IEEE
        # division each; reduction floored to ppm, clamped at 0
        F.greatest(
            F.floor(
                (
                    F.lit(1.0)
                    - (
                        F.col("n").cast("decimal(38,0)") * F.col("__syaya")
                        - F.col("__sya2") * F.col("__sya2")
                    ).cast("double")
                    / F.greatest(
                        (
                            F.col("n").cast("decimal(38,0)") * F.col("__syy")
                            - F.col("__sy2") * F.col("__sy2")
                        ).cast("double"),
                        F.lit(1.0),
                    )
                )
                * F.lit(1e6)
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("var_reduction_ppm"),
        F.floor(F.col("__th") * F.lit(1e9)).cast("long").alias(
            "theta_nano"
        ),
    )
