"""Privacy risk audits: k-anonymity and l-diversity over quasi-identifiers.

The governance sibling of ``cleaning.scrub_pii``: scrubbing removes
direct identifiers, but a release is still re-identifiable when a
quasi-identifier combination (zip + birth year + segment…) isolates
fewer than ``k`` rows (Sweeney, 2002), or when a small group shares one
sensitive value (l-diversity, Machanavajjhala et al., 2007).  This
report is the pre-release gate: every risky group, with its size and
sensitive-value diversity, as exact integers.

Scale plan: one map-side-combined groupBy on the quasi-identifier tuple;
the optional distinct-sensitive count rides the same aggregate as an
exact ``count(DISTINCT)`` (one extra shuffle Spark plans as a partial
distinct).  Output is bounded by the number of RISKY groups — release it
to a dashboard, not the raw table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread

__all__ = [
    "k_anonymity_report",
    "pseudonymize",
    "suppress_small_cells",
    "dp_release_counts",
    "discrete_laplace_cutoffs",
]


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    sensitive_col: str | None = None,
    min_l: int | None = None,
) -> DataFrame:
    """Groups that violate k-anonymity (size < ``k``) and, when
    ``sensitive_col`` is given, l-diversity (distinct sensitive values <
    ``min_l``; defaults to ``min_l = 2``).

    Output, one row per violating quasi-identifier group:

    - the quasi-identifier columns themselves
    - ``group_size`` BIGINT
    - ``k_violation`` BOOLEAN — ``group_size < k``
    - with ``sensitive_col``: ``n_sensitive`` BIGINT (exact distinct)
      and ``l_violation`` BOOLEAN

    NULL quasi-identifier values form their own group (SQL GROUP BY
    semantics — NULLs group together), which is exactly what a privacy
    audit wants: "unknown zip" is itself a bucket an attacker can match.

    A compliant table returns an EMPTY frame — the natural expectation
    gate (`expectations.check_expectations` on the output row count)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    want_l = min_l if min_l is not None else 2
    if sensitive_col is not None and want_l < 1:
        raise ValueError("min_l must be >= 1")
    aggs = [F.count(F.lit(1)).cast("long").alias("group_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col))
            .cast("long")
            .alias("n_sensitive")
        )
    grouped = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out = grouped.withColumn("k_violation", F.col("group_size") < k)
    if sensitive_col is not None:
        out = out.withColumn("l_violation", F.col("n_sensitive") < want_l)
        return out.filter(F.col("k_violation") | F.col("l_violation"))
    return out.filter(F.col("k_violation"))


def pseudonymize(
    df: DataFrame,
    cols: Sequence[str],
    salt: str = "",
    namespaces: dict[str, str] | None = None,
) -> DataFrame:
    """Deterministic pseudonymization: replace identifier columns with
    stable md5-derived surrogate tokens (16 hex chars) — the
    privacy-pipeline step between :func:`~.cleaning.scrub_pii` (free
    text) and :func:`k_anonymity_report` (release audit).  Deterministic
    on purpose: the same value always maps to the same token, so joins,
    groupBys, and dedup over pseudonymized keys still work; rotating
    ``salt`` rotates the whole mapping (re-identification requires the
    salt, which never leaves the pipeline).

    Each column hashes under its own namespace (default: the column
    name), so the same raw value in different columns yields DIFFERENT
    tokens — cross-column correlation attacks see nothing.  To keep a
    join key consistent ACROSS tables, pass the same logical namespace
    for both sides (e.g. ``namespaces={"c_custkey": "custkey",
    "o_custkey": "custkey"}``).  NULL stays NULL.

    Scale shape: a pure projection — md5 inside whole-stage codegen,
    zero shuffle, zero Python.
    """
    if not cols:
        raise ValueError("pseudonymize needs at least one column")
    ns = namespaces or {}
    out = df
    for c in cols:
        token = F.substring(
            F.md5(
                F.concat_ws(
                    "\x1f", F.lit(salt), F.lit(ns.get(c, c)), F.col(c).cast("string")
                )
            ),
            1,
            16,
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNotNull(), token)
        )
    return out


def suppress_small_cells(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int = 5,
    value_col: str | None = None,
    metrics: "Observation | None" = None,
) -> DataFrame:
    """Small-cell suppression for aggregate RELEASE: group, aggregate,
    and DROP every cell backed by fewer than ``k`` rows — the standard
    statistical-disclosure control (census/health-data practice) that
    ENFORCES what :func:`k_anonymity_report` audits.  A released cell
    with n < k lets an attacker with partial knowledge isolate
    individuals; suppressing it costs the consumer one sparse cell.

    Emits (group_cols…, n, sum_micros?) for surviving cells;
    ``sum_micros`` (exact once-quantized integer micros of
    ``value_col``) appears only when a value column is given.  Per the
    repo's no-silent-caps rule, pass a ``pyspark.sql.Observation`` as
    ``metrics`` to receive ``suppressed_cells`` and ``suppressed_rows``
    counts — fired as a DEDICATED noop query (the observe_dropped
    pattern: an observe node on the release side could be pruned
    exactly when everything was suppressed).

    Scale shape: one map-side-combinable groupBy; the suppression is a
    post-aggregate filter over cells, never a second pass over rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    if value_col is not None:
        aggs.append(
            F.sum(
                F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("sum_micros")
        )
    cells = spread(df).groupBy(*group_cols).agg(*aggs)
    if metrics is not None:
        from ..metrics import observe_dropped

        observe_dropped(
            cells.filter(F.col("n") < k),
            metrics,
            suppressed_cells=F.count(F.lit(1)),
            suppressed_rows=F.sum("n"),
        )
    return cells.filter(F.col("n") >= k)


def discrete_laplace_cutoffs(
    epsilon: float, sensitivity: int = 1, z_max: int | None = None
) -> tuple[list[int], int]:
    """Integer inverse-CDF table for the discrete (two-sided geometric)
    Laplace mechanism at scale ``t = epsilon / sensitivity``:
    ``P(Z = z) ∝ exp(-|z| t)``, truncated to ``[-z_max, z_max]`` with
    ``z_max`` sized so the clipped tail mass is < 2^-50 (truncation is
    the standard bounded-noise variant; its effect on the privacy
    accounting is negligible at that mass and documented here rather
    than hidden).  Returns (cutoffs, z_max): ``cutoffs[k]`` is
    ``floor(CDF(k - z_max) * 2^60)`` with the last entry pinned to
    2^60, so a uniform 60-bit integer ``u`` maps to the noise value
    ``z = first k with u < cutoffs[k]  minus  z_max``.

    The cutoffs are computed ONCE here (driver-side floats) and then
    embedded as INTEGER literals in both engines' expressions — the
    mechanism itself runs with zero libm at query time, so releases are
    bit-identical across engines, runs and partitionings (the md5-coin
    discipline of the samplers applied to DP noise)."""
    import math

    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    if sensitivity < 1:
        raise ValueError("sensitivity must be >= 1")
    t = float(epsilon) / float(sensitivity)
    p = math.exp(-t)
    if z_max is None:
        z_max = min(int(math.ceil(35.0 / t)) + 1, 4000)
    # pmf over z in [-z_max, z_max], renormalized after truncation
    weights = [p ** abs(z) for z in range(-z_max, z_max + 1)]
    total = sum(weights)
    cum = 0.0
    cutoffs: list[int] = []
    for w in weights:
        cum += w / total
        cutoffs.append(min(int(math.floor(cum * (1 << 60))), 1 << 60))
    cutoffs[-1] = 1 << 60
    return cutoffs, z_max


def dp_release_counts(
    df: DataFrame,
    by: Sequence[str],
    epsilon: float = 1.0,
    sensitivity: int = 1,
    seed: int = 42,
    count_col: str = "released_count",
) -> DataFrame:
    """Differentially-private group-count release — the release-side
    counterpart of :func:`suppress_small_cells` (which withholds; this
    perturbs and publishes): per group, the true count plus
    seeded discrete-Laplace noise at scale ``epsilon/sensitivity``
    (sensitivity 1 for counting queries where one individual
    contributes one row; pass the true per-individual row bound
    otherwise).

    The noise coin is ``md5(seed, group key)`` — deterministic, so the
    same release is REPRODUCIBLE (re-running never spends extra privacy
    budget on fresh noise, the practical reason deployed DP systems pin
    noise to a release seed) and engine-exact: the inverse CDF is an
    integer cutoff table (:func:`discrete_laplace_cutoffs`) searched
    with per-element comparisons inside whole-stage codegen — no libm,
    no RNG state.  Releases may be negative (unbiasedness is kept;
    clamp downstream if the consumer needs ≥ 0).

    Returns (by..., released_count).  The TRUE counts never leave the
    aggregate.

    Scale shape: one map-side-combined groupBy; the noise expression is
    a ~2·z_max-element literal array probe per GROUP row (not per input
    row)."""
    by = list(by)
    if not by:
        raise ValueError("by must be non-empty")
    from ..functions.text import hash60

    cutoffs, z_max = discrete_laplace_cutoffs(epsilon, sensitivity)
    groups = spread(df).groupBy(*[F.col(c) for c in by]).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    key = F.concat_ws(
        "\x1f",
        F.lit(str(int(seed))),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in by
        ],
    )
    cut_arr = F.array(*[F.lit(int(c)).cast("long") for c in cutoffs])
    # materialize the md5 coin once per group row (a lambda-bound hash60
    # would re-evaluate md5 per cutoff element — the HOF hazard)
    groups = groups.withColumn("__u", hash60(key))
    z = (
        F.array_position(
            F.transform(cut_arr, lambda c: F.col("__u") < c), F.lit(True)
        ).cast("long")
        - F.lit(1 + z_max)
    )
    return groups.select(
        *by, (F.col("__n") + z).cast("long").alias(count_col)
    )
