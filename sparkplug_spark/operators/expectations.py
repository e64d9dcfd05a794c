"""Declarative data-quality expectations over a DataFrame.

The batch-audit complement of the rules engine (reference scope:
``SparkPlug.validate`` checks RULES against a schema,
``SparkPlug.scala:67–86``; this checks DATA against declared invariants —
the step a pipeline runs before trusting an ingested snapshot).

Two surfaces:

- :func:`check_expectations` — ONE aggregation pass over the table
  producing a per-expectation violation report (count + pass flag).
  Every row-level check is a ``sum(CASE WHEN ...)`` inside the same
  hash aggregate, so the cost at 100 TB is a single scan with map-side
  partials regardless of how many expectations are declared.  ``unique``
  checks add a ``count distinct`` (expand); pass ``exact_unique=False``
  to use ``approx_count_distinct`` at scale.
- :func:`flag_violations` — row-level routing: appends an
  ``array<string>`` of failed expectation names per row (empty = clean),
  a narrow zero-shuffle projection for quarantine/split sinks.
  ``unique`` expectations are aggregate-level and not flaggable per row.

Null semantics (documented, engine-reproducible): ``not_null`` counts
nulls; ``in_set``/``in_range``/``matches`` skip nulls (compose with
``not_null`` when nulls are also invalid); ``expr`` declares a predicate
that must hold — a row violates when the predicate is false OR null;
``unique`` counts each extra occurrence of a non-null duplicated value
(``count(col) - count(distinct col)``).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Expectation", "check_expectations", "flag_violations"]

_KINDS = ("not_null", "unique", "in_set", "in_range", "matches", "expr")


@dataclass(frozen=True)
class Expectation:
    """One declared invariant.  ``kind`` picks the check; the matching
    parameter(s) must be set: ``in_set``→``values``, ``in_range``→
    ``lo``/``hi`` (either may be None for a one-sided bound), ``matches``
    →``pattern`` (RE2-compatible, unanchored search — anchor explicitly),
    ``expr``→``predicate`` (Spark SQL boolean expression)."""

    name: str
    kind: str
    column: str | None = None
    values: tuple = field(default=())
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    predicate: str | None = None

    def __post_init__(self) -> None:
        if self.kind not in _KINDS:
            raise ValueError(f"unknown expectation kind {self.kind!r}")
        if self.kind == "expr":
            if not self.predicate:
                raise ValueError(f"{self.name}: expr requires predicate")
        elif not self.column:
            raise ValueError(f"{self.name}: {self.kind} requires column")
        if self.kind == "in_set" and not self.values:
            raise ValueError(f"{self.name}: in_set requires values")
        if self.kind == "in_range" and self.lo is None and self.hi is None:
            raise ValueError(f"{self.name}: in_range requires lo and/or hi")
        if self.kind == "matches" and not self.pattern:
            raise ValueError(f"{self.name}: matches requires pattern")


def _violation(e: Expectation) -> Column:
    """Boolean column: this row violates ``e`` (row-level kinds only)."""
    c = F.col(e.column) if e.column else None
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "in_set":
        return c.isNotNull() & ~c.isin(list(e.values))
    if e.kind == "in_range":
        cond = F.lit(False)
        if e.lo is not None:
            cond = cond | (c < F.lit(e.lo))
        if e.hi is not None:
            cond = cond | (c > F.lit(e.hi))
        return c.isNotNull() & cond
    if e.kind == "matches":
        return c.isNotNull() & ~c.rlike(e.pattern)
    if e.kind == "expr":
        # violated when the predicate is false OR null (unknown != holds)
        return ~F.expr(e.predicate).eqNullSafe(F.lit(True))
    raise ValueError(f"{e.kind} has no row-level violation form")


def check_expectations(
    df: DataFrame,
    expectations: Sequence[Expectation],
    exact_unique: bool = True,
    unique_rsd: float = 0.02,
) -> DataFrame:
    """Violation report: one row per expectation with columns
    ``(expectation, col_name, kind, n_rows, n_violations, passed)``.

    One aggregation job; the report never touches the driver.  With
    ``exact_unique=False`` the ``unique`` checks use
    ``approx_count_distinct(col, unique_rsd)`` (no expand — the at-scale
    mode when the column cardinality is huge).  The HLL estimate makes
    ``unique`` violation counts approximate: a truly-unique column can
    report up to ~``unique_rsd * n_rows`` phantom violations, so in
    approx mode treat ``n_violations`` for unique checks as a magnitude
    signal, not a gate (or gate on ``n_violations > unique_rsd *
    n_rows``)."""
    expectations = list(expectations)
    if not expectations:
        raise ValueError("expectations must be non-empty")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError("expectation names must be unique")

    def nd(c):
        if exact_unique:
            return F.countDistinct(c)
        return F.approx_count_distinct(c, rsd=unique_rsd)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, e in enumerate(expectations):
        if e.kind == "unique":
            aggs.append(F.count(F.col(e.column)).alias(f"__c{i}"))
            aggs.append(nd(F.col(e.column)).alias(f"__d{i}"))
        else:
            aggs.append(
                F.sum(_violation(e).cast("long")).alias(f"__v{i}")
            )
    row = df.agg(*aggs)

    items = []
    for i, e in enumerate(expectations):
        if e.kind == "unique":
            # HLL may over-estimate distinct; clamp so approx mode never
            # reports negative violations
            v = F.greatest(F.col(f"__c{i}") - F.col(f"__d{i}"), F.lit(0))
        else:
            v = F.coalesce(F.col(f"__v{i}"), F.lit(0))
        items.append(
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.lit(e.column).cast("string").alias("col_name"),
                F.lit(e.kind).alias("kind"),
                F.col("__n").alias("n_rows"),
                v.cast("long").alias("n_violations"),
                (v == 0).alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*items)).alias("__e")).select("__e.*")


def flag_violations(
    df: DataFrame, expectations: Sequence[Expectation]
) -> DataFrame:
    """Append ``failed_expectations: array<string>`` listing the
    row-level expectations each row violates (empty array = clean row).
    Narrow projection, zero shuffle — feed quarantine routing
    (``F.size("failed_expectations") > 0``) or a split sink.  Raises on
    ``unique`` expectations (aggregate-level; use
    :func:`check_expectations`)."""
    expectations = list(expectations)
    for e in expectations:
        if e.kind == "unique":
            raise ValueError(
                f"{e.name}: unique is aggregate-level; flag_violations "
                "only supports row-level kinds"
            )
    flags = [
        F.when(_violation(e), F.lit(e.name)) for e in expectations
    ]
    return df.withColumn(
        "failed_expectations",
        F.filter(F.array(*flags), lambda x: x.isNotNull()),
    )
