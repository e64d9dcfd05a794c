"""Skyline (Pareto-front) query: the multi-criteria shortlist operator.

Börzsönyi, Kossmann & Stocker (ICDE 2001) define the skyline of a
relation as the rows not DOMINATED by any other row — ``a`` dominates
``b`` when ``a`` is at-least-as-good on every criterion and strictly
better on at least one.  It's the "show me the defensible candidates"
query (cheapest-and-largest parts, highest-volume-and-best-discount
suppliers) that no single ORDER BY can express, and the reference
engine's delegated SQL surface has no operator for it (SURVEY §2.3).

Distributed shape (the textbook two-phase algorithm): the skyline of a
union is contained in the union of the skylines, so phase 1 prunes each
partition independently (narrow, Arrow-batched) and phase 2 re-prunes
the surviving candidates in one task.  Random-order data keeps local
skylines tiny (expected ``O(log^{d-1} n)`` points), so the one shuffle
moves a sliver; adversarially-correlated data degrades gracefully — the
phase-2 task sees at most the sum of local skyline sizes (documented
cap: none — the skyline IS the answer, dropping rows would be wrong).

Dominance decisions are numeric comparisons only (no arithmetic), so
results are engine-exact for every numeric type; the kernel compares in
float64 (integers beyond 2^53 would need a widened kernel).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread

__all__ = ["skyline"]


def _prune_kernel(dims: list[str], signs: list[float]):
    import numpy as np
    import pandas as pd

    def fn(it):
        chunks = [pdf for pdf in it if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        # orient every dimension to smaller-is-better
        pts = np.column_stack(
            [
                pdf[c].to_numpy(dtype=np.float64) * s
                for c, s in zip(dims, signs)
            ]
        )
        # ascending lexicographic order: a later point is lex->= every
        # earlier KEPT point, so it can never dominate one (it is > on
        # the first differing dim) -- a single forward pass suffices
        order = np.lexsort(tuple(pts[:, i] for i in reversed(range(len(dims)))))
        keep: list[int] = []
        kept = np.empty((0, len(dims)), dtype=np.float64)
        for i in order:
            p = pts[i]
            if kept.shape[0]:
                dom = (kept <= p).all(axis=1) & (kept < p).any(axis=1)
                if dom.any():
                    continue
            keep.append(i)
            kept = np.vstack([kept, p[None, :]])
        yield pdf.iloc[sorted(keep)]

    return fn


def skyline(
    df: DataFrame,
    minimize: Sequence[str] = (),
    maximize: Sequence[str] = (),
) -> DataFrame:
    """Rows of ``df`` not dominated on the given criteria; all input
    columns pass through.  Ties (identical criterion tuples) all
    survive — neither dominates the other.  Rows with a NULL in any
    criterion are excluded (incomparable).

    Plan: null-filter → per-partition prune (``mapInPandas``, narrow) →
    shuffle the small candidate set to one task → final prune.  Exact:
    phase 2 sees every candidate, and local pruning can never discard a
    global skyline point (dominance is transitive across partitions)."""
    dims = [*minimize, *maximize]
    if not dims:
        raise ValueError("need at least one minimize/maximize column")
    if len(set(dims)) != len(dims):
        raise ValueError("a column may appear in only one direction")
    signs = [1.0] * len(minimize) + [-1.0] * len(maximize)
    fn = _prune_kernel(dims, signs)
    clean = spread(df).filter(
        F.expr(" AND ".join(f"`{c}` IS NOT NULL" for c in dims))
    )
    local = clean.mapInPandas(fn, schema=df.schema)
    return local.repartition(1).mapInPandas(fn, schema=df.schema)
