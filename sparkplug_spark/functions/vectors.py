"""Vector column functions over ``array<float|double>`` embeddings.

Built on higher-order functions (``zip_with`` + ``aggregate``): JVM-side,
no UDF, no shuffle.  ``aggregate`` folds left-to-right, so results are
deterministic per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine_similarity",
    "dot_fixed",
    "l2_norm_fixed",
    "cosine_similarity_fixed",
    "infer_dim",
]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|); 0.0 when either norm is zero."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(d / denom)


# -- fixed-dimension (unrolled) variants -------------------------------------
# Higher-order functions (aggregate/zip_with) are interpreted per row, NOT
# whole-stage-codegen'd — on an O(n²) pair join they dominate runtime.  When
# the dimension is known, unrolled element_at sums compile into codegen and
# run ~50-100× faster.  Summation stays strictly left-to-right, so results
# are bit-identical to the fold versions (and to the DuckDB oracle).


def _sum_terms(terms: list[Column]) -> Column:
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    return _sum_terms(
        [
            F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
            for i in range(dim)
        ]
    )


def l2_norm_fixed(a: Column, dim: int) -> Column:
    return F.sqrt(
        _sum_terms(
            [
                F.element_at(a, i + 1).cast("double")
                * F.element_at(a, i + 1).cast("double")
                for i in range(dim)
            ]
        )
    )


def cosine_similarity_fixed(a: Column, b: Column, dim: int) -> Column:
    d = dot_fixed(a, b, dim)
    denom = l2_norm_fixed(a, dim) * l2_norm_fixed(b, dim)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(d / denom)


def infer_dim(df, vec_col: str) -> int:
    """Probe the array length (one tiny job on one row)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None:
        raise ValueError(f"cannot infer dimension of {vec_col!r} (empty input)")
    return row["d"]
