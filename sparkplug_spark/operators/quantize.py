"""Scalar int8 embedding quantization with a reconstruction audit.

A 100 TB embedding store at float32 is 4 bytes/dim; symmetric int8
(the faiss ``SQ8`` / ScaNN baseline) cuts storage and scan bandwidth 4x
while keeping cosine/L2 ranking nearly intact — the standard first move
before the PQ tier (similarity.py E9b) when recall demands stay high.
This operator emits the codes AND the per-vector audit a pipeline gates
on (max reconstruction error, saturation count), engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import int8_quant_pd
from ..partitioning import spread

__all__ = ["quantize_embeddings"]


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``scale = max|v|/127``,
    half-up codes via exact ``floor(v/scale + 0.5)``, plus the
    reconstruction audit (``max_abs_err``, ``n_saturated``).  Returns
    (id_col, n_dims, scale, max_abs_err, n_saturated, codes).

    Engine-exact by construction: scale and errors are single IEEE
    float64 ops on exactly-representable float32 inputs, codes use
    ``floor`` (never ``round`` — half-even vs half-up differs between
    engines), and max/count aggregates are order-free.

    Scale shape: one narrow Arrow projection, zero shuffle; codes are
    4 bytes/dim here only because the audit rides along — persist them
    with ``write_sorted`` and the store is int8 on disk."""
    q = F.col("__q")
    return (
        spread(df)
        .withColumn("__q", int8_quant_pd(F.col(vec_col)))
        .select(
            F.col(id_col),
            q["n_dims"].alias("n_dims"),
            q["scale"].alias("scale"),
            q["max_abs_err"].alias("max_abs_err"),
            q["n_saturated"].alias("n_saturated"),
            q["codes"].alias("codes"),
        )
    )
