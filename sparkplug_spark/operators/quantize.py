"""Scalar int8 embedding quantization with a reconstruction audit.

A 100 TB embedding store at float32 is 4 bytes/dim; symmetric int8
(the faiss ``SQ8`` / ScaNN baseline) cuts storage and scan bandwidth 4x
while keeping cosine/L2 ranking nearly intact — the standard first move
before the PQ tier (similarity.py E9b) when recall demands stay high.
This operator emits the codes AND the per-vector audit a pipeline gates
on (max reconstruction error, saturation count), engine-exact.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import int8_quant_pd
from ..partitioning import spread

__all__ = [
    "quantize_embeddings",
    "dim_truncation_audit",
    "embedding_isotropy",
]


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


def dim_truncation_audit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple = (64, 32, 16, 8),
    max_rows: int = 20000,
) -> DataFrame:
    """Matryoshka-style dimension-truncation audit: how much nearest-
    neighbor structure survives serving only the first ``d`` dims?  Per
    probe dim: (dims, n_vecs, n_top1_match, match_ppm) — the fraction of
    vectors whose top-1 neighbor under the truncated prefix equals their
    full-dim top-1.  The number that decides whether an MRL/truncation
    rollout is safe before anyone re-embeds a corpus.

    Exactness discipline: ranking runs on the INT8-quantized codes
    (:func:`quantize_embeddings`'s exact floor-half-up codes) by integer
    squared-L2 with ties broken on the smaller id — no float argmax
    anywhere, so the oracle reproduces every top-1 bit-for-bit (a raw
    float32 cosine argmax would flip on summation-order ulps exactly
    when two candidates nearly tie).  Quantized + truncated is also the
    realistic serving stack (SQ8 tier).

    Scale shape: the audit corpus is collected and broadcast (guarded
    by ``max_rows`` — run it on a deterministic sample of a big store,
    e.g. :func:`~.cleaning.sample_exact`), then each partition scores
    its probes against the broadcast matrix in one numpy pass —
    embarrassingly parallel O(n²d/tasks), the E8 brute-force shape."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    dims = tuple(int(d) for d in dims)
    if not dims or any(d < 1 for d in dims):
        raise ValueError("dims must be non-empty positive prefixes")
    full = max(dims)
    quant = quantize_embeddings(df, vec_col, id_col).select(
        F.col(id_col).alias("__id"), "codes"
    )
    rows = quant.toPandas()
    if len(rows) > max_rows:
        raise ValueError(
            f"{len(rows)} vectors exceeds max_rows={max_rows}: audit a "
            "deterministic sample (sample_exact) instead of the full store"
        )
    # id-type generic: ids stay in their source type (long, string, ...);
    # positions are looked up through a value->row dict, never via an
    # int64 cast (the r5 ADVICE crash on string/decimal id columns).
    # "smallest id" ties below sort by the column's natural order.
    id_type = df.schema[id_col].dataType
    ids_list = sorted(rows["__id"].tolist())
    if len(set(ids_list)) != len(ids_list):
        raise ValueError(f"id column {id_col!r} must be unique")
    row_of = {v: i for i, v in enumerate(ids_list)}
    src_ids = rows["__id"].tolist()
    perm = np.empty(len(src_ids), dtype=np.int64)
    for src_i, v in enumerate(src_ids):
        perm[row_of[v]] = src_i
    mat = np.stack(
        [np.asarray(c, np.int64) for c in rows["codes"]]
    )[perm]
    if mat.shape[1] < full:
        raise ValueError(
            f"max(dims)={full} exceeds vector dim {mat.shape[1]}"
        )
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((ids_list, mat))
    out_schema = T.StructType(
        [T.StructField("__id", id_type)]
        + [T.StructField(f"top1_{d}", id_type) for d in dims]
    )

    def _score(batches):
        b_ids_list, b_mat = bc.value
        b_ids = np.asarray(b_ids_list, dtype=object)
        pos = {v: i for i, v in enumerate(b_ids_list)}
        for pdf_in in batches:
            pid = pdf_in["__id"].tolist()
            out = {"__id": pid}
            probe_rows = np.array(
                [pos[v] for v in pid], dtype=np.int64
            )
            for d in dims:
                sub = b_mat[:, :d]
                p = sub[probe_rows]
                # (n_probe, n_corpus) exact integer squared L2
                d2 = (
                    (p * p).sum(1)[:, None]
                    - 2 * (p @ sub.T)
                    + (sub * sub).sum(1)[None, :]
                )
                d2[np.arange(len(pid)), probe_rows] = np.iinfo(np.int64).max
                # min dist, ties to the smallest id: ids are ascending,
                # so the first argmin along the row IS the smallest id
                out[f"top1_{d}"] = b_ids[np.argmin(d2, axis=1)]
            yield pd.DataFrame(out)

    top1 = quant.select("__id").mapInPandas(_score, out_schema)
    parts = []
    for d in dims:
        match = (F.col(f"top1_{d}") == F.col(f"top1_{full}")).cast("long")
        parts.append(
            top1.agg(
                F.lit(d).cast("long").alias("dims"),
                F.count(F.lit(1)).alias("n_vecs"),
                F.sum(match).alias("n_top1_match"),
            ).select(
                "dims",
                "n_vecs",
                "n_top1_match",
                F.expr("n_top1_match * 1000000L div n_vecs").alias(
                    "match_ppm"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def embedding_isotropy(
    df: DataFrame,
    vec_col: str = "embedding",
    quantize_sig: int = 9,
) -> DataFrame:
    """Embedding-matrix health report: the FULL covariance eigenvalue
    spectrum as exact integers — the isotropy/effective-rank audit run
    before an embedding store is trusted for retrieval (anisotropic
    spaces concentrate mass in a few directions and cosine separability
    collapses; Ethayarajh 2019, Mu & Viswanath 2018).

    One distributed moment pass (the :func:`~.similarity.pca_fit`
    machinery: per-partition Arrow partials of ``(n, Σx, Σxxᵀ)``), 9-
    significant-digit moment quantization so the driver ``eigh`` is
    engine-identical, then per component k (descending):
    ``eigen_micro`` (λ floored to micro units, clamped at 0 — eigh can
    return -1e-17 noise on a PSD matrix), ``explained_ppm`` and
    ``cum_ppm`` — both INTEGER floor divisions over the integer
    spectrum, so the whole report value-hashes.  Low tail eigenvalues ⇒
    wasted dimensions (truncation candidates — see
    :func:`dim_truncation_audit`); a dominant first component ⇒ a
    common-direction offset worth removing.

    Returns (component, eigen_micro, explained_ppm, cum_ppm), d rows.

    Scale shape: the data pass is one mapInPandas over the corpus with
    d²-sized partials; driver work is one d×d eigh — d is the embedding
    width, never the corpus."""
    from .similarity import pca_fit

    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or not row["d"]:
        raise ValueError("embedding_isotropy: empty vectors")
    d = row["d"]
    _mean, _comps, evals = pca_fit(
        df, vec_col, k=int(d), quantize_sig=quantize_sig
    )
    micros = [max(int(np.floor(float(v) * 1e6 + 0.5)), 0) for v in evals]
    total = max(sum(micros), 1)
    rows = []
    cum = 0
    for k, m in enumerate(micros):
        cum += m
        rows.append(
            (k, m, m * 1_000_000 // total, cum * 1_000_000 // total)
        )
    return df.sparkSession.createDataFrame(
        rows,
        "component long, eigen_micro long, explained_ppm long, cum_ppm long",
    )
