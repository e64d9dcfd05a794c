"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — exact brute-force top-k per query.  The query side
  is broadcast (queries ≪ corpus), so the corpus never shuffles for the
  join; norms are precomputed per row (narrow) and the per-pair work is a
  single unrolled dot product that whole-stage codegen compiles — the HOF
  (``aggregate``) fold is interpreted and ~100× slower on O(n·q) pairs.
- :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH buckets
  prune the corpus per query before exact scoring.

Hyperplanes are generated deterministically from md5 of (plane, dim) — no
RNG, so results are reproducible across runs and engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot_fixed, infer_dim, l2_norm_fixed

__all__ = ["cosine_topk", "cosine_topk_lsh"]


def _hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1,1]^dim from md5."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"plane-{p}-{d}".encode()).hexdigest()[:8], 16)
            row.append((h / float(0xFFFFFFFF)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _plane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign bits ('0'/'1' strings) of the dot products with each plane
    (unrolled element_at sums — codegen-friendly)."""
    sigs = []
    for plane in planes:
        terms = [
            F.element_at(vec, i + 1).cast("double") * F.lit(w)
            for i, w in enumerate(plane)
        ]
        d = terms[0]
        for t in terms[1:]:
            d = d + t
        sigs.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.array(*sigs)


def _cosine_from_parts(d: Column, norm_a: Column, norm_b: Column) -> Column:
    denom = norm_a * norm_b
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(d / denom)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine per query row.  Ties and float-noise are made
    deterministic by ranking on (rounded cosine desc, id asc)."""
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            l2_norm_fixed(F.col(vec_col), dim).alias("qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm_fixed(F.col(vec_col), dim).alias("cn"),
    )
    scored = q.crossJoin(c).select(
        "query_id",
        "neighbor_id",
        F.round(
            _cosine_from_parts(
                dot_fixed(F.col("qv"), F.col("cv"), dim), F.col("qn"), F.col("cn")
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def banded_signature_entries(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    out_vec: str,
    planes: list[list[float]],
    bands: int,
) -> DataFrame:
    """(id, vec, norm, band, bucket) rows — one per band per input row."""
    num_planes = len(planes)
    per = num_planes // bands
    dim = len(planes[0])
    sig = df.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias(out_vec),
        l2_norm_fixed(F.col(vec_col), dim).alias(f"{out_vec}_norm"),
        _plane_signature(F.col(vec_col), planes).alias("bits"),
    )
    return sig.select(
        out_id,
        out_vec,
        f"{out_vec}_norm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws(
                            "",
                            *[F.element_at("bits", i * per + j + 1) for j in range(per)],
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(out_id, out_vec, f"{out_vec}_norm", "bb.band", "bb.bucket")


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    num_planes: int = 16,
    bands: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing ≥1 LSH band
    bucket with the query, then exact cosine + rank among candidates.
    Same output schema as :func:`cosine_topk` (recall < 1 by design)."""
    assert num_planes % bands == 0
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    planes = _hyperplanes(num_planes, dim)

    qb = F.broadcast(
        banded_signature_entries(queries, query_id_col, vec_col, "query_id", "qv", planes, bands)
    )
    cb = banded_signature_entries(corpus, id_col, vec_col, "neighbor_id", "cv", planes, bands)
    cand = (
        qb.join(cb, ["band", "bucket"])
        .select("query_id", "qv", "qv_norm", "neighbor_id", "cv", "cv_norm")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            _cosine_from_parts(
                dot_fixed(F.col("qv"), F.col("cv"), dim),
                F.col("qv_norm"),
                F.col("cv_norm"),
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
