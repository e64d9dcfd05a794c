"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — exact brute-force top-k per query: broadcast the
  (small) query side so the corpus never shuffles for the join; score pairs
  with an Arrow-batched numpy dot (:func:`~..functions.vectors.vec_dot`).
- :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH buckets
  prune the corpus per query before exact scoring.
- :func:`blocked_cosine_pairs` — exact all-pairs cosine ≥ threshold via
  block-matrix GEMM: replicate each row across its block-pair groups, one
  float64 matmul per group.  O(n²·d) FLOPs at BLAS speed instead of per-row
  tuple interpretation; the shuffle moves n·B vector rows, not n² pairs.

Hyperplanes are generated deterministically from md5 of (plane, dim) — no
RNG, so results are reproducible across runs and engines.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import band_buckets, vec_dot, vec_norm
from ..partitioning import spread

__all__ = [
    "sparse_topk_neighbors",
    "cosine_topk",
    "cosine_topk_lsh",
    "cosine_topk_ivf",
    "cosine_topk_pq",
    "build_ivf_index",
    "search_ivf_index",
    "append_to_ivf_index",
    "build_ivfpq_index",
    "search_ivfpq_index",
    "append_to_ivfpq_index",
    "blocked_cosine_pairs",
    "mutual_knn_pairs",
    "embedding_norms",
    "cluster_profile",
    "semantic_dedup",
    "semantic_dedup_frozen",
    "semantic_dedup_against_frozen",
    "build_semantic_store",
    "semantic_dedup_against",
    "pca_fit",
    "pca_project",
]


def embedding_norms(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Per-vector sanity profile: (id, dim, l2_norm, is_unit, has_nan) —
    the pre-flight check before any similarity pass (un-normalized or NaN
    vectors silently poison cosine top-k).

    Narrow codegen'd projection, no shuffle.  The norm sums
    strictly left-to-right via the fixed-dimension unrolled kernel (dim
    probed once), so the value is bit-identical across engines; rounded to
    6dp for canonical-text stability."""
    from ..functions.vectors import infer_dim, l2_norm_fixed

    dim = infer_dim(df, vec_col)
    v = F.col(vec_col)
    # is_unit compares the ROUNDED norm (the emitted value), so both
    # engines test the exact same double — never the pre-round last ulp
    norm6 = F.round(l2_norm_fixed(v, dim), 6)
    return spread(df).select(
        F.col(id_col),
        F.size(v).alias("dim"),
        norm6.alias("l2_norm"),
        (F.abs(norm6 - F.lit(1.0)) < F.lit(1e-6)).alias("is_unit"),
        F.exists(v, lambda x: F.isnan(x.cast("double"))).alias("has_nan"),
    )


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


def _hyperplanes_int(num_planes: int, dim: int) -> list[list[int]]:
    """INTEGER twin of :func:`_hyperplanes` from the same md5 family:
    ``c = 2·h − 0xFFFFFFFF`` is the float coefficient scaled by exactly
    0xFFFFFFFF, so sign structure is preserved while every coefficient
    is an exact int64 a SQL twin can embed as a literal."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"plane-{p}-{d}".encode()).hexdigest()[:8], 16)
            row.append(2 * h - 0xFFFFFFFF)
        planes.append(row)
    return planes


def _cosine(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    denom = norm_a * norm_b
    return F.round(F.when(denom == 0.0, F.lit(0.0)).otherwise(dot / denom), 6)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine per query row.  Ties and float-noise are made
    deterministic by ranking on (rounded cosine desc, id asc)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            vec_norm(F.col(vec_col)).alias("qn"),
        )
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("cn"),
    )
    scored = q.crossJoin(c).select(
        "query_id",
        "neighbor_id",
        _cosine(vec_dot("qv", "cv"), F.col("qn"), F.col("cn")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
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
    planes: list[list[float]],
    bands: int,
) -> DataFrame:
    """(id, band, bucket) rows — one per band per input row.

    Deliberately narrow: candidate generation and the distinct on candidate
    pairs shuffle ONLY ids and bucket strings; vectors are joined back just
    for the final verify, so the wide embedding column never rides through
    the candidate shuffles."""
    sig = spread(df).select(
        F.col(id_col).alias(out_id),
        band_buckets(F.col(vec_col), planes, bands).alias("buckets"),
    )
    return sig.select(out_id, F.posexplode("buckets").alias("band", "bucket"))


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
        from ..functions.vectors import infer_dim

        dim = infer_dim(corpus, vec_col)
    planes = _hyperplanes(num_planes, dim)

    qb = F.broadcast(
        banded_signature_entries(queries, query_id_col, vec_col, "query_id", planes, bands)
    )
    cb = banded_signature_entries(corpus, id_col, vec_col, "neighbor_id", planes, bands)
    cand = qb.join(cb, ["band", "bucket"]).select("query_id", "neighbor_id").distinct()
    return _exact_rank_from_candidates(
        corpus, queries, cand, k, vec_col, id_col, query_id_col
    )


def _exact_rank_from_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    cand: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """Shared tail of the candidate-generation top-k tiers: exact cosine
    on (query_id, neighbor_id) candidate rows, deterministic
    (6dp-cosine desc, id asc) rank, top-k filter."""
    qv = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            vec_norm(F.col(vec_col)).alias("qn"),
        )
    )
    cv = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _cosine(vec_dot("qv", "cv"), F.col("qn"), F.col("cn")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def banded_signature_entries_int(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    planes_int: list[list[int]],
    bands: int,
    unit: int,
) -> DataFrame:
    """Integer twin of :func:`banded_signature_entries` — buckets from
    :func:`~..functions.vectors.int_band_buckets`, so a SQL engine
    replays the same (id, band, bucket) rows exactly."""
    from ..functions.vectors import int_band_buckets

    sig = spread(df).select(
        F.col(id_col).alias(out_id),
        int_band_buckets(F.col(vec_col), planes_int, bands, unit).alias(
            "buckets"
        ),
    )
    return sig.select(out_id, F.posexplode("buckets").alias("band", "bucket"))


def max_abs_component(df: DataFrame, vec_col: str) -> float:
    """max |component| over an embedding column — the int64 headroom
    preflight input for the frozen (integer-quantized) LSH tiers."""
    v = (
        df.agg(
            F.max(F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x))))
        ).first()[0]
        or 0.0
    )
    return float(v)


def check_frozen_headroom(max_abs: float, dim: int, quant_unit: int) -> None:
    """Fail loudly (with the max safe quant_unit) when the integer sign
    dot could exceed int64 — numpy and Spark both wrap silently."""
    import math

    max_vq = int(math.floor(max_abs * quant_unit)) + 1
    if dim * max_vq * 0xFFFFFFFF >= 2**63:
        safe = 2**63 // (dim * 0xFFFFFFFF * (int(math.ceil(max_abs)) + 1))
        raise ValueError(
            f"int64 headroom exceeded (max|component|={max_abs}); pass "
            f"quant_unit <= {safe}"
        )


def cosine_topk_lsh_frozen(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    num_planes: int = 16,
    bands: int = 4,
    quant_unit: int = 10**6,
    dim: int | None = None,
) -> DataFrame:
    """Value-hash-oracle tier of :func:`cosine_topk_lsh` (the E6b
    freezing discipline applied to the top-k path): sign buckets from
    floor-quantized INTEGER components × integer md5 plane coefficients,
    so the candidate set is exact arithmetic a SQL twin replays; the
    exact-cosine rank tail is shared with the float tier.  Recall
    differs from the float tier only where a sign bit sat within one
    quantization step of a hyperplane."""
    if num_planes % bands != 0:
        raise ValueError("num_planes must be a multiple of bands")
    if quant_unit < 1:
        raise ValueError("quant_unit must be >= 1")
    if dim is None:
        from ..functions.vectors import infer_dim

        dim = infer_dim(corpus, vec_col)
    check_frozen_headroom(
        max(
            max_abs_component(spread(corpus), vec_col),
            max_abs_component(queries, vec_col),
        ),
        dim,
        quant_unit,
    )
    planes = _hyperplanes_int(num_planes, dim)
    qb = F.broadcast(
        banded_signature_entries_int(
            queries, query_id_col, vec_col, "query_id", planes, bands,
            quant_unit,
        )
    )
    cb = banded_signature_entries_int(
        corpus, id_col, vec_col, "neighbor_id", planes, bands, quant_unit
    )
    cand = (
        qb.join(cb, ["band", "bucket"])
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_rank_from_candidates(
        corpus, queries, cand, k, vec_col, id_col, query_id_col
    )


def _query_side_schema(
    queries: DataFrame, query_id_col: str, vec_col: str, with_qi: bool = True
) -> str:
    """DDL for the collected-and-rebroadcast query side: preserves the
    caller's id and vector element types instead of hardcoding
    ``long``/``float`` (string doc ids and double vectors are valid)."""
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    vec_t = queries.schema[vec_col].dataType.simpleString()
    base = f"query_id {qid_t}, qv {vec_t}"
    return f"__qi int, {base}" if with_qi else base


def _spherical_lloyd(X: np.ndarray, k: int, seed: int, iters: int = 8) -> np.ndarray:
    """Driver-side spherical k-means (FAISS-style coarse quantizer
    training) on an already-bounded sample: rows L2-normalized, centers
    re-normalized each round.  Deterministic for a given (sample, seed)."""
    nrm = np.linalg.norm(X, axis=1)
    nrm[nrm == 0] = 1.0
    X = X / nrm[:, None]
    rng = np.random.RandomState(seed)
    centers = X[rng.choice(len(X), k, replace=False)]
    for _ in range(iters):
        lab = np.argmax(X @ centers.T, axis=1)
        for j in range(k):
            pts = X[lab == j]
            if len(pts):
                centers[j] = pts.mean(axis=0)
        cnorm = np.linalg.norm(centers, axis=1)
        cnorm[cnorm == 0] = 1.0
        centers = centers / cnorm[:, None]
    return centers


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 42,
    train_fraction: float | None = None,
    train_points_per_centroid: int = 128,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    over L2-normalized vectors partitions the corpus into ``num_centroids``
    lists; each query exactly re-ranks only its ``n_probe`` nearest lists.

    Scale path: corpus assignment is one narrow Arrow-batched pass; the
    probe join touches ``n_probe/num_centroids`` of the corpus per query.
    A coarse quantizer doesn't need the whole corpus: by default training
    reads only ``num_centroids * train_points_per_centroid`` rows via
    ``limit`` (short-circuits after the first partitions — NO full corpus
    scan or count happens before candidate generation); pass
    ``train_fraction`` to train on a uniform sample instead.  With
    ``n_probe == num_centroids`` the scan is exhaustive and results equal
    :func:`cosine_topk` exactly (tested); smaller ``n_probe`` trades
    recall for speed."""
    from ..functions.vectors import _mat

    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("cn"),
    )
    # training sample comes from the RAW corpus (before spread's
    # repartition — a limit above a shuffle would still run the full map
    # side); limit short-circuits after the first partitions.  The sample
    # is bounded (num_centroids * train_points_per_centroid rows ≈
    # megabytes), so the coarse quantizer trains DRIVER-SIDE with
    # spherical Lloyd — the FAISS-style shape — instead of ~10 JVM ML
    # jobs plus a Vector-UDT conversion of the corpus.
    raw = corpus.select(F.col(vec_col).alias("cv"))
    if train_fraction is None:
        train = raw.limit(max(num_centroids, 1) * train_points_per_centroid)
    else:
        train = raw.sample(train_fraction, seed=seed)
    X = np.array([r["cv"] for r in train.collect()], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("cosine_topk_ivf: empty corpus (no training rows)")
    # clamp k from the (bounded) training set, not a full-corpus count
    num_centroids = max(1, min(num_centroids, len(X)))
    n_probe = max(1, min(n_probe, num_centroids))
    centers = _spherical_lloyd(X, num_centroids, seed)
    C = centers.T  # (dim, num_centroids), unit columns

    def _centroid_scores(x: pd.Series) -> np.ndarray:
        m = _mat(x)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        return (m / n[:, None]) @ C

    @F.pandas_udf("int")
    def assign(x: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="int32")
        return pd.Series(np.argmax(_centroid_scores(x), axis=1).astype("int32"))

    probe = int(n_probe)

    @F.pandas_udf("array<int>")
    def probe_lists(x: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype=object)
        s = _centroid_scores(x)
        top = np.argsort(-s, axis=1)[:, :probe].astype("int32")
        return pd.Series(list(top))

    assigned = c.select("neighbor_id", "cv", "cn", assign("cv").alias("__cent"))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            vec_norm(F.col(vec_col)).alias("qn"),
            F.explode(probe_lists(F.col(vec_col))).alias("__cent"),
        )
    )
    scored = q.join(assigned, "__cent").select(
        "query_id",
        "neighbor_id",
        _cosine(vec_dot("qv", "cv"), F.col("qn"), F.col("cn")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def opq_rotation(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    quantize_sig: int | None = 9,
) -> np.ndarray:
    """Parametric OPQ rotation (Ge et al., CVPR 2013 — the eigenvalue-
    allocation variant): returns an orthonormal ``(dim, dim)`` matrix
    that PCA-decorrelates the corpus and then BALANCES variance across
    the ``m`` PQ subspaces, so no codebook is left quantizing all the
    energy while others quantize noise — the standard recall upgrade
    between SQ8 and IVF-PQ.

    The covariance comes from the same one-pass distributed moment
    collection as :func:`pca_fit`, with the same 9-significant-digit
    moment quantization, so any engine/run eigh-decomposes the IDENTICAL
    matrix and the rotation is frozen for a given dataset.  Allocation is
    greedy: eigenvectors in descending-eigenvalue order each go to the
    not-yet-full subspace with the smallest accumulated log-variance
    product (balancing ∏λ per subspace, the OPQ-P objective).  Rows of
    the result are ordered so subspace ``s`` reads rotated dims
    ``[s·dim/m, (s+1)·dim/m)``.  Rotation is applied WITHOUT mean
    centering — centering would change cosines; the mean only serves the
    covariance estimate."""
    from ..functions.vectors import infer_dim

    dim = infer_dim(df, vec_col)
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub = dim // m
    _, components, evar = pca_fit(
        df, vec_col=vec_col, k=dim, quantize_sig=quantize_sig
    )
    # greedy balanced allocation of eigen-directions to subspaces
    logs = np.log(np.maximum(np.asarray(evar, dtype=np.float64), 1e-12))
    load = [0.0] * m
    fill: list[list[int]] = [[] for _ in range(m)]
    for i in range(dim):  # eigenvalues already sorted descending
        open_subs = [s for s in range(m) if len(fill[s]) < dsub]
        tgt = min(open_subs, key=lambda s: (load[s], s))
        fill[tgt].append(i)
        load[tgt] += logs[i]
    perm = [i for s in range(m) for i in fill[s]]
    return np.asarray(components, dtype=np.float64)[perm]


def cosine_topk_opq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 42,
    train_points_per_code: int = 64,
    quantize_sig: int | None = 9,
) -> DataFrame:
    """OPQ top-k: :func:`cosine_topk_pq` behind the trained
    :func:`opq_rotation`.  Cosine is rotation-invariant, so the exact
    rerank stage is untouched — only code quality (and therefore recall
    at a fixed ``rerank``) improves on anisotropic corpora."""
    rot = opq_rotation(corpus, vec_col=vec_col, m=m, quantize_sig=quantize_sig)
    return cosine_topk_pq(
        corpus,
        queries,
        k=k,
        m=m,
        ks=ks,
        rerank=rerank,
        vec_col=vec_col,
        id_col=id_col,
        query_id_col=query_id_col,
        seed=seed,
        train_points_per_code=train_points_per_code,
        rotation=rot,
    )


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 42,
    train_points_per_code: int = 64,
    dim: int | None = None,
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """Product-quantization approximate top-k (Jégou et al., TPAMI 2011):
    the memory-compression ANN tier.

    The corpus is encoded once into ``m`` one-byte codes per vector
    (``ks`` centroids per subspace, trained driver-side on a bounded
    ``limit()`` sample of the NORMALIZED vectors).  Queries score the
    code table by ADC — per-query lookup tables ``T[s][j] = <q_s,
    c_{s,j}>`` so an approximate cosine is ``m`` table lookups instead of
    a ``dim``-float dot — then only the top ``rerank`` candidates per
    query are exactly re-ranked against their true vectors.

    Why it matters at 100 TB: a dim-64 float32 corpus is 256 bytes/vector;
    its PQ codes are ``m`` bytes (32× smaller at m=8).  The full-corpus
    traversal reads ONLY the code column, and the wide vector column is
    fetched for ``rerank`` rows per query.  Compose with
    :func:`cosine_topk_ivf` lists when FLOPs (not bandwidth) dominate.
    Same output schema as :func:`cosine_topk`; recall < 1 by design
    (recall gate in tests)."""
    if dim is None:
        from ..functions.vectors import infer_dim

        dim = infer_dim(corpus, vec_col)
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    if not 2 <= ks <= 256:
        raise ValueError("ks must be in [2, 256]")
    dsub = dim // m
    R = None
    if rotation is not None:
        R = np.asarray(rotation, dtype=np.float64)
        if R.shape != (dim, dim):
            raise ValueError(
                f"rotation must be ({dim}, {dim}), got {R.shape}"
            )

    raw = corpus.select(F.col(vec_col).alias("cv"))
    train = raw.limit(ks * train_points_per_code)
    X = np.array([r["cv"] for r in train.collect()], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("cosine_topk_pq: empty corpus (no training rows)")
    if R is not None:
        X = X @ R.T  # codebooks live in the rotated basis
    books = _train_pq_books(X, m, ks, seed)
    ks_eff = books.shape[1]
    from ..functions.vectors import _mat

    def _normalized(x: pd.Series) -> np.ndarray:
        mat = _mat(x).astype(np.float64, copy=False)
        if R is not None:
            mat = mat @ R.T  # orthonormal: norms (and cosines) unchanged
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        return mat / n[:, None]

    @F.pandas_udf("array<int>")
    def encode(x: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype=object)
        mat = _normalized(x)
        codes = np.empty((len(mat), m), dtype="int32")
        for s in range(m):
            Xs = mat[:, s * dsub : (s + 1) * dsub]
            # ||x-c||^2 = ||x||^2 - 2<x,c> + ||c||^2; argmin drops ||x||^2
            d2 = -2.0 * (Xs @ books[s].T) + (books[s] ** 2).sum(axis=1)
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    # query side is small by the same contract as cosine_topk's broadcast:
    # collect it once, ship the ADC tables inside the scoring kernel
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    if not qrows:
        raise ValueError("cosine_topk_pq: empty query set")
    qids = np.array([r["query_id"] for r in qrows])
    Q = np.array([r["qv"] for r in qrows], dtype=np.float64)
    if R is not None:
        Q = Q @ R.T  # ADC tables must live in the codebook basis
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    Qn = Q / qn[:, None]
    # tables: (n_queries, m, ks_eff) dot contributions
    T = np.stack(
        [Qn[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(m)],
        axis=1,
    )

    @F.pandas_udf("array<double>")
    def adc_scores(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=object)
        C = np.stack(codes.to_numpy()).astype("int64")  # (rows, m)
        # gather per-subspace contributions for every query at once
        scores = np.zeros((len(C), len(qids)), dtype=np.float64)
        for s in range(m):
            scores += T[:, s, :][:, C[:, s]].T  # (rows, n_queries)
        return pd.Series(list(scores))

    coded = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), encode(F.col(vec_col)).alias("__codes")
    )
    approx = coded.select(
        "neighbor_id", F.posexplode(adc_scores("__codes")).alias("__qi", "__approx")
    )
    wa = Window.partitionBy("__qi").orderBy(
        F.desc("__approx"), F.asc("neighbor_id")
    )
    cand = (
        approx.withColumn("__r", F.row_number().over(wa))
        .filter(F.col("__r") <= int(rerank))
        .select("__qi", "neighbor_id")
    )
    qdf = F.broadcast(
        queries.sparkSession.createDataFrame(
            [(int(i), r["query_id"], r["qv"]) for i, r in enumerate(qrows)],
            _query_side_schema(queries, query_id_col, vec_col),
        ).select("__qi", "query_id", "qv", vec_norm(F.col("qv")).alias("qn"))
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        vec_norm(F.col(vec_col)).alias("cn"),
    )
    scored = (
        cand.join(qdf, "__qi")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _cosine(vec_dot("qv", "cv"), F.col("qn"), F.col("cn")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _stored_centers(spark, path: str) -> np.ndarray:
    """Load a stored index's coarse centroids as a (k, dim) array."""
    crows = spark.read.parquet(f"{path}/centroids").collect()
    centers = np.zeros((len(crows), len(crows[0]["center"])))
    for r in crows:
        centers[r["centroid"]] = r["center"]
    return centers


def _stored_books(spark, path: str) -> np.ndarray:
    """Load a stored IVF+PQ index's codebooks as (m, ks, dsub)."""
    brows = spark.read.parquet(f"{path}/books").collect()
    m = 1 + max(r["subspace"] for r in brows)
    ks_eff = 1 + max(r["code"] for r in brows)
    dsub = len(brows[0]["center"])
    books = np.zeros((m, ks_eff, dsub))
    for r in brows:
        books[r["subspace"], r["code"]] = r["center"]
    return books


def _assign_udf(C: np.ndarray):
    """Arrow kernel assigning each vector to its argmax-cosine centroid
    (``C`` is centers TRANSPOSED, dim × k).  The ONE assignment kernel —
    build and append must agree bit-for-bit or appended vectors land in
    different lists than a fresh build would put them."""
    from ..functions.vectors import _mat

    @F.pandas_udf("int")
    def assign(x: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="int32")
        mat = _mat(x).astype(np.float64, copy=False)
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        return pd.Series(
            np.argmax((mat / n[:, None]) @ C, axis=1).astype("int32")
        )

    return assign


def _encode_udf(C: np.ndarray, books: np.ndarray):
    """Arrow kernel assigning + PQ-encoding vectors against frozen
    centers/codebooks — shared by build and append for the same
    bit-for-bit reason as :func:`_assign_udf`."""
    from ..functions.vectors import _mat

    m, _, dsub = books.shape

    @F.pandas_udf("struct<centroid: int, codes: array<int>>")
    def encode(x: pd.Series) -> pd.DataFrame:
        if len(x) == 0:
            return pd.DataFrame({"centroid": [], "codes": []})
        mat = _mat(x).astype(np.float64, copy=False)
        n = np.linalg.norm(mat, axis=1)
        n[n == 0] = 1.0
        mat = mat / n[:, None]
        cent = np.argmax(mat @ C, axis=1).astype("int32")
        codes = np.empty((len(mat), m), dtype="int32")
        for s in range(m):
            Xs = mat[:, s * dsub : (s + 1) * dsub]
            d2 = -2.0 * (Xs @ books[s].T) + (books[s] ** 2).sum(axis=1)
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.DataFrame({"centroid": cent, "codes": list(codes)})

    return encode


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    num_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_points_per_centroid: int = 128,
) -> None:
    """Persist an IVF index: ``{path}/centroids`` (tiny parquet of unit
    centers) + ``{path}/lists`` (the corpus partitioned BY centroid
    directory).  Train once, search many times —
    :func:`search_ivf_index` reads only the probed centroid directories
    (Hive partition pruning), so each search touches
    ``n_probe/num_centroids`` of the stored bytes without any runtime
    assignment pass.  The 100 TB serving shape: index build is one
    bounded-sample train + one narrow assign + one partitioned write."""
    from ..functions.vectors import _mat

    spark = corpus.sparkSession
    train = corpus.select(F.col(vec_col).alias("cv")).limit(
        max(num_centroids, 1) * train_points_per_centroid
    )
    X = np.array([r["cv"] for r in train.collect()], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("build_ivf_index: empty corpus")
    num_centroids = max(1, min(num_centroids, len(X)))
    centers = _spherical_lloyd(X, num_centroids, seed)
    C = centers.T

    spark.createDataFrame(
        [(i, [float(v) for v in centers[i]]) for i in range(num_centroids)],
        "centroid int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")

    assign = _assign_udf(C)
    (
        spread(corpus)
        .select(id_col, vec_col, assign(F.col(vec_col)).alias("centroid"))
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(f"{path}/lists")
    )


def search_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k cosine search against a stored :func:`build_ivf_index`.

    Centroids load driver-side (num_centroids × dim doubles); each query
    picks its ``n_probe`` nearest lists; the list scan filters on the
    PARTITION column, so only the probed ``centroid=`` directories are
    read.  Exact re-rank within the probed lists; same output schema as
    :func:`cosine_topk`."""
    centers = _stored_centers(spark, path)
    n_probe = max(1, min(n_probe, len(centers)))

    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    if not qrows:
        raise ValueError("search_ivf_index: empty query set")
    Q = np.array([r["qv"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    sims = (Q / qn[:, None]) @ centers.T
    probes = np.argsort(-sims, axis=1)[:, :n_probe]
    probe_pairs = [
        (r["query_id"], r["qv"], int(c))
        for r, row in zip(qrows, probes)
        for c in row
    ]
    probed_set = sorted({c for _, _, c in probe_pairs})

    qdf = F.broadcast(
        spark.createDataFrame(
            probe_pairs,
            _query_side_schema(queries, query_id_col, vec_col, with_qi=False)
            + ", centroid int",
        ).select(
            "query_id", "centroid", "qv", vec_norm(F.col("qv")).alias("qn")
        )
    )
    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("centroid").isin(probed_set)  # partition pruning
    )
    scored = qdf.join(
        lists.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            vec_norm(F.col(vec_col)).alias("cn"),
            "centroid",
        ),
        "centroid",
    ).select(
        "query_id",
        "neighbor_id",
        _cosine(vec_dot("qv", "cv"), F.col("qn"), F.col("cn")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def append_to_ivf_index(
    new_corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Absorb NEW vectors into a stored :func:`build_ivf_index` without
    retraining: assign each to its nearest EXISTING centroid and append
    to the partitioned lists.

    The incremental-ingestion shape the dedup family already has
    (E44/E48): rebuild-from-scratch on a 100 TB corpus re-reads
    everything to add a day's vectors; append touches only the new
    batch.  Centroids are frozen, so searches keep pruning the same
    ``centroid=`` directories and results for pre-existing vectors are
    byte-identical; recall for the new vectors matches a fresh build's
    assignment of them (same argmax-cosine kernel as the builder).
    Centroid drift under sustained append is the caller's retrain
    trigger — monitor with :func:`cluster_profile`."""
    spark = new_corpus.sparkSession
    assign = _assign_udf(_stored_centers(spark, path).T)
    (
        spread(new_corpus)
        .select(id_col, vec_col, assign(F.col(vec_col)).alias("centroid"))
        .write.mode("append")
        .partitionBy("centroid")
        .parquet(f"{path}/lists")
    )


def append_to_ivfpq_index(
    new_corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Absorb NEW vectors into a stored :func:`build_ivfpq_index`:
    assign to frozen coarse centroids, encode with the frozen PQ
    codebooks, append to the partitioned lists — same no-retrain
    contract as :func:`append_to_ivf_index`."""
    spark = new_corpus.sparkSession
    encode = _encode_udf(
        _stored_centers(spark, path).T, _stored_books(spark, path)
    )
    (
        spread(new_corpus)
        .select(id_col, vec_col, encode(F.col(vec_col)).alias("__e"))
        .select(id_col, vec_col, "__e.centroid", "__e.codes")
        .write.mode("append")
        .partitionBy("centroid")
        .parquet(f"{path}/lists")
    )


def _train_pq_books(X: np.ndarray, m: int, ks: int, seed: int) -> np.ndarray:
    """Per-subspace Lloyd codebooks on normalized sample rows:
    (m, ks_eff, dim/m)."""
    dim = X.shape[1]
    dsub = dim // m
    nrm = np.linalg.norm(X, axis=1)
    nrm[nrm == 0] = 1.0
    X = X / nrm[:, None]
    ks_eff = min(ks, len(X))
    rng = np.random.RandomState(seed)
    books = np.empty((m, ks_eff, dsub))
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        centers = Xs[rng.choice(len(Xs), ks_eff, replace=False)]
        for _ in range(8):
            d2 = ((Xs[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            lab = np.argmin(d2, axis=1)
            for j in range(ks_eff):
                pts = Xs[lab == j]
                if len(pts):
                    centers[j] = pts.mean(axis=0)
        books[s] = centers
    return books


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    num_centroids: int = 16,
    m: int = 8,
    ks: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_points_per_centroid: int = 128,
) -> None:
    """Persist a FAISS-style IVF+PQ index: coarse lists for partition
    pruning AND per-vector PQ codes for a bandwidth-light traversal.

    Layout: ``{path}/centroids`` (coarse centers), ``{path}/books``
    (PQ codebooks as (subspace, code, center) rows), ``{path}/lists``
    (id, codes, raw vector — PARTITIONED BY centroid).  A search reads
    the probed ``centroid=`` directories ONLY (partition pruning) and its
    ADC pass projects ONLY (id, codes) — parquet column pruning keeps the
    raw vector column on disk until the final ``rerank`` candidates fetch
    it.  Both prunings compound: ``n_probe/num_centroids`` of the rows ×
    ``m`` bytes of the columns."""
    from ..functions.vectors import _mat

    spark = corpus.sparkSession
    if not 1 <= m:
        raise ValueError("m must be positive")
    train = corpus.select(F.col(vec_col).alias("cv")).limit(
        max(num_centroids, 1) * train_points_per_centroid
    )
    X = np.array([r["cv"] for r in train.collect()], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("build_ivfpq_index: empty corpus")
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub = dim // m
    num_centroids = max(1, min(num_centroids, len(X)))
    centers = _spherical_lloyd(X, num_centroids, seed)
    C = centers.T
    books = _train_pq_books(X, m, ks, seed)

    spark.createDataFrame(
        [(i, [float(v) for v in centers[i]]) for i in range(num_centroids)],
        "centroid int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (s, j, [float(v) for v in books[s, j]])
            for s in range(m)
            for j in range(books.shape[1])
        ],
        "subspace int, code int, center array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/books")

    encode = _encode_udf(C, books)
    (
        spread(corpus)
        .select(id_col, vec_col, encode(F.col(vec_col)).alias("__e"))
        .select(id_col, vec_col, "__e.centroid", "__e.codes")
        .write.mode("overwrite")
        .partitionBy("centroid")
        .parquet(f"{path}/lists")
    )


def search_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k cosine search against a stored :func:`build_ivfpq_index`:
    probed-list scan (partition pruning) → ADC approximate scores over
    the code column only (column pruning) → per-query top-``rerank``
    map-side-limited window → exact re-rank fetching raw vectors for the
    survivors.  Same output schema as :func:`cosine_topk`."""
    centers = _stored_centers(spark, path)
    books = _stored_books(spark, path)
    m, _, dsub = books.shape
    n_probe = max(1, min(n_probe, len(centers)))

    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    if not qrows:
        raise ValueError("search_ivfpq_index: empty query set")
    Q = np.array([r["qv"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    Qn = Q / qn[:, None]
    probes = np.argsort(-(Qn @ centers.T), axis=1)[:, :n_probe]
    # ADC tables (n_queries, m, ks)
    T = np.stack(
        [Qn[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(m)],
        axis=1,
    )
    by_cent: dict[int, list[int]] = {}
    for qi, row in enumerate(probes):
        for c in row:
            by_cent.setdefault(int(c), []).append(qi)
    probed_set = sorted(by_cent)

    @F.pandas_udf("array<struct<qi: int, approx: double>>")
    def adc(codes: pd.Series, cent: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=object)
        Cd = np.stack(codes.to_numpy()).astype("int64")
        cvals = cent.to_numpy()
        out = np.empty(len(Cd), dtype=object)
        for i in range(len(Cd)):
            out[i] = []
        ar = np.arange(m)
        # vectorized per (probed centroid, probing query): one fancy-index
        # gather + row sum scores every corpus row of that list at once
        for c, qis in by_cent.items():
            idx = np.nonzero(cvals == c)[0]
            if idx.size == 0:
                continue
            sub = Cd[idx]
            for qi in qis:
                s = T[qi][ar[None, :], sub].sum(axis=1)
                for j, i in enumerate(idx):
                    out[i].append({"qi": qi, "approx": float(s[j])})
        return pd.Series(list(out))

    lists = spark.read.parquet(f"{path}/lists").filter(
        F.col("centroid").isin(probed_set)
    )
    approx = (
        lists.select(
            F.col(id_col).alias("neighbor_id"),
            adc("codes", "centroid").alias("__s"),
        )
        .select("neighbor_id", F.explode("__s").alias("e"))
        .select("neighbor_id", F.col("e.qi").alias("__qi"), F.col("e.approx").alias("__approx"))
    )
    wa = Window.partitionBy("__qi").orderBy(F.desc("__approx"), F.asc("neighbor_id"))
    cand = (
        approx.withColumn("__r", F.row_number().over(wa))
        .filter(F.col("__r") <= int(rerank))
        .select("__qi", "neighbor_id")
    )
    qdf = F.broadcast(
        spark.createDataFrame(
            [(int(i), r["query_id"], r["qv"]) for i, r in enumerate(qrows)],
            _query_side_schema(queries, query_id_col, vec_col),
        ).select("__qi", "query_id", "qv", vec_norm(F.col("qv")).alias("qn"))
    )
    # rerank candidates can only come from probed lists: keep the
    # partition filter here too, or this scan re-reads EVERY centroid
    # directory's wide vector column and defeats the index
    cv = (
        spark.read.parquet(f"{path}/lists")
        .filter(F.col("centroid").isin(probed_set))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            vec_norm(F.col(vec_col)).alias("cn"),
        )
    )
    scored = (
        cand.join(qdf, "__qi")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _cosine(vec_dot("qv", "cv"), F.col("qn"), F.col("cn")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def blocked_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    blocks: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold, as (id_a < id_b, cosine) rows.

    Block-matrix plan: hash rows into ``blocks`` blocks; replicate each row
    once per block-pair group it participates in (``blocks`` copies); one
    ``applyInPandas`` GEMM per (bi, bj) group scores the whole cross
    product.  Shuffle volume is n·B vector rows — the n² pair matrix only
    ever exists as a numpy temporary inside a task.  For a 100 TB corpus
    pick ``blocks`` so a block (~2n/B rows × dim floats) fits executor
    memory; locally it defaults to ~B(B+1)/2 ≈ 3× parallelism groups."""
    spark = df.sparkSession
    if blocks is None:
        blocks = max(2, math.isqrt(6 * spark.sparkContext.defaultParallelism))
    thr = float(threshold)

    entries = spread(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.hash(F.col(id_col)), F.lit(blocks)).cast("int").alias("blk"),
    )
    mates = entries.select(
        "id",
        "v",
        "blk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.least("blk", F.lit(o)).alias("bi"),
                        F.greatest("blk", F.lit(o)).alias("bj"),
                    )
                    for o in range(blocks)
                ]
            )
        ).alias("g"),
    ).select("id", "v", "blk", "g.bi", "g.bj")

    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
        }
    )

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
        ids = pdf["id"].to_numpy()
        if bi == bj:
            A, ia, B, ib = V, ids, V, ids
        else:
            ma = pdf["blk"].to_numpy() == bi
            if ma.all() or not ma.any():
                return empty
            A, ia, B, ib = V[ma], ids[ma], V[~ma], ids[~ma]
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        dot = A @ B.T
        denom = np.outer(na, nb)
        cos = np.round(np.divide(dot, denom, out=np.zeros_like(dot), where=denom != 0), 6)
        mask = cos >= thr
        if bi == bj:
            mask &= ia[:, None] < ib[None, :]
        r, c = np.nonzero(mask)
        if r.size == 0:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia[r], ib[c]),
                "id_b": np.maximum(ia[r], ib[c]),
                "cosine": cos[r, c],
            }
        )

    return mates.groupBy("bi", "bj").applyInPandas(
        score, "id_a long, id_b long, cosine double"
    )


def cluster_profile(
    df: DataFrame,
    num_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    train_points_per_centroid: int = 128,
    train_fraction: float | None = None,
) -> DataFrame:
    """Corpus topic-balance audit: every vector assigned to a spherical
    k-means cluster (the same bounded-sample driver-side quantizer the IVF
    tiers use), reported as one row per cluster —
    (cluster_id, n_vecs, share_ppm, mean_sim_ppm).

    ``share_ppm`` is the cluster's corpus share in floor'd parts-per-
    million; ``mean_sim_ppm`` the mean cosine of members to their center —
    low values flag a diffuse catch-all cluster, extreme shares flag a
    topic dominating the mix (the embedding-space analog of
    :func:`~.cleaning.mixture_report`'s source-label audit).

    Scale: training reads ``num_clusters · train_points_per_centroid``
    rows via ``limit`` (no full scan before assignment); assignment is one
    narrow Arrow pass; the aggregate is map-side combined on a key with at
    most ``num_clusters`` values.  Deterministic for a fixed (data order,
    seed) — but k-means-SEEDED, so the driver records a rows-only check
    (pytest pins the partition/determinism invariants instead)."""
    from ..functions.vectors import _mat

    if num_clusters < 1:
        raise ValueError(f"num_clusters must be >= 1, got {num_clusters}")
    raw = df.select(F.col(vec_col).alias("cv"))
    if train_fraction is None:
        train = raw.limit(num_clusters * train_points_per_centroid)
    else:
        train = raw.sample(train_fraction, seed=seed)
    X = np.array([r["cv"] for r in train.collect()], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("cluster_profile: empty corpus (no training rows)")
    num_clusters = max(1, min(num_clusters, len(X)))
    centers = _spherical_lloyd(X, num_clusters, seed)
    C = centers.T  # (dim, k), unit columns

    @F.pandas_udf("struct<cid: int, sim: double>")
    def assign(x: pd.Series) -> pd.DataFrame:
        if len(x) == 0:
            return pd.DataFrame({"cid": pd.Series([], dtype="int32"),
                                 "sim": pd.Series([], dtype="float64")})
        m = _mat(x)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        scores = (m / n[:, None]) @ C
        cid = np.argmax(scores, axis=1)
        return pd.DataFrame(
            {"cid": cid.astype("int32"), "sim": scores[np.arange(len(cid)), cid]}
        )

    assigned = spread(df).select(assign(F.col(vec_col)).alias("a"))
    counts = assigned.groupBy(F.col("a.cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("a.sim").alias("__sim_sum"),
    )
    totals = counts.agg(F.sum("n_vecs").cast("double").alias("__n"))
    return (
        counts.join(F.broadcast(totals))
        .select(
            "cluster_id",
            "n_vecs",
            F.floor(F.col("n_vecs").cast("double") / F.col("__n") * 1_000_000.0)
            .cast("long")
            .alias("share_ppm"),
            F.floor(F.col("__sim_sum") / F.col("n_vecs").cast("double") * 1_000_000.0)
            .cast("long")
            .alias("mean_sim_ppm"),
        )
        .orderBy("cluster_id")
    )


def cluster_profile_frozen(
    df: DataFrame,
    centers: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    center_id_col: str = "vec_id",
) -> DataFrame:
    """EXACT-tier topic-balance audit over FROZEN centroids — the
    oracle-checkable sibling of :func:`cluster_profile` (whose k-means
    seeding keeps it rows-only).  ``centers`` is any small DataFrame of
    (center_id, vector) rows — seeded medoids, a governance-pinned
    centroid release, or :func:`cluster_profile`'s trained centers
    persisted once — and every corpus vector is assigned to its
    highest-cosine center (ties to the smallest center id).

    Exactness discipline: cosines are the same 6-dp-rounded doubles the
    E8 exact top-k hash-matches on; per-member similarity quantizes to
    integer micros BEFORE summing (float sums are partition-order
    dependent; integer sums commute), and the report carries the SUM
    (``sum_sim_micros``) rather than a mean — an integer division of a
    possibly-negative sum would hit the truncate-vs-floor engine split
    (Spark div truncates toward zero, DuckDB // floors — they agree
    only for non-negative operands).  Output: (cluster_id, n_vecs, share_ppm,
    sum_sim_micros); centers with no members keep a zero row.

    Scale shape: centers broadcast; assignment is one narrow pass over
    |corpus| × |centers| dots with an argmax window partitioned per
    VECTOR (≤ |centers| rows each); the aggregate has ≤ |centers| keys."""
    c = F.broadcast(
        centers.select(
            F.col(center_id_col).alias("cluster_id"),
            F.col(vec_col).alias("cv"),
            vec_norm(F.col(vec_col)).alias("cn"),
        )
    )
    scored = (
        spread(df)
        .select(
            F.col(id_col).alias("__rid"),
            F.col(vec_col).alias("qv"),
            vec_norm(F.col(vec_col)).alias("qn"),
        )
        .crossJoin(c)
        .select(
            "__rid",
            "cluster_id",
            _cosine(vec_dot("qv", "cv"), F.col("qn"), F.col("cn")).alias(
                "__cos"
            ),
        )
    )
    w = Window.partitionBy("__rid").orderBy(
        F.desc("__cos"), F.asc("cluster_id")
    )
    members = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "cluster_id",
            F.floor(F.col("__cos") * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("__sim_micros"),
        )
    )
    counts = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("__sim_micros").cast("long").alias("__sim_sum"),
    )
    totals = counts.agg(
        F.greatest(F.sum("n_vecs"), F.lit(1)).alias("__n")
    )
    return (
        centers.select(F.col(center_id_col).alias("cluster_id"))
        .join(counts, "cluster_id", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "cluster_id",
            F.coalesce("n_vecs", F.lit(0)).cast("long").alias("n_vecs"),
            F.expr(
                "coalesce(n_vecs, 0L) * 1000000L div __n"
            ).alias("share_ppm"),
            F.coalesce(F.col("__sim_sum"), F.lit(0))
            .cast("long")
            .alias("sum_sim_micros"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    num_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_points_per_centroid: int = 128,
    train_fraction: float | None = None,
    _centers: "np.ndarray | None" = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023): assign
    every embedding to a spherical k-means cluster (the same bounded-
    sample driver-side quantizer the IVF tiers use), then WITHIN each
    cluster greedily drop vectors whose cosine to an already-kept vector
    is ``>= threshold``.  Near-duplicate *meaning* — paraphrases, template
    rewrites — that exact/MinHash text dedup can't see.

    Keep rule (deterministic): cluster members are visited in ascending
    ``id_col`` order; a member is kept iff its cosine against every
    EARLIER KEPT member stays below ``threshold`` (greedy prefix rule —
    the canonical maximal-independent-set order used by text-side
    ``dedup_exact``'s keep-smallest-id contract).

    Output: (id, cluster INT, kept BOOLEAN) — the full decision table, so
    callers can either ``filter(kept)`` or audit drop rates per cluster.

    Scale: clustering makes the O(n²) similarity test O(Σ n_c²); pick
    ``num_clusters ≈ corpus/10⁴`` so clusters stay ~10⁴ rows.  Per-cluster
    work runs in ``applyInPandas`` as incremental numpy GEMV against the
    kept prefix (O(n_c · kept · dim) flops, vectorized); only (id, vector)
    pairs shuffle, once, on the cluster key.  Cross-cluster near-dups are
    missed by construction — the recall/cost trade every IVF-family
    method makes.  K-means-seeded → rows-only for cross-engine checks;
    pytest pins the greedy contract against a dense NumPy twin."""
    from ..functions.vectors import _mat

    if not -1.0 <= threshold <= 1.0 + 1e-9:
        raise ValueError("threshold must be a cosine in [-1, 1]")
    if num_clusters < 1:
        raise ValueError(f"num_clusters must be >= 1, got {num_clusters}")
    if _centers is not None:
        # caller (build_semantic_store) already trained the quantizer;
        # re-training here would both double the cost and risk label/
        # centroid disagreement if the two samples ever differed
        centers = _centers
    else:
        raw = df.select(F.col(vec_col).alias("cv"))
        if train_fraction is None:
            train = raw.limit(num_clusters * train_points_per_centroid)
        else:
            train = raw.sample(train_fraction, seed=seed)
        X = np.array([r["cv"] for r in train.collect()], dtype=np.float64)
        if len(X) == 0:
            raise ValueError("semantic_dedup: empty corpus (no training rows)")
        num_clusters = max(1, min(num_clusters, len(X)))
        centers = _spherical_lloyd(X, num_clusters, seed)
    C = centers.T  # (dim, k), unit columns
    thr = float(threshold)

    @F.pandas_udf("int")
    def assign(x: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="int32")
        m = _mat(x)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        return pd.Series(np.argmax((m / n[:, None]) @ C, axis=1).astype("int32"))

    assigned = spread(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("cv"),
        assign(F.col(vec_col)).alias("cluster"),
    )
    id_field = df.schema[id_col].dataType.simpleString()

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        m = _mat(pdf["cv"])
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        m = m / n[:, None]
        kept_rows = np.zeros((len(pdf), m.shape[1]), dtype=np.float64)
        kept_flags = np.zeros(len(pdf), dtype=bool)
        k = 0
        for i in range(len(pdf)):
            if k == 0 or float(np.max(kept_rows[:k] @ m[i])) < thr:
                kept_rows[k] = m[i]
                kept_flags[i] = True
                k += 1
        return pd.DataFrame(
            {"id": pdf["id"], "cluster": pdf["cluster"], "kept": kept_flags}
        )

    return assigned.groupBy("cluster").applyInPandas(
        _prune, schema=f"id {id_field}, cluster int, kept boolean"
    )


def mutual_knn_pairs(
    df: DataFrame,
    k: int = 5,
    min_cosine: float = 0.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Reciprocal (mutual) k-nearest-neighbor pairs: (a, b) kept iff b
    is among a's top-k cosine neighbors AND a is among b's — the
    standard high-precision pair filter for dedup seeding, RNN-based
    clustering (first step of RNN-descent / FINCH), and
    label-transfer graphs, where one-sided kNN edges to hubs are mostly
    noise.

    Ranking happens among pairs with cosine ≥ ``min_cosine`` only (the
    floor is what keeps the pair volume bounded at scale — without it
    an exact kNN graph needs the full n² matrix).  Ties and float noise
    are deterministic: ranks order by (6dp cosine desc, neighbor id
    asc), the repo-wide similarity contract.

    Output: (id_a < id_b, cosine, rank_a, rank_b) — ``rank_a`` is b's
    rank in a's list.

    Plan: exact pair generation via :func:`blocked_cosine_pairs` (block
    GEMM — no broadcast of the corpus, n·B vector rows shuffle), one
    symmetric explosion (2 rows per pair), a per-node rank window over
    ≥-floor neighbors, and a self-join of the two directed k-lists on
    the (a, b) key — all narrow integer/double rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    pairs = blocked_cosine_pairs(
        df, vec_col=vec_col, id_col=id_col, threshold=float(min_cosine)
    )
    sym = pairs.select(
        F.col("id_a").alias("src"),
        F.col("id_b").alias("dst"),
        "cosine",
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("src"),
            F.col("id_a").alias("dst"),
            "cosine",
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    knn = (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )
    fwd = knn.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("id_a"),
        F.col("dst").alias("id_b"),
        "cosine",
        F.col("rank").alias("rank_a"),
    )
    rev = knn.filter(F.col("src") > F.col("dst")).select(
        F.col("dst").alias("id_a"),
        F.col("src").alias("id_b"),
        F.col("rank").alias("rank_b"),
    )
    return fwd.join(rev, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "cosine",
        F.col("rank_a").cast("long").alias("rank_a"),
        F.col("rank_b").cast("long").alias("rank_b"),
    )


def _assign_frozen(
    df: DataFrame,
    centers: DataFrame,
    vec_col: str,
    id_col: str,
    center_id_col: str,
) -> DataFrame:
    """Shared frozen-center assignment: every vector goes to its
    highest-6dp-cosine center, ties to the smallest center id — the
    relational pattern :func:`cluster_profile_frozen` established, kept
    identical here so all frozen tiers value-hash against the same SQL
    twin.  Returns (id, cluster_id, qv) — the vector rides along for
    the downstream greedy/screen pass."""
    c = F.broadcast(
        centers.select(
            F.col(center_id_col).alias("cluster_id"),
            F.col(vec_col).alias("cv"),
            vec_norm(F.col(vec_col)).alias("cn"),
        )
    )
    scored = (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("qv"),
            vec_norm(F.col(vec_col)).alias("qn"),
        )
        .crossJoin(c)
        .select(
            "id",
            "qv",
            "cluster_id",
            _cosine(vec_dot("qv", "cv"), F.col("qn"), F.col("cn")).alias(
                "__cos"
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("__cos"), F.asc("cluster_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("id", "cluster_id", "qv")
    )


def semantic_dedup_frozen(
    df: DataFrame,
    centers: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    center_id_col: str = "vec_id",
) -> DataFrame:
    """EXACT-tier SemDeDup over FROZEN centers — the oracle-checkable
    sibling of :func:`semantic_dedup`, following the
    :func:`cluster_profile_frozen` precedent: with the quantizer pinned
    (seeded medoids, a governance-pinned centroid release, or a trained
    quantizer persisted once), both the cluster assignment and the
    greedy prefix rule are deterministic functions of the data, so the
    whole decision table value-hashes against a recursive-CTE SQL twin.

    Assignment: highest 6dp-rounded cosine, ties to the smallest center
    id (identical to :func:`cluster_profile_frozen`).  Keep rule: within
    each cluster, members are visited in ascending ``id_col``; a member
    is kept iff its 6dp-rounded cosine against every EARLIER KEPT member
    stays below ``threshold`` — the same greedy prefix as
    :func:`semantic_dedup`, quantized so both engines compare the same
    number (raw BLAS-vs-sequential doubles differ by ~1e-15, enough to
    flip a threshold test; 6dp-rounded cosines are the repo's
    established cross-engine contract for similarity values).

    Output: (id, cluster_id, kept BOOLEAN).

    Scale shape: centers broadcast, one narrow assignment pass, one
    shuffle on the cluster key; per-cluster greedy runs as incremental
    numpy GEMV against the kept prefix — O(n_c · kept · dim), vectorized,
    exactly :func:`semantic_dedup`'s kernel with rounded comparisons."""
    from ..functions.vectors import _mat

    if not -1.0 <= threshold <= 1.0 + 1e-9:
        raise ValueError("threshold must be a cosine in [-1, 1]")
    assigned = _assign_frozen(df, centers, vec_col, id_col, center_id_col)
    id_field = df.schema[id_col].dataType.simpleString()
    cl_field = centers.schema[center_id_col].dataType.simpleString()
    thr = float(threshold)

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        m = _mat(pdf["qv"])
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        m = m / n[:, None]
        kept_rows = np.zeros((len(pdf), m.shape[1]), dtype=np.float64)
        kept_flags = np.zeros(len(pdf), dtype=bool)
        k = 0
        for i in range(len(pdf)):
            if k == 0 or float(
                np.max(np.round(kept_rows[:k] @ m[i], 6))
            ) < thr:
                kept_rows[k] = m[i]
                kept_flags[i] = True
                k += 1
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cluster_id": pdf["cluster_id"],
                "kept": kept_flags,
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(
        _prune, schema=f"id {id_field}, cluster_id {cl_field}, kept boolean"
    )


def semantic_dedup_against_frozen(
    batch: DataFrame,
    centers: DataFrame,
    kept: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    center_id_col: str = "vec_id",
) -> DataFrame:
    """EXACT-tier incremental semantic screen over a FROZEN store — the
    oracle-checkable sibling of :func:`semantic_dedup_against`: with the
    centers pinned and the representative set ``kept`` given as data
    ((cluster_id, id, vec) rows, e.g. ``semantic_dedup_frozen(...)``'s
    keepers joined back to their vectors), every batch vector is
    assigned to its frozen cluster and flagged when its 6dp-rounded
    cosine to ANY same-cluster representative reaches ``threshold``.
    ``near_dup_of`` is the matching representative with the highest
    rounded cosine, ties to the smallest rep id; NULL when clean.

    Fully relational — broadcast centers, one cluster-key join against
    the store, a per-batch-row argmax window — so the whole output
    value-hashes; no kernel, no RNG, no training.

    Scale shape: the steady-state ingestion cost is |batch| × (reps in
    the batch rows' clusters) rounded-cosine evaluations — corpus-size-
    independent, the same contract as ``dedup_exact_against`` /
    ``minhash_lsh_join``."""
    if not -1.0 <= threshold <= 1.0 + 1e-9:
        raise ValueError("threshold must be a cosine in [-1, 1]")
    assigned = _assign_frozen(batch, centers, vec_col, id_col, center_id_col)
    reps = kept.select(
        F.col("cluster_id"),
        F.col("id").alias("__rep_id"),
        F.col("vec").alias("__rep_vec"),
        vec_norm(F.col("vec")).alias("__rep_norm"),
    )
    scored = (
        assigned.withColumn("__qn", vec_norm(F.col("qv")))
        .join(reps, "cluster_id", "left")
        .select(
            "id",
            "cluster_id",
            "__rep_id",
            F.when(
                F.col("__rep_id").isNotNull(),
                _cosine(
                    vec_dot("qv", "__rep_vec"),
                    F.col("__qn"),
                    F.col("__rep_norm"),
                ),
            ).alias("__cos"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.desc_nulls_last("__cos"), F.asc_nulls_last("__rep_id")
    )
    thr = float(threshold)
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            "id",
            "cluster_id",
            F.coalesce(F.col("__cos") >= F.lit(thr), F.lit(False)).alias(
                "is_near_dup"
            ),
            F.when(
                F.col("__cos") >= F.lit(thr), F.col("__rep_id")
            ).alias("near_dup_of"),
        )
    )


def build_semantic_store(
    df: DataFrame,
    threshold: float = 0.95,
    num_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_points_per_centroid: int = 128,
) -> tuple[DataFrame, DataFrame]:
    """Day-0 artifacts for INCREMENTAL semantic dedup: returns
    ``(centroids, kept)`` where ``centroids`` is (cluster INT, centroid
    ARRAY<DOUBLE>) — the trained quantizer, num_clusters rows — and
    ``kept`` is (cluster, id, vec) for the corpus representatives that
    survived :func:`semantic_dedup` under the same threshold.  Write both
    (partition ``kept`` by cluster); later batches screen against them
    via :func:`semantic_dedup_against` without re-reading corpus
    vectors."""
    raw = df.select(F.col(vec_col).alias("cv"))
    train = raw.limit(max(num_clusters, 1) * train_points_per_centroid)
    X = np.array([r["cv"] for r in train.collect()], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("build_semantic_store: empty corpus")
    num_clusters = max(1, min(num_clusters, len(X)))
    centers = _spherical_lloyd(X, num_clusters, seed)
    spark = df.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(v) for v in centers[i]]) for i in range(num_clusters)],
        "cluster int, centroid array<double>",
    )
    decisions = semantic_dedup(
        df,
        threshold=threshold,
        num_clusters=num_clusters,
        vec_col=vec_col,
        id_col=id_col,
        seed=seed,
        train_points_per_centroid=train_points_per_centroid,
        _centers=centers,  # single training: labels match stored geometry
    )
    kept = (
        decisions.filter(F.col("kept"))
        .select("id", "cluster")
        .join(
            df.select(
                F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
            ),
            "id",
        )
        .select("cluster", "id", "vec")
    )
    return centroids, kept


def _centroid_matrix(centroids: DataFrame):
    """Collect a stored centroid table into the (dim×k matrix, cluster-id
    vector) pair the Arrow assignment pass closes over.  Hoist this when
    screening MANY batches against one store (the streaming tier does) —
    the collect and matrix build then happen once, not per micro-batch."""
    crows = sorted(
        ((r["cluster"], r["centroid"]) for r in centroids.collect()),
        key=lambda t: t[0],
    )
    if not crows:
        raise ValueError("semantic_dedup_against: empty centroid table")
    C = np.array([c for _, c in crows], dtype=np.float64).T
    cluster_ids = np.array([i for i, _ in crows], dtype=np.int32)
    return C, cluster_ids


def semantic_dedup_against(
    batch: DataFrame,
    centroids: DataFrame,
    kept: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    _prepared=None,
) -> DataFrame:
    """Screen a NEW batch against a stored semantic-dedup state (the
    semantic tier of the incremental-ingestion family, alongside
    ``dedup_exact_against`` and ``minhash_lsh_join``): each batch vector
    is assigned to its stored cluster and flagged when its cosine to ANY
    stored representative of that cluster reaches ``threshold``.

    Output: (id, cluster INT, is_near_dup BOOLEAN, near_dup_of) —
    ``near_dup_of`` is the matching stored id with the HIGHEST cosine
    (ties break on smallest id; NULL when not a near-dup).

    Determinism note: the comparison set is the STORE (fixed), so unlike
    the batch operator no greedy order is involved — each batch row is
    judged independently; batch rows are NOT compared to each other
    (run :func:`semantic_dedup` on the deduped union when intra-batch
    dups matter).

    Plan: centroids collect driver-side (num_clusters rows) for the
    Arrow assignment pass; the screen is one cluster-key join feeding a
    per-cluster ``applyInPandas`` GEMM of batch rows × stored reps —
    only same-cluster pairs are ever scored."""
    from ..functions.vectors import _mat

    C, cluster_ids = (
        _prepared if _prepared is not None else _centroid_matrix(centroids)
    )
    thr = float(threshold)

    @F.pandas_udf("int")
    def assign(x: pd.Series) -> pd.Series:
        if len(x) == 0:
            return pd.Series([], dtype="int32")
        m = _mat(x)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        return pd.Series(cluster_ids[np.argmax((m / n[:, None]) @ C, axis=1)])

    b = spread(batch).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("cv"),
        assign(F.col(vec_col)).alias("cluster"),
    )
    reps = kept.select(
        "cluster",
        F.col("id").alias("__rep_id"),
        F.col("vec").alias("__rep_vec"),
        F.lit(False).alias("__is_batch"),
    )
    both = b.select(
        "cluster",
        F.col("id").alias("__rep_id"),
        F.col("cv").alias("__rep_vec"),
        F.lit(True).alias("__is_batch"),
    ).unionByName(reps)
    id_field = batch.schema[id_col].dataType.simpleString()

    def _screen(pdf: pd.DataFrame) -> pd.DataFrame:
        bat = pdf[pdf["__is_batch"]]
        rep = pdf[~pdf["__is_batch"]]
        if len(bat) == 0:
            return pd.DataFrame(
                {"id": [], "cluster": [], "is_near_dup": [], "near_dup_of": []}
            ).astype({"cluster": "int32", "is_near_dup": "bool"})
        if len(rep) == 0:
            return pd.DataFrame(
                {
                    "id": bat["__rep_id"],
                    "cluster": bat["cluster"],
                    "is_near_dup": False,
                    "near_dup_of": None,
                }
            )
        B = _mat(bat["__rep_vec"])
        R = _mat(rep["__rep_vec"])

        def _norm(m):
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            return m / n[:, None]

        # ties on max cosine break to the smallest rep id: sort reps by id
        # and use the FIRST argmax
        order = np.argsort(rep["__rep_id"].to_numpy(), kind="mergesort")
        R = R[order]
        rep_ids = rep["__rep_id"].to_numpy()[order]
        S = _norm(B) @ _norm(R).T
        best = np.argmax(S, axis=1)
        best_cos = S[np.arange(len(B)), best]
        hit = best_cos >= thr
        return pd.DataFrame(
            {
                "id": bat["__rep_id"].to_numpy(),
                "cluster": bat["cluster"].to_numpy(),
                "is_near_dup": hit,
                "near_dup_of": [
                    rep_ids[b_] if h else None
                    for b_, h in zip(best, hit)
                ],
            }
        )

    return both.groupBy("cluster").applyInPandas(
        _screen,
        schema=(
            f"id {id_field}, cluster int, is_near_dup boolean,"
            f" near_dup_of {id_field}"
        ),
    )


def _round_sig(a: np.ndarray, digits: int) -> np.ndarray:
    """Round every entry to ``digits`` significant decimal digits via the
    shortest-decimal path (format + parse), elementwise."""
    flat = [float(f"{x:.{digits - 1}e}") for x in np.asarray(a, dtype=np.float64).ravel()]
    return np.array(flat, dtype=np.float64).reshape(np.shape(a))


def pca_basis_from_moments(
    n: int,
    s: np.ndarray,
    ss: np.ndarray,
    k: int,
    quantize_sig: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Moments ``(n, Σx, Σxxᵀ)`` → ``(mean, components[k,d], evals[k])``.

    Split out of :func:`pca_fit` so an engine-independent caller (the
    DuckDB oracle recomputes the moments with its own scan) derives the
    IDENTICAL basis: with ``quantize_sig`` set, mean and covariance are
    rounded to that many significant digits BEFORE ``eigh``, so two
    moment computations that differ only in float summation order (tree
    vs sequential reduction) collapse to the same matrix — and the same
    numpy then produces the same basis bit-for-bit."""
    s = np.asarray(s, dtype=np.float64)
    d = s.shape[0]
    ss = np.asarray(ss, dtype=np.float64).reshape(d, d)
    if k < 1 or k > d:
        raise ValueError(f"k must be in [1, {d}]")
    mean = s / n
    # covariance from raw moments; population normalization (divide by n)
    cov = ss / n - np.outer(mean, mean)
    if quantize_sig is not None:
        mean = _round_sig(mean, quantize_sig)
        cov = _round_sig(cov, quantize_sig)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: the largest-|entry| coefficient is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    quantize_sig: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """EXACT distributed PCA fit: one pass computes the full first and
    second moments (per-partition Arrow partials of ``(n, Σx, Σxxᵀ)``,
    combined driver-side), then the d×d covariance eigendecomposition —
    d is the embedding width (bounded, e.g. 64), so the driver work is
    microscopic while the data pass is exact over ANY corpus size.  No
    sampling, no iterative SVD, one job.

    Returns ``(mean[d], components[k, d], explained_var[k])`` with
    components sorted by eigenvalue descending and sign-fixed (largest-
    |coefficient| entry positive) so the fit is deterministic for a
    given dataset regardless of partitioning.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )

    def _partials(batches):
        n = 0
        s = None
        ss = None
        for pdf in batches:
            m = np.array(list(pdf.iloc[:, 0]), dtype=np.float64)
            if m.size == 0:
                continue
            n += m.shape[0]
            s = m.sum(0) if s is None else s + m.sum(0)
            g = m.T @ m
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    parts = (
        spread(df)
        .select(F.col(vec_col).cast("array<double>"))
        .mapInPandas(_partials, schema)
        .collect()
    )
    if not parts:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    d = s.shape[0]
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in parts], axis=0)
    return pca_basis_from_moments(n, s, ss, k, quantize_sig=quantize_sig)


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    whiten: bool = False,
    fitted: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
) -> DataFrame:
    """Project embeddings onto their top-``k`` principal components —
    the standard compression/whitening pass before semantic dedup or ANN
    indexing (SemDeDup and most FAISS recipes run on PCA'd vectors:
    same neighborhoods, k/d of the bytes through every shuffle).

    ``whiten=True`` scales each component to unit variance.  Pass a
    ``fitted`` triple (from :func:`pca_fit`, possibly persisted) to
    apply a frozen basis to NEW batches — the incremental-ingest shape.

    Returns (id, projected array<double>, residual_ppm bigint) where
    ``residual_ppm`` is the per-row reconstruction-error share
    ``⌊10⁶·(1 − ‖proj‖²/‖centered‖²)⌋`` — a quality signal telling you
    how much of THIS row the basis failed to capture.

    Scale shape: the fit is one exact moment pass (d×d driver eigh);
    application broadcasts the (k, d) matrix inside one Arrow kernel —
    narrow, no shuffle, no JVM↔Python row traffic."""
    mean, comps, evals = fitted if fitted is not None else pca_fit(
        df, vec_col=vec_col, k=k
    )
    if whiten:
        scale = 1.0 / np.sqrt(np.maximum(evals, 1e-12))
    else:
        scale = np.ones_like(evals)
    M = mean.copy()
    W = comps.copy()
    S = scale.copy()

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("projected", T.ArrayType(T.DoubleType())),
            T.StructField("residual_ppm", T.LongType()),
        ]
    )

    def _apply(batches):
        for pdf in batches:
            ids = pdf.iloc[:, 0]
            m = np.array(list(pdf.iloc[:, 1]), dtype=np.float64)
            if m.size == 0:
                continue
            c = m - M
            p = c @ W.T  # (n, k)
            cn = (c * c).sum(1)
            pn = (p * p).sum(1)
            cn[cn == 0] = 1.0
            resid = np.floor(
                1e6 * np.clip(1.0 - pn / cn, 0.0, 1.0)
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "projected": list((p * S).tolist()),
                    "residual_ppm": resid,
                }
            )

    return (
        spread(df)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .mapInPandas(_apply, out_schema)
        .withColumnRenamed("id", id_col)
    )


def sparse_topk_neighbors(
    w_rows: DataFrame,
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    weight_col: str = "w_micros",
    k: int = 1,
) -> DataFrame:
    """Exact top-k neighbors over a SPARSE integer vector table
    ((id, bucket, weight) rows, e.g. :func:`~.textops.hashed_embedding`
    ``as_rows`` output): score = Σ w_a·w_b over shared buckets — the
    inverted-index dot product, entirely relational.  Integer products
    are exact, so ranking (score desc, neighbor id asc) never hits the
    float-argmax tie hazard; for micro-quantized unit vectors the dot
    IS cosine×1e12 up to quantization, and that defined ordering is
    what the oracle reproduces.

    Plan: self-equi-join on the bucket (only same-bucket pairs
    materialize — sparsity is the pruning), partial-aggregated dot
    accumulation, one window top-k.  Pair volume is Σ_b n_b², the
    classic inverted-index bound: fine while buckets stay balanced
    (hashing does that); hot buckets would need the E3-style stop-key
    cap.  Zero-weight rows are dropped before the join."""
    from pyspark.sql import Window

    base = w_rows.select(
        F.col(id_col).alias("__id"),
        F.col(bucket_col).alias("__b"),
        F.col(weight_col).cast("long").alias("__w"),
    ).filter(F.col("__w") != 0)
    a = base.select(
        F.col("__id").alias("id_a"), "__b", F.col("__w").alias("__wa")
    )
    b = base.select(
        F.col("__id").alias("id_b"), "__b", F.col("__w").alias("__wb")
    )
    dots = (
        a.join(b, "__b")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("dot"))
    )
    w = Window.partitionBy("id_a").orderBy(
        F.desc("dot"), F.asc("id_b")
    )
    return (
        dots.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("neighbor_id"),
            "dot",
            F.col("__rk").cast("long").alias("rank"),
        )
    )
