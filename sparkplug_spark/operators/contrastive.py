"""Contrastive-training data construction: deterministic negative
sampling and hard-negative mining.

Embedding-model training (retrieval, dedup encoders, CLIP-style
multimodal) needs, for every anchor, a set of NEGATIVE items that are
not among its known positives:

- :func:`negative_samples` — uniform random negatives, drawn by an
  md5-coin so the exact sample reproduces across runs, engines, and
  partitionings (a ``rand()`` draw would make every training epoch a
  different dataset).  Linear shape: anchors × oversample candidate
  picks join a dense item index; never an anchors × corpus cross join.
- :func:`hard_negative_mining` — the highest-cosine non-positives per
  anchor (the negatives that actually move a contrastive loss).  Exact
  brute-force tier sharing :func:`cosine_topk`'s broadcast-query shape;
  at corpus scale, swap the scoring side for the IVF/PQ index search
  and keep the same exclusion join.

Scale notes: the dense item index comes from
``partitioning.global_row_numbers`` (range-partitioned exact ranks —
no single-partition window); candidate generation is a narrow
projection of anchors × k' literals; the positives exclusion is one
left-anti join on (anchor, item).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash60
from ..partitioning import global_row_numbers

__all__ = ["negative_samples", "hard_negative_mining"]


def negative_samples(
    positives: DataFrame,
    items: DataFrame,
    k: int = 4,
    anchor_col: str = "anchor_id",
    item_col: str = "item_id",
    salt: str = "neg",
    oversample: int | None = None,
    release: bool = True,
) -> DataFrame:
    """For every distinct anchor in ``positives``, draw ``k`` negative
    items from ``items`` that are NOT among that anchor's positives.

    Output: (anchor_col, item_col, neg_rank 1..k), deterministic: pick
    j of an anchor targets item index ``hash60(salt|anchor|j) % n`` over
    the ``item_col``-sorted dense index, collisions with positives and
    repeat picks are discarded, and the first ``k`` survivors in j-order
    win.  An anchor whose positives cover nearly the whole universe may
    yield fewer than ``k`` rows — raise ``oversample`` (default
    ``k + max(8, k)`` picks) if that matters.

    Self-exclusion is the caller's contract: when anchors and items
    share an id space, include (a, a) rows in ``positives``."""
    if k < 1:
        raise ValueError("k must be >= 1")
    m = oversample or (k + max(8, k))
    if m < k:
        raise ValueError("oversample must be >= k")
    idx = global_row_numbers(
        items.select(F.col(item_col).alias("__item")).distinct(),
        ["__item"],
        rn_col="__rn",
        release=release,
    ).select("__item", (F.col("__rn") - 1).alias("__idx"))
    n_df = idx.select(F.count(F.lit(1)).alias("__n"))
    anchors = positives.select(F.col(anchor_col).alias("__a")).distinct()
    picks = (
        anchors.crossJoin(F.broadcast(n_df))
        .select(
            "__a",
            "__n",
            F.explode(F.array(*[F.lit(j) for j in range(m)])).alias("__j"),
        )
        .select(
            "__a",
            "__j",
            F.pmod(
                hash60(
                    F.concat_ws(
                        "|",
                        F.lit(salt),
                        F.col("__a").cast("string"),
                        F.col("__j").cast("string"),
                    )
                ),
                F.col("__n"),
            ).alias("__idx"),
        )
    )
    cand = picks.join(idx, "__idx").join(
        positives.select(
            F.col(anchor_col).alias("__a"), F.col(item_col).alias("__item")
        ),
        ["__a", "__item"],
        "left_anti",
    )
    # discard repeat picks of the same item (keep the earliest j), then
    # take the first k survivors in j-order
    first = Window.partitionBy("__a", "__item").orderBy("__j")
    order = Window.partitionBy("__a").orderBy("__j")
    out = (
        cand.withColumn("__dup", F.row_number().over(first))
        .filter(F.col("__dup") == 1)
        .withColumn("neg_rank", F.row_number().over(order))
        .filter(F.col("neg_rank") <= k)
        .select(
            F.col("__a").alias(anchor_col),
            F.col("__item").alias(item_col),
            "neg_rank",
        )
    )
    return out


def hard_negative_mining(
    corpus: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-``k`` HIGHEST-cosine corpus items per query that are not the
    query itself (``exclude_self``, compared on id equality) and not in
    ``positives`` (columns ``query_id_col``, ``id_col``) — the classic
    hard-negative set for contrastive fine-tuning.

    Same broadcast-query / Arrow-dot shape as :func:`cosine_topk`; the
    positives exclusion happens BEFORE ranking, so the output always
    holds the k best true negatives (filtering after a plain top-k would
    silently return fewer)."""
    from ..functions.vectors import vec_dot, vec_norm
    from .similarity import _cosine
    from ..partitioning import spread

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
    scored = q.crossJoin(c)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.join(
        F.broadcast(
            positives.select(
                F.col(query_id_col).alias("query_id"),
                F.col(id_col).alias("neighbor_id"),
            )
        ),
        ["query_id", "neighbor_id"],
        "left_anti",
    ).select(
        "query_id",
        "neighbor_id",
        _cosine(vec_dot("qv", "cv"), F.col("qn"), F.col("cn")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
