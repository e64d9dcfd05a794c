"""Full-text keyword search: inverted index + engine-exact tf·idf top-k.

The reference engine delegates all scalar work to Spark SQL and has no
search capability (see SURVEY §2.3); this module adds the retrieval
operator a corpus pipeline needs for eval-set mining, targeted corpus
audits ("show me the top docs about X"), and labeling-queue construction.

Scoring is a BM25-family tf·idf made **cross-engine exact**: every factor
is integer arithmetic (`LEAST(tf, tf_cap)` saturation, `N DIV df` integer
idf, `* 1000 DIV (len_smooth + dl)` length normalization), so a DuckDB
oracle reproduces scores and ranks bit-for-bit — no `ln()`/double division
whose last-ulp behavior differs between engines.  The classic logarithmic
idf damping is deliberately traded for the integer-exact `N DIV df`
(rarer terms still dominate; the saturation cap bounds tf runaway).

Scale plan: postings are built once per corpus (store them — the index IS
a table); a query batch broadcast-joins its tiny term set against the
postings scan, so only matching-term postings ever shuffle.  The idf join
also broadcasts (bounded by query-term count).  Top-k per query is a
window over per-(query, doc) aggregates.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import materialize_release
from ..functions.text import tokens_pd
from ..partitioning import spread

__all__ = [
    "bm25_search",
    "build_term_index",
    "append_to_term_index",
    "keyword_search",
    "reciprocal_rank_fusion",
    "ranking_metrics",
]


def build_term_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted-index postings: one row per (term, doc) with the term
    frequency and the document's token length — (term, doc_id, tf, dl).

    Tokenization is the shared Arrow kernel (same normalization as every
    other text operator, so stored indexes stay consistent with dedup /
    vocab outputs).  Plan: tokenize once → explode → map-side-combined
    count per (term, doc); ``dl`` rides the groupBy as a `first` (it is
    constant within the doc's group).  Persist the RESULT with
    ``write_bucketed`` on ``term`` for repeated query batches — the
    search-side join then skips the postings shuffle entirely."""
    toks = F.filter(tokens_pd(F.col(text_col)), lambda t: t != F.lit(""))
    with_toks = spread(df).select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    )
    return (
        with_toks.select(
            "doc_id",
            F.size("__toks").cast("long").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.first("dl").alias("dl"),
        )
    )


def append_to_term_index(
    index: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental inverted-index maintenance (the E64 append
    discipline brought to the search lane): fold a batch of new or
    RE-CRAWLED documents into a stored postings table — only the batch
    tokenizes; ids present in the batch drop their stale postings via
    one anti-join (a revised page must not keep old terms), then the
    fresh postings union in.  Postings are per-document facts, so the
    merged table equals a from-scratch build over the final corpus
    state bit-for-bit — and because :func:`keyword_search` /
    :func:`bm25_search` derive N/avgdl/df FROM the index at query
    time, ranking over the folded index is exactly ranking over the
    rebuilt one.

    Per-batch cost: batch tokenize + one id anti-join against the
    store; the corpus is never re-tokenized.  Persist the result with
    ``write_bucketed`` on term, same as the cold build."""
    fresh = build_term_index(new_docs, id_col=id_col, text_col=text_col)
    # anti-join on the BATCH ids, not the fresh postings' ids: a doc
    # re-crawled to empty/NULL text has no fresh postings at all, but
    # its stale postings must still drop (the page is gone)
    kept = index.join(
        new_docs.select(F.col(id_col).alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    return kept.unionByName(fresh)


def keyword_search(
    df: DataFrame,
    queries: Mapping[str, Sequence[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    tf_cap: int = 10,
    len_smooth: int = 100,
    index: DataFrame | None = None,
    require_all: bool = False,
    release: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query by engine-exact integer tf·idf.

    ``queries`` maps a query id to its PRE-TOKENIZED term list (callers
    tokenize with the same normalization as the corpus; passing terms
    keeps the query side trivially engine-portable).  Per (query, doc):

        score     = Σ_t  LEAST(tf(t,d), tf_cap) * (N DIV df(t))
        score_ppk = score * 1000 DIV (len_smooth + dl)

    with ``N`` = corpus doc count and ``df(t)`` = docs containing ``t`` —
    all BIGINT, so both engines rank identically; ties break on doc_id.
    Overflow headroom: with N ≤ 1e11 docs, tf_cap ≤ 10 and ≤ 100 query
    terms, score ≤ 1e14 and score*1000 ≤ 1e17 < 2^63.

    Returns (query_id, doc_id, score_ppk, rank), rank 1..k.

    ``require_all=True`` switches from OR to AND semantics: only documents
    containing EVERY term of the query rank (conjunctive retrieval — the
    per-(query, doc) matched-term count must equal the query's distinct
    term count; one extra broadcast of the tiny per-query term counts).

    Plan: the postings scan is semi-joined against the BROADCAST query
    term set first, so only matching postings survive; df(t) aggregates
    over those survivors (never the full index) and broadcasts back; N is
    a 1-row broadcast cross join.  One shuffle on (query, doc) for the
    score aggregate, then a per-query window over ≤ |terms|·df rows."""
    if k <= 0 or tf_cap <= 0 or len_smooth < 0:
        raise ValueError("k and tf_cap must be positive, len_smooth >= 0")
    if not queries:
        raise ValueError("queries must be non-empty")
    spark: SparkSession = df.sparkSession
    qrows = [
        (str(qid), str(t))
        for qid, terms in queries.items()
        for t in dict.fromkeys(terms)  # dedup, keep order
    ]
    if not qrows:
        raise ValueError("queries must contain at least one term")
    qterms = spark.createDataFrame(qrows, "query_id string, term string")
    # distinct terms computed driver-side (queries are tiny by contract):
    # a .distinct() here would add a shuffle stage per consumer plan
    term_set = F.broadcast(
        spark.createDataFrame(
            [(t,) for t in sorted({t for _, t in qrows})], "term string"
        )
    )

    if index is not None:
        # stored-index path: semi-join the postings scan against the tiny
        # term set (with a bucketed-on-term index this is shuffle-free)
        matched = index.join(term_set, "term")
    else:
        # inline path: per-term tf via narrow array kernels — the corpus
        # token stream is never exploded or shuffled.  Each doc emits only
        # its nonzero (term, tf) pairs (≤ |terms| rows/doc), so the one
        # scoring shuffle downstream carries a bounded sliver.  Suited to
        # interactive batches (≤ ~100 distinct terms — each term is one
        # JVM array scan per doc); larger batches should use a stored
        # index.
        all_terms = sorted({t for _, t in qrows})
        toks = F.filter(tokens_pd(F.col(text_col)), lambda t: t != F.lit(""))
        tf_pairs = F.filter(
            F.transform(
                F.array(*[F.lit(t) for t in all_terms]),
                lambda t: F.struct(
                    t.alias("term"),
                    F.size(F.filter(F.col("__toks"), lambda x: x == t))
                    .cast("long")
                    .alias("tf"),
                ),
            ),
            lambda s: s["tf"] > 0,
        )
        matched = (
            spread(df)
            .select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
            .select(
                "doc_id",
                F.size("__toks").cast("long").alias("dl"),
                F.explode(tf_pairs).alias("__p"),
            )
            .select("doc_id", "dl", "__p.term", "__p.tf")
        )
    # persist only when we will also release it on return; release=False
    # keeps the fully lazy plan (composition/audit mode) — an unreleased
    # internal persist would leak a session-lifetime cache the caller has
    # no handle to (same guard as snapshot_diff).  Trade-off: lazy mode
    # recomputes `matched` (incl. the corpus tokenize) once per consumer
    # subtree — callers composing repeated searches should pass a stored,
    # ideally term-bucketed `index=` instead, which skips tokenize
    # entirely
    if release:
        matched = matched.persist()

    n_docs = df.select(
        F.count(F.lit(1)).cast("long").alias("__n")
    )  # 1 row
    # df(t) over the matched postings only (each doc counted once per term)
    dfreq = (
        matched.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.expr("__n div __df").cast("long").alias("__idf"),
        )
    )
    per_doc = (
        matched.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(
                F.least(F.col("tf"), F.lit(int(tf_cap))) * F.col("__idf")
            ).alias("__score"),
            F.first("dl").alias("__dl"),
            F.count(F.lit(1)).alias("__nterms"),  # matched is unique per (term, doc)
        )
    )
    if require_all:
        want = qterms.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("__want")
        )
        per_doc = per_doc.join(F.broadcast(want), "query_id").filter(
            F.col("__nterms") == F.col("__want")
        )
    scored = per_doc.select(
        "query_id",
        "doc_id",
        F.expr(f"(__score * 1000) div ({int(len_smooth)} + __dl)")
        .cast("long")
        .alias("score_ppk"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_ppk"), F.asc("doc_id")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return materialize_release(out, matched, release=release)


def reciprocal_rank_fusion(
    rankings: Sequence[DataFrame],
    k0: int = 60,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Hybrid retrieval: fuse N ranked lists per query by Reciprocal Rank
    Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) — the standard way a
    curation pipeline combines keyword (tf·idf) and vector (cosine)
    retrieval without score calibration, since RRF consumes only RANKS.

    Per (query, doc): ``rrf_micros = Σ_lists (1_000_000 div (k0 +
    rank))`` — exact truncating integer division per list, exact integer
    sum, so fusion is engine- and partitioning-independent (the repo's
    integer-score discipline; k0=60 is the paper's constant).  Returns
    the top ``k`` per query: (query_id, doc_id, rrf_micros, n_lists,
    fused_rank), ties broken on doc_id.

    Each input needs (query_col, id_col, rank_col); extra columns are
    ignored.  A doc absent from a list simply contributes nothing — no
    imputation, exactly the paper's formulation.

    Scale shape: inputs are already top-k-per-query tables (bounded:
    queries × k rows), so the union + one groupBy + one bounded window
    are all small; the heavy lifting happened in the upstream retrieval
    operators."""
    if not rankings:
        raise ValueError("rankings must be a non-empty sequence")
    if k0 < 1 or k < 1:
        raise ValueError("k0 and k must be positive")
    unioned = None
    for r in rankings:
        part = r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            F.expr(f"1000000 div ({k0} + {rank_col})")
            .cast("long")
            .alias("__contrib"),
        )
        unioned = part if unioned is None else unioned.unionAll(part)
    fused = unioned.groupBy("query_id", "doc_id").agg(
        F.sum("__contrib").cast("long").alias("rrf_micros"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micros"), F.asc("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select("query_id", "doc_id", "rrf_micros", "n_lists", "fused_rank")
    )


def bm25_search(
    df: DataFrame,
    queries: Mapping[str, Sequence[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1_x10: int = 12,
    b_x4: int = 3,
    index: DataFrame | None = None,
    release: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query by **engine-exact integer BM25**
    (Robertson & Zaragoza 2009): real tf saturation and length
    normalization, not the capped-tf surrogate of :func:`keyword_search`.

    BM25's two float parameters are taken as exact rationals — ``k1 =
    k1_x10/10`` (default 1.2) and ``b = b_x4/4`` (default 0.75) — and the
    whole score is cleared of denominators so every factor is BIGINT:

        avgdl   = total_tokens DIV n_docs
        idf     = ((N - df + 1) * 1000) DIV (df + 1)      -- Robertson idf,
                                                          -- log-free, x1000
        sat_pp3 = (4000 * tf * avgdl * (10 + k1_x10))
                  DIV (40*tf*avgdl + k1_x10*(4-b_x4)*avgdl + k1_x10*b_x4*dl)
        score_ppm(q, d) = SUM_t idf(t) * sat_pp3(t, d)

    ``sat_pp3`` is the BM25 saturation ``tf*(k1+1) / (tf + k1*(1-b +
    b*dl/avgdl))`` with numerator and denominator multiplied by
    ``40*avgdl`` — exact integer arithmetic, so a DuckDB oracle
    reproduces scores and ranks bit-for-bit.  Overflow headroom: with
    avgdl ≤ 1e6, tf ≤ 1e6 and N ≤ 1e12 every intermediate stays under
    2^62 (the idf×sat product is ≤ ~2.2e3 × 1e15 per term only when N
    approaches 1e12 AND every query has 100+ terms; at that scale pass a
    smaller idf scale).

    Returns (query_id, doc_id, score_ppm, rank), rank 1..k per query,
    ties on doc_id.  ``index=`` accepts a stored
    :func:`build_term_index` table (corpus stats are then derived from
    its distinct (doc, dl) pairs — zero-token docs are invisible there,
    so N may differ from the raw row count; the inline path counts every
    row).

    Scale shape: one corpus tokenize pass persisted and shared by the
    stats aggregate and the postings sliver (released on return); the
    query term set, corpus stats (1 row) and per-term df all broadcast;
    one shuffle on (query, doc) for the score sum; bounded top-k window.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if k1_x10 < 0 or not (0 <= b_x4 <= 4):
        raise ValueError("k1_x10 must be >= 0 and b_x4 in 0..4")
    if not queries:
        raise ValueError("queries must be non-empty")
    spark: SparkSession = df.sparkSession
    qrows = [
        (str(qid), str(t))
        for qid, terms in queries.items()
        for t in dict.fromkeys(terms)
    ]
    if not qrows:
        raise ValueError("queries must contain at least one term")
    qterms = spark.createDataFrame(qrows, "query_id string, term string")
    intermediates: list[DataFrame] = []

    if index is not None:
        matched = index.join(
            F.broadcast(qterms.select("term").distinct()), "term"
        )
        docs = index.select("doc_id", "dl").distinct()
        stats = docs.agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("dl").cast("long").alias("__tdl"),
        )
    else:
        all_terms = sorted({t for _, t in qrows})
        toks = F.filter(tokens_pd(F.col(text_col)), lambda t: t != F.lit(""))
        base = (
            spread(df)
            .select(F.col(id_col).alias("doc_id"), toks.alias("__toks"))
            .select(
                "doc_id",
                F.size("__toks").cast("long").alias("dl"),
                F.col("__toks"),
            )
        )
        if release:
            base = base.persist()
            intermediates.append(base)
        stats = base.agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("dl").cast("long").alias("__tdl"),
        )
        tf_pairs = F.filter(
            F.transform(
                F.array(*[F.lit(t) for t in all_terms]),
                lambda t: F.struct(
                    t.alias("term"),
                    F.size(F.filter(F.col("__toks"), lambda x: x == t))
                    .cast("long")
                    .alias("tf"),
                ),
            ),
            lambda s: s["tf"] > 0,
        )
        matched = base.select(
            "doc_id", "dl", F.explode(tf_pairs).alias("__p")
        ).select("doc_id", "dl", "__p.term", "__p.tf")

    if release:
        matched = matched.persist()
        intermediates.append(matched)

    # corpus stats ride every downstream row as a 1-row broadcast
    stats = stats.select(
        "__n", F.expr("__tdl div greatest(__n, 1)").alias("__avgdl")
    )
    dfreq = (
        matched.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("__df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.expr("((__n - __df + 1) * 1000) div (__df + 1)")
            .cast("long")
            .alias("__idf"),
            "__avgdl",
        )
    )
    c_num = 4000 * (10 + int(k1_x10))
    c_den_tf = 40
    c_den_avg = int(k1_x10) * (4 - int(b_x4))
    c_den_dl = int(k1_x10) * int(b_x4)
    per_doc = (
        matched.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("__idf")
                * F.expr(
                    f"({c_num} * tf * __avgdl) div"
                    f" ({c_den_tf} * tf * __avgdl"
                    f" + {c_den_avg} * __avgdl + {c_den_dl} * dl)"
                )
            ).alias("__term_score"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("__term_score").cast("long").alias("score_ppm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_ppm"), F.asc("doc_id")
    )
    out = (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_ppm", "rank")
    )
    return materialize_release(out, *intermediates, release=release)


def ranking_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """IR evaluation of a ranking against a binary relevance set:
    precision/recall@k, MRR, and NDCG@k per query — the gate a
    retrieval stack (E87/E138/E132) passes before its ranking ships,
    next to E148's calibration gate for classifiers.

    All metrics are exact integers: precision/recall/MRR are pure
    integer-ppm divisions; NDCG's position discount ``1/log2(rank+1)``
    is quantized to integer nano-units PER POSITION before the exact
    sums (JVM vs libm ln() differs by 1–2 ulp on some inputs, so raw
    log doubles never reach hashed output), and ``ndcg_ppm = dcg·10⁶
    div idcg`` — the ideal DCG sums the same quantized discounts over
    the first ``min(n_relevant, k)`` positions, so both engines agree
    bit-for-bit.

    Returns one row per query present in ``results``: (query_id,
    n_results, n_relevant, hits, precision_ppm, recall_ppm, mrr_ppm,
    ndcg_ppm).  ``mrr_ppm`` is 0 when nothing relevant was retrieved;
    recall/ndcg are NULL when the query has no relevant docs at all.

    Scale shape: one equi-join of the (queries·k)-row ranking against
    the truth set, two query-key aggregates, and a ``sequence()``
    explode bounded by k for the ideal DCG — nothing scales with the
    corpus, only with queries·k.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    nano = lambda x: F.floor(x * F.lit(1e9) + F.lit(0.5)).cast("long")

    def gain(pos):
        return nano(F.lit(1.0) / F.log2(pos.cast("double") + F.lit(1.0)))

    rel = truth.select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__d")
    ).distinct()
    n_rel = rel.groupBy("__q").agg(
        F.count(F.lit(1)).cast("long").alias("n_relevant")
    )
    r = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__d"),
        F.col(rank_col).alias("__r"),
    )
    joined = r.join(rel.withColumn("__rel", F.lit(1)), ["__q", "__d"], "left")
    per_q = joined.groupBy("__q").agg(
        F.count(F.lit(1)).cast("long").alias("n_results"),
        F.coalesce(F.sum("__rel"), F.lit(0)).cast("long").alias("hits"),
        F.min(F.when(F.col("__rel") == 1, F.col("__r"))).alias("__first"),
        F.coalesce(
            F.sum(F.when(F.col("__rel") == 1, gain(F.col("__r")))), F.lit(0)
        )
        .cast("long")
        .alias("__dcg"),
    )
    ideal = (
        n_rel.select(
            "__q",
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("n_relevant"), F.lit(k)))
            ).alias("__p"),
        )
        .groupBy("__q")
        .agg(F.sum(gain(F.col("__p"))).cast("long").alias("__idcg"))
    )
    return (
        per_q.join(F.broadcast(n_rel), "__q", "left")
        .join(F.broadcast(ideal), "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            "n_results",
            F.coalesce(F.col("n_relevant"), F.lit(0))
            .cast("long")
            .alias("n_relevant"),
            "hits",
            F.expr("hits * 1000000 div n_results").alias("precision_ppm"),
            F.expr("hits * 1000000 div nullif(n_relevant, 0)").alias(
                "recall_ppm"
            ),
            F.coalesce(F.expr("1000000 div __first"), F.lit(0))
            .cast("long")
            .alias("mrr_ppm"),
            F.expr("__dcg * 1000000 div nullif(__idcg, 0)").alias("ndcg_ppm"),
        )
    )
