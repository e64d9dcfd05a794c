"""Corpus curation, round-4 layer — quality gates, mixture planning,
retrieval, and the compressed embedding store.

The session-3 operators end to end, on the same components the query
suite checks one by one:

  1. score text like CCNet      charlm_scores       (char-trigram LM, ppm)
  2. catch repetition           repetition_report   (Gopher char coverage)
  3. flag robust outliers       mad_outliers        (|v-med| > 3*MAD)
  4. dedup exactly, uncapped    jaccard_prefix_pairs (prefix filtering)
  5. plan the mixture           temperature_mixture (share ~ weight^0.5)
  6. gate the learned filter    naive_bayes_classifier -> calibration_report
  7. retrieve for eval mining   bm25_search + cosine_topk -> RRF fusion
  8. shrink the vector store    quantize_embeddings (int8 + audit)
  9. track token heavy-hitters  build_cms_sketch/cms_estimate (mergeable)
 10. shortlist suppliers        skyline             (Pareto front)

Every gate emits engine-exact integers (ppm floor divisions, BIGINT
sums, md5 hashes), so the whole pipeline is replayable bit-for-bit on
any engine — the property the oracle suite enforces query by query.

Run:  python examples/corpus_curation_round4.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import (
    bm25_search,
    build_cms_sketch,
    calibration_report,
    charlm_scores,
    cms_estimate,
    cosine_topk,
    jaccard_prefix_pairs,
    mad_outliers,
    naive_bayes_classifier,
    quantize_embeddings,
    reciprocal_rank_fusion,
    repetition_report,
    skyline,
    temperature_mixture,
)
from sparkplug_spark.functions.text import tokens_pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    # 1-2. language-model + repetition quality signals, one narrow pass each
    lm = charlm_scores(docs)
    rep = repetition_report(docs)
    quality = lm.join(rep, "doc_id").select(
        "doc_id", "avg_prob_ppm", "top_2gram_char_frac_ppm"
    )
    print("== quality signals (low-LM-probability docs first) ==")
    quality.orderBy("avg_prob_ppm").show(5)

    # 3. robust outliers on document length per source
    out = mad_outliers(docs, "n_chars", "source", "doc_id")
    print("length outliers:", out.filter("is_outlier").count())

    # 4. exact near-dup pairs without a stop-key completeness trade
    pairs = jaccard_prefix_pairs(docs, threshold=0.6)
    print("exact jaccard>=0.6 pairs:", pairs.count())

    # 5. temperature-flattened mixture plan
    print("== mixture plan (tau=1/2) ==")
    temperature_mixture(docs).orderBy("source").show()

    # 6. learned quality filter + its reliability gate
    nb = naive_bayes_classifier(docs)
    print("== calibration (pos rate must rise with score) ==")
    calibration_report(
        nb, score_col="score_micros", label_col="label", id_col="doc_id"
    ).orderBy("bucket").show()

    # 7. hybrid retrieval: BM25 ranks fused with cosine ranks
    queries = {"q0": ["hash", "join"], "q1": ["stream", "filter"]}
    kw = bm25_search(docs, queries, k=20)
    qvec = emb.filter(F.col("vec_id") < 2).select(
        F.concat(F.lit("q"), F.col("vec_id")).alias("query_id"), "embedding"
    )
    cos = cosine_topk(emb, qvec, k=20, query_id_col="query_id").select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    print("== hybrid retrieval (RRF of BM25 + cosine) ==")
    reciprocal_rank_fusion([kw, cos], k=5).orderBy(
        "query_id", "fused_rank"
    ).show()

    # 8. int8 store: 4x smaller, audited reconstruction error
    q = quantize_embeddings(emb)
    q.agg(
        F.max("max_abs_err").alias("worst_err"),
        F.sum("n_saturated").alias("saturated_dims"),
    ).show()

    # 9. mergeable token heavy-hitter sketch
    toks = docs.select(
        F.explode(
            F.filter(tokens_pd(F.col("text")), lambda t: t != F.lit(""))
        ).alias("token")
    )
    sk = build_cms_sketch(toks, "token", depth=4, width=256)
    probe = spark.createDataFrame(
        [("table",), ("join",), ("zzz-unseen",)], "token string"
    )
    print("== CMS estimates (over-count only) ==")
    cms_estimate(sk, probe, "token", depth=4, width=256).show()

    # 10. supplier shortlist nobody dominates
    s = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"),
        F.min("l_extendedprice").alias("min_price"),
    )
    print("== supplier skyline (max qty, min cheapest-item price) ==")
    skyline(s, minimize=["min_price"], maximize=["total_qty"]).show()

    spark.stop()


if __name__ == "__main__":
    main()
