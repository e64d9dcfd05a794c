"""Quality-signal fusion — from incomparable raw signals to a curriculum.

Single quality signals lie: char-LM ppm, compression ratio, entropy, and
readability all live on incomparable scales, and each has a blind spot
(template spam aces charlm; keyword spam aces length checks).  The
standing fix: compute several independent signals, RANK-normalize each
to [0, 1e6] ppm (scale-free, outlier-immune), blend with integer
weights, then draw the training subset PROPORTIONALLY to the blended
score with an exact-k weighted sample — reproducible across engines,
runs, and cluster sizes.

Run:  python examples/quality_fusion.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import (
    conformal_thresholds,
    lexical_diversity,
    rank_normalize,
    readability_scores,
    text_stats,
    weighted_sample_k,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    # ---- three independent signals --------------------------------------
    quality = text_stats(docs).select("doc_id", "quality_score")
    entropy = lexical_diversity(docs).select("doc_id", "entropy_nanonats")
    flesch = readability_scores(docs).select("doc_id", "flesch_milli")

    # ---- rank-normalize each onto the same 0..1e6 scale ------------------
    rq = rank_normalize(quality, "quality_score", "doc_id").select(
        "doc_id", F.col("rank_ppm").alias("q_ppm")
    )
    re_ = rank_normalize(entropy, "entropy_nanonats", "doc_id").select(
        "doc_id", F.col("rank_ppm").alias("e_ppm")
    )
    rf = rank_normalize(flesch, "flesch_milli", "doc_id").select(
        "doc_id", F.col("rank_ppm").alias("f_ppm")
    )

    # ---- integer-weight blend (2:1:1) ------------------------------------
    blended = (
        rq.join(re_, "doc_id")
        .join(rf, "doc_id")
        .select(
            "doc_id",
            ((F.col("q_ppm") * 2 + F.col("e_ppm") + F.col("f_ppm")) / 4)
            .cast("long")
            .alias("blend_ppm"),
        )
    )
    print("== blended quality (top 5) ==")
    blended.orderBy(F.desc("blend_ppm"), "doc_id").show(5)

    # ---- exact-k curriculum draw, odds proportional to blended score -----
    chosen = weighted_sample_k(
        blended.filter(F.col("blend_ppm") > 0), k=100, weight_col="blend_ppm"
    )
    stats = chosen.agg(
        F.count("*").alias("n"), F.avg("blend_ppm").alias("mean_sel")
    ).collect()[0]
    corpus_mean = blended.agg(F.avg("blend_ppm")).collect()[0][0]
    print(
        f"selected {stats['n']} docs; mean blended score "
        f"{stats['mean_sel']:.0f} vs corpus {corpus_mean:.0f} "
        f"(PPS pulls the curriculum toward quality)"
    )

    # ---- ship gate: a distribution-free floor on the blended score -------
    # the exact rank pick such that ~90% of corpus docs score <= threshold;
    # anything ABOVE it is a defensible "top-decile quality" claim
    gate = conformal_thresholds(
        blended, "blend_ppm", alpha_ppm=100000, id_col="doc_id"
    ).collect()[0]
    print(
        f"conformal gate: rank {gate['k']}/{gate['n']} -> "
        f"blend_ppm threshold {gate['threshold']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
