"""Contrastive training-data pipeline — embeddings to (anchor, positive,
hard negative, random negative) triples, with an incrementally-maintained
ANN index.

The retrieval / embedding-model fine-tuning recipe composed from this
repo's operators:

  1. pre-flight        embedding_norms      (NaN / un-normalized vectors
                                             poison every cosine below)
  2. ANN index         build_ivf_index      (train once; lists stored
                                             PARTITIONED BY centroid)
  2b. daily ingest     append_to_ivf_index  (new vectors absorb against
                                             frozen centroids — no
                                             retrain, no corpus re-read)
  3. positives         search_ivf_index     (top-k neighbors per anchor
                                             = weak-supervision positives;
                                             probed lists only)
  4. hard negatives    hard_negative_mining (highest-cosine NON-positives;
                                             exclusion before ranking)
  5. random negatives  negative_samples     (md5-coin picks — the same
                                             sample every epoch, every
                                             engine, every partitioning)

Every step is deterministic, so the emitted triples reproduce
bit-identically; the ANN index steps read only the probed
``centroid=`` directories (partition pruning — check the plan).

Run:  python examples/contrastive_training_data.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import (
    append_to_ivf_index,
    build_ivf_index,
    embedding_norms,
    hard_negative_mining,
    negative_samples,
    search_ivf_index,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("contrastive-training-data")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    # 1. pre-flight: refuse to build on poisoned vectors
    profile = embedding_norms(emb)
    bad = profile.filter(F.col("has_nan") | (F.col("l2_norm") == 0.0)).count()
    assert bad == 0, f"{bad} unusable vectors"
    print(f"pre-flight: {profile.count()} vectors clean")

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/ivf"
        # 2. day-0 index on the existing corpus...
        day0 = emb.filter(F.col("vec_id") % 5 != 0)
        build_ivf_index(day0, path, num_centroids=8)
        # 2b. ...then absorb the new day's vectors without retraining
        append_to_ivf_index(emb.filter(F.col("vec_id") % 5 == 0), path)
        stored = spark.read.parquet(f"{path}/lists")
        print(f"index: {stored.count()} vectors in 8 centroid lists")

        # 3. weak positives: each anchor's top-3 neighbors (self included)
        anchors = emb.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        positives = search_ivf_index(spark, path, anchors, k=3, n_probe=4)
        pos_pairs = positives.select(
            "query_id", F.col("neighbor_id").alias("vec_id")
        )

        # 4. hard negatives: the lure set right below the positives
        hard = hard_negative_mining(emb, anchors, pos_pairs, k=4)

        # 5. random negatives: deterministic md5-coin draw
        rand = negative_samples(
            pos_pairs.selectExpr("query_id as anchor_id", "vec_id as item_id"),
            emb.selectExpr("vec_id as item_id"),
            k=4,
            salt="epoch0",
        )

        triples = (
            pos_pairs.filter(F.col("vec_id") != F.col("query_id"))
            .withColumnRenamed("vec_id", "positive_id")
            .join(
                hard.selectExpr("query_id", "neighbor_id as hard_negative_id"),
                "query_id",
            )
            .join(
                rand.selectExpr(
                    "anchor_id as query_id", "item_id as random_negative_id"
                ),
                "query_id",
            )
        )
        n = triples.count()
        print(f"emitted {n} (anchor, positive, hard-neg, random-neg) rows")
        assert n == 20 * 2 * 4 * 4
        triples.orderBy("query_id", "positive_id").show(6)

    spark.stop()


if __name__ == "__main__":
    main()
