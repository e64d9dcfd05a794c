"""Incremental corpus ingestion — the 100 TB daily-batch flow end to end.

Day 0 builds the stored artifacts (content digests, MinHash signatures, a
decontamination bloom bitmap); every later day screens ONLY its new batch
against them: exact dups anti-join 16-byte digests, near-dups LSH-join
stored signatures, contamination probes the stored bitmap.  Corpus text is
never re-read.  The run ends with the change-tracking layer: snapshot_diff
says what the day actually changed, scd2_merge folds it into a versioned
history table.

Run:  python examples/incremental_ingest.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.functions.bloom import build_bloom_from_texts
from sparkplug_spark.operators import (
    content_digests,
    dedup_exact_against,
    decontaminate,
    gopher_quality_flags,
    minhash_lsh_join,
    minhash_signatures,
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
    store = "/tmp/sparkplug_demo_store"

    # ---- day 0: corpus artifacts (write once, append per batch) --------
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    content_digests(corpus).write.mode("overwrite").parquet(f"{store}/digests")
    minhash_signatures(corpus).write.mode("overwrite").parquet(f"{store}/sigs")
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    blob = build_bloom_from_texts(eval_set, "text", 5, 1 << 20, 5)

    # ---- day N: screen the new batch against stored artifacts ----------
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    fresh = dedup_exact_against(batch, spark.read.parquet(f"{store}/digests"))
    near = minhash_lsh_join(
        minhash_signatures(fresh),
        spark.read.parquet(f"{store}/sigs"),
        min_est_jaccard=0.5,
    )
    clean = (
        decontaminate(
            fresh, eval_set, n=5, bloom_prefilter=True,
            bloom_bits=1 << 20, bloom_blob=blob,
        )
        .filter(~F.col("contaminated"))
        .drop("n_eval_grams_hit", "contaminated")
    )
    kept = gopher_quality_flags(clean).filter(~F.col("flag_low_quality"))

    print("batch rows:        ", batch.count())
    print("after exact screen:", fresh.count())
    print("near-dup pairs:    ", near.count())
    print("after decontam:    ", clean.count())
    print("after quality:     ", kept.count())

    # ---- semantic tier: embeddings screened vs stored representatives --
    from sparkplug_spark.operators import (
        build_semantic_store,
        semantic_dedup_against,
    )

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    centroids, reps = build_semantic_store(
        emb.filter(F.col("vec_id") % 2 == 0), threshold=0.45, num_clusters=8
    )
    centroids.write.mode("overwrite").parquet(f"{store}/sem_centroids")
    reps.write.mode("overwrite").parquet(f"{store}/sem_reps")
    sem = semantic_dedup_against(
        emb.filter(F.col("vec_id") % 2 == 1),
        spark.read.parquet(f"{store}/sem_centroids"),
        spark.read.parquet(f"{store}/sem_reps"),
        threshold=0.45,
    )
    print(
        "semantic near-dups:",
        sem.filter(F.col("is_near_dup")).count(),
        "of",
        sem.count(),
    )

    # ---- change tracking: what did day N change, and version it --------
    from sparkplug_spark.operators import scd2_merge, snapshot_diff

    day0 = corpus.select("doc_id", "text")
    dayn = day0.unionByName(kept.select("doc_id", "text"))
    diff = snapshot_diff(day0, dayn, ["doc_id"], ["text"])
    diff.groupBy("status").count().show()
    history = day0.select(
        "doc_id", "text",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    history = scd2_merge(history, dayn, ["doc_id"], ["text"], as_of=1)
    print("history rows:      ", history.count())
    print("open rows:         ", history.filter("valid_to is null").count())

    # ---- maintenance: per-batch appends accumulate small files ---------
    # (every micro-batch leaves part-files; compact the artifact stores on
    # a maintenance cadence so listings/footers stay cheap)
    from sparkplug_spark.sources import compact_table

    content_digests(kept).write.mode("append").parquet(f"{store}/digests")
    stats = compact_table(spark, f"{store}/digests")
    print("digest store compacted:", stats)
    spark.stop()


if __name__ == "__main__":
    main()
