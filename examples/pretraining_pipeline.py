"""Pre-training corpus pipeline — raw documents to dataloader shards.

The standard cleaning recipe (C4 / Gopher / GPT-3 lineage) composed from
this repo's operators, in the order a production pipeline runs them:

  0. expectations gate   check_expectations     (fail fast on a broken
                                                 ingest before paying for it)
  0a. markup strip       strip_markup           (tags/entities out before
                                                 anything tokenizes)
  0b. unicode normalize  normalize_unicode      (one byte representation
                                                 before any hashing)
  1. quality gate        gopher_quality_flags   (drop junk early: every
                                                 later stage reads less)
  2. PII scrub           scrub_pii
  3. within-doc dedup    dedup_spans_within_doc (repetition removal)
  4. boilerplate         remove_boilerplate_spans (inter-doc spans)
  4b. length trim        trim_by_quantile       (winsor outlier lengths)
  5. exact dedup         dedup_exact
  6. near dedup          dedup_keep_best        (MinHash clusters -> best)
  7. decontamination     decontaminate (exact) + decontaminate_fuzzy
  7b. leak-safe splits   assign_splits          (coin keyed on the near-dup
                                                 GROUP: clusters never
                                                 straddle train/test)
  8. mixture             mixture_report -> sample_to_token_budget
  9. upsampling          oversample_by_key      (fractional epochs)
 10. shards + manifest   write_sharded
 10b. training blocks    build_training_blocks  (budgeted md5-ordered
                                                 concatenation)
 11. release audit       dataset_fingerprint    (order-independent digest
                                                 pinning exactly what shipped)
 12. targeted audit      keyword_search         ("show me the top docs
                                                 about X" spot check)

Every step is deterministic (md5-derived orders/coins), so the whole
pipeline reproduces bit-identically on any run, cluster size, or engine.

Run:  python examples/pretraining_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import (
    Expectation,
    assign_splits,
    build_training_blocks,
    check_expectations,
    dataset_fingerprint,
    keyword_search,
    near_dup_groups,
    decontaminate,
    decontaminate_fuzzy,
    dedup_exact,
    dedup_keep_best,
    dedup_spans_within_doc,
    gopher_quality_flags,
    minhash_lsh_pairs,
    mixture_report,
    normalize_unicode,
    oversample_by_key,
    remove_boilerplate_spans,
    sample_to_token_budget,
    scrub_pii,
    strip_markup,
    trim_by_quantile,
)
from sparkplug_spark.sources import write_sharded


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
    n0 = docs.count()

    # 0. expectations gate: refuse to process a structurally broken drop
    report = check_expectations(
        docs,
        [
            Expectation("doc_id_unique", "unique", column="doc_id"),
            Expectation("text_not_null", "not_null", column="text"),
            Expectation("source_shape", "matches", column="source",
                        pattern=r"^src\d+$"),
        ],
    )
    gate = {r["expectation"]: r["passed"] for r in report.collect()}
    assert all(gate.values()), f"ingest failed expectations: {gate}"

    # 0a+0b. raw-text canonicalization FIRST: strip markup, then pin one
    # unicode byte representation — every hash-based stage downstream
    # (dedup, shingles, decontamination) depends on it
    docs = strip_markup(docs).drop("text").withColumnRenamed("text_clean", "text")
    docs = normalize_unicode(docs, lowercase=False).drop("text").withColumnRenamed(
        "text_norm", "text"
    )

    # 1. quality gate — relaxed thresholds for the short synthetic docs
    flagged = gopher_quality_flags(docs, min_tokens=10)
    kept = flagged.filter(~F.col("flag_low_quality")).select(
        "doc_id", "text", "lang", "source", "n_chars", "n_tokens"
    )

    # 2. PII scrub (placeholder tokens; counts kept for audit)
    scrubbed = scrub_pii(kept).drop("text").withColumnRenamed("text_clean", "text")

    # 3. within-doc repetition removal (zero-shuffle narrow pass)
    span_clean = dedup_spans_within_doc(scrubbed, span_tokens=2).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    meta = scrubbed.select("doc_id", "lang", "source", "n_tokens")
    docs2 = span_clean.join(meta, "doc_id")

    # 4. inter-doc boilerplate spans
    bp = remove_boilerplate_spans(docs2, span_tokens=8, min_docs=2).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    docs3 = bp.join(meta.drop("n_tokens"), "doc_id")

    # RE-COUNT after every text-mutating step: trim bands, mixture
    # budgets, and shard weights must describe the text that SHIPS, not
    # the ingest-time counts (scrub/span/boilerplate all shrank it)
    from sparkplug_spark.functions.text import tokens

    docs3 = docs3.withColumn("n_tokens", F.size(tokens(F.col("text"))))

    # 4b. winsor the length outliers per source (exact rank tier; use
    # mode="approx" when the table is ungrouped at scale)
    docs3 = trim_by_quantile(
        docs3, "n_tokens", lo=0.02, hi=0.98, by=("source",), id_col="doc_id"
    )

    # 5+6. exact dedup then near-dup clusters -> keep best per cluster
    exact = dedup_exact(docs3, text_col="text", id_col="doc_id")
    pairs = minhash_lsh_pairs(exact, threshold=0.6)
    best = dedup_keep_best(exact, pairs, quality=F.col("n_tokens"))

    # 7. decontamination: exact n-gram overlap OR fuzzy near-match
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    exact_flags = decontaminate(best, eval_set, n=5).select(
        "doc_id", "contaminated"
    )
    fuzzy_flags = decontaminate_fuzzy(best, eval_set, min_est_jaccard=0.5).select(
        "doc_id", "fuzzy_contaminated"
    )
    clean = (
        best.join(exact_flags, "doc_id")
        .join(fuzzy_flags, "doc_id")
        .filter(~F.col("contaminated") & ~F.col("fuzzy_contaminated"))
        .drop("contaminated", "fuzzy_contaminated")
    )

    # 7b. leak-safe train/val/test: the split coin is keyed on the
    # near-dup GROUP id, so the cluster a kept doc represents can never
    # have members on both sides of the train/test boundary
    groups = near_dup_groups(pairs).withColumnRenamed("id", "doc_id")
    clean = assign_splits(
        clean.join(groups.withColumnRenamed("group_id", "dup_group"),
                   "doc_id", "left"),
        salt="release1", group_col="dup_group",
    ).drop("dup_group")
    train = clean.filter(F.col("split") == "train")

    # 8. mixture: audit actual-vs-target shares, then budgeted take
    mixture_report(train, {"src0": 0.6, "src1": 0.4},
                   weight_col="n_tokens").orderBy("source").show(5)
    mixed = sample_to_token_budget(
        train, {"src0": 3000, "src1": 1500}, key_col="source",
        weight_col="n_tokens", default_budget=800,
    )

    # 9. fractional-epoch upsampling of the scarcest source
    epochs = oversample_by_key(mixed, "source", {"src1": 2.0})

    # 10. weight-targeted shards + manifest
    manifest = write_sharded(
        epochs.withColumn(
            # copies must shard as distinct rows -> composite id
            "pack_id", F.concat_ws("#", "doc_id", "copy_idx")
        ),
        "/tmp/sparkplug_demo_shards",
        target_weight=2000,
        weight_col="n_tokens",
        id_col="pack_id",
        num_groups=4,
    )

    print(f"input docs:        {n0}")
    print(f"after quality:     {kept.count()}")
    print(f"after dedup:       {best.count()}")
    print(f"after decontam:    {clean.count()}")
    print(f"after mixture:     {mixed.count()}")
    print(f"rows to pack:      {epochs.count()}")
    manifest.orderBy("shard").show(20, truncate=False)

    # 10b. dataloader blocks: budgeted md5-ordered concatenation (the
    # aggregation state per block is bounded by the budget, not key skew)
    blocks = build_training_blocks(
        epochs.withColumn("pack_id", F.concat_ws("#", "doc_id", "copy_idx")),
        budget=2000, weight_col="n_tokens", id_col="pack_id", num_groups=4,
    )
    blocks.select("pack_group", "shard_id", "n_docs", "block_weight").show(5)

    # 11. release audit: the digest that pins EXACTLY what shipped — any
    # re-run, replica, or engine migration must reproduce these 4 numbers
    shipped = spark.read.parquet("/tmp/sparkplug_demo_shards")
    dataset_fingerprint(shipped, id_col="pack_id").show(truncate=False)

    # 12. targeted audit: "what are the top shipped docs about X?"
    keyword_search(
        shipped, {"audit": ["table", "join"]}, k=5, id_col="pack_id"
    ).show(truncate=False)


if __name__ == "__main__":
    main()
