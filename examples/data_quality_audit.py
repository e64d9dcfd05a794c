"""Data-quality audit & repair — the rules-engine's statistical siblings.

The reference's purpose is filling data holes with declared SQL rules;
this flow shows the surrounding quality lifecycle built from the same
repo's operators:

  1. declare invariants      check_expectations  (one-pass violation report)
  2. route bad rows          flag_violations     (zero-shuffle quarantine)
  3. repair                  impute_nulls        (per-group median/mode)
                             + SparkPlug rules   (knowable fixes)
  4. verify the repair       check_expectations again — violations gone
  5. profile the result      column_profile / histogram

Run:  python examples/data_quality_audit.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark import PlugAction, PlugRule, SparkPlug
from sparkplug_spark.operators import (
    Expectation,
    check_expectations,
    column_profile,
    flag_violations,
    impute_nulls,
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

    # a deliberately damaged feed: nulled lengths, negative sizes
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id",
        "source",
        "lang",
        F.when(F.col("doc_id") % 9 == 0, None)
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )

    exps = [
        Expectation("n_chars_present", "not_null", column="n_chars"),
        Expectation("n_chars_positive", "in_range", column="n_chars", lo=1),
        Expectation("doc_id_unique", "unique", column="doc_id"),
        Expectation("source_shape", "matches", column="source", pattern=r"^src\d+$"),
    ]

    print("--- before repair ---")
    check_expectations(docs, exps).show(truncate=False)

    # quarantine routing is a narrow filter, not a second scan pipeline
    flagged = flag_violations(docs, [e for e in exps if e.kind != "unique"])
    quarantined = flagged.filter(F.size("failed_expectations") > 0)
    print("rows quarantined:", quarantined.count())

    # repair: statistical fill for the unknowable, a rule for the knowable
    repaired = impute_nulls(docs, {"n_chars": "median"}, by=("source",))
    rule = PlugRule(
        "default_lang", "v1", "lang is null or lang = ''",
        (PlugAction("lang", "und"),),
    )
    repaired = SparkPlug.builder(spark).create().plug(repaired, [rule])

    print("--- after repair ---")
    check_expectations(repaired, exps).show(truncate=False)

    # alternative: ship the learned fills AS rules — reviewable, versioned
    # artifacts that apply through the same engine and survive the data
    # they were learned from (suggest_fill_rules output == impute_nulls)
    from sparkplug_spark.operators import suggest_fill_rules

    suggested = suggest_fill_rules(docs, {"n_chars": "median"}, by=("source",))
    print("suggested rules (first 3):")
    for r in suggested[:3]:
        print(f"  {r.name}: WHEN {r.condition} SET "
              f"{r.actions[0].key} = {r.actions[0].value}")

    column_profile(repaired, ["n_chars"]).show(truncate=False)

    # 6. drift gate: schema changes between feed drops are caught at
    # metadata level before any row-level check pays for a scan
    from sparkplug_spark.sources import schema_drift

    next_drop = docs.withColumn("crawl_ts", F.lit(0).cast("long")).withColumn(
        "n_chars", F.col("n_chars").cast("int")
    )
    print("schema drift vs next drop:")
    for d in schema_drift(docs, next_drop):
        print(f"  {d['column']}: {d['status']} "
              f"({d['old_type']} -> {d['new_type']})")
    spark.stop()


if __name__ == "__main__":
    main()
