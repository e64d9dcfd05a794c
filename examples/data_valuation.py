"""Data-centric debugging — who is hurting the model, and what to fix.

The round-5 valuation flow on a corpus with a KNOWN defect: three
annotation vendors label the same two text dialects, and one vendor's
labels are inverted.  (1) leave-one-out source valuation — held-out NB
accuracy if each vendor were removed, all 1+|sources| models derived
arithmetically from ONE counting pass; (2) the label-noise queue — the
individual examples the trained model confidently argues against;
(3) the remediation readout straight from the LOO report.

Run:  python examples/data_valuation.py
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import label_noise_report, source_influence


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # two separable dialects; vendor_c's labels are inverted, and
    # vendor_a slips in a handful of one-off mistakes
    random.seed(42)
    pos_words = "alpha beta gamma delta".split()
    neg_words = "zork quux blarg fnord".split()

    def doc(words):
        return " ".join(random.choice(words) for _ in range(12))

    rows, did = [], 0
    # vendor_c ships the most volume AND inverted labels — the classic
    # "big cheap vendor" failure a valuation pass exists to catch
    for vendor, n, invert in (
        ("vendor_a", 80, False),
        ("vendor_b", 80, False),
        ("vendor_c", 300, True),
    ):
        for i in range(n):
            en = i % 2 == 0
            label = ("en" if en else "xx") if not invert else ("xx" if en else "en")
            rows.append((did, doc(pos_words if en else neg_words), label, vendor))
            did += 1
    # a few isolated vendor_a mistakes (mislabeled, not systematic)
    for _ in range(4):
        rows.append((did, doc(neg_words), "en", "vendor_a"))
        did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    train = df.filter(F.col("doc_id") % 5 != 0)
    eval_df = df.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("source") != "vendor_c")
    )

    print("== 1. leave-one-out vendor valuation (positive delta = removing HELPS) ==")
    rep = source_influence(train, eval_df)
    rep.orderBy(F.desc("delta_ppm")).show()

    # NOTE the inversion below: with a poisoned MAJORITY, the trained
    # model sides with the poison, so the noise queue flags the CLEAN
    # vendors' (correct) labels.  The per-example screen reflects the
    # model's majority view; only the leave-one-out valuation above
    # attributes the systematic defect to its source — use both.
    print("== 2. label-noise queue: who supplied the flagged examples? ==")
    noise = label_noise_report(train)
    (
        noise.filter(F.col("flag_noise"))
        .join(train.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .count()
        .orderBy(F.desc("count"))
        .show()
    )

    print("== 3. remediation readout ==")
    worst = rep.filter(F.col("source") != "__full__").orderBy(
        F.desc("delta_ppm")
    ).first()
    full = rep.filter(F.col("source") == "__full__").first()
    print(
        f"   drop {worst['source']}: held-out accuracy "
        f"{full['accuracy_ppm'] / 1e4:.1f}% -> "
        f"{worst['accuracy_ppm'] / 1e4:.1f}% "
        f"({worst['delta_ppm'] / 1e4:+.1f} points, "
        f"{worst['n_removed_docs']} docs removed)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
