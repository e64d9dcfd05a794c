"""Audience analytics from portable sketches — the round-5 KMV flow.

Exact distinct-user math at 100 TB multiplies shuffles (rolling windows
explode pairs × w; pairwise overlaps rescan the corpus per pair).  The
sketch flow does the raw-volume work ONCE: (1) fold the event stream
into a KMV sketch store (≤ k md5-60 hashes per group — readable by any
engine, estimates oracle-checkable, unlike an HLL binary), (2) serve
distinct counts and every pairwise audience overlap from the store
alone, (3) answer DAU/WAU/MAU either exactly (pair explode) or from
per-day sketches (merge — raw volume never touched again), (4) gate the
pipeline with the FK audit and read the result as-of a past instant.

Run:  python examples/audience_sketches.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import (
    kmv_distinct,
    kmv_jaccard_pairs,
    referential_audit,
    rolling_active_users,
    rolling_active_users_kmv,
    share_shift,
)
from sparkplug_spark.streaming import _merge_kmv_batch

from __spark_entry__ import read_events  # events-ts normalization helper


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    events = read_events(spark, sf)
    store = tempfile.mkdtemp(prefix="audience_kmv_")

    # ---- 1. stream-shaped ingestion: micro-batches fold into the store
    for i in range(3):
        batch = events.filter(F.col("event_id") % 3 == i).select(
            "event_type", F.col("user_id").cast("string").alias("u")
        )
        _merge_kmv_batch(batch, i, f"{store}/sk", "u", ("event_type",), 64)

    sketches = spark.read.parquet(f"{store}/sk").drop("__last_batch")
    print("== distinct users per event type, from the store alone ==")
    kmv_distinct(sketches, by=("event_type",), k=64).orderBy(
        "event_type"
    ).show()

    print("== pairwise audience overlap, store only (no event rescan) ==")
    kmv_jaccard_pairs(sketches, "event_type", k=64).orderBy(
        F.desc("jaccard_ppm")
    ).show(5)

    # ---- 2. DAU/WAU: exact tier vs sketch tier ------------------------
    print("== rolling actives: exact (left) vs KMV estimate (right) ==")
    exact = rolling_active_users(events, windows=(1, 7))
    est = rolling_active_users_kmv(events, windows=(1, 7), k=64)
    exact.join(est, "day_idx").orderBy("day_idx").show(7)

    # ---- 3. which event types are gaining share? ----------------------
    day = F.floor(F.col("ts").cast("long") / F.lit(86400)).cast("long")
    print("== daily mix shift (ppm) ==")
    share_shift(
        events.select("event_type", day.alias("d")), "event_type", "d"
    ).orderBy("key", "period").show(7)

    # ---- 4. trust gate: do event users resolve to known customers? ----
    customers = spark.read.parquet(f"{sf}/customer.parquet")
    print("== FK audit: events.user_id vs customer.c_custkey ==")
    referential_audit(events, customers, "user_id", "c_custkey").show(5)

    shutil.rmtree(store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
