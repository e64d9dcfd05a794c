"""Product analytics — journeys, experiments, and the co-purchase graph.

The event-log analytics layer end to end, on the same operators the query
suite checks one by one:

  1. how users move        event_transitions   (Markov table, exact ppm)
  2. what journeys look like  session_paths    (gap sessions -> top paths)
  3. did the change work   ab_test_report      (exact integer components)
  4. who buys what together   basket_pairs     (support + lift, guarded)
  5. which items are central  pagerank         (checkpointed power iteration)
  6. how many distinct users  build/rollup_distinct_sketches
                              (mergeable HLL — rollups never rescan raw)
  7. who are the customers    rfm_scores          (exact global-rank tiles)
  8. did they convert in time funnel_counts(within_seconds=)
  9. what carries the volume  pareto_report       (vital-few, exact ppm)

Every step is DataFrame-declarative: one user-key shuffle feeds both the
transition and the path analyses, the experiment readout is a single
map-side-combined aggregate, and the sketch table answers every coarser
distinct-count question by unioning kilobyte sketches.

Run:  python examples/product_analytics.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import (
    ab_test_report,
    basket_pairs,
    build_distinct_sketches,
    event_transitions,
    funnel_counts,
    pagerank,
    pareto_report,
    rfm_scores,
    rollup_distinct_sketches,
    session_paths,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __spark_entry__ import read_events  # timestamp-storage-tolerant reader

    events = read_events(spark, SF_DIR)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    # 1. Markov transition table: where does traffic flow next?
    print("== event transitions (top by probability) ==")
    trans = event_transitions(events)
    trans.orderBy(F.desc("p_ppm")).show(5, truncate=False)

    # 2. Session journeys: the most common multi-step paths
    print("== top multi-step session paths ==")
    paths = session_paths(events, gap_seconds=1800, max_steps=8, min_sessions=3)
    paths.filter(F.col("path").contains(">")).orderBy(
        F.desc("n_sessions"), "path"
    ).show(5, truncate=False)

    # 3. Experiment readout: order priority as the arm, price as the metric
    print("== A/B readout vs 1-URGENT (exact integer components) ==")
    ab_test_report(
        orders,
        variant_col="o_orderpriority",
        metric_col="o_totalprice",
        control="1-URGENT",
    ).orderBy("variant").show(truncate=False)

    # 4 + 5. Co-purchase graph -> central items
    print("== co-purchase pairs by lift, then PageRank centrality ==")
    pairs = basket_pairs(lineitem, "l_orderkey", "l_partkey", min_count=2)
    pairs.orderBy(F.desc("n_baskets"), "item_a").show(5)
    edges = pairs.selectExpr("item_a AS src", "item_b AS dst").unionAll(
        pairs.selectExpr("item_b AS src", "item_a AS dst")
    )
    ranks = pagerank(edges, iterations=8)
    ranks.orderBy(F.desc("rank")).show(5)

    # 6. Distinct-user sketch table: build daily, roll up per type AND total
    #    — two different grains from ONE pass over the raw log
    print("== HLL sketch rollups (daily sketches, merged upward) ==")
    daily = build_distinct_sketches(
        events.withColumn("day", F.to_date("ts")),
        ["event_type", "day"],
        "user_id",
    ).persist()
    rollup_distinct_sketches(daily, ["event_type"]).orderBy("event_type").show()
    rollup_distinct_sketches(daily, []).show()
    daily.unpersist()

    # 7. RFM segments: quantile scores from range-distributed exact ranks
    print("== RFM top segments ==")
    rfm = rfm_scores(events, asof="2026-01-01 00:00:00")
    rfm.groupBy("segment").count().orderBy(F.desc("count")).show(5)

    # 8. Timeout funnel: conversion must land within a day of each step
    print("== 24h-window funnel ==")
    funnel_counts(
        events, ["view", "click", "purchase"], within_seconds=86400
    ).show()

    # 9. Volume concentration: which parts carry 80% of shipped quantity
    print("== Pareto vital few ==")
    par = pareto_report(lineitem, "l_partkey", weight_col="l_quantity")
    par.groupBy("is_vital").agg(
        F.count("*").alias("n_parts"), F.sum("volume").alias("quantity")
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
