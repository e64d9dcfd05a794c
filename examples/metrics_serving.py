"""Operational metrics serving — the continuous-aggregate flow end to end.

A 100 TB event table can't serve dashboards by rescanning raw data.  The
standing fix: (1) pre-flight the dimension columns (are they trustworthy
group-by keys?), (2) materialize a day-bucketed rollup store of mergeable
integer stats, (3) fold each day's increment in by rewriting ONLY the
touched day partitions, (4) serve any grain (day/week/month) from the
store alone, (5) keep a streaming tier folding micro-batches into the
same store shape for the freshest slice.

Run:  python examples/metrics_serving.py
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from sparkplug_spark.operators import (
    build_rollup_store,
    categorical_profile,
    fd_audit,
    refresh_rollup,
    rollup_query,
)
from sparkplug_spark.streaming import _merge_rollup_batch


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    events = spark.read.parquet(f"{sf}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    store = "/tmp/sparkplug_metrics_store"
    shutil.rmtree(store, ignore_errors=True)

    # ---- pre-flight: is event_type a trustworthy dimension? ------------
    print("== categorical profile (dimension pre-flight) ==")
    categorical_profile(events, ["event_type"]).show(truncate=False)
    print("== functional-dependency audit ==")
    fd_audit(events, [("event_id", "event_type")]).show(truncate=False)

    # ---- day 0: materialize the store ----------------------------------
    first = events.filter(F.col("event_id") % 4 < 2)
    build_rollup_store(first, f"{store}/rollup")

    # ---- later days: incremental refresh, touched partitions only ------
    for k in (2, 3):
        inc = events.filter(F.col("event_id") % 4 == k)
        days = refresh_rollup(spark, inc, f"{store}/rollup")
        print(f"refresh #{k - 1}: rewrote {days} day partitions")

    # ---- serve any grain from the store alone --------------------------
    print("== monthly serving (store only, raw events never rescanned) ==")
    rollup_query(spark, f"{store}/rollup", grain="month").orderBy(
        "grain_start", "agg_key"
    ).show(8, truncate=False)

    # ---- streaming tier: micro-batches fold into the same shape --------
    sstore = f"{store}/stream_rollup"
    for i, frac in enumerate((0, 1)):
        batch = events.filter(F.col("event_id") % 2 == frac).limit(500)
        _merge_rollup_batch(batch, i, sstore, "ts", "event_type", "value")
    print("== streaming-tier store, weekly grain ==")
    rollup_query(spark, sstore, grain="week").orderBy(
        "grain_start", "agg_key"
    ).show(8, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
