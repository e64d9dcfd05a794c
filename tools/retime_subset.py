"""Re-time a subset of bench queries solo (min-of-N warm) for regression
triage.  Usage: python tools/retime_subset.py q1 q2 ... [--passes N]

Mirrors bench.py's harness (noop sink, cache clear + GC between passes)
but only for the named queries, so an A/B against a code change takes
seconds instead of the full 200-query suite.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    for a in sys.argv[1:]:
        if a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sparkplug-retime")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    warm = spark.range(100_000).select(F.md5(F.col("id").cast("string")).alias("h"))
    warm.write.format("noop").mode("overwrite").save()

    qs = entry.queries()
    timings: dict[str, float] = {}
    for name in args:
        fn = qs[name]
        best = None
        for _ in range(passes):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in jmap.keySet().toArray():
                jmap.get(rid).unpersist(False)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(best, 4)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
