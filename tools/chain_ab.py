"""A/B harness for rank-loop chain depth (r11).  HISTORICAL NOTE: the
chaining machinery this sweeps (graphs._RANK_CHAIN) was measured with
this tool and REMOVED — every depth lost or tied against one
observe-riding checkpoint per iteration (see the module note above
_SCC_CHAIN in operators/graphs.py for the numbers).  The tool is kept
as the measurement record and re-enables automatically if the
machinery is ever reintroduced; with the machinery absent, setting
graphs._RANK_CHAIN is a no-op and every depth measures the same code
(still useful as a repeat-timing harness with result fingerprints).

For each depth: run the given queries (noop sink, min-of-N warm
passes), record wall + job/stage counts, and verify the RESULT is
bit-identical across depths (order-insensitive row fingerprint — the
chain must be pure scheduling, never arithmetic).

Usage: python tools/chain_ab.py [q ...] [--depths=1,2,3] [--passes=3]
Run SOLO (same contention rule as bench.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "hits_exact",
        "hits_incremental",
        "pagerank_incremental",
    ]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    depths = [int(d) for d in opts.get("depths", "1,2,3").split(",")]
    passes = int(opts.get("passes", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as entry
    from sparkplug_spark.operators import graphs

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sparkplug-chain-ab")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.range(100_000).select(F.md5(F.col("id").cast("string")).alias("h"))
    warm.write.format("noop").mode("overwrite").save()

    def _fingerprint(df):
        cols = [F.col(c).cast("string") for c in sorted(df.columns)]
        row_md5 = F.md5(F.concat_ws("\x1f", *cols))
        r = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.conv(F.substring(row_md5, 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
        ).first()
        return (r["n"], str(r["s"]))

    def _cleanup():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in jmap.keySet().toArray():
            jmap.get(rid).unpersist(False)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    qmap = entry.queries()
    tracker = spark.sparkContext.statusTracker()
    fps: dict[str, dict[int, tuple]] = {q: {} for q in args}
    for q in args:
        fn = qmap[q]
        for d in depths:
            graphs._RANK_CHAIN = d
            best, jobs = None, None
            for p in range(passes):
                j0 = set(tracker.getJobIdsForGroup(None))
                spark.sparkContext.setJobDescription(f"chainab:{q}:d{d}:p{p}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if p == passes - 1:
                    fps[q][d] = _fingerprint(df)
                jobs = len(set(tracker.getJobIdsForGroup(None)) - j0)
                best = dt if best is None else min(best, dt)
                _cleanup()
            print(f"{q} depth={d} best={best:.3f}s jobs={jobs}", flush=True)
        ref = fps[q][depths[0]]
        for d in depths[1:]:
            tag = "IDENTICAL" if fps[q][d] == ref else "MISMATCH!!!"
            print(f"{q} depth={depths[0]} vs depth={d}: {tag} {ref} {fps[q][d]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
