"""A/B the replay harness's shuffle_partitions override across every
streaming_*_replay query in one bench-identical session: monkeypatches
replay_file_stream / replay_foreach_batch to force a partition count,
times each query (min-of-N warm passes), and verifies the RESULT is
bit-identical across counts (order-insensitive row fingerprint) — the
operators' documented contract is partition-count independence, this
proves it per query before any knob lands.

Usage: python tools/replay_ab.py [q ...] [--parts=8,2] [--passes=2]
Run SOLO (same contention rule as bench.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--") and "=" in a
    )
    parts = [int(d) for d in opts.get("parts", "8,2").split(",")]
    passes = int(opts.get("passes", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as entry
    from sparkplug_spark.streaming import replay as rp

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sparkplug-replay-ab")
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

    qmap = entry.queries()
    if not args:
        args = [q for q in qmap if q.startswith("streaming_") and q.endswith("_replay")]

    # force the override: wrap both replay entry points
    orig_file, orig_feb = rp.replay_file_stream, rp.replay_foreach_batch
    forced = {"n": None}

    def file_wrap(spark_, batches, build_query, **kw):
        if forced["n"] is not None:
            kw["shuffle_partitions"] = forced["n"]
        return orig_file(spark_, batches, build_query, **kw)

    def feb_wrap(spark_, batches, attach, **kw):
        if forced["n"] is not None:
            kw["shuffle_partitions"] = forced["n"]
        return orig_feb(spark_, batches, attach, **kw)

    rp.replay_file_stream = file_wrap
    rp.replay_foreach_batch = feb_wrap

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

    for q in args:
        fn = qmap[q]
        fps = {}
        for n in parts:
            forced["n"] = n
            best = None
            for p in range(passes):
                spark.sparkContext.setJobDescription(f"replayab:{q}:n{n}:p{p}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if p == passes - 1:
                    fps[n] = _fingerprint(df)
                best = dt if best is None else min(best, dt)
                _cleanup()
            print(f"{q} parts={n} best={best:.3f}s", flush=True)
        ref = fps[parts[0]]
        for n in parts[1:]:
            tag = "IDENTICAL" if fps[n] == ref else "MISMATCH!!!"
            print(f"{q} parts={parts[0]} vs parts={n}: {tag} {ref} {fps[n]}", flush=True)
    rp.replay_file_stream, rp.replay_foreach_batch = orig_file, orig_feb
    spark.stop()


if __name__ == "__main__":
    main()
