"""E149 streaming CMS store: counters accumulate across micro-batches,
estimates stay over-count-only, replayed batch ids are skipped."""

import time

from pyspark.sql import functions as F

from sparkplug_spark.sources import read_store
from sparkplug_spark.operators import cms_estimate


class TestStreamingCmsSketches:
    def test_counters_accumulate_across_batches(self, spark, tmp_path):
        from sparkplug_spark.streaming import streaming_cms_sketches

        src = str(tmp_path / "c_src")
        store = str(tmp_path / "c_store")
        spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 2, "k string"
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("k string").parquet(src)

        def run():
            q = (
                streaming_cms_sketches(stream, store, "k", depth=3, width=128)
                .trigger(availableNow=True)
                .option("checkpointLocation", str(tmp_path / "c_ck"))
                .start()
            )
            q.awaitTermination(120)

        run()
        time.sleep(1)
        spark.createDataFrame(
            [("a",)] * 4 + [("c",)] * 7, "k string"
        ).coalesce(1).write.mode("append").parquet(src)
        run()
        sk = read_store(spark, store).drop("__last_batch")
        keys = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
        est = {
            r["k"]: r["cms_est"]
            for r in cms_estimate(sk, keys, "k", depth=3, width=128).collect()
        }
        # wide sketch, 3 keys: exact
        assert est == {"a": 9, "b": 2, "c": 7}

    def test_replayed_batch_id_is_skipped(self, spark, tmp_path):
        from sparkplug_spark.streaming import _merge_cms_batch

        store = str(tmp_path / "cms_replay")
        b0 = spark.createDataFrame([("a",)] * 3, "k string")
        _merge_cms_batch(b0, 0, store, "k", 3, 64)
        total = read_store(spark, store).agg(F.sum("cnt")).collect()[0][0]
        assert total == 3 * 3  # depth rows per key occurrence
        # at-least-once redelivery of batch 0 must be a no-op
        _merge_cms_batch(b0, 0, store, "k", 3, 64)
        total2 = read_store(spark, store).agg(F.sum("cnt")).collect()[0][0]
        assert total2 == total
        # a NEW batch id merges
        _merge_cms_batch(b0, 1, store, "k", 3, 64)
        total3 = read_store(spark, store).agg(F.sum("cnt")).collect()[0][0]
        assert total3 == 2 * total
