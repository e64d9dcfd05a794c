"""E182 streaming KMV store: the bottom-k fold accumulates across
micro-batches to exactly the one-shot sketch, replayed batch ids are
skipped, and even a forced re-merge is idempotent."""

import time

from pyspark.sql import functions as F

from sparkplug_spark.sources import read_store
from sparkplug_spark.operators import kmv_distinct, kmv_sketch


def _hashes(df):
    return sorted(
        (r["src"], r["kmv_hash"])
        for r in df.select("src", "kmv_hash").collect()
    )


class TestStreamingKmvSketches:
    def test_store_equals_one_shot_sketch(self, spark, tmp_path):
        from sparkplug_spark.streaming import streaming_kmv_sketches

        src = str(tmp_path / "k_src")
        store = str(tmp_path / "k_store")
        rows1 = [("s1", f"k{i}") for i in range(300)]
        rows2 = [("s1", f"k{i}") for i in range(200, 500)] + [
            ("s2", f"x{i}") for i in range(40)
        ]
        spark.createDataFrame(rows1, "src string, k string").coalesce(
            1
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema("src string, k string").parquet(src)

        def run():
            q = (
                streaming_kmv_sketches(stream, store, "k", by=("src",), k=64)
                .trigger(availableNow=True)
                .option("checkpointLocation", str(tmp_path / "k_ck"))
                .start()
            )
            q.awaitTermination(120)

        run()
        time.sleep(1)
        spark.createDataFrame(rows2, "src string, k string").coalesce(
            1
        ).write.mode("append").parquet(src)
        run()
        got = read_store(spark, store).drop("__last_batch")
        whole = kmv_sketch(
            spark.createDataFrame(rows1 + rows2, "src string, k string"),
            key="k",
            by=("src",),
            k=64,
        )
        assert _hashes(got) == _hashes(whole)
        rep = {
            r["src"]: r["est_distinct"]
            for r in kmv_distinct(got, ("src",), 64).collect()
        }
        assert rep["s2"] == 40  # under k: exact tier
        assert abs(rep["s1"] - 500) / 500 < 0.4  # estimator tier

    def test_replayed_batch_id_is_skipped_and_merge_idempotent(
        self, spark, tmp_path
    ):
        from sparkplug_spark.streaming import _merge_kmv_batch

        store = str(tmp_path / "kmv_replay")
        b0 = spark.createDataFrame(
            [("s", f"a{i}") for i in range(50)], "src string, k string"
        )
        b1 = spark.createDataFrame(
            [("s", f"b{i}") for i in range(50)], "src string, k string"
        )
        _merge_kmv_batch(b0, 0, store, "k", ("src",), 32)
        after0 = _hashes(read_store(spark, store))
        # at-least-once replay of batch 0: guard skips it
        _merge_kmv_batch(b0, 0, store, "k", ("src",), 32)
        assert _hashes(read_store(spark, store)) == after0
        _merge_kmv_batch(b1, 1, store, "k", ("src",), 32)
        after1 = _hashes(read_store(spark, store))
        # idempotence beyond the guard: force-merge batch 1 AGAIN under a
        # new id — the bottom-k-of-distinct-union fold must not change
        _merge_kmv_batch(b1, 2, store, "k", ("src",), 32)
        assert _hashes(read_store(spark, store)) == after1


class TestKmvStoreReplayGuard:
    def test_replayed_batch_id_is_skipped(self, spark, tmp_path):
        from sparkplug_spark.sources import read_store
        from sparkplug_spark.streaming import _merge_kmv_batch

        store = str(tmp_path / "kmv_replay")
        b0 = spark.createDataFrame(
            [(f"u{i}",) for i in range(40)], "k string"
        )
        _merge_kmv_batch(b0, 0, store, "k", (), 16)
        first = sorted(
            r["kmv_hash"] for r in read_store(spark, store).collect()
        )
        # redelivery: identical store (fold is idempotent AND guarded)
        _merge_kmv_batch(b0, 0, store, "k", (), 16)
        again = read_store(spark, store)
        assert [r[0] for r in again.select("__last_batch").distinct().collect()] == [0]
        assert sorted(r["kmv_hash"] for r in again.collect()) == first
        # new batch advances the watermark
        b1 = spark.createDataFrame(
            [(f"w{i}",) for i in range(40)], "k string"
        )
        _merge_kmv_batch(b1, 1, store, "k", (), 16)
        assert read_store(spark, store).select("__last_batch").distinct().collect()[0][0] == 1
