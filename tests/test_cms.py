"""E145 Count-Min sketch: over-count-only guarantee, mergeability by
counter addition, bounded size, unseen keys."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import build_cms_sketch, cms_estimate


def _stream(spark, items):
    return spark.createDataFrame([(x,) for x in items], "k string")


class TestCountMinSketch:
    def test_estimates_never_undercount(self, spark):
        items = ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + [f"x{i}" for i in range(200)]
        df = _stream(spark, items)
        sk = build_cms_sketch(df, "k", depth=4, width=32)  # narrow -> collisions
        true = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
        est = {
            r["k"]: r["cms_est"]
            for r in cms_estimate(sk, df.select("k").distinct(), "k", depth=4, width=32).collect()
        }
        assert est.keys() == true.keys()
        for k, t in true.items():
            assert est[k] >= t

    def test_wide_sketch_is_exact_here(self, spark):
        items = ["a"] * 7 + ["b"] * 3 + ["c"]
        df = _stream(spark, items)
        sk = build_cms_sketch(df, "k", depth=4, width=4096)
        est = {
            r["k"]: r["cms_est"]
            for r in cms_estimate(sk, df.select("k").distinct(), "k",
                                  depth=4, width=4096).collect()
        }
        assert est == {"a": 7, "b": 3, "c": 1}

    def test_merge_by_counter_addition(self, spark):
        h1, h2 = ["a"] * 5 + ["b"], ["a"] * 2 + ["c"] * 4
        merged = (
            build_cms_sketch(_stream(spark, h1), "k", depth=3, width=64)
            .unionAll(build_cms_sketch(_stream(spark, h2), "k", depth=3, width=64))
            .groupBy("row", "col")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        whole = build_cms_sketch(_stream(spark, h1 + h2), "k", depth=3, width=64)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_sketch_size_bounded(self, spark):
        df = _stream(spark, [f"k{i}" for i in range(1000)])
        sk = build_cms_sketch(df, "k", depth=4, width=64)
        assert sk.count() <= 4 * 64

    def test_unseen_key_reads_collision_mass_only(self, spark):
        df = _stream(spark, ["a"] * 10)
        sk = build_cms_sketch(df, "k", depth=4, width=4096)
        est = cms_estimate(
            sk, _stream(spark, ["never-seen"]), "k", depth=4, width=4096
        ).collect()[0]["cms_est"]
        assert est == 0  # wide sketch: no collision with the single key

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            build_cms_sketch(_stream(spark, ["a"]), "k", depth=0)
