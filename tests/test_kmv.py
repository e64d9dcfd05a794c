"""KMV bottom-k sketches: merge-of-shards == sketch-of-whole, exactness
below k, estimator accuracy within the published RSE band, and pairwise
Jaccard sanity against exact set overlap."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    kmv_distinct,
    kmv_jaccard_pairs,
    kmv_merge,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # two groups with a controlled overlap: g1 = 0..2999, g2 = 2000..5999
    rows = [("g1", i) for i in range(3000)] + [
        ("g2", i) for i in range(2000, 6000)
    ]
    return spark.createDataFrame(rows, "src string, k long")


def _hashes(df):
    return sorted(
        (r["src"], r["kmv_hash"])
        for r in df.select("src", "kmv_hash").collect()
    )


class TestKmvSketch:
    def test_merge_of_shards_equals_whole(self, spark, keyed):
        whole = kmv_sketch(keyed, key="k", by=("src",), k=128)
        s1 = kmv_sketch(keyed.filter(F.col("k") % 2 == 0), "k", ("src",), 128)
        s2 = kmv_sketch(keyed.filter(F.col("k") % 2 == 1), "k", ("src",), 128)
        merged = kmv_merge(s1.unionByName(s2), by=("src",), k=128)
        assert _hashes(merged) == _hashes(whole)

    def test_exact_below_k(self, spark):
        small = spark.createDataFrame(
            [("s", i % 40) for i in range(500)], "src string, k long"
        )
        rep = kmv_distinct(kmv_sketch(small, "k", ("src",), k=256), ("src",), 256)
        r = rep.collect()[0]
        assert r["n_hashes"] == 40 and r["est_distinct"] == 40

    def test_estimate_within_rse_band(self, keyed):
        rep = kmv_distinct(
            kmv_sketch(keyed, "k", ("src",), k=256), ("src",), 256
        ).collect()
        truth = {"g1": 3000, "g2": 4000}
        for r in rep:
            rel = abs(r["est_distinct"] - truth[r["src"]]) / truth[r["src"]]
            assert rel < 0.25, (r["src"], r["est_distinct"])  # 4x RSE(k=256)

    def test_jaccard_tracks_exact_overlap(self, keyed):
        sk = kmv_sketch(keyed, "k", ("src",), k=256)
        rep = kmv_jaccard_pairs(sk, "src", k=256).collect()
        assert len(rep) == 1
        r = rep[0]
        # exact: |∩|=1000, |∪|=6000 → J = 1/6
        assert abs(r["jaccard_ppm"] / 1e6 - 1 / 6) < 0.08
        assert abs(r["union_est"] - 6000) / 6000 < 0.25
        assert r["n_merged"] == 256 and 0 < r["n_common"] <= 256
        assert r["intersection_est"] < r["union_est"]

    def test_null_keys_excluded_and_k_guard(self, spark, keyed):
        withnull = keyed.unionByName(
            spark.createDataFrame([("g1", None)], "src string, k long")
        )
        a = _hashes(kmv_sketch(keyed, "k", ("src",), 64))
        b = _hashes(kmv_sketch(withnull, "k", ("src",), 64))
        assert a == b
        with pytest.raises(ValueError, match="k must be"):
            kmv_sketch(keyed, "k", ("src",), k=2)

    def test_partitioning_invariant(self, spark, keyed):
        a = _hashes(kmv_sketch(keyed, "k", ("src",), 128))
        b = _hashes(kmv_sketch(keyed.repartition(13), "k", ("src",), 128))
        assert a == b
