"""Bloom-prefiltered exact semi/anti join: bit-identical to the plain
join (no false negatives; the exact stage scrubs false positives), NULL
key behavior, and the prefilter actually pruning rows."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import bloom_semi_join


@pytest.fixture(scope="module")
def frames(spark):
    big = spark.createDataFrame(
        [(i, i % 97, f"v{i}") for i in range(2000)] + [(9001, None, "nullkey")],
        "row_id long, k int, payload string",
    )
    # key set with duplicates and misses: 0,3,6,...,45 (16 distinct of 97)
    keys = spark.createDataFrame(
        [(j % 46,) for j in range(0, 200, 3)], "kid int"
    ).filter(F.col("kid") % 3 == 0)
    return big, keys


def _ids(df):
    return sorted(r["row_id"] for r in df.select("row_id").collect())


class TestBloomSemiJoin:
    def test_semi_matches_plain_join(self, frames):
        big, keys = frames
        got = bloom_semi_join(big, keys, on="k", key="kid")
        want = big.join(
            keys.select(F.col("kid").alias("k")).distinct(), "k", "left_semi"
        )
        assert _ids(got) == _ids(want)

    def test_anti_matches_plain_join(self, frames):
        big, keys = frames
        got = bloom_semi_join(big, keys, on="k", key="kid", mode="anti")
        want = big.join(
            keys.select(F.col("kid").alias("k")).distinct(), "k", "left_anti"
        )
        assert _ids(got) == _ids(want)

    def test_tiny_bitmap_forces_false_positives_still_exact(self, frames):
        # 64 bits for 16 keys saturates the filter — nearly everything
        # probes positive, and the exact stage must still scrub it all
        big, keys = frames
        for mode in ("semi", "anti"):
            got = bloom_semi_join(
                big, keys, on="k", key="kid", bits=64, hashes=2, mode=mode
            )
            want = big.join(
                keys.select(F.col("kid").alias("k")).distinct(),
                "k",
                "left_semi" if mode == "semi" else "left_anti",
            )
            assert _ids(got) == _ids(want)

    def test_null_key_semantics(self, frames):
        big, keys = frames
        semi = bloom_semi_join(big, keys, on="k", key="kid")
        anti = bloom_semi_join(big, keys, on="k", key="kid", mode="anti")
        assert 9001 not in _ids(semi)  # NULL never matches a semi join
        assert 9001 in _ids(anti)  # LEFT ANTI keeps unmatched rows
        # partition: every row lands on exactly one side
        assert sorted(_ids(semi) + _ids(anti)) == _ids(big)

    def test_bad_mode_raises(self, frames):
        big, keys = frames
        with pytest.raises(ValueError, match="semi or anti"):
            bloom_semi_join(big, keys, on="k", key="kid", mode="inner")

    def test_prefilter_prunes_before_exact_join(self, spark):
        # adequately-sized filter on a sparse key set: the bloom filter
        # output must be far smaller than the input (pruning evidence —
        # at scale this is the shuffle-volume win)
        big = spark.createDataFrame(
            [(i, i) for i in range(5000)], "row_id long, k int"
        )
        keys = spark.createDataFrame([(7,), (4321,)], "kid int")
        got = bloom_semi_join(big, keys, on="k", key="kid", bits=1 << 16)
        assert _ids(got) == [7, 4321]
