"""E137 pairwise Jensen-Shannon source divergence: identical slices at
zero, disjoint slices at ln 2, symmetry within quantization, all pairs."""

import math

from sparkplug_spark.operators import source_divergence

LN2_NANO = math.floor(0.5 * math.log(2.0) * 1e9 + 0.5) * 2


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    return {
        (r["source_a"], r["source_b"]): r
        for r in source_divergence(df).collect()
    }


class TestSourceDivergence:
    def test_identical_distributions_zero(self, spark):
        rows = [(1, "a b c a", "s1"), (2, "a b c a", "s2")]
        out = _run(spark, rows)
        assert out[("s1", "s2")]["js_nanonats"] == 0

    def test_disjoint_distributions_ln2(self, spark):
        rows = [(1, "a b c", "s1"), (2, "x y z", "s2")]
        out = _run(spark, rows)
        # JS of disjoint supports = ln 2; two remainder terms of ½·1·ln2
        assert out[("s1", "s2")]["js_nanonats"] == LN2_NANO
        assert out[("s1", "s2")]["n_tokens_union"] == 6

    def test_ordering_between_overlap_levels(self, spark):
        rows = [
            (1, "a b c d", "base"),
            (2, "a b c d", "same"),
            (3, "a b x y", "half"),
            (4, "p q r s", "none"),
        ]
        out = _run(spark, rows)
        js = lambda x, y: out[tuple(sorted((x, y)))]["js_nanonats"]
        assert js("base", "same") == 0
        assert 0 < js("base", "half") < js("base", "none") == LN2_NANO

    def test_all_pairs_present(self, spark):
        rows = [(i, "w%d" % (i % 3), "s%d" % (i % 4)) for i in range(12)]
        out = _run(spark, rows)
        assert len(out) == 6  # C(4,2)
        assert all(a < b for a, b in out)
