"""E141 Gopher repetition report: hand-computed ppm fractions for lines,
top n-gram coverage, duplicated 5-gram coverage; cap and edge cases."""

from sparkplug_spark.operators import repetition_report


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _row(spark, text):
    return repetition_report(_docs(spark, [text])).collect()[0]


class TestRepetitionReport:
    def test_duplicate_lines(self, spark):
        # 4 lines, "same line" twice -> 3 distinct; dup chars = 9 of 9+9+1+2
        r = _row(spark, "same line\nsame line\na\nbb")
        assert r["n_lines"] == 4
        assert r["dup_line_frac_ppm"] == (4 - 3) * 1_000_000 // 4
        assert r["dup_line_char_frac_ppm"] == 9 * 1_000_000 // 21

    def test_no_duplicate_lines(self, spark):
        r = _row(spark, "alpha\nbeta")
        assert r["n_lines"] == 2
        assert r["dup_line_frac_ppm"] == 0
        assert r["dup_line_char_frac_ppm"] == 0

    def test_top_2gram_coverage(self, spark):
        # tokens: ab cd ab cd ab -> tchars 10; top 2-gram "ab cd" count 2,
        # token chars 4 -> cov 8
        r = _row(spark, "ab cd ab cd ab")
        assert r["top_2gram_char_frac_ppm"] == 8 * 1_000_000 // 10

    def test_top_gram_tie_breaks_lexicographically(self, spark):
        # "b a b" and "a b a": counts equal; smallest gram chosen in both
        # engines -- only determinism matters, value must be stable
        r1 = _row(spark, "b a b a b a")
        r2 = _row(spark, "b a b a b a")
        assert r1["top_2gram_char_frac_ppm"] == r2["top_2gram_char_frac_ppm"]

    def test_dup_5gram_coverage_and_cap(self, spark):
        # "a a a a a a" -> 5-grams: 2 occurrences of "a a a a a" (cov
        # 2*5=10 > tchars 6) -> capped at 1e6
        r = _row(spark, "a a a a a a")
        assert r["dup_5gram_char_frac_ppm"] == 1_000_000

    def test_short_docs_zero(self, spark):
        r = _row(spark, "onlyfourchars")
        assert r["top_2gram_char_frac_ppm"] == 0
        assert r["dup_5gram_char_frac_ppm"] == 0
        r2 = _row(spark, "")
        assert r2["n_lines"] == 0
        assert r2["dup_line_frac_ppm"] == 0
