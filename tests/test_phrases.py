"""E131 word2vec phrase mining: exact integer-ppm collocation scores,
delta discount, adjacency (not bag) semantics."""

import pytest

from sparkplug_spark.operators import phrase_scores


class TestPhraseScores:
    def test_fixed_collocation_scores_high(self, spark):
        # "new york" always adjacent; "the" everywhere -> "the new" scores low
        doc = "the new york trip and the new york fair and the new york map"
        df = spark.createDataFrame([(1, doc)] * 2, "doc_id long, text string")
        out = {
            (r["token_a"], r["token_b"]): r
            for r in phrase_scores(df, min_count=2, delta=1).collect()
        }
        ny = out[("new", "york")]
        tn = out[("the", "new")]
        # 14 tokens/doc, 2 docs -> N=28; the/new/york each 3/doc -> 6;
        # both pairs adjacent 3/doc -> 6
        assert ny["n_pair"] == 6 and tn["n_pair"] == 6
        assert ny["score_ppm"] == (5 * 28 * 1_000_000) // 36
        assert tn["score_ppm"] == ny["score_ppm"]

    def test_delta_suppresses_rare_pairs(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b a b"), (2, "x y")], "doc_id long, text string"
        )
        out = {
            (r["token_a"], r["token_b"]): r["score_ppm"]
            for r in phrase_scores(df, min_count=1, delta=1).collect()
        }
        # (x,y) occurs once = delta+0 -> filtered by the delta+1 floor
        assert ("x", "y") not in out
        assert ("a", "b") in out

    def test_adjacency_not_bag(self, spark):
        # "a" and "c" co-occur in every doc but are never adjacent
        df = spark.createDataFrame(
            [(i, "a b c") for i in range(5)], "doc_id long, text string"
        )
        out = {
            (r["token_a"], r["token_b"])
            for r in phrase_scores(df, min_count=2, delta=0).collect()
        }
        assert ("a", "c") not in out
        assert {("a", "b"), ("b", "c")} <= out

    def test_rejects_bad_params(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            phrase_scores(df, min_count=0)
        with pytest.raises(ValueError):
            phrase_scores(df, delta=-1)
