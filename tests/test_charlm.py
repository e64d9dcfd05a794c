"""E139 char-trigram LM quality scores: hand-checked Laplace ppm,
context-count semantics, separate-reference training, short-doc drop."""

from sparkplug_spark.operators import charlm_scores


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestCharlmScores:
    def test_hand_computed_self_scoring(self, spark):
        # corpus "abab": trigrams aba, bab (1 each); contexts ab, ba
        # (1 each); V = |{a, b}| = 2 -> each position (1+1)*1e6//(1+2)
        rows = charlm_scores(_docs(spark, ["abab", "ab"])).collect()
        assert len(rows) == 1  # "ab" has no trigram -> dropped
        r = rows[0]
        assert r["doc_id"] == 0
        assert r["n_trigrams"] == 2
        assert r["sum_prob_ppm"] == 2 * ((1 + 1) * 1_000_000 // (1 + 2))
        assert r["avg_prob_ppm"] == r["sum_prob_ppm"] / 2

    def test_context_counts_are_trigram_prefixes(self, spark):
        # "abc": context "bc" occurs as a bigram but never as a trigram
        # prefix -> it must NOT appear in C2; the one position scores
        # against C2("ab")=1, V=|{c}|=1
        rows = charlm_scores(_docs(spark, ["abc"])).collect()
        assert rows[0]["sum_prob_ppm"] == (1 + 1) * 1_000_000 // (1 + 1)

    def test_separate_reference_corpus(self, spark):
        # LM trained on "aaa" (C3(aaa)=1, C2(aa)=1, V={a}=1); scoring
        # "aab": trigram unseen (c3=0), context aa seen (c2=1)
        out = charlm_scores(
            _docs(spark, ["aab"]), train_df=_docs(spark, ["aaa"])
        ).collect()
        assert out[0]["sum_prob_ppm"] == (0 + 1) * 1_000_000 // (1 + 1)

    def test_repetitive_text_scores_higher_than_unique(self, spark):
        # the quality signal: repeated structure -> high in-context
        # probability; all-distinct trigrams -> low
        texts = ["abcabcabcabcabc", "qwertyuiopasdfg"]
        rows = {
            r["doc_id"]: r["avg_prob_ppm"]
            for r in charlm_scores(_docs(spark, texts)).collect()
        }
        assert rows[0] > rows[1]

    def test_probabilities_bounded(self, spark):
        rows = charlm_scores(
            _docs(spark, ["hello world hello", "zzzyyy", "xy"])
        ).collect()
        for r in rows:
            assert 0 < r["avg_prob_ppm"] <= 1_000_000
