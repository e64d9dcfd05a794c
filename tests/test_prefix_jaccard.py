"""E144 prefix-filtered exact Jaccard pairs: brute-force twin (no cap),
threshold edges, and equivalence with the capped tier when the cap is
inactive."""

from itertools import combinations

from sparkplug_spark.functions.text import norm_tokens_py
from sparkplug_spark.operators import jaccard_ngram_pairs, jaccard_prefix_pairs


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute(texts, n, t):
    def sh(text):
        toks = norm_tokens_py(text)
        if len(toks) <= n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = [sh(x) for x in texts]
    out = set()
    for a, b in combinations(range(len(texts)), 2):
        i = len(sets[a] & sets[b])
        if i and i / (len(sets[a]) + len(sets[b]) - i) >= t:
            out.add((a, b))
    return out


class TestJaccardPrefixPairs:
    def test_brute_force_twin(self, spark):
        texts = [
            "the quick brown fox jumps over the lazy dog tonight",
            "the quick brown fox jumps over the lazy dog today",
            "a completely different document about spark joins",
            "a completely different document about spark joins",
            "the quick brown fox jumps over a sleepy dog tonight",
            "short one",
            "short one",
        ]
        got = {
            (r["id_a"], r["id_b"])
            for r in jaccard_prefix_pairs(
                _docs(spark, texts), n=3, threshold=0.5
            ).collect()
        }
        assert got == _brute(texts, 3, 0.5)

    def test_matches_capped_tier_when_cap_inactive(self, spark):
        texts = [
            f"doc number {i} shares a common frame with neighbours {i % 3}"
            for i in range(12)
        ]
        prefix = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in jaccard_prefix_pairs(
                _docs(spark, texts), n=3, threshold=0.4
            ).collect()
        }
        capped = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in jaccard_ngram_pairs(
                _docs(spark, texts), n=3, threshold=0.4, max_key_freq=10_000
            ).collect()
        }
        assert prefix == capped

    def test_identical_docs_jaccard_one(self, spark):
        rows = jaccard_prefix_pairs(
            _docs(spark, ["same exact text here okay", "same exact text here okay"]),
            threshold=0.9,
        ).collect()
        assert len(rows) == 1 and rows[0]["jaccard"] == 1.0

    def test_below_threshold_excluded(self, spark):
        rows = jaccard_prefix_pairs(
            _docs(spark, ["alpha beta gamma delta", "epsilon zeta eta theta"]),
            threshold=0.1,
        ).collect()
        assert rows == []
