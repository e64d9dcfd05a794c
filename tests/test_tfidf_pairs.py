"""E134 weighted tf·idf cosine pairs: frequency weighting that set-based
Jaccard can't see, idf down-weighting, integer-exact dots."""

from pyspark.sql import Observation

from sparkplug_spark.operators import tfidf_cosine_pairs


class TestTfidfCosinePairs:
    def test_identical_docs_cosine_one(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
            "doc_id long, text string",
        )
        rows = tfidf_cosine_pairs(df, threshold=0.9, max_key_freq=0).collect()
        assert [(r["id_a"], r["id_b"], r["cosine"]) for r in rows] == [
            (1, 2, 1.0)
        ]

    def test_repetition_separates_what_jaccard_cannot(self, spark):
        # same token SET, very different token FREQUENCIES
        df = spark.createDataFrame(
            [
                (1, "spam spam spam spam spam spam spam spam ham eggs"),
                (2, "spam ham ham eggs eggs eggs eggs eggs eggs eggs"),
                (3, "spam spam spam spam spam spam spam spam ham eggs"),
            ],
            "doc_id long, text string",
        )
        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(
                df, threshold=0.0, max_key_freq=0
            ).collect()
        }
        # identical frequency profiles -> 1.0; same set, skewed -> lower
        assert got[(1, 3)] == 1.0
        assert got[(1, 2)] < 0.6

    def test_tf_cap_bounds_repetition(self, spark):
        # 100x repetition vs 10x repetition of the same word: both hit the
        # cap, so the vectors coincide
        df = spark.createDataFrame(
            [(1, " ".join(["x"] * 100)), (2, " ".join(["x"] * 10))],
            "doc_id long, text string",
        )
        rows = tfidf_cosine_pairs(
            df, threshold=0.9, tf_cap=10, max_key_freq=0
        ).collect()
        assert rows[0]["cosine"] == 1.0

    def test_stop_key_cap_metrics(self, spark):
        df = spark.createDataFrame(
            [(i, "common unique%d" % i) for i in range(6)],
            "doc_id long, text string",
        )
        obs = Observation("drops")
        out = tfidf_cosine_pairs(
            df, threshold=0.0, max_key_freq=3, metrics=obs
        )
        assert out.collect() == []  # only the shared term linked them
        assert obs.get["dropped_keys"] == 1
        assert obs.get["dropped_entries"] == 6
