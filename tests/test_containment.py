"""E130 directed n-gram containment pairs: catches subset/quotation
duplicates whose symmetric Jaccard is tiny."""

from pyspark.sql import Observation

from sparkplug_spark.operators import containment_pairs, jaccard_ngram_pairs

SHORT = "alpha beta gamma delta epsilon zeta"
LONG = (
    SHORT
    + " one two three four five six seven eight nine ten eleven twelve"
    + " thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
)


class TestContainmentPairs:
    def test_subset_doc_caught_jaccard_misses(self, spark):
        df = spark.createDataFrame(
            [(1, SHORT), (2, LONG)], "doc_id long, text string"
        )
        got = {
            (r["id_sub"], r["id_super"]): r["containment"]
            for r in containment_pairs(df, n=3, threshold=0.9).collect()
        }
        # every 3-gram of SHORT appears in LONG: containment exactly 1.0
        assert got == {(1, 2): 1.0}
        # while symmetric Jaccard on the same pair is far below 0.5
        assert (
            jaccard_ngram_pairs(df, n=3, threshold=0.5).collect() == []
        )

    def test_identical_docs_both_directions(self, spark):
        df = spark.createDataFrame(
            [(1, SHORT), (2, SHORT)], "doc_id long, text string"
        )
        rows = containment_pairs(df, n=3, threshold=0.9).collect()
        assert {(r["id_sub"], r["id_super"]) for r in rows} == {(1, 2), (2, 1)}
        assert all(r["containment"] == 1.0 for r in rows)

    def test_disjoint_docs_no_pairs(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "u v w x y z")],
            "doc_id long, text string",
        )
        assert containment_pairs(df, n=3, threshold=0.1).collect() == []

    def test_stop_key_cap_metrics(self, spark):
        # one shingle shared by every doc, cap at 3 -> it is dropped and
        # the dropped-work metric reports it exactly
        df = spark.createDataFrame(
            [(i, SHORT) for i in range(5)], "doc_id long, text string"
        )
        obs = Observation("drops")
        out = containment_pairs(
            df, n=3, threshold=0.9, max_key_freq=3, metrics=obs
        )
        out.collect()
        # 4 distinct shingles in SHORT, each in 5 docs > cap 3
        assert obs.get["dropped_keys"] == 4
        assert obs.get["dropped_entries"] == 20
