"""E209 ngram diversity + E210 duplication weights."""

import pytest


class TestNgramDiversity:
    def test_hand_computed(self, spark):
        from sparkplug_spark.operators import ngram_diversity

        df = spark.createDataFrame(
            [(1, "a b a b a"), (2, "x x x x"), (3, "")],
            "doc_id long, text string",
        )
        got = {
            (r["doc_id"], r["n"]): (r["n_grams"], r["n_distinct"],
                                    r["distinct_ppm"])
            for r in ngram_diversity(df, n_values=(1, 2)).collect()
        }
        # doc 1: unigrams 5 total {a,b}=2 distinct; bigrams 4 total,
        # {"a b","b a"}=2 distinct
        assert got[(1, 1)] == (5, 2, 400000)
        assert got[(1, 2)] == (4, 2, 500000)
        # doc 2: degenerate repetition -> 1 distinct everywhere
        assert got[(2, 1)] == (4, 1, 250000)
        assert got[(2, 2)] == (3, 1, 333333)
        # empty text normalizes to one empty token: 1 unigram, no bigram
        assert got[(3, 1)][0] == 1 and got[(3, 2)] == (0, 0, 0)

    def test_validation(self, spark):
        from sparkplug_spark.operators import ngram_diversity

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="n_values"):
            ngram_diversity(df, n_values=())


class TestDuplicationWeights:
    def test_clusters_singletons_and_mass(self, spark):
        from sparkplug_spark.operators import duplication_weights

        docs = spark.createDataFrame(
            [(i,) for i in range(10)], "doc_id long"
        )
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
        )
        got = {
            r["doc_id"]: (r["group_id"], r["group_size"], r["weight_ppm"])
            for r in duplication_weights(docs, pairs).collect()
        }
        assert got[0] == (0, 3, 333333)
        assert got[1][0] == 0 and got[2][0] == 0
        assert got[5] == (5, 2, 500000)
        # singletons keep full weight
        assert got[3] == (3, 1, 1000000)
        assert len(got) == 10
        # total corpus mass ~ number of distinct clusters (floor losses)
        mass = sum(v[2] for v in got.values()) / 1e6
        assert 6.9 < mass <= 7.0  # 2 clusters + 5 singletons = 7

    def test_partition_invariant(self, spark):
        from sparkplug_spark.operators import duplication_weights

        docs = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 20, 2)], "id_a long, id_b long"
        )
        a = sorted(map(tuple, duplication_weights(docs, pairs).collect()))
        b = sorted(
            map(tuple,
                duplication_weights(
                    docs.repartition(7), pairs.repartition(3)
                ).collect())
        )
        assert a == b
