"""Market-basket pairs and blocked record linkage."""

from sparkplug_spark.operators import basket_pairs, blocked_link


class TestBasketPairs:
    def test_counts_and_lift(self, spark):
        rows = [
            (1, "a"), (1, "b"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "c"),
        ]
        df = spark.createDataFrame(rows, "b long, i string")
        out = {
            (r["item_a"], r["item_b"]): (r["n_baskets"], r["lift_ppm"])
            for r in basket_pairs(df, "b", "i", min_count=1).collect()
        }
        # a&b together in 2 of 4 baskets; n_a=3, n_b=2
        # lift = 2*4/(3*2) = 4/3 -> 1_333_333 ppm truncating
        assert out[("a", "b")] == (2, 1_333_333)
        # a&c together once; n_c=2 -> lift = 4/6 -> 666_666
        assert out[("a", "c")] == (1, 666_666)
        assert len(out) == 2

    def test_duplicate_rows_count_once(self, spark):
        rows = [(1, "a"), (1, "a"), (1, "b")]
        df = spark.createDataFrame(rows, "b long, i string")
        [r] = basket_pairs(df, "b", "i", min_count=1).collect()
        assert (r["item_a"], r["item_b"], r["n_baskets"]) == ("a", "b", 1)

    def test_min_count_filters(self, spark):
        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c")]
        df = spark.createDataFrame(rows, "b long, i string")
        assert basket_pairs(df, "b", "i", min_count=2).count() == 0

    def test_oversized_basket_guard(self, spark):
        # basket 1 exceeds the cap: no pairs from it, but its items still
        # count toward totals, so the a-b pair from basket 2 sees n_a=2
        rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b")]
        df = spark.createDataFrame(rows, "b long, i string")
        [r] = basket_pairs(df, "b", "i", min_count=1, max_basket_size=2).collect()
        # lift = 1 * 2 / (2 * 2) = 0.5
        assert (r["item_a"], r["item_b"]) == ("a", "b")
        assert (r["n_baskets"], r["lift_ppm"]) == (1, 500_000)


class TestBlockedLink:
    SCHEMA = "id long, name string, blk string"

    def test_links_within_block_only(self, spark):
        rows = [
            (1, "alice", "x"),
            (2, "alise", "x"),
            (3, "alice", "y"),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = blocked_link(df, "id", "name", ["blk"], max_distance=1).collect()
        assert [(r["id_a"], r["id_b"], r["distance"]) for r in out] == [(1, 2, 1)]

    def test_distance_cap(self, spark):
        rows = [(1, "abcdef", "x"), (2, "abcxyz", "x")]
        df = spark.createDataFrame(rows, self.SCHEMA)
        assert blocked_link(df, "id", "name", ["blk"], max_distance=2).count() == 0
        assert blocked_link(df, "id", "name", ["blk"], max_distance=3).count() == 1

    def test_null_block_key_never_matches(self, spark):
        rows = [(1, "same", None), (2, "same", None)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        assert blocked_link(df, "id", "name", ["blk"]).count() == 0

    def test_oversized_block_dropped(self, spark):
        rows = [(i, "same", "big") for i in range(4)] + [
            (10, "same", "ok"),
            (11, "same", "ok"),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = blocked_link(df, "id", "name", ["blk"], max_block_size=3).collect()
        assert [(r["id_a"], r["id_b"]) for r in out] == [(10, 11)]

    def test_multi_column_block(self, spark):
        rows = [
            (1, "n", "x"), (2, "n", "x"),
        ]
        df = spark.createDataFrame(rows, "id long, name string, b1 string")
        df = df.withColumn("b2", df.id % 2)  # differing second key
        assert blocked_link(df, "id", "name", ["b1", "b2"]).count() == 0


class TestSkipgramPairs:
    def _df(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        # user 1: a b c d ; user 2: a c
        for i, it in enumerate(["a", "b", "c", "d"]):
            rows.append((i, 1, base + dt.timedelta(minutes=i), it))
        for i, it in enumerate(["a", "c"]):
            rows.append((10 + i, 2, base + dt.timedelta(minutes=i), it))
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )

    def test_window2_counts(self, spark):
        from sparkplug_spark.operators import skipgram_pairs

        out = {(r["item"], r["context"]): r["n_pairs"]
               for r in skipgram_pairs(self._df(spark), window=2).collect()}
        # user1 fwd pairs: (a,b),(a,c),(b,c),(b,d),(c,d); user2: (a,c)
        # symmetric doubles each
        assert out[("a", "c")] == 2 and out[("c", "a")] == 2
        assert out[("a", "b")] == 1 and out[("b", "a")] == 1
        assert out[("c", "d")] == 1 and out[("d", "c")] == 1
        assert ("a", "d") not in out  # distance 3 > window
        total = sum(out.values())
        assert total == 2 * (5 + 1)

    def test_window1_is_bigram(self, spark):
        from sparkplug_spark.operators import skipgram_pairs

        out = {(r["item"], r["context"]): r["n_pairs"]
               for r in skipgram_pairs(self._df(spark), window=1).collect()}
        assert ("a", "c") in out  # user2 adjacency only
        assert out[("a", "c")] == 1

    def test_partitioning_invariance(self, spark):
        from sparkplug_spark.operators import skipgram_pairs

        df = self._df(spark)
        a = sorted(map(tuple, skipgram_pairs(df, window=2).collect()))
        b = sorted(map(tuple, skipgram_pairs(df.repartition(5), window=2).collect()))
        assert a == b

    def test_bad_args(self, spark):
        import pytest

        from sparkplug_spark.operators import skipgram_pairs

        df = self._df(spark)
        with pytest.raises(ValueError):
            skipgram_pairs(df, window=0)
        with pytest.raises(ValueError):
            skipgram_pairs(df, min_count=0)
