"""E223 mutual kNN, E224 categorical encoding, E225 A-Priori itemsets."""

import numpy as np
import pytest

from sparkplug_spark.operators import (
    encode_categoricals,
    frequent_itemsets,
    mutual_knn_pairs,
)


class TestEncodeCategoricals:
    def test_frequency_order_and_ties(self, spark):
        rows = [(1, "b"), (2, "b"), (3, "a"), (4, "a"), (5, "c"), (6, None)]
        df = spark.createDataFrame(rows, "id long, cat string")
        got = {
            r["id"]: r["cat_id"]
            for r in encode_categoricals(df, ["cat"]).collect()
        }
        # a and b both count 2 -> tie breaks lexically: a=0, b=1, c=2
        assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 2, 6: None}

    def test_multiple_columns_and_start(self, spark):
        df = spark.createDataFrame(
            [(1, "x", "p"), (2, "y", "p")], "id long, a string, b string"
        )
        out = encode_categoricals(df, ["a", "b"], start=10).collect()
        by_id = {r["id"]: (r["a_id"], r["b_id"]) for r in out}
        assert by_id == {1: (10, 10), 2: (11, 10)}

    def test_empty_cols_rejected(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, a string")
        with pytest.raises(ValueError, match="cols"):
            encode_categoricals(df, [])


class TestFrequentItemsets:
    def test_hand_built_lattice(self, spark):
        baskets = [
            (1, 10), (1, 20), (1, 30),
            (2, 10), (2, 20), (2, 30),
            (3, 10), (3, 20),
            (4, 40),
        ]
        df = spark.createDataFrame(baskets, "b long, i long")
        got = {
            (r["items"], r["size"]): r["support"]
            for r in frequent_itemsets(df, "b", "i", min_support=2).collect()
        }
        assert got[("10", 1)] == 3 and got[("20", 1)] == 3
        assert got[("30", 1)] == 2
        assert ("40", 1) not in got           # support 1
        assert got[("10,20", 2)] == 3
        assert got[("10,30", 2)] == 2 and got[("20,30", 2)] == 2
        assert got[("10,20,30", 3)] == 2
        assert all(s <= 3 for _, s in got)    # no size-4 leaks

    def test_matches_brute_force(self, spark):
        from itertools import combinations

        rng = np.random.default_rng(2)
        baskets = sorted(
            {(int(b), int(i)) for b, i in zip(
                rng.integers(0, 30, 300), rng.integers(0, 15, 300))}
        )
        df = spark.createDataFrame(baskets, "b long, i long")
        by_b = {}
        for b, i in baskets:
            by_b.setdefault(b, set()).add(i)
        want = {}
        for size in (1, 2, 3):
            from collections import Counter

            c = Counter()
            for items in by_b.values():
                for combo in combinations(sorted(items), size):
                    c[combo] += 1
            for combo, sup in c.items():
                if sup >= 3:
                    want[(",".join(map(str, combo)), size)] = sup
        got = {
            (r["items"], r["size"]): r["support"]
            for r in frequent_itemsets(df, "b", "i", min_support=3).collect()
        }
        assert got == want

    def test_guards(self, spark):
        df = spark.createDataFrame([(1, 2)], "b long, i long")
        with pytest.raises(ValueError, match="min_support"):
            frequent_itemsets(df, "b", "i", min_support=0)
        with pytest.raises(ValueError, match="max_size"):
            frequent_itemsets(df, "b", "i", max_size=4)


class TestMutualKnn:
    def test_reciprocity_required(self, spark):
        # hub h is everyone's neighbor, but h's own top-1 is only a
        rows = [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [0.0, 1.0]),
            (4, [0.1, 0.9]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            (r["id_a"], r["id_b"]): (r["rank_a"], r["rank_b"])
            for r in mutual_knn_pairs(df, k=1, min_cosine=0.0).collect()
        }
        # with k=1: 1<->2 mutual, 3<->4 mutual, nothing else
        assert set(got) == {(1, 2), (3, 4)}
        assert got[(1, 2)] == (1, 1)

    def test_floor_excludes_low_cosine(self, spark):
        rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        assert (
            mutual_knn_pairs(df, k=5, min_cosine=0.5).count() == 0
        )

    def test_guard(self, spark):
        df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="k"):
            mutual_knn_pairs(df, k=0)


class TestStreamingEnrich:
    """E226 stream-static dim enrichment with atomic republish."""

    def test_version_boundary_and_left_join(self, spark, tmp_path):
        import os
        import shutil

        from pyspark.sql import functions as F

        from sparkplug_spark.sources import manifest_publish
        from sparkplug_spark.streaming import streaming_enrich

        tmp = str(tmp_path)
        store, out, chk, src = (
            os.path.join(tmp, d) for d in ("dim", "out", "chk", "src")
        )
        os.makedirs(src)
        schema = "id long, key string"

        def write_batch(rows, i):
            stage = os.path.join(tmp, f"st{i}")
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                stage
            )
            part = next(
                f for f in os.listdir(stage) if f.endswith(".parquet")
                and not f.startswith(("_", "."))
            )
            shutil.move(
                os.path.join(stage, part),
                os.path.join(src, f"b{i:04d}.parquet"),
            )

        def run():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                streaming_enrich(stream, store, "key", ("val",), out)
                .option("checkpointLocation", chk)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        dim1 = spark.createDataFrame(
            [("a", 1), ("b", 2)], "key string, val long"
        )
        manifest_publish(
            spark, store, lambda d: dim1.write.mode("overwrite").parquet(d)
        )
        write_batch([(1, "a"), (2, "zzz")], 0)  # zzz: no dim row
        run()
        dim2 = spark.createDataFrame(
            [("a", 100), ("b", 200)], "key string, val long"
        )
        manifest_publish(
            spark, store, lambda d: dim2.write.mode("overwrite").parquet(d)
        )
        write_batch([(3, "a")], 1)
        run()
        rows = {
            r["id"]: (r["val"], r["__dim_version"], r["__batch_id"])
            for r in spark.read.parquet(out).collect()
        }
        assert rows[1][0] == 1          # batch 1 saw dim v1
        assert rows[2][0] is None       # unmatched key survives with NULL
        assert rows[3][0] == 100        # batch 2 saw dim v2
        assert rows[1][1] != rows[3][1]  # version stamp moved
        assert rows[1][2] == 0 and rows[3][2] == 1


class TestFrequentEventSequences:
    """E227: ordered subsequence support via first/last bounds."""

    def _brute(self, events, min_support, max_len):
        from collections import defaultdict
        from itertools import product

        by_u = defaultdict(list)
        for u, t, ts in events:
            by_u[u].append((ts, t))
        for u in by_u:
            by_u[u].sort()
        types = sorted({t for _, t, _ in events})

        def contains(stream, pat):
            i = 0
            last_ts = None
            for ts, t in stream:
                if i < len(pat) and t == pat[i] and (
                    last_ts is None or ts > last_ts
                ):
                    i += 1
                    last_ts = ts
            return i == len(pat)

        want = {}
        for size in range(1, max_len + 1):
            for pat in product(types, repeat=size):
                sup = sum(
                    1 for s in by_u.values() if contains(s, list(pat))
                )
                if sup >= min_support:
                    want[(">".join(pat), size)] = sup
        return want

    def test_matches_brute_force(self, spark):
        import datetime

        import numpy as np

        from sparkplug_spark.operators import frequent_event_sequences

        rng = np.random.default_rng(3)
        base = datetime.datetime(2024, 1, 1)
        events = []
        for u in range(25):
            n = int(rng.integers(3, 12))
            ts_off = np.sort(rng.choice(10_000, size=n, replace=False))
            for k in range(n):
                events.append(
                    (u, "abcd"[int(rng.integers(0, 4))],
                     base + datetime.timedelta(seconds=int(ts_off[k])))
                )
        df = spark.createDataFrame(
            events, "user_id long, event_type string, ts timestamp"
        )
        got = {
            (r["pattern"], r["size"]): r["support"]
            for r in frequent_event_sequences(df, min_support=5).collect()
        }
        assert got == self._brute(events, 5, 3)

    def test_order_matters_and_ties_excluded(self, spark):
        import datetime

        from sparkplug_spark.operators import frequent_event_sequences

        t0 = datetime.datetime(2024, 1, 1)
        s = datetime.timedelta(seconds=1)
        events = [
            (1, "a", t0), (1, "b", t0 + s),          # a>b only
            (2, "b", t0), (2, "a", t0 + s),          # b>a only
            (3, "a", t0), (3, "b", t0),              # SAME ts: no sequence
        ]
        df = spark.createDataFrame(
            events, "user_id long, event_type string, ts timestamp"
        )
        got = {
            r["pattern"]: r["support"]
            for r in frequent_event_sequences(df, min_support=1).collect()
            if r["size"] == 2
        }
        assert got.get("a>b") == 1 and got.get("b>a") == 1
        assert "a>a" not in got and "b>b" not in got

    def test_guards(self, spark):
        from sparkplug_spark.operators import frequent_event_sequences

        df = spark.createDataFrame(
            [(1, "a", None)], "user_id long, event_type string, ts timestamp"
        )
        with pytest.raises(ValueError, match="min_support"):
            frequent_event_sequences(df, min_support=0)
        with pytest.raises(ValueError, match="max_len"):
            frequent_event_sequences(df, max_len=4)


class TestTextrankScores:
    """E228 corpus TextRank over the adjacent-token graph."""

    def test_hub_token_ranks_highest(self, spark):
        from sparkplug_spark.operators import textrank_scores

        # 'hub' co-occurs with everything; spokes only with hub
        docs = [
            (i, f"hub {w} hub {w} hub {w}")
            for i, w in enumerate(["red", "green", "blue", "cyan"])
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = textrank_scores(df, min_pair_count=2, iterations=8).collect()
        ranks = {r["token"]: r["rank_nano"] for r in rows}
        assert max(ranks, key=ranks.get) == "hub"
        assert set(ranks) == {"hub", "red", "green", "blue", "cyan"}
        # spokes are symmetric -> identical integer ranks
        assert len({ranks[w] for w in ["red", "green", "blue", "cyan"]}) == 1

    def test_min_pair_count_prunes(self, spark):
        from sparkplug_spark.operators import textrank_scores

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "c d")], "doc_id long, text string"
        )
        toks = {
            r["token"]
            for r in textrank_scores(df, min_pair_count=2).collect()
        }
        # (a,b) occurs 3x; (c,d) once -> pruned entirely
        assert toks == {"a", "b"}


class TestConsensusRecords:
    """E229 golden records: CC merge + deterministic attribute mode."""

    def test_consensus_mode_and_singletons(self, spark):
        from sparkplug_spark.operators import consensus_records

        ents = spark.createDataFrame(
            [
                (1, "gold", 10),
                (2, "gold", 20),
                (3, "silver", 20),   # cluster {1,2,3}: gold wins 2-1
                (4, None, 30),       # singleton, NULL attr stays NULL
                (5, "bronze", None),
            ],
            "id long, tier string, region int",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long"
        )
        got = {
            r["cluster_id"]: (r["n_members"], r["tier"], r["region"])
            for r in consensus_records(
                ents, pairs, id_col="id", attr_cols=("tier", "region")
            ).collect()
        }
        # region: 20 appears twice (ids 2,3), 10 once -> 20
        assert got[1] == (3, "gold", 20)
        assert got[4] == (1, None, 30)
        assert got[5] == (1, "bronze", None)

    def test_tie_breaks_to_smallest_value(self, spark):
        from sparkplug_spark.operators import consensus_records

        ents = spark.createDataFrame(
            [(1, "b"), (2, "a")], "id long, v string"
        )
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        rows = consensus_records(
            ents, pairs, id_col="id", attr_cols=("v",)
        ).collect()
        assert rows[0]["v"] == "a" and rows[0]["cluster_id"] == 1

    def test_empty_attrs_rejected(self, spark):
        from sparkplug_spark.operators import consensus_records

        df = spark.createDataFrame([(1, "x")], "id long, v string")
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        import pytest as _p

        with _p.raises(ValueError, match="attr_cols"):
            consensus_records(df, pairs, id_col="id", attr_cols=())


class TestSelectMaxCoverage:
    """E230 greedy max-coverage coreset selection."""

    def test_greedy_picks_and_gains(self, spark):
        from sparkplug_spark.operators import select_max_coverage

        docs = [
            (1, "a b c d e"),      # 5 tokens — greedy first pick
            (2, "a b c"),          # subset of 1: gain 0 after pick 1
            (3, "f g h"),          # 3 new
            (4, "f g"),            # subset of 3
            (5, "e i"),            # 1 new after 1 and 3
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = select_max_coverage(df, k=4).orderBy("step").collect()
        got = [(r["step"], r["id"], r["gain"], r["covered_total"]) for r in rows]
        # step 3: doc 5 adds only 'i' (1 token); steps stop when gain=0
        assert got == [(1, 1, 5, 5), (2, 3, 3, 8), (3, 5, 1, 9)]

    def test_tie_breaks_to_smallest_id(self, spark):
        from sparkplug_spark.operators import select_max_coverage

        df = spark.createDataFrame(
            [(7, "x y"), (3, "p q"), (9, "z w")], "doc_id long, text string"
        )
        first = select_max_coverage(df, k=1).collect()[0]
        assert first["id"] == 3

    def test_guard(self, spark):
        from sparkplug_spark.operators import select_max_coverage

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        import pytest as _p

        with _p.raises(ValueError, match="k"):
            select_max_coverage(df, k=0)


class TestSplitLeakAudit:
    """E232 cross-split near-dup leakage."""

    def test_counts_cross_and_unassigned(self, spark):
        from sparkplug_spark.operators import split_leak_audit

        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (4, 5), (6, 99)], "id_a long, id_b long"
        )
        splits = spark.createDataFrame(
            [(1, "train"), (2, "test"), (3, "train"), (4, "val"),
             (5, "val"), (6, "train")],
            "doc_id long, split string",
        )
        got = {
            (r["split_a"], r["split_b"]): (r["n_pairs"], r["is_leak"])
            for r in split_leak_audit(pairs, splits).collect()
        }
        assert got[("test", "train")] == (1, True)     # the leak
        assert got[("train", "train")] == (1, False)
        assert got[("val", "val")] == (1, False)
        # id 99 has no assignment -> surfaced, not dropped
        assert got[("train", "unassigned")] == (1, True)

    def test_clean_split_reports_no_leaks(self, spark):
        from sparkplug_spark.operators import split_leak_audit

        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        splits = spark.createDataFrame(
            [(1, "train"), (2, "train")], "doc_id long, split string"
        )
        rows = split_leak_audit(pairs, splits).collect()
        assert len(rows) == 1 and rows[0]["is_leak"] is False
