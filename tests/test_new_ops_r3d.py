"""Round-3 continuation batch 4: rolling window features, conversion
attribution, n-gram counts, keyword search."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    assign_splits,
    attribution_counts,
    build_term_index,
    build_training_blocks,
    densify_time_series,
    group_ntiles,
    keyword_search,
    ngram_counts,
    rolling_window_features,
    throttle_events,
)


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


class TestRollingWindowFeatures:
    def test_trailing_counts_and_sums(self, spark):
        rows = [
            (1, _ts(0), 1, "view", 1.0),
            (2, _ts(50), 1, "view", 2.0),
            (3, _ts(100), 1, "view", 4.0),
            (4, _ts(300), 1, "view", 8.0),
            (5, _ts(0), 1, "click", 100.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = {
            r["event_id"]: (r["n_trailing"], r["value_micros_trailing"])
            for r in rolling_window_features(ev, window_seconds=100).collect()
        }
        assert out[1] == (1, 1_000_000)
        assert out[2] == (2, 3_000_000)
        # window [0, 100] inclusive: events 1,2,3
        assert out[3] == (3, 7_000_000)
        # 300 - 100 = 200 > 100: only itself
        assert out[4] == (1, 8_000_000)
        # other key unaffected
        assert out[5] == (1, 100_000_000)

    def test_ties_share_frame(self, spark):
        rows = [
            (1, _ts(10), 1, "view", 1.0),
            (2, _ts(10), 1, "view", 2.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = rolling_window_features(ev, window_seconds=5).collect()
        # RANGE frame includes peers: both rows see both events
        assert {r["n_trailing"] for r in out} == {2}

    def test_no_value_col(self, spark):
        ev = spark.createDataFrame([(1, _ts(0), 1, "view", 1.0)], EVENT_SCHEMA)
        out = rolling_window_features(ev, value_col=None).columns
        assert out == ["event_id", "event_type", "ts_s", "n_trailing"]

    def test_rejects_bad_window(self, spark):
        ev = spark.createDataFrame([(1, _ts(0), 1, "view", 1.0)], EVENT_SCHEMA)
        with pytest.raises(ValueError):
            rolling_window_features(ev, window_seconds=0)
        with pytest.raises(ValueError):
            rolling_window_features(ev, window_seconds=100, bucket_seconds=99)

    def test_bucketed_equals_global(self, spark):
        # boundary-heavy layout: events exactly on bucket edges, just
        # inside/outside the spill margin, and tied timestamps
        rows = []
        eid = 0
        for k in ("a", "b"):
            for s in [0, 1, 95, 99, 100, 100, 101, 105, 199, 200, 201, 299, 300]:
                eid += 1
                rows.append((eid, _ts(s), 1, k, float(eid)))
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        plain = sorted(
            map(tuple, rolling_window_features(ev, window_seconds=10).collect())
        )
        bucketed = sorted(
            map(
                tuple,
                rolling_window_features(
                    ev, window_seconds=10, bucket_seconds=100
                ).collect(),
            )
        )
        assert plain == bucketed
        # window == bucket width (worst legal case: every row ghosts)
        wide = sorted(
            map(
                tuple,
                rolling_window_features(
                    ev, window_seconds=100, bucket_seconds=100
                ).collect(),
            )
        )
        wide_plain = sorted(
            map(tuple, rolling_window_features(ev, window_seconds=100).collect())
        )
        assert wide == wide_plain


class TestAttributionCounts:
    def _ev(self, spark, rows):
        return spark.createDataFrame(rows, EVENT_SCHEMA)

    def test_last_touch(self, spark):
        rows = [
            # user 1: view@0, click@10, purchase@20 -> click credited
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(10), 1, "click", 0.0),
            (3, _ts(20), 1, "purchase", 0.0),
            # user 2: purchase with no prior touch -> (none)
            (4, _ts(5), 2, "purchase", 0.0),
            (5, _ts(9), 2, "view", 0.0),  # after conversion: no credit
            # user 3: touch at the SAME second as conversion -> (none)
            (6, _ts(30), 3, "view", 0.0),
            (7, _ts(30), 3, "purchase", 0.0),
        ]
        out = {
            r["touch_type"]: r["n_conversions"]
            for r in attribution_counts(
                self._ev(spark, rows), "purchase", ("view", "click")
            ).collect()
        }
        assert out == {"click": 1, "(none)": 2}

    def test_first_touch_and_id_tiebreak(self, spark):
        rows = [
            # user 1: click@0 and view@0 tie -> first model takes MIN id
            (1, _ts(0), 1, "click", 0.0),
            (2, _ts(0), 1, "view", 0.0),
            (3, _ts(50), 1, "purchase", 0.0),
        ]
        first = attribution_counts(
            self._ev(spark, rows), "purchase", ("view", "click"), model="first"
        ).collect()
        assert {(r["touch_type"], r["n_conversions"]) for r in first} == {
            ("click", 1)
        }
        last = attribution_counts(
            self._ev(spark, rows), "purchase", ("view", "click"), model="last"
        ).collect()
        assert {(r["touch_type"], r["n_conversions"]) for r in last} == {
            ("view", 1)
        }

    def test_only_first_conversion_counts(self, spark):
        rows = [
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(10), 1, "purchase", 0.0),
            (3, _ts(20), 1, "click", 0.0),
            (4, _ts(30), 1, "purchase", 0.0),  # second conversion ignored
        ]
        out = {
            r["touch_type"]: r["n_conversions"]
            for r in attribution_counts(
                self._ev(spark, rows), "purchase", ("view", "click")
            ).collect()
        }
        assert out == {"view": 1}

    def test_rejects_bad_args(self, spark):
        ev = self._ev(spark, [(1, _ts(0), 1, "view", 0.0)])
        with pytest.raises(ValueError):
            attribution_counts(ev, "purchase", ())
        with pytest.raises(ValueError):
            attribution_counts(ev, "purchase", ("view",), model="time_decay")


class TestNgramCounts:
    def test_bigrams(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c a b"), (2, "a b"), (3, "x")],
            ["doc_id", "text"],
        )
        out = [
            (r["ngram"], r["n"], r["rank"])
            for r in ngram_counts(docs, n=2).orderBy("rank").collect()
        ]
        # "a b": doc1 twice + doc2 once = 3; "b c"/"c a": 1 each; doc3 too short
        assert out == [("a b", 3, 1), ("b c", 1, 2), ("c a", 1, 3)]

    def test_trigram_and_min_count(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c")], ["doc_id", "text"]
        )
        out = [
            (r["ngram"], r["n"])
            for r in ngram_counts(docs, n=3, min_count=2).collect()
        ]
        assert out == [("a b c", 2)]

    def test_normalization_matches_tokenizer(self, spark):
        docs = spark.createDataFrame([(1, "Héllo,  World! hello world")], ["doc_id", "text"])
        out = {r["ngram"]: r["n"] for r in ngram_counts(docs, n=2).collect()}
        # "Héllo," -> "h llo" after non-alnum strip+squash; exact kernel parity
        assert "hello world" in out

    def test_rejects_bad_args(self, spark):
        docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            ngram_counts(docs, n=0)


class TestNTZTolerance:
    def test_event_ops_accept_raw_ntz_timestamps(self, spark):
        """Raw parquet reads give TIMESTAMP_NTZ (no read_events
        normalization); every events operator must still resolve — Spark 4
        refuses a direct NTZ->long cast, so _epoch_s routes through a
        session-UTC timestamp cast."""
        from sparkplug_spark.operators import (
            rate_anomalies,
            retention_cohorts,
            sessionize,
            user_activity_profile,
        )

        ev = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 1, "view", 1.0)],
            "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
        )
        assert rolling_window_features(ev).count() == 1
        assert sessionize(ev).count() == 1
        assert retention_cohorts(ev).count() == 1
        assert rate_anomalies(ev).count() == 1
        assert rate_anomalies(ev, include_empty=True).count() == 1
        assert user_activity_profile(ev).count() == 1
        assert attribution_counts(ev, "purchase", ("view",)).count() == 0
        assert densify_time_series(ev).count() == 1
        assert throttle_events(ev).count() == 1


class TestKeywordSearch:
    DOCS = [
        (1, "spark join join join spark"),
        (2, "join"),
        (3, "window sort window"),
        (4, "spark window"),
    ]

    def test_index_shape(self, spark):
        docs = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        idx = {
            (r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in build_term_index(docs).collect()
        }
        assert idx[("join", 1)] == (3, 5)
        assert idx[("join", 2)] == (1, 1)
        assert idx[("window", 3)] == (2, 3)

    def test_scoring_exact(self, spark):
        docs = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        out = keyword_search(
            docs, {"q": ["join"]}, k=10, len_smooth=0
        ).collect()
        # N=4, df(join)=2 -> idf=2. doc1: min(3,10)*2=6, dl=5 -> 6*1000//5=1200
        # doc2: 1*2=2, dl=1 -> 2000 -> rank 1
        ranked = [(r["doc_id"], r["score_ppk"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
        assert ranked == [(2, 2000, 1), (1, 1200, 2)]

    def test_multi_term_and_tiebreak(self, spark):
        docs = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        out = keyword_search(
            docs, {"q": ["spark", "window"]}, k=10, len_smooth=0
        ).collect()
        # idf(spark)=4//2=2, idf(window)=4//2=2
        # doc1: 2*2=4, dl=5 -> 800; doc3: 2*2=4, dl=3 -> 1333
        # doc4: (1*2 + 1*2)=4, dl=2 -> 2000
        got = {r["doc_id"]: (r["score_ppk"], r["rank"]) for r in out}
        assert got[4] == (2000, 1)
        assert got[3] == (1333, 2)
        assert got[1] == (800, 3)

    def test_k_truncates_and_prebuilt_index(self, spark):
        docs = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        idx = build_term_index(docs)
        out = keyword_search(
            docs, {"q": ["spark", "window", "join"]}, k=2, index=idx
        ).collect()
        assert len(out) == 2
        assert {r["rank"] for r in out} == {1, 2}

    def test_rejects_bad_args(self, spark):
        docs = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        with pytest.raises(ValueError):
            keyword_search(docs, {})
        with pytest.raises(ValueError):
            keyword_search(docs, {"q": ["a"]}, k=0)


class TestAssignSplits:
    def test_deterministic_and_total(self, spark):
        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(200)], ["doc_id", "text"]
        )
        a = assign_splits(docs, salt="s").select("doc_id", "split").collect()
        b = assign_splits(docs, salt="s").select("doc_id", "split").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        got = {r["split"] for r in a}
        assert got <= {"train", "val", "test"}
        # 98/1/1: train strongly dominates
        n_train = sum(1 for r in a if r["split"] == "train")
        assert n_train > 180

    def test_group_coherence(self, spark):
        rows = [(1, 10), (2, 10), (3, 10), (4, None), (5, None)]
        df = spark.createDataFrame(rows, "doc_id long, grp long")
        out = assign_splits(
            df, weights={"a": 1, "b": 1}, group_col="grp"
        ).collect()
        by_grp = {}
        for r in out:
            by_grp.setdefault(r["grp"], set()).add(r["split"])
        # same group -> same split
        assert len(by_grp[10]) == 1

    def test_salt_changes_assignment(self, spark):
        docs = spark.createDataFrame(
            [(i, "t") for i in range(500)], ["doc_id", "text"]
        )
        a = {r["doc_id"]: r["split"] for r in assign_splits(docs, salt="x").collect()}
        b = {r["doc_id"]: r["split"] for r in assign_splits(docs, salt="y").collect()}
        assert a != b

    def test_rejects_bad_weights(self, spark):
        docs = spark.createDataFrame([(1, "t")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            assign_splits(docs, weights={})
        with pytest.raises(ValueError):
            assign_splits(docs, weights={"a": 0})


class TestBuildTrainingBlocks:
    def test_blocks_concat_in_pack_order(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc{i}", 10) for i in range(20)],
            "doc_id long, text string, n_tokens long",
        )
        blocks = build_training_blocks(
            docs, budget=30, num_groups=1, sep=" | "
        ).collect()
        # every doc appears exactly once across blocks
        alltext = " | ".join(b["block_text"] for b in blocks)
        for i in range(20):
            assert f"doc{i}" in alltext
        assert sum(b["n_docs"] for b in blocks) == 20
        # budget 30 at weight 10 -> 3 docs per full block
        assert {b["n_docs"] for b in blocks} <= {3, 2, 1}
        for b in blocks:
            assert b["block_weight"] == 10 * b["n_docs"]
            assert b["block_text"].count(" | ") == b["n_docs"] - 1

    def test_reproducible(self, spark):
        docs = spark.createDataFrame(
            [(i, f"d{i}", 7) for i in range(50)],
            "doc_id long, text string, n_tokens long",
        )
        a = sorted(
            (r["pack_group"], r["shard_id"], r["block_text"])
            for r in build_training_blocks(docs, budget=20).collect()
        )
        b = sorted(
            (r["pack_group"], r["shard_id"], r["block_text"])
            for r in build_training_blocks(docs, budget=20).collect()
        )
        assert a == b


class TestGroupNtiles:
    def test_tiles_are_balanced_and_ordered(self, spark):
        docs = spark.createDataFrame(
            [(i, "en", i * 10) for i in range(20)],
            "doc_id long, lang string, n_chars long",
        )
        out = sorted(
            group_ntiles(docs, n=4).collect(), key=lambda r: r["doc_id"]
        )
        tiles = [r["tile"] for r in out]
        # 20 rows / 4 tiles = 5 each, monotone with n_chars
        assert tiles == [1] * 5 + [2] * 5 + [3] * 5 + [4] * 5

    def test_remainder_to_leading_tiles(self, spark):
        docs = spark.createDataFrame(
            [(i, "en", i) for i in range(5)],
            "doc_id long, lang string, n_chars long",
        )
        out = sorted(
            group_ntiles(docs, n=3).collect(), key=lambda r: r["doc_id"]
        )
        assert [r["tile"] for r in out] == [1, 1, 2, 2, 3]

    def test_global_when_no_group(self, spark):
        docs = spark.createDataFrame(
            [(i, "en", i) for i in range(4)],
            "doc_id long, lang string, n_chars long",
        )
        out = group_ntiles(docs, n=2, group_col=None)
        assert out.columns == ["doc_id", "n_chars", "tile"]
        assert out.count() == 4

    def test_rejects_bad_n(self, spark):
        docs = spark.createDataFrame(
            [(1, "en", 1)], "doc_id long, lang string, n_chars long"
        )
        with pytest.raises(ValueError):
            group_ntiles(docs, n=0)


class TestKeywordSearchModes:
    DOCS = [
        (1, "spark join join"),
        (2, "spark window"),
        (3, "join window"),
        (4, "spark join window"),
    ]

    def test_require_all_conjunctive(self, spark):
        docs = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        got_or = {
            r["doc_id"]
            for r in keyword_search(docs, {"q": ["spark", "join"]}, k=10).collect()
        }
        got_and = {
            r["doc_id"]
            for r in keyword_search(
                docs, {"q": ["spark", "join"]}, k=10, require_all=True
            ).collect()
        }
        assert got_or == {1, 2, 3, 4}
        assert got_and == {1, 4}

    def test_require_all_scores_match_or_mode(self, spark):
        docs = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        or_scores = {
            (r["query_id"], r["doc_id"]): r["score_ppk"]
            for r in keyword_search(docs, {"q": ["spark", "join"]}, k=10).collect()
        }
        for r in keyword_search(
            docs, {"q": ["spark", "join"]}, k=10, require_all=True
        ).collect():
            assert or_scores[(r["query_id"], r["doc_id"])] == r["score_ppk"]

    def test_stored_index_search_is_shuffle_free_to_match(self, spark):
        """The stored-index scale path: postings bucketed on term join the
        broadcast query term set with no Exchange before the match."""
        from sparkplug_spark.sources import write_bucketed

        docs = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        try:
            write_bucketed(
                build_term_index(docs), "kw_idx_test", ["term"], num_buckets=4
            )
            idx = spark.table("kw_idx_test")
            out = keyword_search(
                docs, {"q": ["spark", "join"]}, k=10, index=idx, release=False
            )
            plan = out._jdf.queryExecution().executedPlan().toString()
            # the matched side is scan -> broadcast join; the only
            # Exchanges are the scoring aggregation + final window
            assert plan.count("Exchange hashpartitioning") <= 2
            assert {r["doc_id"] for r in out.collect()} == {1, 2, 3, 4}
        finally:
            spark.sql("drop table if exists kw_idx_test")


class TestDensifyTimeSeries:
    def test_fills_gaps_with_zeros(self, spark):
        rows = [
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(50), 1, "view", 0.0),
            # gap: bucket [100,200) empty
            (3, _ts(250), 1, "view", 0.0),
            (4, _ts(0), 1, "click", 0.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = {
            (r["event_type"], r["bucket_start"] % 1000): r["n_events"]
            for r in densify_time_series(ev, bucket_seconds=100).collect()
        }
        base = _ts(0).replace(tzinfo=dt.timezone.utc).timestamp() % 1000
        assert out[("view", base % 1000)] == 2
        assert out[("view", (base + 100) % 1000)] == 0  # gap filled
        assert out[("view", (base + 200) % 1000)] == 1
        assert out[("click", base % 1000)] == 1
        assert len(out) == 4

    def test_global_series(self, spark):
        ev = spark.createDataFrame(
            [(1, _ts(0), 1, "a", 0.0), (2, _ts(250), 1, "b", 0.0)], EVENT_SCHEMA
        )
        out = densify_time_series(ev, key_col=None, bucket_seconds=100)
        assert out.count() == 3  # buckets 0,100,200
        assert out.filter("n_events = 0").count() == 1

    def test_rejects_bad_bucket(self, spark):
        ev = spark.createDataFrame([(1, _ts(0), 1, "a", 0.0)], EVENT_SCHEMA)
        with pytest.raises(ValueError):
            densify_time_series(ev, bucket_seconds=0)


class TestThrottleEvents:
    def test_burst_chain_collapses_to_first(self, spark):
        rows = [
            # chain: 0, 30, 60 (each diff <= 60) -> ONE kept (id 1)
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(30), 1, "view", 0.0),
            (3, _ts(60), 1, "view", 0.0),
            # 61s after previous -> new burst
            (4, _ts(121), 1, "view", 0.0),
            # other type independent
            (5, _ts(10), 1, "click", 0.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        kept = {r["event_id"] for r in throttle_events(ev, gap_seconds=60).collect()}
        assert kept == {1, 4, 5}

    def test_tied_timestamps_keep_min_id(self, spark):
        rows = [
            (7, _ts(0), 1, "view", 0.0),
            (3, _ts(0), 1, "view", 0.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        kept = {r["event_id"] for r in throttle_events(ev, gap_seconds=60).collect()}
        assert kept == {3}

    def test_keeps_all_columns(self, spark):
        ev = spark.createDataFrame([(1, _ts(0), 1, "view", 2.5)], EVENT_SCHEMA)
        out = throttle_events(ev).collect()[0]
        assert out["value"] == 2.5 and out["ts"] is not None

    def test_rejects_bad_gap(self, spark):
        ev = spark.createDataFrame([(1, _ts(0), 1, "view", 0.0)], EVENT_SCHEMA)
        with pytest.raises(ValueError):
            throttle_events(ev, gap_seconds=0)


class TestAttributionLinear:
    def test_equal_split_with_remainder_to_last(self, spark):
        rows = [
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(10), 1, "click", 0.0),
            (3, _ts(20), 1, "view", 0.0),
            (4, _ts(30), 1, "purchase", 0.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = {
            r["touch_type"]: r["credit_ppm"]
            for r in attribution_counts(
                ev, "purchase", ("view", "click"), model="linear"
            ).collect()
        }
        # k=3: share 333333 each, last touch (view id 3) takes +1 remainder
        assert out == {"view": 333333 + 333334, "click": 333333}
        assert sum(out.values()) == 1_000_000

    def test_no_touch_gets_full_none_credit(self, spark):
        ev = spark.createDataFrame(
            [(1, _ts(0), 1, "purchase", 0.0)], EVENT_SCHEMA
        )
        out = attribution_counts(
            ev, "purchase", ("view",), model="linear"
        ).collect()
        assert [(r["touch_type"], r["credit_ppm"]) for r in out] == [
            ("(none)", 1_000_000)
        ]

    def test_total_credit_equals_converting_users(self, spark):
        rows = []
        eid = 0
        for u in range(5):
            for s, t in [(0, "view"), (5, "click"), (9, "view"), (20, "purchase")]:
                eid += 1
                rows.append((eid, _ts(s + u), u, t, 0.0))
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = attribution_counts(
            ev, "purchase", ("view", "click"), model="linear"
        ).collect()
        assert sum(r["credit_ppm"] for r in out) == 5_000_000


class TestTrainingBlocksStringIds:
    def test_composite_string_ids_under_ansi(self, spark):
        docs = spark.createDataFrame(
            [(f"doc#{i}", f"text {i}", 10) for i in range(12)],
            "pack_id string, text string, n_tokens long",
        )
        blocks = build_training_blocks(
            docs, budget=30, id_col="pack_id", num_groups=2, sep=" | "
        )
        rows = blocks.collect()  # materializes block_text (the ANSI cast path)
        assert sum(r["n_docs"] for r in rows) == 12
        assert all("text" in r["block_text"] for r in rows)

    def test_existing_scratch_column_survives(self, spark):
        from sparkplug_spark.operators import pack_token_budget

        docs = spark.createDataFrame(
            [(1, "t", 5, "keep")], "doc_id long, text string, n_tokens long, __oh string"
        )
        out = pack_token_budget(docs, budget=10)
        assert out.filter("__oh = 'keep'").count() == 1
        with pytest.raises(ValueError):
            pack_token_budget(docs, budget=10, order_hash_col="__oh")
        blocks = build_training_blocks(docs, budget=10)
        assert blocks.count() == 1


class TestRateAnomaliesDense:
    def test_empty_windows_join_baseline_and_flag(self, spark):
        # type "a": 10 events in window 0, then silence for 8 windows,
        # then 10 again -- with empty windows in the baseline, the silent
        # stretch drags the mean down and the bursts flag
        rows = []
        eid = 0
        for s in list(range(10)) + [900 + i for i in range(10)]:
            eid += 1
            rows.append((eid, _ts(s), 1, "a", 0.0))
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        from sparkplug_spark.operators import rate_anomalies

        dense = rate_anomalies(ev, window_seconds=100, k=1, include_empty=True)
        rows_out = dense.collect()
        base = min(r["window_start"] for r in rows_out)
        got = {
            (r["window_start"] - base) // 100: (r["n_events"], r["is_anomaly"])
            for r in rows_out
        }
        assert sorted(got) == list(range(10))  # windows 0..9 all present
        zero_windows = [v for v in got.values() if v[0] == 0]
        assert len(zero_windows) == 8
        assert got[2][0] == 0  # a silent window materialized
        # the two 10-event bursts are > 1 sigma above the dense mean (2.0)
        burst = [v for v in got.values() if v[0] == 10]
        assert len(burst) == 2 and all(flag for _, flag in burst)

    def test_sparse_mode_unchanged(self, spark):
        ev = spark.createDataFrame([(1, _ts(0), 1, "a", 0.0)], EVENT_SCHEMA)
        from sparkplug_spark.operators import rate_anomalies

        assert rate_anomalies(ev).count() == 1
