"""Round-4 batch 5: incremental connected components (E154), streaming
rollup store (E155), categorical column profile (E156)."""

import math

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    categorical_profile,
    near_dup_groups,
    rollup_query,
    update_components,
)


def _cc(spark, pairs):
    return near_dup_groups(
        spark.createDataFrame(pairs, ["id_a", "id_b"])
    )


class TestUpdateComponents:
    def _check(self, spark, old_pairs, new_pairs):
        """Incremental result must equal full recompute over all pairs."""
        labels = _cc(spark, old_pairs)
        got = {
            (r["id"], r["group_id"])
            for r in update_components(
                labels, spark.createDataFrame(new_pairs, ["id_a", "id_b"])
            ).collect()
        }
        want = {
            (r["id"], r["group_id"])
            for r in _cc(spark, old_pairs + new_pairs).collect()
        }
        assert got == want
        # exactly one label per node
        assert len({i for i, _ in got}) == len(got)
        return got

    def test_merge_two_old_components(self, spark):
        # {1,2} and {5,6} merge through a new 2-5 bridge; {8,9} untouched
        self._check(spark, [(1, 2), (5, 6), (8, 9)], [(2, 5)])

    def test_new_node_becomes_new_min(self, spark):
        # new node 0 joins {5,6}: merged component must relabel to 0
        got = self._check(spark, [(5, 6), (8, 9)], [(0, 6)])
        assert (5, 0) in got and (6, 0) in got and (0, 0) in got

    def test_brand_new_component_and_chain_merge(self, spark):
        # chain 1-2 .. 3-4 joined by 2-3; plus a disjoint new pair 20-21
        got = self._check(spark, [(1, 2), (3, 4)], [(2, 3), (20, 21)])
        assert (4, 1) in got and (21, 20) in got

    def test_no_new_edges_passthrough(self, spark):
        labels = _cc(spark, [(1, 2), (5, 6)])
        new = spark.createDataFrame([], "id_a long, id_b long")
        got = {
            (r["id"], r["group_id"])
            for r in update_components(labels, new).collect()
        }
        assert got == {(1, 1), (2, 1), (5, 5), (6, 5)}

    def test_self_pair_seeds_singleton(self, spark):
        # a (u, u) pair carries no connectivity but asserts the node
        # exists — both full recompute and incremental keep it as a
        # singleton component
        got = self._check(spark, [(1, 2)], [(7, 7), (1, 2)])
        assert (7, 7) in got


class TestStreamingRollupStore:
    def test_batches_accumulate_and_replay_is_noop(self, spark, tmp_path):
        from sparkplug_spark.streaming import _merge_rollup_batch

        store = str(tmp_path / "roll_store")

        def batch(rows):
            return spark.createDataFrame(
                rows, ["ts_s", "event_type", "value"]
            ).select(
                F.to_timestamp("ts_s").alias("ts"), "event_type", "value"
            )

        b0 = batch([("2024-01-01 10:00:00", "view", 1.5),
                    ("2024-01-01 11:00:00", "view", 2.5)])
        b1 = batch([("2024-01-01 12:00:00", "view", 4.0),
                    ("2024-01-02 09:00:00", "click", 1.0)])
        _merge_rollup_batch(b0, 0, store, "ts", "event_type", "value")
        _merge_rollup_batch(b1, 1, store, "ts", "event_type", "value")
        # replayed batch must not double-count
        _merge_rollup_batch(b1, 1, store, "ts", "event_type", "value")
        day = {
            (str(r["grain_start"]), r["agg_key"]): (r["n"], r["sum_micros"])
            for r in rollup_query(spark, store, grain="day")
            .drop("__last_batch")
            .collect()
        }
        assert day == {
            ("2024-01-01", "view"): (3, 8000000),
            ("2024-01-02", "click"): (1, 1000000),
        }

    def test_file_stream_end_to_end(self, spark, tmp_path):
        import time

        from sparkplug_spark.streaming import streaming_rollup_store

        src = str(tmp_path / "r_src")
        store = str(tmp_path / "r_store")
        schema = "ts timestamp, event_type string, value double"

        def write(rows):
            spark.createDataFrame(rows, ["ts_s", "event_type", "value"]).select(
                F.to_timestamp("ts_s").alias("ts"), "event_type", "value"
            ).coalesce(1).write.mode("append").parquet(src)

        write([("2024-01-01 10:00:00", "view", 1.5)])
        stream = spark.readStream.schema(schema).parquet(src)

        def run():
            q = (
                streaming_rollup_store(stream, store)
                .trigger(availableNow=True)
                .option("checkpointLocation", str(tmp_path / "r_ck"))
                .start()
            )
            q.awaitTermination(120)

        run()
        time.sleep(1)
        write([("2024-01-01 20:00:00", "view", 2.0),
               ("2024-02-03 08:00:00", "click", 3.0)])
        run()
        month = {
            (str(r["grain_start"]), r["agg_key"]): (r["n"], r["sum_micros"])
            for r in rollup_query(spark, store, grain="month")
            .drop("__last_batch")
            .collect()
        }
        assert month == {
            ("2024-01-01", "view"): (2, 3500000),
            ("2024-02-01", "click"): (1, 3000000),
        }


class TestCategoricalProfile:
    def test_exact_stats(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 1), ("b", 2), ("c", None), (None, 3)],
            ["k", "v"],
        )
        out = {r["col_name"]: r for r in categorical_profile(df, ["k", "v"]).collect()}

        def nano(x):
            return math.floor(x * 1e9 + 0.5)

        k = out["k"]
        assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (5, 1, 3)
        assert (k["mode_value"], k["mode_n"]) == ("a", 2)
        assert k["mode_share_ppm"] == 500000
        # H over counts [2,1,1]: nano(ln 4) - (nano(2 ln 2)) // 4
        assert k["entropy_nanonats"] == nano(math.log(4)) - nano(2 * math.log(2)) // 4
        v = out["v"]
        assert (v["n_rows"], v["n_nulls"], v["n_distinct"]) == (5, 1, 3)
        # tie between '2' and '3' (and '1' has 2) -> mode is '1'
        assert (v["mode_value"], v["mode_n"]) == ("1", 2)

    def test_tie_breaks_to_smallest_value(self, spark):
        df = spark.createDataFrame([("b",), ("a",)], ["k"])
        r = categorical_profile(df, ["k"]).collect()[0]
        assert (r["mode_value"], r["mode_n"]) == ("a", 1)

    def test_empty_cols_raise(self, spark):
        df = spark.createDataFrame([(1,)], ["a"])
        with pytest.raises(ValueError):
            categorical_profile(df, [])


class TestRankNormalize:
    def test_global_and_grouped(self, spark):
        from sparkplug_spark.operators import rank_normalize

        df = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 30), (3, "b", 20), (4, "b", 20), (5, "a", None)],
            ["id", "g", "v"],
        )
        g = {
            r["id"]: (r["rank"], r["rank_ppm"])
            for r in rank_normalize(df, "v", "id").collect()
        }
        # null row dropped; ties ordered by id
        assert g == {1: (1, 0), 3: (2, 333333), 4: (3, 666666), 2: (4, 1000000)}
        per = {
            r["id"]: (r["rank"], r["rank_ppm"])
            for r in rank_normalize(df, "v", "id", group_col="g").collect()
        }
        assert per == {1: (1, 0), 2: (2, 1000000), 3: (1, 0), 4: (2, 1000000)}

    def test_single_row_group_gets_zero(self, spark):
        from sparkplug_spark.operators import rank_normalize

        df = spark.createDataFrame([(1, "a", 5)], ["id", "g", "v"])
        r = rank_normalize(df, "v", "id", group_col="g").collect()[0]
        assert (r["rank"], r["rank_ppm"]) == (1, 0)


class TestLayoutSkippingReport:
    def test_sorted_layout_prunes_unsorted_does_not(self, spark, tmp_path):
        from sparkplug_spark.sources import layout_skipping_report, write_sorted

        df = spark.range(0, 4000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("x")
        )
        sorted_path = str(tmp_path / "sorted")
        write_sorted(df, sorted_path, ["k"], num_files=8)
        rep = layout_skipping_report(spark, sorted_path, "k").collect()
        assert len(rep) == 8
        assert sum(r["n_rows"] for r in rep) == 4000
        # range-partitioned on k: envelopes are disjoint -> nothing overlaps
        assert all(r["n_overlapping"] == 0 for r in rep)
        # ranks follow the envelope order
        mins = [r["min_v"] for r in sorted(rep, key=lambda r: r["file_rank"])]
        assert mins == sorted(mins)

        unsorted_path = str(tmp_path / "unsorted")
        # round-robin: every file spans nearly the whole k domain
        df.repartition(8).write.parquet(unsorted_path)
        rep2 = layout_skipping_report(spark, unsorted_path, "k").collect()
        assert all(r["n_overlapping"] == len(rep2) - 1 for r in rep2)


class TestFeatureDrift:
    def test_identical_distributions_score_zero(self, spark):
        from sparkplug_spark.operators import feature_drift

        df = spark.createDataFrame([(float(i % 10),) for i in range(100)], ["v"])
        out = feature_drift(df, df, "v", lo=0.0, hi=10.0, bins=10).collect()
        assert all(r["psi_nanonats"] == 0 for r in out)
        assert sum(r["n_base"] for r in out) == 100

    def test_shifted_distribution_scores_high(self, spark):
        from sparkplug_spark.operators import feature_drift

        base = spark.createDataFrame([(1.0,)] * 50, ["v"])
        curr = spark.createDataFrame([(9.0,)] * 50, ["v"])
        out = feature_drift(base, curr, "v", lo=0.0, hi=10.0, bins=10).collect()
        total = sum(r["psi_nanonats"] for r in out)
        assert total > 250_000_000  # PSI > 0.25: "shifted" per convention
        assert all(r["psi_nanonats"] >= 0 for r in out)

    def test_edge_buckets_and_nulls(self, spark):
        from sparkplug_spark.operators import feature_drift

        base = spark.createDataFrame([(-5.0,), (15.0,), (None,)], ["v"])
        curr = spark.createDataFrame([(5.0,)], ["v"])
        out = {r["bucket"]: r for r in feature_drift(
            base, curr, "v", lo=0.0, hi=10.0, bins=10
        ).collect()}
        assert set(out) == {-1, 10, 5}
        assert out[-1]["n_base"] == 1 and out[10]["n_base"] == 1
        assert out[5]["n_curr"] == 1


class TestPseudonymize:
    def test_stable_namespaced_and_null_safe(self, spark):
        from sparkplug_spark.operators import pseudonymize

        df = spark.createDataFrame(
            [(1, "alice", "x"), (2, "alice", None), (1, "bob", "y")],
            ["uid", "name", "note"],
        )
        out = pseudonymize(df, ["uid", "name", "note"], salt="s").collect()
        uids = [r["uid"] for r in out]
        names = [r["name"] for r in out]
        # deterministic: same input -> same token; joins keep working
        assert uids[0] == uids[2] and uids[0] != uids[1]
        assert names[0] == names[1] and names[0] != names[2]
        # NULL stays NULL
        assert out[1]["note"] is None
        # all tokens 16 hex chars
        assert all(len(t) == 16 for t in uids + names if t)

    def test_namespace_isolation_and_salt_rotation(self, spark):
        from sparkplug_spark.operators import pseudonymize

        df = spark.createDataFrame([("7", "7")], ["a", "b"])
        r = pseudonymize(df, ["a", "b"], salt="s").collect()[0]
        assert r["a"] != r["b"]  # same value, different columns
        shared = pseudonymize(
            df, ["a", "b"], salt="s", namespaces={"a": "k", "b": "k"}
        ).collect()[0]
        assert shared["a"] == shared["b"]  # shared namespace: joinable
        r2 = pseudonymize(df, ["a"], salt="other").collect()[0]
        assert r2["a"] != r["a"]  # salt rotates the mapping

    def test_empty_cols_raise(self, spark):
        from sparkplug_spark.operators import pseudonymize

        with pytest.raises(ValueError):
            pseudonymize(spark.createDataFrame([(1,)], ["a"]), [])


class TestInterpolateSeries:
    def _series(self, spark, rows):
        return spark.createDataFrame(
            rows, ["event_type", "s", "value"]
        ).select("event_type", F.timestamp_seconds("s").alias("ts"), "value")

    def test_midpoint_and_range_clipping(self, spark):
        from sparkplug_spark.operators import interpolate_series

        df = self._series(
            spark, [("a", 0, 1.0), ("a", 7200, 4.0), ("b", 3600, 5.0)]
        )
        out = {
            (r["event_type"], r["grid_start"]): (r["value_micros"], r["src"])
            for r in interpolate_series(df, grid_seconds=3600).collect()
        }
        assert out == {
            ("a", 0): (1000000, "obs"),
            ("a", 3600): (2500000, "interp"),
            ("a", 7200): (4000000, "obs"),
            ("b", 3600): (5000000, "obs"),  # single point: no extrapolation
        }

    def test_negative_slope_floor_division(self, spark):
        from sparkplug_spark.operators import interpolate_series

        # 1.0 -> 0.0 over 3 grid steps: exact thirds floor to
        # 666666 and 333333 (floor, NOT truncate-toward-zero of a
        # negative intermediate: v = 1e6 + (-1e6 * k) fdiv 3)
        df = self._series(spark, [("a", 0, 1.0), ("a", 10800, 0.0)])
        out = {
            r["grid_start"]: r["value_micros"]
            for r in interpolate_series(df, grid_seconds=3600).collect()
        }
        assert out == {0: 1000000, 3600: 666666, 10800: 0, 7200: 333333}

    def test_same_second_ties_pick_latest_then_larger(self, spark):
        from sparkplug_spark.operators import interpolate_series

        df = self._series(
            spark,
            [("a", 100, 2.0), ("a", 200, 9.0), ("a", 200, 3.0), ("a", 3600, 1.0)],
        )
        out = {
            r["grid_start"]: (r["value_micros"], r["src"])
            for r in interpolate_series(df, grid_seconds=3600).collect()
        }
        # bucket 0 collapses to the obs at s=200 (latest; tie -> larger v=9)
        assert out[0] == (9000000, "obs")
        assert out[3600] == (1000000, "obs")


class TestWeightedSampleK:
    def test_exact_k_no_dupes_deterministic(self, spark):
        from sparkplug_spark.operators import weighted_sample_k

        df = spark.createDataFrame(
            [(i, float(i % 7 + 1)) for i in range(200)], ["doc_id", "w"]
        )
        a = weighted_sample_k(df, 20, "w").collect()
        b = weighted_sample_k(df, 20, "w").collect()
        ids = [r["doc_id"] for r in a]
        assert len(ids) == 20 and len(set(ids)) == 20
        assert {r["doc_id"] for r in a} == {r["doc_id"] for r in b}
        fresh = {r["doc_id"] for r in weighted_sample_k(df, 20, "w", salt="v2").collect()}
        assert fresh != set(ids)  # new salt = fresh draw

    def test_weight_proportionality_and_exclusions(self, spark):
        from sparkplug_spark.operators import weighted_sample_k

        rows = [(0, 1e9)] + [(i, 1e-6) for i in range(1, 10)]
        rows += [(100, 0.0), (101, None)]
        df = spark.createDataFrame(rows, ["doc_id", "w"])
        win = weighted_sample_k(df, 1, "w").collect()
        assert [r["doc_id"] for r in win] == [0]  # 1e15x odds: heavy row wins
        all_k = weighted_sample_k(df, 50, "w").collect()
        ids = {r["doc_id"] for r in all_k}
        assert 100 not in ids and 101 not in ids  # zero/NULL weight excluded
        assert len(all_k) == 10  # fewer qualifying rows than k -> all of them

    def test_invalid_k(self, spark):
        from sparkplug_spark.operators import weighted_sample_k

        with pytest.raises(ValueError):
            weighted_sample_k(spark.createDataFrame([(1, 1.0)], ["doc_id", "w"]), 0, "w")


class TestAudienceOverlap:
    def test_exact_overlap_counts(self, spark):
        from sparkplug_spark.operators import audience_overlap

        rows = [
            (1, "view"), (1, "view"), (1, "click"),
            (2, "view"),
            (3, "click"), (3, "buy"),
            (4, None), (None, "view"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        out = {
            (r["key_a"], r["key_b"]): (
                r["users_a"], r["users_b"], r["users_both"], r["jaccard_ppm"]
            )
            for r in audience_overlap(df).collect()
        }
        # view users {1,2}, click {1,3}, buy {3}; nulls excluded
        assert out[("click", "view")] == (2, 2, 1, 333333)
        assert out[("buy", "click")] == (1, 2, 1, 500000)
        # disjoint pairs are not emitted (no shared user rows)
        assert ("buy", "view") not in out


class TestReadability:
    def test_exact_counts_and_formula(self, spark):
        from sparkplug_spark.operators import readability_scores

        rows = [
            (1, "The cat sat. The dog ran!"),
            (2, "no terminal punctuation here"),
            (3, "..."),
        ]
        out = {
            r["doc_id"]: r
            for r in readability_scores(
                spark.createDataFrame(rows, ["doc_id", "text"])
            ).collect()
        }
        d1 = out[1]
        # words: the cat sat the dog ran = 6; sentences: 2;
        # syllables (vowel runs): e,a,a,e,o,a = 6
        assert (d1["n_words"], d1["n_sentences"], d1["n_syllables"]) == (6, 2, 6)
        assert d1["flesch_milli"] == 206835 - 1015 * 6 // 2 - 84600 * 6 // 6
        d2 = out[2]
        assert d2["n_sentences"] == 1  # headline floor
        assert 3 not in out  # zero words -> omitted


class TestRankingMetrics:
    def test_exact_metrics(self, spark):
        import math

        from sparkplug_spark.operators import ranking_metrics

        results = spark.createDataFrame(
            [("q1", d, r) for r, d in enumerate([10, 20, 30, 40], 1)]
            + [("q2", d, r) for r, d in enumerate([50, 60], 1)],
            ["query_id", "doc_id", "rank"],
        )
        truth = spark.createDataFrame(
            [("q1", 20), ("q1", 40), ("q1", 99), ("q3", 1)],
            ["query_id", "doc_id"],
        )
        out = {r["query_id"]: r for r in ranking_metrics(results, truth, k=10).collect()}

        def nano(x):
            return math.floor(x * 1e9 + 0.5)

        q1 = out["q1"]
        assert (q1["n_results"], q1["n_relevant"], q1["hits"]) == (4, 3, 2)
        assert q1["precision_ppm"] == 500000
        assert q1["recall_ppm"] == 666666
        assert q1["mrr_ppm"] == 500000  # first relevant at rank 2
        dcg = nano(1 / math.log2(3)) + nano(1 / math.log2(5))
        idcg = nano(1 / math.log2(2)) + nano(1 / math.log2(3)) + nano(1 / math.log2(4))
        assert q1["ndcg_ppm"] == dcg * 1000000 // idcg
        q2 = out["q2"]
        assert (q2["hits"], q2["mrr_ppm"]) == (0, 0)
        assert q2["recall_ppm"] is None and q2["ndcg_ppm"] is None
        assert "q3" not in out  # truth-only queries are not scored

    def test_invalid_k(self, spark):
        from sparkplug_spark.operators import ranking_metrics

        df = spark.createDataFrame([("q", 1, 1)], ["query_id", "doc_id", "rank"])
        with pytest.raises(ValueError):
            ranking_metrics(df, df.select("query_id", "doc_id"), k=0)


class TestMutualInformation:
    def test_independent_and_determined(self, spark):
        import math

        from sparkplug_spark.operators import mutual_information

        def nano(x):
            return math.floor(x * 1e9 + 0.5)

        # perfectly determined: b = f(a), uniform over 2x values
        det = spark.createDataFrame(
            [("x", "u")] * 4 + [("y", "v")] * 4, ["a", "b"]
        )
        r = mutual_information(det, "a", "b").collect()[0]
        assert r["n_rows"] == 8 and r["n_a"] == 2 and r["n_b"] == 2
        # MI == H(a) == H(b) == ln 2, up to the two quantization paths
        # (per-pair nano terms vs the entropy fold) differing by ±1 nano
        assert abs(r["mi_nanonats"] - r["h_a_nanonats"]) <= 2
        assert abs(r["mi_nanonats"] - r["h_b_nanonats"]) <= 2
        assert abs(r["mi_nanonats"] - nano(math.log(2))) <= 2

        # independent: every (a, b) combination equally likely
        ind = spark.createDataFrame(
            [(a, b) for a in "xy" for b in "uv" for _ in range(3)], ["a", "b"]
        )
        r2 = mutual_information(ind, "a", "b").collect()[0]
        assert abs(r2["mi_nanonats"]) <= 4  # ~0 up to quantization
        assert r2["n_pairs"] == 4


class TestWeightedSampleKGrouped:
    def test_exact_k_per_group_and_global_unchanged(self, spark):
        from sparkplug_spark.operators import weighted_sample_k

        df = spark.createDataFrame(
            [(i, "g%d" % (i % 3), float(i % 5 + 1)) for i in range(90)]
            + [(100, "tiny", 1.0)],
            ["doc_id", "src", "w"],
        )
        per = weighted_sample_k(df, 5, "w", group_col="src").collect()
        counts = {}
        for r in per:
            counts[r["src"]] = counts.get(r["src"], 0) + 1
        assert counts == {"g0": 5, "g1": 5, "g2": 5, "tiny": 1}
        # global tier unaffected by the new param's default
        g = weighted_sample_k(df, 7, "w").collect()
        assert len(g) == 7 and len({r["doc_id"] for r in g}) == 7
        # grouped draw is reproducible
        again = {r["doc_id"] for r in weighted_sample_k(df, 5, "w", group_col="src").collect()}
        assert again == {r["doc_id"] for r in per}


class TestReviewHardening:
    def test_mi_includes_null_category(self, spark):
        import math

        from sparkplug_spark.operators import mutual_information

        def nano(x):
            return math.floor(x * 1e9 + 0.5)

        # NULL is a real category: b is fully determined by a (NULL<->v)
        df = spark.createDataFrame(
            [("x", "u")] * 3 + [(None, "v")] * 3, ["a", "b"]
        )
        r = mutual_information(df, "a", "b").collect()[0]
        assert r["n_pairs"] == 2 and r["n_a"] == 2
        assert abs(r["mi_nanonats"] - nano(math.log(2))) <= 2

    def test_weighted_sample_k_null_id_excluded(self, spark):
        from sparkplug_spark.operators import weighted_sample_k

        df = spark.createDataFrame(
            [(1, 1.0), (None, 1e12), (2, 1.0)], "doc_id long, w double"
        )
        ids = {r["doc_id"] for r in weighted_sample_k(df, 3, "w").collect()}
        assert ids == {1, 2}  # the NULL id never wins, whatever its weight

    def test_conformal_global_no_single_partition_window(self, spark):
        from sparkplug_spark.operators import conformal_thresholds

        df = spark.createDataFrame(
            [(float(v), v) for v in range(1, 51)], ["score", "id"]
        )
        out = conformal_thresholds(df, "score", alpha_ppm=200000, id_col="id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        r = out.collect()[0]
        assert (r["n"], r["k"]) == (50, 41)  # ceil(51*0.8) = 41
        # the global tier must rank via range-distributed prefix sums —
        # no Window node anywhere (the final 1-row scalar aggregate's
        # SinglePartition exchange is inherent and carries only partials)
        assert "Window" not in plan

    def test_feature_drift_validation(self, spark):
        from sparkplug_spark.operators import feature_drift

        df = spark.createDataFrame([(1.0,)], ["v"])
        with pytest.raises(ValueError):
            feature_drift(df, df, "v", lo=0.0, hi=10.0, bins=0)
        with pytest.raises(ValueError):
            feature_drift(df, df, "v", lo=10.0, hi=10.0, bins=5)

    def test_isotonic_preserves_score_type(self, spark):
        from sparkplug_spark.operators import calibrate_isotonic

        df = spark.createDataFrame([(1, 0), (2, 1), (3, 1)], "score int, label int")
        out = calibrate_isotonic(df, "score", "label")
        assert dict(out.dtypes)["score"] == "int"
