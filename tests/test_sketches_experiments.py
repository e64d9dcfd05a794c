"""HLL sketch rollups and A/B readout components."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.sources import read_store

from sparkplug_spark.operators import (
    ab_test_report,
    build_distinct_sketches,
    rollup_distinct_sketches,
)


class TestDistinctSketches:
    def test_estimates_match_exact_within_rse(self, spark):
        # 3 groups x 400 distinct-ish values with overlap across days
        df = spark.range(4000).selectExpr(
            "id % 3 AS g", "(id % 5) AS day", "id % 700 AS v"
        )
        daily = build_distinct_sketches(df, ["g", "day"], "v", lg_k=14)
        exact_daily = {
            (r["g"], r["day"]): r["n"]
            for r in df.groupBy("g", "day")
            .agg(F.countDistinct("v").alias("n"))
            .collect()
        }
        for r in daily.collect():
            want = exact_daily[(r["g"], r["day"])]
            assert abs(r["n_est"] - want) <= max(3, 0.03 * want)

    def test_rollup_merges_not_sums(self, spark):
        # same values every day: union must dedup across days
        df = spark.range(300).selectExpr("id % 3 AS day", "id % 100 AS v")
        daily = build_distinct_sketches(df, ["day"], "v")
        [total] = rollup_distinct_sketches(daily, []).collect()
        assert abs(total["n_est"] - 100) <= 3  # NOT ~300

    def test_rollup_grouped(self, spark):
        df = spark.range(1000).selectExpr(
            "id % 2 AS g", "id % 4 AS day", "id AS v"
        )
        daily = build_distinct_sketches(df, ["g", "day"], "v")
        out = {r["g"]: r["n_est"] for r in rollup_distinct_sketches(daily, ["g"]).collect()}
        for g in (0, 1):
            assert abs(out[g] - 500) <= max(3, 0.03 * 500)

    def test_empty_keys_rejected(self, spark):
        df = spark.range(3).selectExpr("id AS v")
        with pytest.raises(ValueError):
            build_distinct_sketches(df, [], "v")


class TestAbTestReport:
    SCHEMA = "variant string, metric double"

    def test_exact_components(self, spark):
        rows = [
            ("control", 1.5),
            ("control", 2.5),
            ("treat", 3.25),
            ("treat", 5.0),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {
            r["variant"]: r
            for r in ab_test_report(
                df, "variant", "metric", control="control", scale=100
            ).collect()
        }
        c, t = out["control"], out["treat"]
        assert (c["n"], c["sum_micros"], c["mean_micros"]) == (2, 4_000_000, 2_000_000)
        # floor(1.5*100)=150, floor(2.5*100)=250 -> 150^2+250^2
        assert c["ssq_scaled"] == 150**2 + 250**2
        assert c["diff_vs_control_micros"] == 0
        assert (t["n"], t["sum_micros"], t["mean_micros"]) == (2, 8_250_000, 4_125_000)
        assert t["ssq_scaled"] == 325**2 + 500**2
        assert t["diff_vs_control_micros"] == 4_125_000 - 2_000_000

    def test_truncating_mean(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 2.0)], self.SCHEMA
        )
        [r] = ab_test_report(df, "variant", "metric", control="a").collect()
        # 5_000_000 div 3 truncates
        assert r["mean_micros"] == 1_666_666

    def test_missing_control_yields_null_diff(self, spark):
        df = spark.createDataFrame([("a", 1.0)], self.SCHEMA)
        [r] = ab_test_report(df, "variant", "metric", control="zz").collect()
        assert r["diff_vs_control_micros"] is None
        assert r["n"] == 1  # arms still reported


class TestHistogramSketch:
    def test_bins_and_clamp(self, spark):
        from sparkplug_spark.operators import build_histogram_sketch

        rows = [("a", -5.0), ("a", 0.0), ("a", 9.99), ("a", 55.0), ("a", 999.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {
            r["bin"]: r["n"]
            for r in build_histogram_sketch(df, ["g"], "v", lo=0.0, hi=100.0, bins=10).collect()
        }
        # -5 clamps into bin 0; 999 clamps into bin 9
        assert out == {0: 3, 5: 1, 9: 1}

    def test_rollup_equals_coarse_build(self, spark):
        from sparkplug_spark.operators import (
            build_histogram_sketch,
            rollup_histogram_percentiles,
        )
        import random

        rng = random.Random(3)
        rows = [
            (rng.choice("ab"), rng.choice("xy"), rng.uniform(0, 100))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "g string, h string, v double")
        fine = build_histogram_sketch(df, ["g", "h"], "v", 0.0, 100.0, bins=20)
        coarse = build_histogram_sketch(df, ["g"], "v", 0.0, 100.0, bins=20)
        a = rollup_histogram_percentiles(fine, ["g"], [50, 90], 0.0, 100.0, 20)
        b = rollup_histogram_percentiles(coarse, ["g"], [50, 90], 0.0, 100.0, 20)
        key = lambda r: (r["g"], r["pct"])
        assert sorted(map(tuple, a.collect()), key=lambda t: (t[0], t[1])) == \
               sorted(map(tuple, b.collect()), key=lambda t: (t[0], t[1]))

    def test_percentile_brackets_true_value(self, spark):
        from sparkplug_spark.operators import (
            build_histogram_sketch,
            rollup_histogram_percentiles,
        )
        import random

        rng = random.Random(11)
        vals = [rng.uniform(0, 1000) for _ in range(800)]
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        sk = build_histogram_sketch(df, ["g"], "v", 0.0, 1000.0, bins=100)
        out = {
            r["pct"]: (r["value_low"], r["value_high"])
            for r in rollup_histogram_percentiles(
                sk, ["g"], [50, 95], 0.0, 1000.0, 100
            ).collect()
        }
        import math

        svals = sorted(vals)
        for p in (50, 95):
            true = svals[math.ceil(p / 100 * len(svals)) - 1]
            lo, hi = out[p]
            assert lo <= true < hi + 1e-9

    def test_guards(self, spark):
        from sparkplug_spark.operators import (
            build_histogram_sketch,
            rollup_histogram_percentiles,
        )

        df = spark.createDataFrame([("g", 1.0)], "g string, v double")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            build_histogram_sketch(df, ["g"], "v", 5.0, 5.0)
        with _pytest.raises(ValueError):
            build_histogram_sketch(df, [], "v", 0.0, 1.0)
        sk = build_histogram_sketch(df, ["g"], "v", 0.0, 2.0)
        with _pytest.raises(ValueError):
            rollup_histogram_percentiles(sk, ["g"], [], 0.0, 2.0)
        with _pytest.raises(ValueError):
            rollup_histogram_percentiles(sk, ["g"], [0], 0.0, 2.0)


class TestStreamingDistinctSketches:
    def test_store_merges_across_batches(self, spark, tmp_path):
        import time

        from sparkplug_spark.operators import rollup_distinct_sketches
        from sparkplug_spark.streaming import streaming_distinct_sketches

        src = str(tmp_path / "sk_src")
        store = str(tmp_path / "sk_store")
        # batch 1: keys a:{1..40}, b:{1..20}
        spark.createDataFrame(
            [("a", i) for i in range(40)]
            + [("b", 1000 + i) for i in range(20)],
            "g string, v long",
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("g string, v long").parquet(src)
        q = (
            streaming_distinct_sketches(stream, store, ["g"], "v")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(120)
        est1 = {
            r["g"]: r["n_est"] for r in read_store(spark, store).collect()
        }
        assert abs(est1["a"] - 40) <= 2 and abs(est1["b"] - 20) <= 2

        # batch 2 overlaps batch 1: a gains 20..59 (union = 60, not 80)
        time.sleep(1)
        spark.createDataFrame(
            [("a", i) for i in range(20, 60)], "g string, v long"
        ).coalesce(1).write.mode("append").parquet(src)
        q = (
            streaming_distinct_sketches(stream, store, ["g"], "v")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(120)
        est2 = {
            r["g"]: r["n_est"] for r in read_store(spark, store).collect()
        }
        assert abs(est2["a"] - 60) <= 3   # merged, not summed (80)
        assert abs(est2["b"] - 20) <= 2   # untouched key survives the swap

        # the stored table feeds the batch rollup directly
        [total] = rollup_distinct_sketches(
            read_store(spark, store), []
        ).collect()
        assert abs(total["n_est"] - 80) <= 4


class TestStreamingHistogramSketches:
    def test_bins_accumulate_across_batches(self, spark, tmp_path):
        import time

        from sparkplug_spark.operators import rollup_histogram_percentiles
        from sparkplug_spark.streaming import streaming_histogram_sketches

        src = str(tmp_path / "h_src")
        store = str(tmp_path / "h_store")
        spark.createDataFrame(
            [("a", float(v)) for v in range(50)], "g string, v double"
        ).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("g string, v double").parquet(src)

        def run():
            q = (
                streaming_histogram_sketches(
                    stream, store, ["g"], "v", lo=0.0, hi=100.0, bins=10
                )
                .trigger(availableNow=True)
                .option("checkpointLocation", str(tmp_path / "h_ck"))
                .start()
            )
            q.awaitTermination(120)

        run()
        time.sleep(1)
        spark.createDataFrame(
            [("a", float(v)) for v in range(50, 100)], "g string, v double"
        ).coalesce(1).write.mode("append").parquet(src)
        run()
        store_df = read_store(spark, store)
        # 100 values uniform over [0,100) into 10 bins: each bin n=10
        assert {r["bin"]: r["n"] for r in store_df.collect()} == {
            b: 10 for b in range(10)
        }
        out = {
            r["pct"]: r["value_low"]
            for r in rollup_histogram_percentiles(
                store_df, ["g"], [50, 90], 0.0, 100.0, 10
            ).collect()
        }
        assert out[50] == 40.0 and out[90] == 80.0


class TestHistogramStoreReplaySafety:
    def test_replayed_batch_id_is_skipped(self, spark, tmp_path):
        from sparkplug_spark.streaming import _merge_histogram_batch

        store = str(tmp_path / "replay_store")
        b0 = spark.createDataFrame(
            [("a", float(v)) for v in range(10)], "g string, v double"
        )
        _merge_histogram_batch(b0, 0, store, ["g"], "v", 0.0, 10.0, 5)
        first = {
            (r["bin"]): r["n"]
            for r in read_store(spark, store).collect()
        }
        # at-least-once replay of batch 0 must be a no-op
        _merge_histogram_batch(b0, 0, store, ["g"], "v", 0.0, 10.0, 5)
        assert {
            r["bin"]: r["n"] for r in read_store(spark, store).collect()
        } == first
        # the NEXT batch id still merges
        _merge_histogram_batch(b0, 1, store, ["g"], "v", 0.0, 10.0, 5)
        doubled = {
            r["bin"]: r["n"] for r in read_store(spark, store).collect()
        }
        assert doubled == {b: n * 2 for b, n in first.items()}

    def test_half_finished_swap_recovers(self, spark, tmp_path):
        from sparkplug_spark.sources import recover_swap
        from sparkplug_spark.streaming import _merge_histogram_batch

        store = str(tmp_path / "crash_store")
        b0 = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0)], "g string, v double"
        )
        _merge_histogram_batch(b0, 0, store, ["g"], "v", 0.0, 10.0, 5)
        want = read_store(spark, store).collect()
        # simulate a crash between publish_over's two renames: live moved
        # aside to .swap_old, new live never landed
        import os

        os.rename(store, store + ".swap_old")
        assert recover_swap(spark, store)
        got = read_store(spark, store).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        # and the next merge sees the recovered store, not an empty one
        _merge_histogram_batch(b0, 1, store, ["g"], "v", 0.0, 10.0, 5)
        out = {r["bin"]: r["n"] for r in read_store(spark, store).collect()}
        # 1.0 -> bin 0, 2.0 -> bin 1; each doubled by the second batch
        assert out == {0: 2, 1: 2}


class TestBootstrapCi:
    """E214 deterministic Poisson bootstrap: cutoff pmf contract,
    coverage sanity, determinism, validation."""

    def test_poisson_cutoffs_pmf(self):
        import math

        from sparkplug_spark.operators import poisson_cutoffs

        cuts = poisson_cutoffs(1.0)
        assert cuts[-1] == 1 << 60 and cuts == sorted(cuts)
        prev = 0
        for k, c in enumerate(cuts[:-1]):
            mass = (c - prev) / (1 << 60)
            want = math.exp(-1.0) / math.factorial(k)
            assert abs(mass - want) < 1e-12, k
            prev = c

    def test_interval_brackets_mean_and_shrinks_with_n(self, spark):
        from sparkplug_spark.operators import bootstrap_ci

        rows = [(i, "g", float(50 + (i * 37) % 101)) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, g string, v double")
        r = bootstrap_ci(df, "v", by=["g"], n_boot=100).collect()[0]
        assert r["ci_lo_micros"] <= r["mean_micros"] <= r["ci_hi_micros"]
        width_400 = r["ci_hi_micros"] - r["ci_lo_micros"]
        small = spark.createDataFrame(rows[:40], "doc_id long, g string, v double")
        r2 = bootstrap_ci(small, "v", by=["g"], n_boot=100).collect()[0]
        width_40 = r2["ci_hi_micros"] - r2["ci_lo_micros"]
        assert width_40 > width_400  # ~sqrt(10) wider on 10x less data

    def test_deterministic_and_seed_sensitive(self, spark):
        from sparkplug_spark.operators import bootstrap_ci

        df = spark.createDataFrame(
            [(i, "a" if i % 2 else "b", float(i % 7)) for i in range(200)],
            "doc_id long, g string, v double",
        )
        a = sorted(map(tuple, bootstrap_ci(df, "v", by=["g"], n_boot=50).collect()))
        b = sorted(
            map(tuple,
                bootstrap_ci(df.repartition(9), "v", by=["g"], n_boot=50).collect())
        )
        assert a == b
        c = sorted(
            map(tuple, bootstrap_ci(df, "v", by=["g"], n_boot=50, seed=7).collect())
        )
        assert a != c

    def test_validation(self, spark):
        from sparkplug_spark.operators import bootstrap_ci, poisson_cutoffs

        df = spark.createDataFrame([(1, 1.0)], "doc_id long, v double")
        with pytest.raises(ValueError, match="n_boot"):
            bootstrap_ci(df, "v", n_boot=1)
        with pytest.raises(ValueError, match="alpha"):
            bootstrap_ci(df, "v", alpha=0.6)
        with pytest.raises(ValueError, match="lam"):
            poisson_cutoffs(0.0)


class TestCuped:
    """E215: variance reduction on a correlated covariate, effect
    preservation, no-correlation no-op, determinism."""

    def _df(self, spark, rho=True):
        import numpy as np

        rng = np.random.default_rng(1)
        x = rng.normal(100, 20, 3000)
        noise = rng.normal(0, 5, 3000)
        y = (0.8 * x if rho else 0.0) + noise + 50
        y = y + np.where(np.arange(3000) % 2 == 0, 2.0, 0.0)
        rows = [
            (i, "treat" if i % 2 == 0 else "ctrl", float(y[i]), float(x[i]))
            for i in range(3000)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, variant string, y double, x double"
        )

    def test_reduces_variance_keeps_effect(self, spark):
        from sparkplug_spark.operators import cuped_adjust

        out = {
            r["variant"]: r
            for r in cuped_adjust(self._df(spark), "y", "x", "variant").collect()
        }
        for r in out.values():
            assert r["var_reduction_ppm"] > 800_000  # rho^2 ~ 0.91
        raw = out["treat"]["mean_micros"] - out["ctrl"]["mean_micros"]
        adj = out["treat"]["mean_adj_micros"] - out["ctrl"]["mean_adj_micros"]
        # true effect 2.0: both estimates near it, adjusted not degraded
        assert abs(raw - 2_000_000) < 2_000_000
        assert abs(adj - 2_000_000) < 1_000_000

    def test_uncorrelated_covariate_is_noop(self, spark):
        from sparkplug_spark.operators import cuped_adjust

        out = cuped_adjust(
            self._df(spark, rho=False), "y", "x", "variant"
        ).collect()
        for r in out:
            assert r["var_reduction_ppm"] < 50_000
            assert abs(r["theta_nano"]) < 50_000_000  # theta ~ 0

    def test_partition_invariant(self, spark):
        from sparkplug_spark.operators import cuped_adjust

        df = self._df(spark)
        a = sorted(map(tuple, cuped_adjust(df, "y", "x", "variant").collect()))
        b = sorted(
            map(tuple,
                cuped_adjust(df.repartition(13), "y", "x", "variant").collect())
        )
        assert a == b


class TestDistinctStoreReplayGuard:
    def test_replayed_batch_id_is_skipped(self, spark, tmp_path):
        from sparkplug_spark.streaming import _merge_distinct_batch

        store = str(tmp_path / "hll_replay")
        b0 = spark.createDataFrame(
            [("a", i) for i in range(30)], "g string, v long"
        )
        _merge_distinct_batch(b0, 0, store, ["g"], "v", 12)
        first = read_store(spark, store).collect()
        assert first[0]["__last_batch"] == 0
        # redelivery of batch 0: store byte-identically unchanged (the
        # union is idempotent, but the guard must also keep __last_batch)
        _merge_distinct_batch(b0, 0, store, ["g"], "v", 12)
        again = read_store(spark, store).collect()
        assert [r["__last_batch"] for r in again] == [0]
        assert {r["g"]: r["n_est"] for r in again} == {
            r["g"]: r["n_est"] for r in first
        }
        # a NEW batch advances the watermark and merges
        b1 = spark.createDataFrame(
            [("a", i) for i in range(25, 55)], "g string, v long"
        )
        _merge_distinct_batch(b1, 1, store, ["g"], "v", 12)
        after = read_store(spark, store).collect()
        assert after[0]["__last_batch"] == 1
        assert abs(after[0]["n_est"] - 55) <= 3  # union, not 60

    def test_legacy_store_without_guard_column_merges_once(
        self, spark, tmp_path
    ):
        from sparkplug_spark.operators import build_distinct_sketches
        from sparkplug_spark.sources import manifest_publish
        from sparkplug_spark.streaming import _merge_distinct_batch

        store = str(tmp_path / "hll_legacy")
        legacy = build_distinct_sketches(
            spark.createDataFrame(
                [("a", i) for i in range(10)], "g string, v long"
            ),
            ["g"],
            "v",
            lg_k=12,
        )
        manifest_publish(
            spark,
            store,
            lambda tmp: legacy.write.mode("overwrite").parquet(tmp),
        )
        assert "__last_batch" not in read_store(spark, store).columns
        b = spark.createDataFrame(
            [("a", i) for i in range(5, 20)], "g string, v long"
        )
        _merge_distinct_batch(b, 0, store, ["g"], "v", 12)
        rows = read_store(spark, store).collect()
        assert rows[0]["__last_batch"] == 0  # column carried from now on
        assert abs(rows[0]["n_est"] - 20) <= 2
