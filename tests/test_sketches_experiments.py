"""HLL sketch rollups and A/B readout components."""

import pytest
from pyspark.sql import functions as F

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

    def test_missing_control_yields_empty(self, spark):
        df = spark.createDataFrame([("a", 1.0)], self.SCHEMA)
        assert ab_test_report(df, "variant", "metric", control="zz").count() == 0
