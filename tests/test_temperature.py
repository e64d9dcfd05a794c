"""E143 temperature mixture planner: exact ppm shares, boost direction,
tau_halvings, zero-weight guard."""

import math

import pytest

from sparkplug_spark.operators import temperature_mixture


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, n_chars long")


class TestTemperatureMixture:
    def test_exact_hand_values(self, spark):
        rows = {
            r["source"]: r
            for r in temperature_mixture(
                _df(spark, [("big", 900), ("small", 100)])
            ).collect()
        }
        sb, ss = math.floor(math.sqrt(900)), math.floor(math.sqrt(100))  # 30, 10
        assert rows["big"]["natural_ppm"] == 900 * 1_000_000 // 1000
        assert rows["big"]["temp_ppm"] == sb * 1_000_000 // (sb + ss)
        assert rows["small"]["temp_ppm"] == ss * 1_000_000 // (sb + ss)
        # flattening: small source boosted above natural, big damped
        assert rows["small"]["boost_x1000"] > 1000
        assert rows["big"]["boost_x1000"] < 1000

    def test_equal_sources_unchanged(self, spark):
        rows = temperature_mixture(
            _df(spark, [("a", 400), ("b", 400)])
        ).collect()
        for r in rows:
            assert r["natural_ppm"] == r["temp_ppm"] == 500_000

    def test_tau_quarter_flattens_harder(self, spark):
        df = _df(spark, [("big", 10_000_000), ("small", 10_000)])
        t1 = {r["source"]: r["temp_ppm"] for r in temperature_mixture(df).collect()}
        t2 = {
            r["source"]: r["temp_ppm"]
            for r in temperature_mixture(df, tau_halvings=2).collect()
        }
        assert t2["small"] > t1["small"]

    def test_multiple_rows_per_source_summed(self, spark):
        rows = {
            r["source"]: r
            for r in temperature_mixture(
                _df(spark, [("a", 50), ("a", 50), ("b", 300)])
            ).collect()
        }
        assert rows["a"]["n_rows"] == 2
        assert rows["a"]["weight"] == 100

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            temperature_mixture(_df(spark, [("a", 1)]), tau_halvings=0)
