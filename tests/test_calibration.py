"""E148 calibration report: exact integer bucket math, per-bucket
positive rates, perfect-classifier separation."""

import pytest

from sparkplug_spark.operators import calibration_report


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, score_micros long, label boolean"
    )


class TestCalibrationReport:
    def test_exact_bucket_math(self, spark):
        # 25 rows, 10 buckets: bucket = ((rn-1)*10) div 25 + 1
        rows = _df(spark, [(i, i * 10, i % 2 == 0) for i in range(25)])
        out = {r["bucket"]: r for r in calibration_report(
            rows, "score_micros", "label", "id").collect()}
        want_sizes: dict[int, int] = {}
        for rn in range(1, 26):
            b = (rn - 1) * 10 // 25 + 1
            want_sizes[b] = want_sizes.get(b, 0) + 1
        assert {b: r["n"] for b, r in out.items()} == want_sizes
        assert sum(r["n"] for r in out.values()) == 25
        for r in out.values():
            assert r["pos_ppm"] == r["n_pos"] * 1_000_000 // r["n"]

    def test_perfect_classifier_separates(self, spark):
        # negatives score low, positives high -> low buckets 0 ppm,
        # high buckets 1e6 ppm
        rows = _df(
            spark,
            [(i, i, False) for i in range(50)]
            + [(100 + i, 1000 + i, True) for i in range(50)],
        )
        out = {r["bucket"]: r for r in calibration_report(
            rows, "score_micros", "label", "id").collect()}
        assert out[1]["pos_ppm"] == 0
        assert out[10]["pos_ppm"] == 1_000_000

    def test_score_extremes_and_sums(self, spark):
        rows = _df(spark, [(i, s, True) for i, s in enumerate([5, 1, 9, 3])])
        out = {r["bucket"]: r for r in calibration_report(
            rows, "score_micros", "label", "id", buckets=2).collect()}
        assert out[1]["min_score"] == 1 and out[1]["max_score"] == 3
        assert out[2]["min_score"] == 5 and out[2]["max_score"] == 9
        assert out[1]["sum_score"] == 4 and out[2]["sum_score"] == 14

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            calibration_report(
                _df(spark, [(1, 1, True)]), "score_micros", "label", "id",
                buckets=0,
            )
