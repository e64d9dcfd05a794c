"""Round-4 batch 16: isotonic calibration (E167, pure-Python PAVA twin)
and split-conformal thresholds (E168)."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import calibrate_isotonic, conformal_thresholds


def _pava(points):
    """Pure-Python pool-adjacent-violators on (x, y) pairs sorted by x;
    returns the fitted value per input point (unit weights)."""
    pts = sorted(points)
    # each block: [sum_y, n, first_index, last_index]
    blocks = []
    for i, (_, y) in enumerate(pts):
        blocks.append([float(y), 1, i, i])
        while len(blocks) > 1 and (
            blocks[-2][0] / blocks[-2][1] > blocks[-1][0] / blocks[-1][1]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
            blocks[-1][3] = b[3]
    fitted = [0.0] * len(pts)
    for s, n, lo, hi in blocks:
        for i in range(lo, hi + 1):
            fitted[i] = s / n
    return {pts[i][0]: fitted[i] for i in range(len(pts))}


class TestCalibrateIsotonic:
    def test_matches_pava_twin_and_monotone(self, spark):
        # distinct scores, deliberately violating monotonicity in spots
        data = [
            (1.0, 0), (2.0, 1), (3.0, 0), (4.0, 0), (5.0, 1),
            (6.0, 1), (7.0, 0), (8.0, 1), (9.0, 1), (10.0, 1),
        ]
        df = spark.createDataFrame(data, ["score", "label"])
        out = sorted(
            (r["score"], r["calibrated"])
            for r in calibrate_isotonic(df, "score", "label").collect()
        )
        want = _pava(data)
        for x, yhat in out:
            assert abs(yhat - want[x]) < 1e-9, (x, yhat, want[x])
        ys = [y for _, y in out]
        assert all(a <= b + 1e-12 for a, b in zip(ys, ys[1:]))  # monotone
        assert all(0.0 <= y <= 1.0 for y in ys)  # pooled means of binary

    def test_null_rows_dropped(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1), (None, 0), (2.0, None)],
            "score double, label int",
        )
        out = calibrate_isotonic(df, "score", "label").collect()
        assert len(out) == 1 and out[0]["calibrated"] == 1.0


class TestConformalThresholds:
    def test_exact_rank_pick(self, spark):
        # n=9 per group, alpha=0.1: k = ceil(10*0.9) = 9 -> max value
        rows = [("a", float(v), v) for v in range(1, 10)]
        rows += [("b", 5.0, 100 + i) for i in range(4)]  # ties, n=4 -> k=5->4
        df = spark.createDataFrame(rows, ["g", "score", "id"])
        out = {
            r["g"]: (r["n"], r["k"], r["threshold"])
            for r in conformal_thresholds(
                df, "score", alpha_ppm=100000, group_col="g", id_col="id"
            ).collect()
        }
        assert out["a"] == (9, 9, 9.0)
        assert out["b"] == (4, 4, 5.0)  # k clamps to n

    def test_global_and_low_alpha(self, spark):
        df = spark.createDataFrame(
            [(float(v), v) for v in range(1, 101)], ["score", "id"]
        )
        r = conformal_thresholds(
            df, "score", alpha_ppm=500000, id_col="id"
        ).collect()[0]
        # k = ceil(101 * 0.5) = 51
        assert (r["n"], r["k"], r["threshold"]) == (100, 51, 51.0)

    def test_invalid_alpha(self, spark):
        df = spark.createDataFrame([(1.0, 1)], ["score", "id"])
        with pytest.raises(ValueError):
            conformal_thresholds(df, "score", alpha_ppm=0)


class TestDedupThresholdCurve:
    def test_counts_monotone_and_exact(self, spark):
        from sparkplug_spark.operators import dedup_threshold_curve

        rows = [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),      # J=1.0 with 1
            (3, "alpha beta gamma delta epsilon OMEGA"),     # high-J with 1,2
            (4, "completely different words entirely here"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r["threshold_ppm"]: (r["n_pairs"], r["n_docs"])
            for r in dedup_threshold_curve(
                df, thresholds_ppm=(500000, 900000, 1000000)
            ).collect()
        }
        assert set(out) == {500000, 900000, 1000000}
        # identical pair survives even at 1.0; zeros are rows, not gaps
        assert out[1000000] == (1, 2)
        # monotone: lower threshold can only add pairs/docs
        assert out[500000][0] >= out[900000][0] >= out[1000000][0]
        assert out[500000][1] >= out[900000][1] >= out[1000000][1]

    def test_invalid_thresholds(self, spark):
        from sparkplug_spark.operators import dedup_threshold_curve

        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            dedup_threshold_curve(df, thresholds_ppm=())
        with pytest.raises(ValueError):
            dedup_threshold_curve(df, thresholds_ppm=(0,))


class TestSuppressSmallCells:
    def test_suppression_and_metrics(self, spark):
        from pyspark.sql import Observation

        from sparkplug_spark.operators import suppress_small_cells

        df = spark.createDataFrame(
            [("a", 1.5)] * 5 + [("b", 2.0)] * 2 + [("c", 3.0)],
            ["g", "v"],
        )
        obs = Observation("sup")
        out = suppress_small_cells(df, ["g"], k=3, value_col="v", metrics=obs)
        rows = {(r["g"], r["n"], r["sum_micros"]) for r in out.collect()}
        assert rows == {("a", 5, 7500000)}
        assert obs.get == {"suppressed_cells": 2, "suppressed_rows": 3}

    def test_all_suppressed_reports_exact_zero_release(self, spark):
        from pyspark.sql import Observation

        from sparkplug_spark.operators import suppress_small_cells

        df = spark.createDataFrame([("a", 1.0), ("b", 1.0)], ["g", "v"])
        obs = Observation("sup0")
        out = suppress_small_cells(df, ["g"], k=5, metrics=obs)
        assert out.count() == 0
        assert obs.get == {"suppressed_cells": 2, "suppressed_rows": 2}

    def test_invalid_args(self, spark):
        import pytest as _pytest

        from sparkplug_spark.operators import suppress_small_cells

        df = spark.createDataFrame([("a", 1.0)], ["g", "v"])
        with _pytest.raises(ValueError):
            suppress_small_cells(df, [], k=3)
        with _pytest.raises(ValueError):
            suppress_small_cells(df, ["g"], k=0)


class TestIsotonicFitExact:
    def test_matches_pava_twin_on_ties_and_violations(self, spark):
        import math
        import random

        from sparkplug_spark.operators import isotonic_fit_exact

        random.seed(11)
        rows = [
            (float(s), 1 if random.random() < min(0.9, 0.1 + s / 30) else 0)
            for s in (random.randint(0, 25) for _ in range(1500))
        ]
        df = spark.createDataFrame(rows, "score double, label int")
        got = {
            r["score"]: (r["n"], r["n_pos"], r["calibrated_ppm"])
            for r in isotonic_fit_exact(df, "score", "label").collect()
        }
        # tied scores must share one fitted value: aggregate to weighted
        # blocks FIRST (the _pava helper's per-point form lets the
        # within-tie label order split a tie — a different, non-block
        # solution), then pool adjacent violators
        agg = {}
        for s, y in rows:
            n0, p0 = agg.get(s, (0, 0))
            agg[s] = (n0 + 1, p0 + y)
        blocks = []  # [sum_y, n, scores...]
        for s in sorted(agg):
            n, p = agg[s]
            blocks.append([float(p), n, [s]])
            while len(blocks) > 1 and (
                blocks[-2][0] / blocks[-2][1] >= blocks[-1][0] / blocks[-1][1]
            ):
                b = blocks.pop()
                blocks[-1][0] += b[0]
                blocks[-1][1] += b[1]
                blocks[-1][2] += b[2]
        want = {}
        for sy, n, scores in blocks:
            for s in scores:
                want[s] = sy / n
        for score, (n, n_pos, ppm) in got.items():
            assert ppm == math.floor(want[score] * 1_000_000), score
        exp_n = {}
        for s, y in rows:
            a, b = exp_n.get(s, (0, 0))
            exp_n[s] = (a + 1, b + y)
        assert {s: v[:2] for s, v in got.items()} == exp_n

    def test_agrees_with_ml_tier(self, spark):
        import math

        from sparkplug_spark.operators import (
            calibrate_isotonic,
            isotonic_fit_exact,
        )

        rows = [
            (float(i % 13), 1 if (i * 2654435761) % 97 < 20 + (i % 13) * 4 else 0)
            for i in range(800)
        ]
        df = spark.createDataFrame(rows, "score double, label int")
        exact = {
            r["score"]: r["calibrated_ppm"]
            for r in isotonic_fit_exact(df, "score", "label").collect()
        }
        ml = {
            r["score"]: math.floor(r["calibrated"] * 1_000_000)
            for r in calibrate_isotonic(df, "score", "label").collect()
        }
        assert set(ml) == set(exact)
        mismatch = {s for s in ml if abs(ml[s] - exact[s]) > 1}
        assert not mismatch, sorted(mismatch)[:5]

    def test_block_guard_raises(self, spark):
        from sparkplug_spark.operators import isotonic_fit_exact

        df = spark.createDataFrame(
            [(float(i), i % 2) for i in range(50)], "score double, label int"
        )
        with pytest.raises(ValueError, match="bin scores first"):
            isotonic_fit_exact(df, "score", "label", max_blocks=10)
