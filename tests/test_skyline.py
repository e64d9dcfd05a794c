"""E140 skyline / Pareto front: dominance semantics, tie survival,
brute-force twin on random data, null exclusion."""

import numpy as np
import pytest

from sparkplug_spark.operators import skyline


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, x double, y double")


class TestSkyline:
    def test_hand_example(self, spark):
        # minimize x, maximize y: (1,9) and (3,10) survive; (2,8) is
        # dominated by (1,9); (5,1) dominated by everything
        rows = _df(
            spark, [(0, 1.0, 9.0), (1, 3.0, 10.0), (2, 2.0, 8.0), (3, 5.0, 1.0)]
        )
        out = sorted(
            r["id"] for r in skyline(rows, ["x"], ["y"]).collect()
        )
        assert out == [0, 1]

    def test_identical_tuples_all_survive(self, spark):
        rows = _df(spark, [(0, 1.0, 1.0), (1, 1.0, 1.0), (2, 2.0, 0.5)])
        out = sorted(r["id"] for r in skyline(rows, ["x"], ["y"]).collect())
        assert out == [0, 1]

    def test_single_dim_is_min(self, spark):
        rows = _df(spark, [(0, 3.0, 0.0), (1, 1.0, 0.0), (2, 1.0, 5.0)])
        out = sorted(r["id"] for r in skyline(rows, minimize=["x"]).collect())
        assert out == [1, 2]  # both share the global min x

    def test_nulls_excluded(self, spark):
        rows = spark.createDataFrame(
            [(0, None, 1.0), (1, 2.0, 1.0)], "id long, x double, y double"
        )
        out = [r["id"] for r in skyline(rows, ["x"], ["y"]).collect()]
        assert out == [1]

    def test_brute_force_twin_3d(self, spark):
        rng = np.random.default_rng(7)
        pts = rng.integers(0, 40, size=(300, 3)).astype(float)
        rows = spark.createDataFrame(
            [(i, *map(float, p)) for i, p in enumerate(pts)],
            "id long, a double, b double, c double",
        ).repartition(8)
        got = sorted(
            r["id"]
            for r in skyline(rows, minimize=["a", "b"], maximize=["c"]).collect()
        )
        orient = pts * np.array([1.0, 1.0, -1.0])
        want = [
            i
            for i in range(len(pts))
            if not any(
                (orient[j] <= orient[i]).all() and (orient[j] < orient[i]).any()
                for j in range(len(pts))
            )
        ]
        assert got == want

    def test_validation(self, spark):
        rows = _df(spark, [(0, 1.0, 1.0)])
        with pytest.raises(ValueError):
            skyline(rows)
        with pytest.raises(ValueError):
            skyline(rows, minimize=["x"], maximize=["x"])
