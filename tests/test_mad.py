"""E147 MAD outlier flags: hand-computed lower-rank medians, robustness
to the outlier itself, per-group isolation, null drop."""

from sparkplug_spark.operators import mad_outliers


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


class TestMadOutliers:
    def test_hand_computed(self, spark):
        # grp a: values 1..5 + outlier 100 -> n=6, lower median = rank 3
        # sorted: 1,2,3,4,5,100 -> median 3; devs 2,1,0,1,2,97 sorted
        # 0,1,1,2,2,97 -> MAD = rank-3 value = 1; outlier iff dev > 3
        rows = _df(
            spark,
            [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 100])],
        )
        out = {r["id"]: r for r in mad_outliers(rows, "v", "grp", "id").collect()}
        assert out[0]["group_median"] == 3.0
        assert out[0]["group_mad"] == 1.0
        flagged = sorted(i for i, r in out.items() if r["is_outlier"])
        assert flagged == [5]

    def test_robust_to_extreme_outlier(self, spark):
        # classic failure of mean/std: one huge value must not mask itself
        vals = [10.0] * 20 + [1e9]
        rows = _df(spark, [(i, "g", v) for i, v in enumerate(vals)])
        out = mad_outliers(rows, "v", "grp", "id").collect()
        flagged = [r["id"] for r in out if r["is_outlier"]]
        assert flagged == [20]

    def test_groups_independent(self, spark):
        rows = _df(
            spark,
            [(0, "a", 1.0), (1, "a", 1.2), (2, "a", 50.0),
             (3, "b", 50.0), (4, "b", 50.5), (5, "b", 49.5)],
        )
        out = {r["id"]: r["is_outlier"] for r in
               mad_outliers(rows, "v", "grp", "id").collect()}
        assert out[2] is True   # 50 is wild in group a
        assert out[3] is False  # 50 is the norm in group b

    def test_nulls_dropped(self, spark):
        rows = spark.createDataFrame(
            [(0, "a", 1.0), (1, "a", None), (2, "a", 1.5)],
            "id long, grp string, v double",
        )
        out = mad_outliers(rows, "v", "grp", "id").collect()
        assert sorted(r["id"] for r in out) == [0, 2]

    def test_constant_group_no_flags(self, spark):
        rows = _df(spark, [(i, "c", 7.0) for i in range(5)])
        out = mad_outliers(rows, "v", "grp", "id").collect()
        assert not any(r["is_outlier"] for r in out)
