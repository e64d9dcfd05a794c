"""E184 rolling active users (exact DAU/WAU) and E185 referential
audit: window semantics, NULL handling, clean-FK zero case."""

import datetime

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import referential_audit, rolling_active_users


def _ts(day, hour=1):
    return datetime.datetime(2024, 1, day, hour, 0, 0)


class TestRollingActiveUsers:
    def test_windows_count_trailing_distincts(self, spark):
        rows = [
            (_ts(1), 1), (_ts(1), 2), (_ts(1, 23), 1),  # day 1: {1,2}
            (_ts(2), 3),                                 # day 2: {3}
            (_ts(9), 1),                                 # day 9: {1}
            (_ts(9), None),                              # NULL user dropped
        ]
        df = spark.createDataFrame(rows, "ts timestamp, user_id long")
        got = {
            r["day_idx"]: (r["active_1d"], r["active_7d"])
            for r in rolling_active_users(df, windows=(1, 7)).collect()
        }
        d1 = int(_ts(1).replace(tzinfo=datetime.timezone.utc).timestamp()) // 86400
        assert got[d1] == (2, 2)
        assert got[d1 + 1] == (1, 3)  # {3} today; {1,2,3} over 7 days
        # day 9: day 2 falls out of the trailing 7 (days 3..9), day 1 too
        assert got[d1 + 8] == (1, 1)
        assert set(got) == {d1, d1 + 1, d1 + 8}  # eventless days: no row

    def test_rejects_bad_windows(self, spark):
        df = spark.createDataFrame([(_ts(1), 1)], "ts timestamp, user_id long")
        with pytest.raises(ValueError, match="positive day counts"):
            rolling_active_users(df, windows=())


class TestReferentialAudit:
    def test_orphans_found_and_ranked(self, spark):
        child = spark.createDataFrame(
            [(1,)] * 5 + [(2,)] * 3 + [(99,)] * 4 + [(98,)] * 6 + [(None,)],
            "fk int",
        )
        parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
        rows = referential_audit(child, parent, "fk", "pk").collect()
        summary = [r for r in rows if r["orphan_key"] is None][0]
        assert summary["n_child_rows"] == 18  # NULL fk excluded
        assert summary["n_orphan_rows"] == 10
        assert summary["n_orphan_keys"] == 2
        assert summary["orphan_ppm"] == 10 * 1_000_000 // 18
        worst = [
            (r["orphan_key"], r["n_orphan_rows"])
            for r in rows
            if r["orphan_key"] is not None
        ]
        assert worst == [("98", 6), ("99", 4)]  # count desc

    def test_clean_fk_reports_zero(self, spark):
        child = spark.createDataFrame([(1,), (2,)], "fk int")
        parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
        rows = referential_audit(child, parent, "fk", "pk").collect()
        assert len(rows) == 1
        s = rows[0]
        assert (s["n_orphan_rows"], s["orphan_ppm"], s["n_orphan_keys"]) == (
            0,
            0,
            0,
        )


class TestRollingActiveKmv:
    def test_tracks_exact_and_small_windows_are_exact(self, spark):
        import random

        random.seed(3)
        rows = []
        base = datetime.datetime(2024, 3, 1)
        for d in range(10):
            for u in random.sample(range(3000), 400):
                rows.append((base + datetime.timedelta(days=d, hours=2), u))
        df = spark.createDataFrame(rows, "ts timestamp, user_id long")
        from sparkplug_spark.operators import (
            rolling_active_users,
            rolling_active_users_kmv,
        )

        exact = {
            r["day_idx"]: (r["active_1d"], r["active_7d"])
            for r in rolling_active_users(df, windows=(1, 7)).collect()
        }
        est = {
            r["day_idx"]: (r["active_1d_est"], r["active_7d_est"])
            for r in rolling_active_users_kmv(df, windows=(1, 7), k=128).collect()
        }
        assert set(est) == set(exact)
        for d in exact:
            # 1d: 400 actives vs k=128 -> estimator; 4x RSE(128) ~ 36%
            assert abs(est[d][0] - exact[d][0]) / exact[d][0] < 0.36
            assert abs(est[d][1] - exact[d][1]) / exact[d][1] < 0.36
        # under-k day set is exact: tiny corpus
        few = spark.createDataFrame(
            [(base, u) for u in range(20)], "ts timestamp, user_id long"
        )
        only = rolling_active_users_kmv(few, windows=(1,), k=64).collect()[0]
        assert only["active_1d_est"] == 20


class TestShareShift:
    def test_shares_and_lag_semantics(self, spark):
        from sparkplug_spark.operators import share_shift

        rows = [
            ("a", 1, 3), ("b", 1, 1),          # period 1: a=75%, b=25%
            ("a", 2, 1), ("b", 2, 1),          # period 2: 50/50
            ("a", 4, 2),                       # a skips period 3
        ]
        df = spark.createDataFrame(
            [(k, p) for k, p, n in rows for _ in range(n)],
            "k string, p long",
        )
        got = {
            (r["key"], r["period"]): (
                r["weight"], r["share_ppm"], r["prev_share_ppm"],
                r["delta_ppm"],
            )
            for r in share_shift(df, "k", "p").collect()
        }
        assert got[("a", 1)] == (3, 750000, None, None)
        assert got[("b", 1)] == (1, 250000, None, None)
        assert got[("a", 2)] == (1, 500000, 750000, -250000)
        # previous OBSERVED period, not previous calendar period
        assert got[("a", 4)] == (2, 1000000, 500000, 500000)

    def test_weighted(self, spark):
        from sparkplug_spark.operators import share_shift

        df = spark.createDataFrame(
            [("a", 1, 30), ("b", 1, 10)], "k string, p long, w long"
        )
        got = {
            r["key"]: (r["weight"], r["share_ppm"])
            for r in share_shift(df, "k", "p", weight_col="w").collect()
        }
        assert got == {"a": (30, 750000), "b": (10, 250000)}


class TestGiniConcentration:
    def test_known_values(self, spark):
        from sparkplug_spark.operators import gini_concentration

        # perfect equality -> 0; one-holder extreme -> (n-1)/n
        eq = spark.createDataFrame(
            [("a", 10)] * 4, "g string, x long"
        )
        ex = spark.createDataFrame(
            [("b", 0), ("b", 0), ("b", 0), ("b", 100)], "g string, x long"
        )
        got = {
            r["key"]: (r["n"], r["total"], r["gini_ppm"])
            for r in gini_concentration(
                eq.unionByName(ex), "x", by="g"
            ).collect()
        }
        assert got["a"] == (4, 40, 0)
        assert got["b"] == (4, 100, 750_000)  # (n-1)/n = 0.75

    def test_hand_computed_and_zero_total(self, spark):
        from sparkplug_spark.operators import gini_concentration

        df = spark.createDataFrame(
            [("g", 1), ("g", 2), ("g", 3), ("g", 4), ("z", 0)],
            "g string, x long",
        )
        got = {
            r["key"]: r["gini_ppm"]
            for r in gini_concentration(df, "x", by="g").collect()
        }
        # G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40 = 0.25
        assert got["g"] == 250_000
        assert got["z"] is None

    def test_global_mode(self, spark):
        from sparkplug_spark.operators import gini_concentration

        df = spark.createDataFrame([(5,), (5,)], "x long")
        r = gini_concentration(df, "x").collect()
        assert len(r) == 1 and r[0]["key"] == "*" and r[0]["gini_ppm"] == 0


class TestStateDurations:
    def test_caps_and_attribution(self, spark):
        from sparkplug_spark.operators import state_durations

        rows = [
            (1, 1, _ts(1, 1), "view"),     # +1h -> capped at 1800s
            (2, 1, _ts(1, 2), "click"),    # +60s
            (3, 1, _ts(1, 2).replace(minute=1), "view"),  # last: no gap
            (4, 2, _ts(1, 5), "view"),     # single event: no gap
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        got = {
            r["event_type"]: (
                r["n_events"], r["n_capped"],
                r["total_dwell_micros"], r["mean_dwell_micros"],
            )
            for r in state_durations(
                df, tiebreak_cols=("event_id",)
            ).collect()
        }
        assert got["view"] == (1, 1, 1800 * 10**6, 1800 * 10**6)
        assert got["click"] == (1, 0, 60 * 10**6, 60 * 10**6)

    def test_tied_timestamps_attribute_by_tiebreak(self, spark):
        from sparkplug_spark.operators import state_durations

        t = _ts(2, 3)
        rows = [
            (10, 1, t, "a"), (11, 1, t, "b"),
            (12, 1, t.replace(minute=5), "c"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        got = {
            r["event_type"]: r["total_dwell_micros"]
            for r in state_durations(df, tiebreak_cols=("event_id",)).collect()
        }
        # order by (ts, event_id): a -> b gap 0, b -> c gap 300s
        assert got == {"a": 0, "b": 300 * 10**6}


class TestActivityHeatmap:
    def test_dow_hour_buckets_and_shares(self, spark):
        import datetime

        from sparkplug_spark.operators import activity_heatmap

        # 2024-01-01 was a Monday -> dow 0
        mon = datetime.datetime(2024, 1, 1, 9, 30)
        sun = datetime.datetime(2024, 1, 7, 23, 5)
        df = spark.createDataFrame(
            [(mon,), (mon,), (mon,), (sun,)], "ts timestamp"
        )
        got = {
            (r["dow"], r["hour"]): (r["weight"], r["share_ppm"])
            for r in activity_heatmap(df).collect()
        }
        assert got == {(0, 9): (3, 750000), (6, 23): (1, 250000)}
