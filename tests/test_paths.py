"""Path analytics: Markov event transitions and top session paths."""

import datetime as dt

from sparkplug_spark.operators import event_transitions, session_paths

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


class TestEventTransitions:
    def test_counts_ppm_and_gap(self, spark):
        rows = [
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(10), 1, "click", 0.0),
            (3, _ts(40), 1, "view", 0.0),
            (4, _ts(41), 1, "click", 0.0),
            (5, _ts(100), 2, "view", 0.0),
            (6, _ts(103), 2, "purchase", 0.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = {
            (r["src_type"], r["dst_type"]): (
                r["n_transitions"],
                r["p_ppm"],
                r["avg_gap_us"],
            )
            for r in event_transitions(ev).collect()
        }
        # view -> click twice (gaps 10, 1), view -> purchase once (gap 3)
        assert out[("view", "click")] == (2, 666666, 5_500_000)
        assert out[("view", "purchase")] == (1, 333333, 3_000_000)
        # click -> view once out of one click transition
        assert out[("click", "view")] == (1, 1_000_000, 30_000_000)
        assert len(out) == 3

    def test_users_never_cross(self, spark):
        rows = [
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(1), 2, "click", 0.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        assert event_transitions(ev).count() == 0

    def test_same_second_orders_by_id(self, spark):
        rows = [
            (5, _ts(0), 1, "b", 0.0),
            (2, _ts(0), 1, "a", 0.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        [r] = event_transitions(ev).collect()
        assert (r["src_type"], r["dst_type"]) == ("a", "b")
        assert r["avg_gap_us"] == 0


class TestSessionPaths:
    def test_gap_splits_sessions(self, spark):
        rows = [
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(10), 1, "click", 0.0),
            (3, _ts(5000), 1, "view", 0.0),
            (4, _ts(5010), 1, "click", 0.0),
            (5, _ts(0), 2, "view", 0.0),
            (6, _ts(20), 2, "click", 0.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = {
            r["path"]: r["n_sessions"]
            for r in session_paths(ev, min_sessions=1).collect()
        }
        # user 1 has two view>click sessions (30-min gap), user 2 one
        assert out == {"view>click": 3}

    def test_max_steps_truncates(self, spark):
        rows = [
            (i, _ts(i), 1, t, 0.0)
            for i, t in enumerate(["a", "b", "c", "d"])
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = session_paths(ev, max_steps=2, min_sessions=1).collect()
        assert [(r["path"], r["n_sessions"]) for r in out] == [("a>b", 1)]

    def test_support_floor(self, spark):
        rows = [
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(0), 2, "view", 0.0),
            (3, _ts(0), 3, "click", 0.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = session_paths(ev, min_sessions=2).collect()
        assert [(r["path"], r["n_sessions"]) for r in out] == [("view", 2)]

    def test_rejects_bad_max_steps(self, spark):
        import pytest as _pytest

        ev = spark.createDataFrame([], EVENT_SCHEMA)
        with _pytest.raises(ValueError):
            session_paths(ev, max_steps=0)


class TestWindowedFunnel:
    def _run(self, spark, rows, w):
        from sparkplug_spark.operators import funnel_counts

        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = funnel_counts(
            ev, ["a", "b", "c"], within_seconds=w
        ).collect()
        return {r["step"]: r["n_users"] for r in out}

    def test_later_first_step_still_converts(self, spark):
        # earliest 'a' (t=0) misses the window for b@110, but a@100 fits:
        # the greedy first-reach frontier would miss this user
        rows = [
            (1, _ts(0), 1, "a", 0.0),
            (2, _ts(100), 1, "a", 0.0),
            (3, _ts(110), 1, "b", 0.0),
        ]
        assert self._run(spark, rows, w=50) == {"a": 1, "b": 1, "c": 0}

    def test_window_expiry_blocks_step(self, spark):
        rows = [
            (1, _ts(0), 1, "a", 0.0),
            (2, _ts(100), 1, "b", 0.0),
        ]
        assert self._run(spark, rows, w=50) == {"a": 1, "b": 0, "c": 0}
        assert self._run(spark, rows, w=100) == {"a": 1, "b": 1, "c": 0}

    def test_validity_chains_not_just_presence(self, spark):
        # b@200 is NOT valid (a@0 out of window), so c@210 must not count
        # even though it is within window of the (invalid) b
        rows = [
            (1, _ts(0), 1, "a", 0.0),
            (2, _ts(200), 1, "b", 0.0),
            (3, _ts(210), 1, "c", 0.0),
        ]
        assert self._run(spark, rows, w=50) == {"a": 1, "b": 0, "c": 0}

    def test_same_second_never_chains(self, spark):
        rows = [
            (1, _ts(5), 1, "a", 0.0),
            (2, _ts(5), 1, "b", 0.0),
            (3, _ts(6), 2, "a", 0.0),
            (4, _ts(7), 2, "b", 0.0),
        ]
        assert self._run(spark, rows, w=10) == {"a": 2, "b": 1, "c": 0}

    def test_rejects_bad_window(self, spark):
        import pytest as _pytest
        from sparkplug_spark.operators import funnel_counts

        ev = spark.createDataFrame([], EVENT_SCHEMA)
        with _pytest.raises(ValueError):
            funnel_counts(ev, ["a"], within_seconds=0)


class TestDecayAttribution:
    def _run(self, spark, rows, hl=100):
        from sparkplug_spark.operators import attribution_counts

        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = attribution_counts(
            ev, conversion="buy", touch_types=("ad", "email"),
            model="decay", half_life_seconds=hl,
        ).collect()
        return {r["touch_type"]: r["credit_ppm"] for r in out}

    def test_halving_per_half_life(self, spark):
        # ad at age 150s (1 half-life elapsed -> w=500000),
        # email at age 50s (0 half-lives -> w=1000000)
        rows = [
            (1, _ts(0), 1, "ad", 0.0),
            (2, _ts(100), 1, "email", 0.0),
            (3, _ts(150), 1, "buy", 0.0),
        ]
        out = self._run(spark, rows, hl=100)
        # shares: email 1e6*1e6//1.5e6=666666, ad 333333; +1 remainder to
        # the most recent (email)
        assert out == {"email": 666667, "ad": 333333}

    def test_total_weight_underflow_goes_to_last(self, spark):
        rows = [
            (1, _ts(0), 1, "ad", 0.0),
            (2, _ts(40 * 100), 1, "buy", 0.0),  # 40 half-lives old
        ]
        out = self._run(spark, rows, hl=100)
        assert out == {"ad": 1_000_000}

    def test_per_user_credit_sums_to_one(self, spark):
        import random

        rng = random.Random(5)
        rows, eid = [], 0
        for u in range(8):
            t = 0
            for _ in range(rng.randint(1, 6)):
                t += rng.randint(1, 400)
                rows.append((eid, _ts(t), u, rng.choice(["ad", "email"]), 0.0))
                eid += 1
            rows.append((eid, _ts(t + rng.randint(1, 300)), u, "buy", 0.0))
            eid += 1
        out = self._run(spark, rows, hl=120)
        assert sum(out.values()) == 8 * 1_000_000

    def test_no_touch_user_credited_none(self, spark):
        rows = [(1, _ts(10), 1, "buy", 0.0)]
        assert self._run(spark, rows) == {"(none)": 1_000_000}


class TestRfmScores:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, EVENT_SCHEMA)

    def test_metrics_exact(self, spark):
        rows = [
            (1, _ts(0), 1, "x", 2.5),
            (2, _ts(100), 1, "x", 1.5),
            (3, _ts(50), 2, "x", 10.0),
        ]
        from sparkplug_spark.operators import rfm_scores

        out = {
            r["user"]: r
            for r in rfm_scores(
                self._df(spark, rows), asof="2024-01-01 00:10:00"
            ).collect()
        }
        # asof = t+600s
        assert out[1]["recency_s"] == 500 and out[2]["recency_s"] == 550
        assert out[1]["frequency"] == 2 and out[2]["frequency"] == 1
        assert out[1]["monetary_micros"] == 4_000_000
        assert out[2]["monetary_micros"] == 10_000_000
        assert out[1]["segment"] == "-".join(
            map(str, (out[1]["r_score"], out[1]["f_score"], out[1]["m_score"]))
        )

    def test_tiles_match_spark_ntile(self, spark):
        import random

        from pyspark.sql import Window
        from pyspark.sql import functions as F
        from sparkplug_spark.operators import rfm_scores

        rng = random.Random(23)
        rows, eid = [], 0
        for u in range(23):  # N not divisible by 5: remainder rule matters
            for _ in range(rng.randint(1, 5)):
                rows.append(
                    (eid, _ts(rng.randint(0, 10**6)), u, "x", rng.uniform(0, 9))
                )
                eid += 1
        df = self._df(spark, rows)
        out = {
            r["user"]: (r["r_score"], r["f_score"], r["m_score"])
            for r in rfm_scores(df, asof="2024-03-01 00:00:00").collect()
        }
        per = df.groupBy("user_id").agg(
            (
                F.unix_timestamp(F.lit("2024-03-01 00:00:00").cast("timestamp"))
                - F.max(F.col("ts").cast("long"))
            ).alias("r"),
            F.count(F.lit(1)).alias("f"),
            F.sum(
                (F.col("value").cast("decimal(28,6)") * 1000000).cast("long")
            ).alias("m"),
        )
        twin = {
            r["user_id"]: (r["rs"], r["fs"], r["ms"])
            for r in per.select(
                "user_id",
                (6 - F.ntile(5).over(Window.orderBy("r", "user_id"))).alias("rs"),
                F.ntile(5).over(Window.orderBy("f", "user_id")).alias("fs"),
                F.ntile(5).over(Window.orderBy("m", "user_id")).alias("ms"),
            ).collect()
        }
        assert out == twin

    def test_fewer_users_than_tiles(self, spark):
        from sparkplug_spark.operators import rfm_scores

        rows = [(1, _ts(0), 1, "x", 1.0), (2, _ts(10), 2, "x", 2.0)]
        out = {
            r["user"]: r["m_score"]
            for r in rfm_scores(
                self._df(spark, rows), asof="2024-01-02 00:00:00"
            ).collect()
        }
        # N=2 < 5 tiles: tile == rank
        assert out == {1: 1, 2: 2}

    def test_guard(self, spark):
        import pytest as _pytest

        from sparkplug_spark.operators import rfm_scores

        with _pytest.raises(ValueError):
            rfm_scores(self._df(spark, []), asof="2024-01-01 00:00:00", n_tiles=0)


class TestCohortLtv:
    def test_curve_math(self, spark):
        from sparkplug_spark.operators import cohort_ltv

        P = 100  # period seconds
        rows = [
            # cohort 0: users 1,2 acquired in period 0
            (1, _ts(10), 1, "x", 2.0),     # p0, rev 2
            (2, _ts(150), 1, "x", 4.0),    # p1, rev 4
            (3, _ts(20), 2, "x", 6.0),     # p0, rev 6
            # cohort 2: user 3 acquired in period 2
            (4, _ts(250), 3, "x", 10.0),   # p2 offset 0
            (5, _ts(460), 3, "x", 1.0),    # p4 offset 2
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = {
            (r["cohort_period"], r["period_offset"]): (
                r["revenue_micros"],
                r["cum_revenue_micros"],
                r["n_users"],
                r["cum_ltv_per_user_micros"],
            )
            for r in cohort_ltv(ev, period_seconds=P).collect()
        }
        base = _ts(0).timestamp() // P  # epoch-period of the fixture day
        c0, c2 = base, base + 2
        assert out[(c0, 0)] == (8_000_000, 8_000_000, 2, 4_000_000)
        assert out[(c0, 1)] == (4_000_000, 12_000_000, 2, 6_000_000)
        assert out[(c2, 0)] == (10_000_000, 10_000_000, 1, 10_000_000)
        # gap at offset 1: cumulative carries over observed offsets
        assert out[(c2, 2)] == (1_000_000, 11_000_000, 1, 11_000_000)
        assert len(out) == 4

    def test_max_offset_truncates(self, spark):
        from sparkplug_spark.operators import cohort_ltv

        rows = [
            (1, _ts(0), 1, "x", 1.0),
            (2, _ts(1000), 1, "x", 1.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = cohort_ltv(ev, period_seconds=100, max_offset=5).collect()
        assert {r["period_offset"] for r in out} == {0}


class TestConversionPaths:
    def test_end_anchored_band(self, spark):
        from sparkplug_spark.operators import session_paths

        rows = [
            (i, _ts(i * 10), 1, t, 0.0)
            for i, t in enumerate(["a", "b", "c", "buy", "d", "buy"])
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = {
            r["path"]: r["n_sessions"]
            for r in session_paths(
                ev, min_sessions=1, max_steps=3, end_at="buy"
            ).collect()
        }
        # first 'buy' at step 4: band is steps 2..4; later steps ignored
        assert out == {"b>c>buy": 1}

    def test_sessions_without_conversion_dropped(self, spark):
        from sparkplug_spark.operators import session_paths

        rows = [
            (1, _ts(0), 1, "a", 0.0),
            (2, _ts(10), 1, "buy", 0.0),
            (3, _ts(0), 2, "a", 0.0),
        ]
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = {
            r["path"]: r["n_sessions"]
            for r in session_paths(ev, min_sessions=1, end_at="buy").collect()
        }
        assert out == {"a>buy": 1}


class TestTrendComponents:
    def test_exact_slope(self, spark):
        from sparkplug_spark.operators import trend_components

        # y = 3t + 1 exactly: slope_ppm = 3_000_000
        rows = [("a", t, 3 * t + 1) for t in range(5)]
        df = spark.createDataFrame(rows, "g string, t long, y long")
        [r] = trend_components(df, ["g"], "t", "y").collect()
        assert r["slope_num"] * 1 == 3 * r["slope_den"]
        assert r["slope_ppm"] == 3_000_000
        assert (r["n"], r["sum_t"], r["sum_y"]) == (5, 10, 35)

    def test_flat_series(self, spark):
        from sparkplug_spark.operators import trend_components

        rows = [("a", t, 7) for t in range(4)]
        df = spark.createDataFrame(rows, "g string, t long, y long")
        [r] = trend_components(df, ["g"], "t", "y").collect()
        assert r["slope_num"] == 0 and r["slope_ppm"] == 0

    def test_degenerate_t_null_slope(self, spark):
        from sparkplug_spark.operators import trend_components

        rows = [("a", 5, 1), ("a", 5, 9)]
        df = spark.createDataFrame(rows, "g string, t long, y long")
        [r] = trend_components(df, ["g"], "t", "y").collect()
        assert r["slope_den"] == 0 and r["slope_ppm"] is None

    def test_matches_numpy_polyfit(self, spark):
        import random

        import numpy as np

        from sparkplug_spark.operators import trend_components

        rng = random.Random(13)
        rows = [("g", t, rng.randint(0, 100)) for t in range(30)]
        df = spark.createDataFrame(rows, "g string, t long, y long")
        [r] = trend_components(df, ["g"], "t", "y").collect()
        want = np.polyfit([t for _, t, _ in rows], [y for _, _, y in rows], 1)[0]
        assert abs(r["slope_num"] / r["slope_den"] - want) < 1e-9

    def test_guard(self, spark):
        import pytest as _pytest

        from sparkplug_spark.operators import trend_components

        df = spark.createDataFrame([("a", 1, 1)], "g string, t long, y long")
        with _pytest.raises(ValueError):
            trend_components(df, [], "t", "y")


class TestSeasonalRateAnomalies:
    def test_same_phase_population(self, spark):
        from sparkplug_spark.operators import rate_anomalies

        # two phases (period 2, window 100s): phase 0 counts {5,5,5,50},
        # phase 1 counts {5,5,5,5}.  Against the GLOBAL baseline the 50
        # dominates; against the per-phase baseline it is the outlier.
        rows, eid = [], 0
        for w, n in enumerate([5, 5, 5, 5, 5, 5, 50, 5]):
            for j in range(n):
                rows.append((eid, _ts(w * 100 + j), 1, "x", 0.0))
                eid += 1
        ev = spark.createDataFrame(rows, EVENT_SCHEMA)
        out = {
            (r["window_start"] - rows[0][1].timestamp() // 100 * 100, r["phase"]): r["is_anomaly"]
            for r in rate_anomalies(
                ev, window_seconds=100, k=1, seasonal_period_windows=2
            ).collect()
        }
        # the 50-count window sits at offset 600 (phase 0)
        assert out[(600, 0)] is True
        assert sum(v for v in out.values()) == 1

    def test_phase_column_present_only_in_seasonal_mode(self, spark):
        from sparkplug_spark.operators import rate_anomalies

        ev = spark.createDataFrame(
            [(1, _ts(0), 1, "x", 0.0)], EVENT_SCHEMA
        )
        plain = rate_anomalies(ev, window_seconds=100)
        assert "phase" not in plain.columns
        seasonal = rate_anomalies(
            ev, window_seconds=100, seasonal_period_windows=4
        )
        assert "phase" in seasonal.columns

    def test_guard(self, spark):
        import pytest as _pytest

        from sparkplug_spark.operators import rate_anomalies

        ev = spark.createDataFrame([], EVENT_SCHEMA)
        with _pytest.raises(ValueError):
            rate_anomalies(ev, seasonal_period_windows=1)


class TestCusumChangepoints:
    def _ev(self, spark, window_counts, w=100):
        rows, eid = [], 0
        for wi, n in enumerate(window_counts):
            for j in range(n):
                rows.append((eid, _ts(wi * w + j), 1, "x", 0.0))
                eid += 1
        return spark.createDataFrame(rows, EVENT_SCHEMA)

    def test_sustained_shift_detected_spike_ignored(self, spark):
        from sparkplug_spark.operators import cusum_changepoints

        # baseline 10/window, then a sustained shift to 14
        counts = [10] * 10 + [14] * 6
        ev = self._ev(spark, counts)
        out = sorted(
            cusum_changepoints(
                ev, window_seconds=100, slack=1, threshold=8
            ).collect(),
            key=lambda r: r["window_start"],
        )
        # mu = floor((100+84)/16) = 11; drift per shifted window = 14-11-1 = 2
        flags = [r["is_shift"] for r in out]
        assert not any(flags[:10])
        assert flags[-1]  # accumulated drift tripped by the end
        # cusum recurrence matches a direct model
        s, want = 0, []
        for c in counts:
            s = max(0, s + c - 11 - 1)
            want.append(s)
        assert [r["cusum"] for r in out] == want

    def test_outage_resets_statistic_visibly(self, spark):
        from sparkplug_spark.operators import cusum_changepoints

        # empty middle windows enter the series as zeros (densified)
        counts = [5, 5, 0, 0, 5, 5]
        ev = self._ev(spark, counts)
        out = sorted(
            cusum_changepoints(
                ev, window_seconds=100, slack=0, threshold=100
            ).collect(),
            key=lambda r: r["window_start"],
        )
        assert len(out) == 6  # zeros present
        assert [r["n_events"] for r in out] == counts

    def test_guards(self, spark):
        import pytest as _pytest

        from sparkplug_spark.operators import cusum_changepoints

        ev = spark.createDataFrame([], EVENT_SCHEMA)
        with _pytest.raises(ValueError):
            cusum_changepoints(ev, threshold=0)
        with _pytest.raises(ValueError):
            cusum_changepoints(ev, slack=-1)


class TestParetoReport:
    def test_shares_and_vital_prefix(self, spark):
        from sparkplug_spark.operators import pareto_report

        rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
        df = spark.createDataFrame(rows, "k string")
        out = {
            r["key"]: r
            for r in pareto_report(df, "k", vital_ppm=800_000).collect()
        }
        assert out["a"]["share_ppm"] == 600_000
        assert out["a"]["cum_share_ppm"] == 600_000
        assert out["b"]["cum_share_ppm"] == 900_000
        assert out["c"]["cum_share_ppm"] == 1_000_000
        # a (cum_before 0) and b (cum_before 60%) are vital; c (90%) is not
        assert (out["a"]["is_vital"], out["b"]["is_vital"], out["c"]["is_vital"]) == (
            True,
            True,
            False,
        )

    def test_weighted_and_tiebreak(self, spark):
        from sparkplug_spark.operators import pareto_report

        rows = [("x", 5), ("y", 5), ("z", 10)]
        df = spark.createDataFrame(rows, "k string, w long")
        out = sorted(
            pareto_report(df, "k", weight_col="w", vital_ppm=500_000).collect(),
            key=lambda r: -r["cum_share_ppm"],
        )
        # order: z (10), then x before y (tie on 5, key asc)
        cums = {r["key"]: r["cum_share_ppm"] for r in out}
        assert cums == {"z": 500_000, "x": 750_000, "y": 1_000_000}
        vit = {r["key"]: r["is_vital"] for r in out}
        assert vit == {"z": True, "x": False, "y": False}

    def test_guard(self, spark):
        import pytest as _pytest

        from sparkplug_spark.operators import pareto_report

        df = spark.createDataFrame([("a",)], "k string")
        with _pytest.raises(ValueError):
            pareto_report(df, "k", vital_ppm=0)


class TestJoinSizeEstimate:
    def test_exact_counts_and_hot_key(self, spark):
        from sparkplug_spark.operators import join_size_estimate

        left = spark.createDataFrame(
            [(1,), (1,), (2,), (3,), (None,)], "k long"
        )
        right = spark.createDataFrame(
            [(1,), (1,), (1,), (2,), (9,)], "k long"
        )
        [r] = join_size_estimate(left, right, on="k").collect()
        # key 1: 2*3=6, key 2: 1*1=1; keys 3/9 unmatched; NULL excluded
        assert (r["n_left"], r["n_right"]) == (4, 5)
        assert (r["n_matching_keys"], r["n_join_rows"]) == (2, 7)
        assert (r["max_key_rows"], r["max_key"]) == (6, 1)
        # ground truth
        assert left.join(right, "k").count() == 7

    def test_tie_breaks_to_smallest_key(self, spark):
        from sparkplug_spark.operators import join_size_estimate

        left = spark.createDataFrame([(5,), (2,)], "k long")
        right = spark.createDataFrame([(5,), (2,)], "k long")
        [r] = join_size_estimate(left, right, on="k").collect()
        assert (r["max_key_rows"], r["max_key"]) == (1, 2)

    def test_disjoint_keys(self, spark):
        from sparkplug_spark.operators import join_size_estimate

        left = spark.createDataFrame([(1,)], "k long")
        right = spark.createDataFrame([(2,)], "k long")
        [r] = join_size_estimate(left, right, on="k").collect()
        assert (r["n_matching_keys"], r["n_join_rows"], r["max_key"]) == (0, 0, None)

    def test_different_key_names(self, spark):
        from sparkplug_spark.operators import join_size_estimate

        left = spark.createDataFrame([(1,)], "a long")
        right = spark.createDataFrame([(1,)], "b long")
        [r] = join_size_estimate(left, right, left_on="a", right_on="b").collect()
        assert r["n_join_rows"] == 1


class TestReview2Guards:
    def test_pareto_zero_total_yields_null_shares(self, spark):
        from sparkplug_spark.operators import pareto_report

        df = spark.createDataFrame([("a", 0), ("b", 0)], "k string, w long")
        out = pareto_report(df, "k", weight_col="w").collect()
        assert all(r["share_ppm"] is None for r in out)

    def test_prefix_sums_reject_fractional_weights(self, spark):
        import pytest as _pytest

        from sparkplug_spark.partitioning import global_prefix_sums

        df = spark.createDataFrame([("a", 0.5)], "k string, w double")
        with _pytest.raises(ValueError):
            global_prefix_sums(df, ["k"], "w")

    def test_join_estimate_requires_keys(self, spark):
        import pytest as _pytest

        from sparkplug_spark.operators import join_size_estimate

        df = spark.createDataFrame([(1,)], "k long")
        with _pytest.raises(ValueError):
            join_size_estimate(df, df, left_on="k")  # right_on missing
