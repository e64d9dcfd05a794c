"""Round-3 continuation batch 2: event-rate anomalies, activity
profiles, cross-source overlap, rare-token ratio, token drift, key-skew
report."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    cross_source_overlap,
    key_skew_report,
    rare_token_ratio,
    rate_anomalies,
    token_drift,
    user_activity_profile,
)


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


class TestRateAnomalies:
    def test_integer_z_flag(self, spark):
        # a single burst among n uniform windows flags iff n-1 > k^2
        # (algebra of the integer z-test); n=6, k=2 -> 5 > 4 flags, and
        # the quiet windows sit below 1 sigma
        rows = []
        eid = 0
        for widx, c in enumerate([1, 1, 1, 1, 1, 6]):
            for j in range(c):
                rows.append((eid, _ts(widx * 3600 + j), "a"))
                eid += 1
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        out = {r.window_start: r for r in rate_anomalies(df, window_seconds=3600, k=2).collect()}
        assert len(out) == 6
        flags = sorted((ws, r.is_anomaly) for ws, r in out.items())
        assert [f for _, f in flags] == [False] * 5 + [True]
        burst = max(out.values(), key=lambda r: r.n_events)
        assert burst.n_events == 6 and bool(burst.is_anomaly)

    def test_uniform_counts_never_flag(self, spark):
        rows = [(i, _ts(i * 3600), "a") for i in range(6)]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        out = rate_anomalies(df, window_seconds=3600, k=2).collect()
        assert all(not r.is_anomaly for r in out)  # zero variance, lhs == rhs == 0

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, _ts(0), "a")], "event_id long, ts timestamp, event_type string")
        with pytest.raises(ValueError):
            rate_anomalies(df, window_seconds=0)
        with pytest.raises(ValueError):
            rate_anomalies(df, k=0)


class TestUserActivityProfile:
    def test_profile_values(self, spark):
        rows = [
            (1, _ts(0), "view", 1.5),
            (1, _ts(10), "view", 2.5),
            (1, _ts(90000), "click", None),  # next day, null value
            (2, _ts(50), "view", -1.25),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
        out = {r.user_id: r for r in user_activity_profile(df, value_col="value", exact_distinct=True).collect()}
        u1 = out[1]
        assert u1.n_events == 3 and u1.n_event_types == 2 and u1.n_active_days == 2
        assert u1.last_seen - u1.first_seen == 90000
        assert u1.value_micros == 4_000_000  # 1.5 + 2.5, null ignored
        assert out[2].value_micros == -1_250_000

    def test_approx_tier_schema_identical(self, spark):
        rows = [(1, _ts(0), "view", 1.0)]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
        exact = user_activity_profile(df, value_col="value", exact_distinct=True)
        approx = user_activity_profile(df, value_col="value", exact_distinct=False)
        assert exact.schema == approx.schema


class TestCrossSourceOverlap:
    def test_shared_and_jaccard(self, spark):
        rows = [
            (1, "shared doc text", "A"),
            (2, "shared doc text", "B"),
            (3, "only in a", "A"),
            (4, "only in b", "B"),
            (5, "only in b two", "B"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = cross_source_overlap(df).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.source_a, r.source_b) == ("A", "B")
        assert (r.n_shared, r.n_a, r.n_b) == (1, 2, 3)
        assert r.jaccard_ppm == 1_000_000 // 4  # 1 / (2+3-1)

    def test_within_source_dups_collapse(self, spark):
        rows = [
            (1, "same", "A"),
            (2, "same", "A"),  # within-source dup: one distinct digest
            (3, "same", "B"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        r = cross_source_overlap(df).collect()[0]
        assert (r.n_shared, r.n_a, r.n_b) == (1, 1, 1)
        assert r.jaccard_ppm == 1_000_000

    def test_custom_digest(self, spark):
        from sparkplug_spark.functions import token_fingerprint

        rows = [(1, "alpha beta", "A"), (2, "beta alpha", "B")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        assert cross_source_overlap(df).count() == 0  # different exact text
        out = cross_source_overlap(df, digest=token_fingerprint(F.col("text"))).collect()
        assert out[0].n_shared == 1  # order-insensitive fingerprint matches


class TestRareTokenRatio:
    def test_rare_fraction(self, spark):
        # "common" appears 6x (>= min_count 3), each "rareN" once
        rows = [
            (1, "common common common rare1"),
            (2, "common common common rare2 rare3"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in rare_token_ratio(df, min_count=3).collect()}
        assert (out[1].n_tokens, out[1].n_rare) == (4, 1)
        assert out[1].rare_ppm == 1_000_000 // 4
        assert (out[2].n_tokens, out[2].n_rare) == (5, 2)
        assert out[2].rare_ppm == 2_000_000 // 5

    def test_empty_doc_reports_zero(self, spark):
        df = spark.createDataFrame([(1, "word word word"), (2, "")], "doc_id long, text string")
        out = {r.doc_id: r for r in rare_token_ratio(df, min_count=2).collect()}
        assert (out[2].n_tokens, out[2].n_rare, out[2].rare_ppm) == (0, 0, 0)

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            rare_token_ratio(df, min_count=0)


class TestTokenDrift:
    def test_drift_ranks_and_ppm(self, spark):
        rows = [
            (1, "aa aa aa aa", "A"),  # aa: 4/4 in A
            (2, "bb bb bb bb", "B"),  # bb: 4/4 in B
            (3, "ignored entirely", "C"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r.token: r for r in token_drift(df, "A", "B", top_n=10).collect()}
        assert set(out) == {"aa", "bb"}
        assert out["aa"].ppm_a == 1_000_000 and out["aa"].ppm_b == 0
        assert out["aa"].delta_ppm == 1_000_000
        assert out["bb"].delta_ppm == -1_000_000
        # tie on |delta| broken by token string: "aa" < "bb"
        assert (out["aa"].rank, out["bb"].rank) == (1, 2)

    def test_top_n_truncates(self, spark):
        rows = [(i, f"tok{i}", "A") for i in range(5)] + [(9, "z", "B")]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = token_drift(df, "A", "B", top_n=3).collect()
        assert len(out) == 3 and sorted(r.rank for r in out) == [1, 2, 3]

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, "x", "A")], "doc_id long, text string, source string")
        with pytest.raises(ValueError):
            token_drift(df, "A", "B", top_n=0)


class TestKeySkewReport:
    def test_shares_and_multiples(self, spark):
        rows = [(i, "hot") for i in range(6)] + [(10, "c1"), (11, "c2")]
        df = spark.createDataFrame(rows, "id long, k string")
        out = {r.key: r for r in key_skew_report(df, ["k"], top_n=10).collect()}
        hot = out["hot"]
        assert hot.n_rows == 6 and hot.rank == 1
        assert hot.share_ppm == (1_000_000 * 6) // 8
        assert hot.avg_multiple_ppk == (1000 * 6 * 3) // 8  # 2.25x the average
        assert out["c1"].avg_multiple_ppk == (1000 * 1 * 3) // 8

    def test_null_keys_visible(self, spark):
        df = spark.createDataFrame([(1, None), (2, None), (3, "x")], "id long, k string")
        out = {r.key: r for r in key_skew_report(df, ["k"], top_n=10).collect()}
        assert out["<NULL>"].n_rows == 2

    def test_multi_column_key(self, spark):
        df = spark.createDataFrame([(1, "a", 1), (2, "a", 1), (3, "a", 2)], "id long, k string, j int")
        out = {r.key: r for r in key_skew_report(df, ["k", "j"], top_n=10).collect()}
        assert out["a|1"].n_rows == 2 and out["a|2"].n_rows == 1

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, k string")
        with pytest.raises(ValueError):
            key_skew_report(df, [])
        with pytest.raises(ValueError):
            key_skew_report(df, ["k"], top_n=0)
