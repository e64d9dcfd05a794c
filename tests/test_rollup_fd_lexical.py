"""Round-4 batch 4: continuous-aggregate rollup store (E150), lexical
diversity (E151), functional-dependency audit (E152), tokenizer
fertility (E153)."""

import math
import os

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    build_rollup_store,
    fd_audit,
    lexical_diversity,
    refresh_rollup,
    rollup_query,
    token_fertility,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, et, float(v)) for i, (ts, et, v) in enumerate(rows)],
        ["event_id", "ts_s", "event_type", "value"],
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "event_type",
        "value",
    )


class TestRollupStore:
    ROWS = [
        ("2024-01-01 10:00:00", "view", 1.25),
        ("2024-01-01 11:00:00", "view", 2.0),
        ("2024-01-01 12:00:00", "click", 0.5),
        ("2024-01-02 09:00:00", "view", -3.75),
        ("2024-02-10 08:00:00", "view", 10.0),
        ("2024-02-11 08:00:00", "click", 4.5),
    ]

    def test_build_refresh_query_matches_direct_agg(self, spark, tmp_path):
        path = str(tmp_path / "store")
        df = _events(spark, self.ROWS)
        build_rollup_store(df.filter(F.col("event_id") < 3), path)
        n_days = refresh_rollup(spark, df.filter(F.col("event_id") >= 3), path)
        assert n_days == 3  # 01-02, 02-10, 02-11
        got = {
            (str(r["grain_start"]), r["agg_key"]): (
                r["n"],
                r["sum_micros"],
                r["min_micros"],
                r["max_micros"],
            )
            for r in rollup_query(spark, path, grain="month").collect()
        }
        assert got == {
            ("2024-01-01", "view"): (3, -500000, -3750000, 2000000),
            ("2024-01-01", "click"): (1, 500000, 500000, 500000),
            ("2024-02-01", "view"): (1, 10000000, 10000000, 10000000),
            ("2024-02-01", "click"): (1, 4500000, 4500000, 4500000),
        }

    def test_refresh_merges_same_day_and_leaves_others_untouched(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "store")
        df = _events(spark, self.ROWS)
        build_rollup_store(df, path)
        # snapshot the untouched Feb day partition files
        feb = os.path.join(path, "bucket_date=2024-02-10")
        before = {
            f: os.path.getmtime(os.path.join(feb, f))
            for f in os.listdir(feb)
            if f.endswith(".parquet")
        }
        inc = _events(spark, [("2024-01-01 23:00:00", "view", 100.0)])
        assert refresh_rollup(spark, inc, path) == 1
        after = {
            f: os.path.getmtime(os.path.join(feb, f))
            for f in os.listdir(feb)
            if f.endswith(".parquet")
        }
        assert after == before  # partition pruning + dynamic overwrite
        day = {
            (str(r["grain_start"]), r["agg_key"]): (r["n"], r["sum_micros"])
            for r in rollup_query(spark, path, grain="day").collect()
        }
        assert day[("2024-01-01", "view")] == (3, 103250000)

    def test_empty_increment_is_noop(self, spark, tmp_path):
        path = str(tmp_path / "store")
        df = _events(spark, self.ROWS)
        build_rollup_store(df, path)
        assert refresh_rollup(spark, df.filter(F.lit(False)), path) == 0

    def test_date_bounds_prune(self, spark, tmp_path):
        path = str(tmp_path / "store")
        build_rollup_store(_events(spark, self.ROWS), path)
        out = rollup_query(
            spark, path, grain="month", start="2024-02-01", end="2024-03-01"
        ).collect()
        assert {str(r["grain_start"]) for r in out} == {"2024-02-01"}


class TestLexicalDiversity:
    def test_entropy_and_ttr_against_math(self, spark):
        rows = [
            (1, "a a a a"),            # zero entropy, ttr 1/4
            (2, "a b c d"),            # max entropy ln(4), ttr 1
            (3, "a a b b"),            # ln(2)
            (4, "Spam! spam, SPAM."),  # normalization folds to one type
        ]
        out = {
            r["doc_id"]: r
            for r in lexical_diversity(
                spark.createDataFrame(rows, ["doc_id", "text"])
            ).collect()
        }

        def nano(x):
            return math.floor(x * 1e9 + 0.5)

        def expected(counts):
            n = sum(counts)
            s = sum(nano(c * math.log(c)) for c in counts)
            return nano(math.log(n)) - s // n

        assert out[1]["entropy_nanonats"] == expected([4])
        assert out[1]["ttr_ppm"] == 250000
        assert out[2]["entropy_nanonats"] == expected([1, 1, 1, 1])
        assert out[2]["ttr_ppm"] == 1000000
        assert out[3]["entropy_nanonats"] == expected([2, 2])
        assert out[4]["n_types"] == 1 and out[4]["n_tokens"] == 3

    def test_tokenless_docs_are_omitted(self, spark):
        out = lexical_diversity(
            spark.createDataFrame([(1, "..."), (2, "ok")], ["doc_id", "text"])
        ).collect()
        assert [r["doc_id"] for r in out] == [2]


class TestFdAudit:
    def test_exact_violations(self, spark):
        df = spark.createDataFrame(
            [
                (1, "x", 10),
                (2, "x", 10),
                (3, "x", 20),   # x -> {10:2, 20:1}: 1 violation
                (4, "y", 30),
                (5, "y", 30),   # y holds
                (6, None, 30),  # NULL lhs is an ordinary group
            ],
            ["id", "k", "v"],
        )
        out = {
            (r["lhs"], r["rhs"]): r
            for r in fd_audit(df, [("id", "k"), ("k", "v")]).collect()
        }
        ik = out[("id", "k")]
        assert (ik["violations"], ik["holds"]) == (0, True)
        kv = out[("k", "v")]
        assert kv["n_rows"] == 6
        assert kv["n_lhs_values"] == 3
        assert kv["violations"] == 1
        assert kv["violation_ppm"] == 166666
        assert kv["holds"] is False

    def test_empty_candidates_raise(self, spark):
        df = spark.createDataFrame([(1, 1)], ["a", "b"])
        with pytest.raises(ValueError):
            fd_audit(df, [])


class TestTokenFertility:
    def test_exact_counts(self, spark):
        rows = [
            (1, "en", "s1", "Hello, world!"),
            (2, "en", "s1", "a b"),
            (3, "de", "s2", "zwei Worte"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])
        out = {
            (r["lang"], r["source"]): r
            for r in token_fertility(df).collect()
        }
        en = out[("en", "s1")]
        # "Hello, world!" -> ws ['hello','world']; bpe ['Hello',',','world','!']
        assert en["n_docs"] == 2
        assert en["n_chars"] == 13 + 3
        assert en["n_tokens_ws"] == 2 + 2
        assert en["n_tokens_bpe"] == 4 + 2
        assert en["ws_per_kchar"] == 4000 // 16
        assert en["bpe_per_kchar"] == 6000 // 16
        de = out[("de", "s2")]
        assert de["n_tokens_ws"] == 2 and de["n_docs"] == 1
