"""Null imputation: median/mode/mean/const strategies, per group."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import impute_nulls


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "red"),
            (2, "a", 20.0, "red"),
            (3, "a", 30.0, "blue"),
            (4, "a", None, None),
            (5, "b", 100.0, "green"),
            (6, "b", None, None),
            (7, "c", None, None),  # all-null group stays null
        ],
        "id long, g string, v double, color string",
    )


def test_median_and_mode_per_group(df):
    out = {
        r["id"]: r
        for r in impute_nulls(
            df, {"v": "median", "color": "mode"}, by=("g",)
        ).collect()
    }
    # group a: medians of (10,20,30) -> 20; mode of (red,red,blue) -> red
    assert out[4]["v"] == 20.0 and out[4]["color"] == "red"
    assert out[6]["v"] == 100.0 and out[6]["color"] == "green"
    assert out[7]["v"] is None and out[7]["color"] is None  # nothing to learn
    # non-null rows untouched
    assert out[3]["v"] == 30.0 and out[3]["color"] == "blue"


def test_median_even_count_picks_lower(spark):
    d = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0), (5, None)],
        "id long, v double",
    )
    out = {r["id"]: r["v"] for r in impute_nulls(d, {"v": "median"}).collect()}
    assert out[5] == 20.0  # ceil(4/2)=2nd of (10,20,30,40)


def test_mean_and_const(df):
    out = {
        r["id"]: r
        for r in impute_nulls(
            df, {"v": "mean", "color": ("const", "unknown")}, by=("g",)
        ).collect()
    }
    assert out[4]["v"] == 20.0  # mean(10,20,30)
    assert out[4]["color"] == "unknown"
    assert out[7]["color"] == "unknown"  # const fills even all-null groups


def test_all_null_column_ungrouped_keeps_rows(spark):
    d = spark.createDataFrame(
        [(1, None), (2, None)], "id long, v double"
    )
    out = impute_nulls(d, {"v": "median"})
    rows = out.collect()
    assert len(rows) == 2 and all(r["v"] is None for r in rows)
    out2 = impute_nulls(d, {"v": "mode"})
    assert out2.count() == 2


def test_null_group_key_gets_its_fill(spark):
    d = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 30.0), (3, None, None), (4, "g", None)],
        "id long, g string, v double",
    )
    out = {r["id"]: r["v"] for r in impute_nulls(d, {"v": "median"}, by=("g",)).collect()}
    assert out[3] == 10.0  # NULL group computed and joined null-safely
    assert out[4] is None  # group g all-null -> stays null


def test_impute_validation(df):
    with pytest.raises(ValueError, match="non-empty"):
        impute_nulls(df, {})
    with pytest.raises(ValueError, match="unknown strategy"):
        impute_nulls(df, {"v": "vibes"})
    with pytest.raises(ValueError, match="unknown strategy"):
        impute_nulls(df, {"v": ("fancy", 1)})


class TestSuggestFillRules:
    def test_rules_reproduce_impute(self, spark):
        from sparkplug_spark import SparkPlug
        from sparkplug_spark.operators import impute_nulls, suggest_fill_rules

        rows = [
            (1, "a", 10, "en"), (2, "a", 20, "en"), (3, "a", None, None),
            (4, "b", 7, "de"), (5, "b", None, "de"), (6, "b", 9, None),
        ]
        df = spark.createDataFrame(
            rows, "id long, g string, v long, lang string"
        )
        strategies = {"v": "median", "lang": "mode"}
        rules = suggest_fill_rules(df, strategies, by=("g",))
        via_rules = SparkPlug.builder(spark).create().plug(df, rules)
        via_impute = impute_nulls(df, strategies, by=("g",))
        assert sorted(map(tuple, via_rules.collect())) == sorted(
            map(tuple, via_impute.collect())
        )
        # rules are inspectable artifacts with the expected shape (column
        # names backtick-quoted so non-plain identifiers parse)
        assert all(
            r.condition.startswith(("`v` IS NULL", "`lang` IS NULL"))
            for r in rules
        )

    def test_group_values_with_quotes_and_null_groups(self, spark):
        from sparkplug_spark import SparkPlug
        from sparkplug_spark.operators import impute_nulls, suggest_fill_rules

        rows = [
            (1, "o'brien", 5), (2, "o'brien", None),
            (3, None, 8), (4, None, None),
        ]
        df = spark.createDataFrame(rows, "id long, g string, v long")
        rules = suggest_fill_rules(df, {"v": "median"}, by=("g",))
        got = {r["id"]: r["v"] for r in
               SparkPlug.builder(spark).create().plug(df, rules).collect()}
        want = {r["id"]: r["v"] for r in
                impute_nulls(df, {"v": "median"}, by=("g",)).collect()}
        assert got == want == {1: 5, 2: 5, 3: 8, 4: 8}

    def test_mean_rejected_and_const(self, spark):
        import pytest as _pytest

        from sparkplug_spark.operators import suggest_fill_rules

        df = spark.createDataFrame([(1, None)], "id long, v long")
        with _pytest.raises(ValueError, match="mean"):
            suggest_fill_rules(df, {"v": "mean"})
        rules = suggest_fill_rules(df, {"v": ("const", 42)})
        assert rules[0].condition == "`v` IS NULL"
        assert rules[0].actions[0].value == "42"
        with _pytest.raises(ValueError, match="backtick"):
            suggest_fill_rules(df, {"v": ("const", "has ` tick")})

    def test_group_cardinality_guard(self, spark):
        import pytest as _pytest

        from sparkplug_spark.operators import suggest_fill_rules

        df = spark.range(50).selectExpr(
            "id", "cast(id as string) as g", "id as v",
        )
        with _pytest.raises(ValueError, match="exceeds max_groups"):
            suggest_fill_rules(df, {"v": "median"}, by=("g",), max_groups=10)
        with _pytest.raises(ValueError, match="positive"):
            suggest_fill_rules(df, {"v": "median"}, by=("g",), max_groups=0)
        # Under the bound it still works.
        rules = suggest_fill_rules(
            df, {"v": "median"}, by=("g",), max_groups=50
        )
        assert len(rules) == 50

    def test_suggested_rules_pass_engine_validation(self, spark):
        from sparkplug_spark.operators import suggest_fill_rules
        from sparkplug_spark.validation import validate_rules

        df = spark.createDataFrame(
            [(1, "a", 10, "en"), (2, "a", None, None), (3, "b", 7, "de")],
            "id long, g string, v long, lang string",
        )
        rules = suggest_fill_rules(df, {"v": "median", "lang": "mode"}, by=("g",))
        assert validate_rules(df.schema, rules, spark=spark) == []

    def test_date_group_keys_round_trip(self, spark):
        import datetime as dt

        from sparkplug_spark import SparkPlug
        from sparkplug_spark.operators import impute_nulls, suggest_fill_rules

        rows = [
            (1, dt.date(2024, 1, 1), 10), (2, dt.date(2024, 1, 1), None),
            (3, dt.date(2024, 2, 2), 7), (4, dt.date(2024, 2, 2), None),
        ]
        df = spark.createDataFrame(rows, "id long, d date, v long")
        rules = suggest_fill_rules(df, {"v": "median"}, by=("d",))
        got = {r["id"]: r["v"] for r in
               SparkPlug.builder(spark).create().plug(df, rules).collect()}
        want = {r["id"]: r["v"] for r in
                impute_nulls(df, {"v": "median"}, by=("d",)).collect()}
        assert got == want == {1: 10, 2: 10, 3: 7, 4: 7}
