"""Data-quality expectations: one-pass violation report + row flagging."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    Expectation,
    check_expectations,
    flag_violations,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", "O", 10.0),
            (2, "bad", "O", -5.0),
            (3, None, "Z", 50.0),
            (3, "c@y.org", "F", None),
            (4, "d@z.io", None, 2000.0),
        ],
        ["id", "email", "status", "price"],
    )


EXPS = [
    Expectation("email_not_null", "not_null", column="email"),
    Expectation("id_unique", "unique", column="id"),
    Expectation("status_valid", "in_set", column="status", values=("O", "F")),
    Expectation("price_range", "in_range", column="price", lo=0.0, hi=1000.0),
    Expectation(
        "email_shape", "matches", column="email", pattern=r"^[^@]+@[^@]+$"
    ),
    Expectation(
        "price_covers_id", "expr", predicate="price > id"
    ),
]


def test_report_counts(df):
    rep = {r["expectation"]: r for r in check_expectations(df, EXPS).collect()}
    assert all(r["n_rows"] == 5 for r in rep.values())
    assert rep["email_not_null"]["n_violations"] == 1
    assert rep["id_unique"]["n_violations"] == 1  # id=3 twice -> 1 extra
    assert rep["status_valid"]["n_violations"] == 1  # Z; null skipped
    assert rep["price_range"]["n_violations"] == 2  # -5, 2000; null skipped
    assert rep["email_shape"]["n_violations"] == 1  # "bad"; null skipped
    # violated when false (-5<2, 10>1 ok...) OR null (price None)
    assert rep["price_covers_id"]["n_violations"] == 2
    assert rep["email_not_null"]["passed"] is False
    assert rep["email_not_null"]["kind"] == "not_null"
    assert rep["price_covers_id"]["col_name"] is None


def test_report_clean_table_passes(spark):
    clean = spark.createDataFrame([(1, "x")], ["id", "s"])
    rep = check_expectations(
        clean,
        [
            Expectation("id_unique", "unique", column="id"),
            Expectation("s_not_null", "not_null", column="s"),
        ],
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rep)


def test_approx_unique_runs(df):
    rep = {
        r["expectation"]: r
        for r in check_expectations(df, EXPS, exact_unique=False).collect()
    }
    # approx_count_distinct is exact at this cardinality
    assert rep["id_unique"]["n_violations"] == 1


def test_flag_violations_rows(df):
    row_exps = [e for e in EXPS if e.kind != "unique"]
    out = {
        r["id"]: sorted(r["failed_expectations"])
        for r in flag_violations(df, row_exps).collect()
        if r["email"] != "c@y.org"
    }
    assert out[1] == []
    assert out[2] == ["email_shape", "price_covers_id", "price_range"]
    assert out[4] == ["price_range"]


def test_flag_rejects_unique(df):
    with pytest.raises(ValueError, match="aggregate-level"):
        flag_violations(df, [Expectation("u", "unique", column="id")])


def test_expectation_validation():
    with pytest.raises(ValueError, match="kind"):
        Expectation("x", "sometimes_null", column="c")
    with pytest.raises(ValueError, match="requires column"):
        Expectation("x", "not_null")
    with pytest.raises(ValueError, match="requires values"):
        Expectation("x", "in_set", column="c")
    with pytest.raises(ValueError, match="requires lo"):
        Expectation("x", "in_range", column="c")
    with pytest.raises(ValueError, match="requires predicate"):
        Expectation("x", "expr")
    with pytest.raises(ValueError, match="non-empty"):
        check_expectations(None, [])


def test_streaming_violation_counts(spark, tmp_path):
    import datetime as dt

    from sparkplug_spark.streaming import streaming_violation_counts

    def ts(s):
        return dt.datetime.fromisoformat(s)

    src = str(tmp_path / "viol_src")
    spark.createDataFrame(
        [
            (1, 10.0, ts("2024-01-01 10:00:00")),
            (2, None, ts("2024-01-01 10:00:20")),   # not_null violation
            (3, -4.0, ts("2024-01-01 10:00:40")),   # range violation
            (4, 5.0, ts("2024-01-01 10:01:10")),    # next window, clean
        ],
        "id long, v double, ts timestamp",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("id long, v double, ts timestamp").parquet(src)
    counts = streaming_violation_counts(
        stream,
        [
            Expectation("v_not_null", "not_null", column="v"),
            Expectation("v_range", "in_range", column="v", lo=0.0, hi=100.0),
        ],
        time_col="ts",
        window_duration="1 minute",
        watermark_delay=None,
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("viol_q")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["window_start"].minute, r["expectation"]): r
        for r in spark.sql("select * from viol_q").collect()
    }
    assert rows[(0, "v_not_null")]["n_violations"] == 1
    assert rows[(0, "v_not_null")]["n_rows"] == 3
    assert rows[(0, "v_range")]["n_violations"] == 1
    assert rows[(1, "v_not_null")]["n_violations"] == 0
    assert rows[(1, "v_range")]["n_violations"] == 0  # zero-violation row kept


def test_one_sided_range(spark):
    d = spark.createDataFrame([(1, -1.0), (2, 5.0)], ["id", "v"])
    rep = check_expectations(
        d, [Expectation("v_pos", "in_range", column="v", lo=0.0)]
    ).collect()[0]
    assert rep["n_violations"] == 1
