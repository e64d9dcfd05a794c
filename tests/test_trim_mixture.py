"""Quantile trimming and corpus-mixture reporting."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import mixture_report, trim_by_quantile


@pytest.fixture()
def lengths(spark):
    # group "a": values 1..100; group "b": 1..10 plus a null
    rows = [(i, "a", float(i)) for i in range(1, 101)]
    rows += [(100 + i, "b", float(i)) for i in range(1, 11)]
    rows += [(999, "b", None)]
    return spark.createDataFrame(rows, "doc_id long, source string, v double")


def test_trim_exact_grouped(lengths):
    out = trim_by_quantile(
        lengths, "v", lo=0.05, hi=0.95, by=("source",), id_col="doc_id"
    )
    a = sorted(r["v"] for r in out.filter("source = 'a'").collect())
    # n=100: keep rn in (5, 95] -> values 6..95
    assert a[0] == 6.0 and a[-1] == 95.0 and len(a) == 90
    b = sorted(r["v"] for r in out.filter("source = 'b'").collect())
    # n=10 (null dropped): keep rn in (0, ceil(9.5)=10] -> all 10
    assert len(b) == 10
    assert out.filter("v is null").count() == 0


def test_trim_exact_ungrouped(lengths):
    out = trim_by_quantile(lengths, "v", lo=0.0, hi=0.5, id_col="doc_id")
    # 110 non-null rows, keep rn <= 55
    assert out.count() == 55


def test_trim_approx_within_band(lengths):
    out = trim_by_quantile(
        lengths, "v", lo=0.05, hi=0.95, by=("source",), mode="approx"
    )
    a = sorted(r["v"] for r in out.filter("source = 'a'").collect())
    # sketch cuts are near the exact ones; band must cover the bulk
    assert 80 <= len(a) <= 100 and a[0] >= 1.0 and a[-1] <= 100.0
    assert out.filter("v is null").count() == 0


def test_trim_validation(lengths):
    with pytest.raises(ValueError, match="lo < hi"):
        trim_by_quantile(lengths, "v", lo=0.9, hi=0.1)
    with pytest.raises(ValueError, match="mode"):
        trim_by_quantile(lengths, "v", mode="sorta")


def test_mixture_report(spark):
    df = spark.createDataFrame(
        [(1, "web", 600), (2, "web", 150), (3, "wiki", 200), (4, "code", 50)],
        "doc_id long, source string, n_tokens long",
    )
    rep = {
        r["source"]: r
        for r in mixture_report(
            df, {"web": 0.5, "wiki": 0.5}, key="source", weight_col="n_tokens"
        ).collect()
    }
    assert rep["web"]["actual_weight"] == 750
    assert rep["web"]["actual_ppm"] == 750000
    assert rep["web"]["target_ppm"] == 500000
    # factor = 0.5 / 0.75
    assert rep["web"]["factor_ppm"] == 666666
    assert rep["wiki"]["factor_ppm"] == 2500000
    assert rep["code"]["target_ppm"] == 0 and rep["code"]["factor_ppm"] == 0
    # a declared source with zero rows still shows up in the audit
    rep2 = {
        r["source"]: r
        for r in mixture_report(
            df, {"web": 0.5, "books": 0.5}, key="source", weight_col="n_tokens"
        ).collect()
    }
    assert rep2["books"]["actual_weight"] == 0
    assert rep2["books"]["actual_ppm"] == 0
    assert rep2["books"]["target_ppm"] == 500000
    assert rep2["books"]["factor_ppm"] is None
    with pytest.raises(ValueError, match="non-empty"):
        mixture_report(df, {})
    with pytest.raises(ValueError, match="positive"):
        mixture_report(df, {"web": 0.0})


def test_build_vocab(spark):
    from sparkplug_spark.operators import build_vocab

    df = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "beta gamma gamma? delta")],
        "doc_id long, text string",
    )
    rows = build_vocab(df, max_size=3, min_count=2).collect()
    got = [(r["token"], r["n"], r["rank"]) for r in rows]
    # beta=3, gamma=3 (tie -> beta first alphabetically); delta/alpha cut
    assert got == [("beta", 3, 1), ("gamma", 3, 2)]
    import pytest as _p

    with _p.raises(ValueError, match="positive"):
        build_vocab(df, max_size=0)


def test_covariance_components(spark):
    import math

    from sparkplug_spark.operators import covariance_components

    rows = [(1.25, 2.0), (-0.5, 4.0), (3.0, None), (None, 1.0), (2.5, -1.5)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = covariance_components(df, [("x", "y"), ("x", "x")], scale=100).collect()
    out = {(t["x_col"], t["y_col"]): t for t in r}
    both = [(x, y) for x, y in rows if x is not None and y is not None]
    xi = [math.floor(x * 100) for x, _ in both]
    yi = [math.floor(y * 100) for _, y in both]
    c = out[("x", "y")]
    assert c["n"] == 3
    assert c["sum_x"] == sum(xi) and c["sum_y"] == sum(yi)
    assert c["sum_xy"] == sum(a * b for a, b in zip(xi, yi))
    assert c["sum_xx"] == sum(a * a for a in xi)
    # derived corr matches numpy on the scaled ints
    import numpy as np

    corr = np.corrcoef(xi, yi)[0, 1]
    n, sx, sy = c["n"], c["sum_x"], c["sum_y"]
    num = c["sum_xy"] - sx * sy / n
    den = math.sqrt((c["sum_xx"] - sx * sx / n) * (c["sum_yy"] - sy * sy / n))
    assert abs(num / den - corr) < 1e-12
    assert out[("x", "x")]["n"] == 4
    import pytest as _p

    with _p.raises(ValueError, match="non-empty"):
        covariance_components(df, [])


def test_sample_exact_n(spark):
    from sparkplug_spark.operators import sample_exact_n

    df = spark.createDataFrame([(i, f"t{i}") for i in range(100)], "doc_id long, t string")
    a = {r["doc_id"] for r in sample_exact_n(df, 10).collect()}
    b = {r["doc_id"] for r in sample_exact_n(df, 10).collect()}
    assert len(a) == 10 and a == b  # exact and reproducible
    c = {r["doc_id"] for r in sample_exact_n(df, 10, salt="v2").collect()}
    assert c != a  # salted redraw
    assert len({r["doc_id"] for r in sample_exact_n(df, 200).collect()}) == 100
    import pytest as _p

    with _p.raises(ValueError, match="positive"):
        sample_exact_n(df, 0)
