"""Property-based check: SparkPlug's fused plug vs an independent pandas
fold implementing the documented semantics (sequential visibility,
null-safe change gate for details, literal coercion).  The reference has
no property tests (SURVEY 5); this guards the rebuild's core semantics
against a second implementation."""

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkplug_spark import PlugAction, PlugRule, SparkPlug

COLS = ["cat", "qty", "price"]
CATS = ["a", "b", "c", None]

rows_st = st.lists(
    st.tuples(
        st.sampled_from(CATS),
        st.one_of(st.none(), st.integers(min_value=-5, max_value=20)),
        st.one_of(st.none(), st.floats(min_value=-10, max_value=100,
                                       allow_nan=False, width=16)),
    ),
    min_size=1,
    max_size=25,
)


def cond_st():
    return st.one_of(
        st.tuples(st.just("cat"), st.just("="), st.sampled_from(["a", "b", "c"])),
        st.tuples(st.just("qty"), st.sampled_from(["<", ">", "="]),
                  st.integers(min_value=-2, max_value=15)),
        st.tuples(st.just("price"), st.sampled_from(["<", ">"]),
                  st.integers(min_value=0, max_value=80)),
    )


def action_st():
    return st.one_of(
        st.tuples(st.just("cat"), st.sampled_from(["x", "y"])),
        st.tuples(st.just("qty"), st.integers(min_value=0, max_value=9).map(str)),
        st.tuples(st.just("price"), st.integers(min_value=0, max_value=50).map(lambda v: f"{v}.5")),
    )


rules_st = st.lists(
    st.tuples(cond_st(), st.lists(action_st(), min_size=1, max_size=2)),
    min_size=1,
    max_size=4,
)


def pandas_plug(pdf: pd.DataFrame, rules):
    """Independent reference: sequential fold of conditional overrides."""
    out = pdf.copy()
    for rule in rules:
        (col, op, lit), actions = rule
        series = out[col]
        if op == "=":
            mask = series == lit
        elif op == "<":
            mask = series < lit
        else:
            mask = series > lit
        mask = mask.fillna(False) if mask.dtype == object else (mask & series.notna())
        for key, value in actions:
            coerced = int(value) if key == "qty" else (float(value) if key == "price" else value)
            out.loc[mask, key] = coerced
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st, raw_rules=rules_st)
def test_plug_matches_pandas_reference(spark, rows, raw_rules):
    pdf = pd.DataFrame(rows, columns=COLS).astype(
        {"qty": "Int64", "price": "float64"}
    )
    df = spark.createDataFrame(
        [(c, None if q is pd.NA or q is None else int(q),
          None if p is None or (isinstance(p, float) and math.isnan(p)) else float(p))
         for c, q, p in rows],
        "cat string, qty int, price double",
    )
    rules = [
        PlugRule(
            f"r{i}", "v1",
            f"{col} {op} {repr(lit) if isinstance(lit, str) else lit}",
            tuple(PlugAction(k, v) for k, v in actions),
        )
        for i, ((col, op, lit), actions) in enumerate(raw_rules)
    ]
    got = (
        SparkPlug.builder(spark).create().plug(df, rules)
        .toPandas()
        .sort_values(COLS, na_position="last")
        .reset_index(drop=True)
    )
    want = (
        pandas_plug(pdf, raw_rules)
        .astype({"qty": "float64"})
        .sort_values(COLS, na_position="last")
        .reset_index(drop=True)
    )
    got["qty"] = got["qty"].astype("float64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
