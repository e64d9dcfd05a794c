"""Partitioning-invariance properties for the session-4 deterministic
operators: the SAME logical input must produce the SAME result whatever
physical partitioning it arrives in — the property that separates
"happens to work on local[4]" from "correct on 1000 executors".

Each case computes the operator over the input at 1 partition and at a
hypothesis-chosen partition count and requires set equality.  Volume is
tiny on purpose; the adversarial value is the REPARTITION, which
reshuffles row order and per-partition contents."""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    rank_normalize,
    weighted_sample_k,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 99),
        st.floats(0.125, 100.0, allow_nan=False, allow_subnormal=False, width=32),
    ),
    min_size=2,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(**_SETTINGS)
@given(rows=rows_strategy, parts=st.integers(2, 7))
def test_weighted_sample_k_partitioning_invariant(spark, rows, parts):
    df = spark.createDataFrame(
        [(i, float(w)) for i, w in rows], ["doc_id", "w"]
    )
    k = max(1, len(rows) // 2)
    a = {
        (r["doc_id"], r["race_key_nanos"])
        for r in weighted_sample_k(df.coalesce(1), k, "w").collect()
    }
    b = {
        (r["doc_id"], r["race_key_nanos"])
        for r in weighted_sample_k(df.repartition(parts), k, "w").collect()
    }
    assert a == b


@settings(**_SETTINGS)
@given(rows=rows_strategy, parts=st.integers(2, 7))
def test_rank_normalize_partitioning_invariant(spark, rows, parts):
    df = spark.createDataFrame(
        [(i, float(w)) for i, w in rows], ["id", "v"]
    )
    a = {
        (r["id"], r["rank"], r["rank_ppm"])
        for r in rank_normalize(df.coalesce(1), "v", "id").collect()
    }
    b = {
        (r["id"], r["rank"], r["rank_ppm"])
        for r in rank_normalize(df.repartition(parts), "v", "id").collect()
    }
    assert a == b
