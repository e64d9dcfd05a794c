"""Property-based equivalence of the incremental maintenance tiers and
their one-shot twins: folding work in as increments must land on exactly
the state a full recompute produces, for ANY split of the input.

- update_components (E154): incremental CC over random graphs and random
  edge splits == CC over all edges at once.
- refresh_rollup (E150): build + K increments == direct aggregate of all
  events, for random event sets and random split points.

Each example runs several Spark jobs, so example counts stay small; the
adversarial value is in the random STRUCTURE (graph shape, split point),
not volume."""

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    build_rollup_store,
    near_dup_groups,
    refresh_rollup,
    rollup_query,
    update_components,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

edges_strategy = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=1,
    max_size=18,
)


@settings(**_SETTINGS)
@given(edges=edges_strategy, cut=st.integers(0, 18))
def test_update_components_equals_full_recompute(spark, edges, cut):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    cut = min(cut, len(edges) - 1) if len(edges) > 1 else 0
    old, new = edges[: cut or 1], edges[cut or 1 :]
    if not new:
        old, new = edges[:-1] or edges, edges[-1:]
    labels = near_dup_groups(spark.createDataFrame(old, ["id_a", "id_b"]))
    got = {
        (r["id"], r["group_id"])
        for r in update_components(
            labels, spark.createDataFrame(new, ["id_a", "id_b"])
        ).collect()
    }
    want = {
        (r["id"], r["group_id"])
        for r in near_dup_groups(
            spark.createDataFrame(edges, ["id_a", "id_b"])
        ).collect()
    }
    assert got == want


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 59),  # day offset within two months
        st.sampled_from(["a", "b"]),
        st.floats(-100, 100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=24,
)


@settings(**_SETTINGS)
@given(rows=events_strategy, cut=st.integers(0, 24))
def test_rollup_refresh_equals_direct_aggregate(spark, rows, cut, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("roll") / "store")
    df = spark.createDataFrame(
        [(i, d, k, float(v)) for i, (d, k, v) in enumerate(rows)],
        ["event_id", "d", "event_type", "value"],
    ).select(
        "event_id",
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("d") * 86400 + F.col("event_id")
        ).alias("ts"),
        "event_type",
        "value",
    )
    cut = max(1, min(cut, len(rows)))
    build_rollup_store(df.filter(F.col("event_id") < cut), path)
    refresh_rollup(spark, df.filter(F.col("event_id") >= cut), path)
    got = {
        (str(r["grain_start"]), r["agg_key"]): (
            r["n"],
            r["sum_micros"],
            r["min_micros"],
            r["max_micros"],
        )
        for r in rollup_query(spark, path, grain="month").collect()
    }
    want = {}
    for i, (d, k, v) in enumerate(rows):
        month = "2024-01-01" if d < 31 else "2024-02-01"
        m = math.floor(float(v) * 1e6 + 0.5)
        n, s, lo, hi = want.get((month, k), (0, 0, None, None))
        want[(month, k)] = (
            n + 1,
            s + m,
            m if lo is None else min(lo, m),
            m if hi is None else max(hi, m),
        )
    assert got == want
