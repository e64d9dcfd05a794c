"""Physical-plan regression locks: the properties PLANS.md reports,
asserted in CI so a refactor can't silently trade them away.

These are the plan shapes that matter at 100 TB: the rule chain must stay
one fused codegen'd projection (no shuffle, no Python), scrubbing must
stay pure codegen, candidate-generation joins must broadcast their small
sides, and single-tokenize operators must evaluate exactly one Arrow node.
"""

import re

from pyspark.sql import functions as F

from sparkplug_spark import PlugAction, PlugRule, SparkPlug


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


RULES = [
    PlugRule("r1", "v1", "v < 10", (PlugAction("v", "99"),)),
    PlugRule("r2", "v1", "s = 'x'", (PlugAction("s", "y"),)),
    PlugRule("r3", "v1", "v >= 99", (PlugAction("s", "`concat(s, '!')`"),)),
]


def test_plug_chain_is_one_fused_projection(spark):
    df = spark.createDataFrame([(1, "x"), (20, "z")], ["v", "s"])
    out = SparkPlug.builder(spark).enable_plug_details().create().plug(df, RULES)
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
    # all three rules collapse into ONE whole-stage-codegen span
    assert len(set(re.findall(r"\*\((\d+)\)", plan))) == 1


def test_scrub_pii_is_pure_codegen(spark):
    from sparkplug_spark.operators import scrub_pii

    df = spark.createDataFrame([(1, "a@b.co")], ["id", "text"])
    plan = _plan(scrub_pii(df))
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_textops_single_arrow_node(spark):
    from sparkplug_spark.operators import language_id, text_stats

    df = spark.createDataFrame([(1, "some text here")], ["id", "text"])
    plan = _plan(language_id(text_stats(df)))
    # tokenize-once: one ArrowEvalPython per operator, two total max
    assert plan.count("ArrowEvalPython") <= 2


def test_decontaminate_broadcasts_eval_index(spark):
    from sparkplug_spark.operators import decontaminate

    docs = spark.createDataFrame(
        [(i, f"doc {i} alpha beta gamma delta epsilon") for i in range(20)],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(0, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    plan = _plan(decontaminate(docs, ev, n=5))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/part.parquet")
    plan = _plan(df.filter(F.col("p_size") > 40).select("p_partkey", "p_size"))
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan", plan)
    # column pruning: only the two selected columns in ReadSchema
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(f.split(":")[0] for f in m.group(1).split(",")) == {
        "p_partkey",
        "p_size",
    }


def test_column_profile_approx_is_single_exchange(spark):
    """The at-scale default (HLL approx_count_distinct) must keep the whole
    profile to ONE aggregation exchange; exact_distinct=True is allowed to
    expand (it exists for the cross-engine oracle only)."""
    from sparkplug_spark.operators import column_profile

    df = spark.createDataFrame(
        [(float(i), float(i * 2), float(i % 7)) for i in range(100)],
        ["a", "b", "c"],
    )
    approx_plan = _plan(column_profile(df, ["a", "b", "c"]))
    assert approx_plan.count("Exchange") == 1
    exact_plan = _plan(column_profile(df, ["a", "b", "c"], exact_distinct=True))
    assert exact_plan.count("Exchange") >= approx_plan.count("Exchange")


def test_chunk_documents_is_shuffle_free(spark):
    from sparkplug_spark.operators import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = _plan(chunk_documents(df, chunk_tokens=4, overlap=1))
    assert "Exchange" not in plan


def test_funnel_is_two_exchanges(spark):
    from sparkplug_spark.operators import funnel_counts

    df = spark.createDataFrame(
        [(i % 7, float(i), ["view", "click", "purchase"][i % 3]) for i in range(60)],
        ["user_id", "ts", "event_type"],
    )
    plan = _plan(funnel_counts(df, ["view", "click", "purchase"]))
    # the frontier recursion must stay window-chained: one hash exchange on
    # the user key + the final K-row single-partition aggregate — NOT the
    # O(K^2) union-of-frontier-joins shape (17 exchanges for 3 steps)
    assert plan.count("Exchange") == 2
    assert "Join" not in plan


def test_strip_markup_is_pure_codegen(spark):
    from sparkplug_spark.operators import strip_markup

    df = spark.createDataFrame([(1, "<b>x</b> &amp; y")], ["id", "text"])
    plan = _plan(strip_markup(df))
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_dataset_fingerprint_partial_aggregates(spark):
    from sparkplug_spark.operators import dataset_fingerprint

    df = spark.createDataFrame([(i, f"t{i}") for i in range(10)], ["doc_id", "text"])
    plan = _plan(dataset_fingerprint(df))
    # commutative folds must combine map-side: only per-partition digests
    # may cross the single-partition boundary
    assert "partial_bit_xor" in plan and "partial_sum" in plan


def test_assign_splits_is_zero_shuffle_codegen(spark):
    from sparkplug_spark.operators import assign_splits

    df = spark.createDataFrame([(1, "t")], ["doc_id", "text"])
    plan = _plan(assign_splits(df))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan


def test_rolling_features_single_window_exchange(spark):
    import datetime as dt

    from sparkplug_spark.operators import rolling_window_features

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "view", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    # plain: exactly one hash exchange (the keyed window); bucketed: same
    for kwargs in ({}, {"bucket_seconds": 86400}):
        plan = _plan(rolling_window_features(ev, window_seconds=3600, **kwargs))
        assert plan.count("Exchange hashpartitioning") == 1, kwargs
        assert "EvalPython" not in plan and "InPandas" not in plan


def test_ngram_counts_single_arrow_node_no_global_sort(spark):
    from sparkplug_spark.operators import ngram_counts

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = _plan(ngram_counts(docs, n=2, max_size=10))
    assert plan.count("ArrowEvalPython") == 1  # tokenize once
    # top-N via TakeOrdered (per-partition heaps), not a full sort shuffle
    assert "TakeOrderedAndProject" in plan


def test_keyword_search_inline_no_token_explode_shuffle(spark):
    from sparkplug_spark.operators import keyword_search

    docs = spark.createDataFrame([(1, "a b c"), (2, "b d")], ["doc_id", "text"])
    out = keyword_search(docs, {"q": ["b"]}, k=5, release=False)
    plan = _plan(out)
    # matched side: tokenize (1 Arrow node per consumer) -> narrow
    # per-term tf; hash exchanges = dfreq-by-term + scoring agg +
    # per-query window, all over the bounded match sliver
    assert plan.count("ArrowEvalPython") <= 2  # matched + dfreq reuse
    assert plan.count("Exchange hashpartitioning") <= 3
    # the corpus token stream itself never shuffles: no explode feeding
    # an exchange
    assert "Generate explode(filter(pythonUDF" not in plan


def test_textrank_adjacency_has_no_window(spark):
    # the final textrank frame is checkpoint-truncated, so assert on the
    # adjacency stage itself: pairs come off the token ARRAY (zip of
    # slices) — no Window node, no exchange of the exploded token stream
    from sparkplug_spark.operators.textops import _adjacent_token_pairs

    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "b c d b c")], ["doc_id", "text"]
    )
    plan = _plan(_adjacent_token_pairs(docs, "text"))
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan
