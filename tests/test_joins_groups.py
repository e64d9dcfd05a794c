"""as-of join, range join, connected components, keep-best dedup,
streaming dedup + windowed impact counts."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparkplug_spark import PlugAction, PlugRule
from sparkplug_spark.operators import (
    asof_join,
    dedup_keep_best,
    near_dup_groups,
    range_join,
)
from sparkplug_spark.streaming import (
    plug_stream,
    streaming_dedup_exact,
    streaming_impact_counts,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [
            (1, 100, ts("2024-01-01 10:00:00")),
            (2, 100, ts("2024-01-01 12:00:00")),
            (3, 200, ts("2024-01-01 09:00:00")),
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, ts("2024-01-01 09:30:00"), 5.0),
            (100, ts("2024-01-01 11:00:00"), 7.0),
            (200, ts("2024-01-01 09:00:00"), 9.0),  # tie: >= matches
        ],
        ["user_id", "ts", "value"],
    )
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, on="ts", by=["user_id"], right_cols=["value"]).collect()
    }
    assert out[1]["asof_value"] == 5.0
    assert out[2]["asof_value"] == 7.0
    assert out[3]["asof_value"] == 9.0  # equal timestamps match
    assert out[1]["asof_ts"] == ts("2024-01-01 09:30:00")


def test_asof_join_forward_and_nearest(spark):
    left = spark.createDataFrame(
        [
            (1, 100, ts("2024-01-01 10:00:00")),  # fwd 11:00; nearest 09:30
            (2, 100, ts("2024-01-01 12:00:00")),  # fwd none; nearest 11:00
            (3, 200, ts("2024-01-01 09:00:00")),  # tie both dirs → itself
            (4, 100, ts("2024-01-01 10:30:00")),  # equidistant → backward
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (100, ts("2024-01-01 09:30:00"), 5.0),
            (100, ts("2024-01-01 11:30:00"), 7.0),
            (200, ts("2024-01-01 09:00:00"), 9.0),
        ],
        ["user_id", "ts", "value"],
    )
    fwd = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on="ts", by=["user_id"], right_cols=["value"],
            direction="forward",
        ).collect()
    }
    assert fwd[1]["asof_value"] == 7.0
    assert fwd[2]["asof_value"] is None  # nothing at/after 12:00
    assert fwd[3]["asof_value"] == 9.0  # equal timestamps match
    near = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on="ts", by=["user_id"], right_cols=["value"],
            direction="nearest",
        ).collect()
    }
    assert near[1]["asof_value"] == 5.0  # 30 min back vs 90 min fwd
    assert near[2]["asof_value"] == 7.0  # only backward exists
    assert near[3]["asof_value"] == 9.0
    assert near[4]["asof_value"] == 5.0  # 60 min both ways → backward wins
    assert near[4]["asof_ts"] == ts("2024-01-01 09:30:00")


def test_asof_join_bad_direction(spark):
    left = spark.createDataFrame([(1, 100, 1.0)], ["event_id", "user_id", "ts"])
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, direction="sideways")


def test_interval_overlap_join(spark):
    from sparkplug_spark.operators import interval_overlap_join

    left = spark.createDataFrame(
        [
            (1, 100, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
            (2, 100, ts("2024-01-01 15:00:00"), ts("2024-01-01 16:00:00")),
            (3, 200, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
        ],
        ["l_id", "user_id", "start", "end"],
    )
    right = spark.createDataFrame(
        [
            # overlaps l1 across several shared hourly buckets -> one row
            (10, 100, ts("2024-01-01 09:00:00"), ts("2024-01-01 13:00:00")),
            # touches l1's end only (half-open: no overlap)
            (11, 100, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")),
            # overlaps l2 by one minute
            (12, 100, ts("2024-01-01 15:59:00"), ts("2024-01-01 17:00:00")),
            # right user differs -> no match for l3
            (13, 999, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
        ],
        ["r_id", "user_id", "rstart", "rend"],
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in interval_overlap_join(
            left, right, "start", "end", "rstart", "rend", by=["user_id"]
        ).collect()
    )
    assert got == [(1, 10), (2, 12)]


def test_retention_cohorts(spark):
    from sparkplug_spark.operators import retention_cohorts

    day = 86400
    base = 1_700_000_000 - (1_700_000_000 % (7 * day))  # period boundary
    rows = [
        # user 1: first week 0, returns week 1 and 2
        (1, base + 1 * day), (1, base + 8 * day), (1, base + 15 * day),
        # user 2: first week 0 only (two events same week count once)
        (2, base + 2 * day), (2, base + 3 * day),
        # user 3: first week 1, returns week 2
        (3, base + 8 * day), (3, base + 14 * day),
    ]
    df = spark.createDataFrame(
        [(u, dt.datetime.utcfromtimestamp(t)) for u, t in rows],
        "user_id long, ts timestamp",
    )
    out = {
        (r["cohort_period"] - base // (7 * day), r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }
    assert out == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1, (1, 1): 1}
    capped = retention_cohorts(df, max_offset=1)
    assert capped.agg(F.max("period_offset")).collect()[0][0] == 1


def test_asof_join_no_match_is_null(spark):
    left = spark.createDataFrame([(1, 100, ts("2024-01-01 08:00:00"))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([(100, ts("2024-01-01 09:00:00"), 1.0)], ["user_id", "ts", "value"])
    row = asof_join(left, right).collect()[0]
    assert row["asof_value"] is None and row["asof_ts"] is None


def test_range_join(spark):
    events = spark.createDataFrame(
        [(1, ts("2024-01-01 10:30:00")), (2, ts("2024-01-01 13:30:00"))],
        ["event_id", "ts"],
    )
    windows = spark.createDataFrame(
        [
            ("w1", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
            ("w2", ts("2024-01-01 11:00:00"), ts("2024-01-01 14:00:00")),
        ],
        ["win_id", "start", "end"],
    )
    out = {(r["event_id"], r["win_id"]) for r in range_join(events, windows).collect()}
    assert out == {(1, "w1"), (2, "w2")}


def test_range_join_pre_epoch(spark):
    # negative-epoch timestamps: truncation-toward-zero bucketing would
    # disagree with floor and silently drop the containment match
    events = spark.createDataFrame(
        [(1, ts("1969-12-31 23:30:00"))], ["event_id", "ts"]
    )
    windows = spark.createDataFrame(
        [("w0", ts("1969-12-31 23:00:00"), ts("1970-01-01 00:00:00"))],
        ["win_id", "start", "end"],
    )
    out = {(r["event_id"], r["win_id"]) for r in range_join(events, windows).collect()}
    assert out == {(1, "w0")}


def test_near_dup_groups_chain(spark):
    # chain 1-2-3-4 plus isolated pair (10,11): two components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    out = {r["id"]: r["group_id"] for r in near_dup_groups(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_near_dup_groups_reliable_checkpoint(spark, tmp_path):
    # executor-loss-safe lineage truncation for 1000-node jobs
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    out = {
        r["id"]: r["group_id"]
        for r in near_dup_groups(pairs, reliable_checkpoint=True).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_near_dup_groups_nonconvergence_raises(spark):
    import pytest

    # a long chain can't converge in one round; silent wrong labels are
    # worse than an error
    chain = [(i, i + 1) for i in range(1, 9)]
    pairs = spark.createDataFrame(chain, ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_groups(pairs, max_iterations=1)


def test_connected_components_star_matches_label_prop(spark):
    from sparkplug_spark.operators import connected_components_star

    import random

    rng = random.Random(5)
    edges = {(rng.randrange(100), rng.randrange(100)) for _ in range(120)}
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    star = {r["id"]: r["group_id"] for r in connected_components_star(pairs).collect()}
    label = {r["id"]: r["group_id"] for r in near_dup_groups(pairs).collect()}
    assert star == label


def test_connected_components_star_high_diameter(spark):
    """An 80-node chain: min-label needs 80 rounds (raises at the 25 cap);
    the alternating star algorithm converges in O(log² n)."""
    from sparkplug_spark.operators import connected_components_star

    import pytest

    chain = [(i, i + 1) for i in range(1, 81)]
    pairs = spark.createDataFrame(chain, ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_groups(pairs, max_iterations=10)
    out = {r["id"]: r["group_id"] for r in connected_components_star(pairs, max_iterations=10).collect()}
    assert set(out) == set(range(1, 82))
    assert set(out.values()) == {1}


def test_dedup_keep_best(spark):
    docs = spark.createDataFrame(
        [
            (1, "short"),
            (2, "the quick brown fox jumps over the lazy dog and keeps running"),
            (3, "unrelated survivor document"),
        ],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    kept = {r["doc_id"] for r in dedup_keep_best(docs, pairs).collect()}
    assert kept == {2, 3}  # 2 beats 1 on quality; 3 untouched


def test_streaming_dedup_and_impact(spark, tmp_path):
    src = str(tmp_path / "sd_src")
    spark.createDataFrame(
        [
            (1, "same doc!", ts("2024-01-01 10:00:00"), 5.0),
            (2, "Same doc", ts("2024-01-01 10:00:30"), 5.0),   # dup of 1 normalized
            (3, "other doc", ts("2024-01-01 10:01:00"), -1.0),
        ],
        ["id", "text", "ts", "value"],
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "id long, text string, ts timestamp, value double"
    ).parquet(src)

    deduped = streaming_dedup_exact(stream, text_col="text", time_col="ts")
    plugged = plug_stream(
        spark,
        deduped,
        [PlugRule("nonneg", "v1", "value < 0", (PlugAction("value", "0.0"),))],
    )
    counts = streaming_impact_counts(plugged, "ts", window_duration="1 minute", watermark_delay=None)
    q = (
        counts.writeStream.format("memory")
        .queryName("sdi_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sdi_test").collect()
    assert len(rows) == 1
    assert rows[0]["rule_name"] == "nonneg" and rows[0]["rows_changed"] == 1
    assert rows[0]["window_start"] == ts("2024-01-01 10:01:00")


def test_cosine_topk_ivf_full_probe_equals_exact(spark):
    import random

    from sparkplug_spark.operators import cosine_topk, cosine_topk_ivf

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = corpus.filter("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding"
    )
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(corpus, queries, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_ivf(
            corpus, queries, k=5, num_centroids=4, n_probe=4
        ).collect()
    }
    assert ivf == exact  # exhaustive probe == brute force


def test_cosine_topk_ivf_partial_probe_recall(spark):
    import random

    from sparkplug_spark.operators import cosine_topk, cosine_topk_ivf

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = corpus.filter("vec_id < 5").selectExpr("vec_id as query_id", "embedding")
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_ivf(corpus, queries, k=5, num_centroids=8, n_probe=4).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.5  # loose recall floor


def test_extract_audio_features(spark):
    from sparkplug_spark.operators.multimodal import extract_audio_features

    df = spark.createDataFrame([(1, b"x" * 100), (2, None)], ["id", "payload"])
    rows = {r["id"]: r for r in extract_audio_features(df, frame_ms=25, n_mels=4).collect()}
    assert len(rows[1]["features"]) == 4  # 100 "ms" / 25
    assert len(rows[1]["features"][0]) == 4
    assert len(rows[2]["features"]) == 1  # null payload -> 1 empty-derived frame
    with pytest.raises(Exception):
        extract_audio_features(df, decoder="real").collect()


def test_overwrite_partitions_dynamic(spark, tmp_path):
    from sparkplug_spark.sources import overwrite_partitions

    path = str(tmp_path / "incr")
    full = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "day", "v"]
    )
    overwrite_partitions(full, path, ["day"])
    # reprocess ONLY day b with corrected values
    fix = spark.createDataFrame([(2, "b", 99)], ["id", "day", "v"])
    overwrite_partitions(fix, path, ["day"])
    got = {(r["id"], r["day"], r["v"]) for r in spark.read.parquet(path).collect()}
    # day a and c untouched, day b replaced (static mode would truncate all)
    assert got == {(1, "a", 10), (2, "b", 99), (3, "c", 30)}
    # conf restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"


def test_read_corpus_jsonl_csv(spark, tmp_path):
    from sparkplug_spark.sources import read_corpus

    jl = tmp_path / "docs.jsonl"
    jl.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        "{this is not json at all}\n"
        '{"doc_id": 2, "text": "second doc"}\n'
    )
    df = read_corpus(spark, str(jl), fmt="jsonl", schema="doc_id long, text string")
    rows = df.collect()
    good = {r["doc_id"]: r["text"] for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {1: "hello world", 2: "second doc"}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]

    cv = tmp_path / "docs.csv"
    cv.write_text("doc_id,text\n1,hello\n2,world\n")
    cdf = read_corpus(spark, str(cv), fmt="csv", schema="doc_id long, text string")
    assert {(r["doc_id"], r["text"]) for r in cdf.select("doc_id", "text").collect()} == {
        (1, "hello"),
        (2, "world"),
    }


def test_write_bucketed_join_has_no_shuffle(spark, tmp_path):
    from sparkplug_spark.sources import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1000).withColumnRenamed("id", "k")
        b = spark.range(0, 1000).withColumnRenamed("id", "k")
        write_bucketed(a, "bk_a", ["k"], num_buckets=4)
        write_bucketed(b, "bk_b", ["k"], num_buckets=4)
        joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucketing co-locates the join
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("drop table if exists bk_a")
        spark.sql("drop table if exists bk_b")


def test_salted_join_matches_plain_join(spark):
    from sparkplug_spark.operators import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e")], ["k", "lv"]
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y")], ["k", "rv"])
    plain = {tuple(r) for r in left.join(right, "k").select("k", "lv", "rv").collect()}
    salted = {
        tuple(r)
        for r in salted_join(left, right, "k", salts=4).select("k", "lv", "rv").collect()
    }
    assert salted == plain
    outer = {
        tuple(r)
        for r in salted_join(left, right, "k", salts=4, how="left")
        .select("k", "lv", "rv")
        .collect()
    }
    assert (3, "e", None) in outer


def test_sessionize_stream(spark, tmp_path):
    from sparkplug_spark.streaming import sessionize_stream

    src = str(tmp_path / "sess_src")
    rows = [
        (100, ts("2024-01-01 10:00:00")),
        (100, ts("2024-01-01 10:10:00")),   # same session (gap 10m < 30m)
        (100, ts("2024-01-01 12:00:00")),   # new session after 110m gap
        (200, ts("2024-01-01 10:00:00")),
    ]
    spark.createDataFrame(rows, ["user_id", "ts"]).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("select * from sess_test").collect()
    }
    # only user 100's FIRST session closes within this batch (the 12:00
    # event is > gap after it); open sessions stay in state
    assert (100, ts("2024-01-01 10:00:00"), 2) in got


def test_sessionize_stream_late_event_moves_start(spark, tmp_path):
    """A late event in a LATER micro-batch, earlier than the open session's
    recorded start, must pull session_start back to the true earliest."""
    from sparkplug_spark.streaming import sessionize_stream

    import time

    src = tmp_path / "sess_late_src"
    src.mkdir()
    # single part-file per batch (coalesce) + mtime-ordered writes: the
    # file source processes f1 strictly before f2, so batch content is
    # deterministic
    spark.createDataFrame(
        [(100, ts("2024-01-01 10:10:00"))], ["user_id", "ts"]
    ).coalesce(1).write.parquet(str(src / "f1.parquet"))
    time.sleep(1.1)
    # batch 2: late 10:00 event (within gap+watermark) + 12:00 closer
    spark.createDataFrame(
        [(100, ts("2024-01-01 10:00:00")), (100, ts("2024-01-01 12:00:00"))],
        ["user_id", "ts"],
    ).coalesce(1).write.parquet(str(src / "f2.parquet"))
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sess_late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("select * from sess_late_test").collect()
    }
    assert (100, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2) in got


def test_sessionize_batch(spark):
    from sparkplug_spark.operators import sessionize

    rows = [
        (1, ts("2024-01-01 10:00:00")),
        (1, ts("2024-01-01 10:00:00")),   # timestamp tie — same session
        (1, ts("2024-01-01 10:20:00")),
        (1, ts("2024-01-01 12:00:00")),   # > 30 min gap — new session
        (2, ts("2024-01-01 09:00:00")),
    ]
    out = {
        (r["user_id"], r["session_idx"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(spark.createDataFrame(rows, ["user_id", "ts"]), gap_seconds=1800).collect()
    }
    assert out[(1, 1)] == (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:20:00"), 3)
    assert out[(1, 2)] == (ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 1)
    assert out[(2, 1)][2] == 1


def test_funnel_counts(spark):
    from sparkplug_spark.operators import funnel_counts

    rows = [
        # user 1: full ordered funnel
        (1, ts("2024-01-01 10:00:00"), "view"),
        (1, ts("2024-01-01 10:01:00"), "click"),
        (1, ts("2024-01-01 10:02:00"), "purchase"),
        # user 2: view then click, no purchase
        (2, ts("2024-01-01 10:00:00"), "view"),
        (2, ts("2024-01-01 10:05:00"), "click"),
        # user 3: purchase BEFORE view — order violated, counts only view
        (3, ts("2024-01-01 09:00:00"), "purchase"),
        (3, ts("2024-01-01 10:00:00"), "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["step"]: r["n_users"] for r in funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_streaming_quality_filter_and_decontaminate(spark, tmp_path):
    from sparkplug_spark.streaming import (
        streaming_decontaminate,
        streaming_quality_filter,
    )

    varied = " ".join(f"word{i} item{i * 7 % 97} thing{i * 13 % 89}" for i in range(40))
    rows = [
        (1, varied),                              # good
        (2, "spam ham eggs " * 40),               # repetitive -> dropped
        (3, varied + " alpha beta gamma delta epsilon tail"),  # contaminated
    ]
    src = str(tmp_path / "clean_src")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)

    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    for method, qname in (("exact", "clean_stream_test"), ("bloom", "clean_stream_bloom")):
        cleaned = streaming_decontaminate(
            streaming_quality_filter(stream), eval_df, n=5, method=method
        )
        assert cleaned.isStreaming
        q = (
            cleaned.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        kept = {r["doc_id"] for r in spark.sql(f"select * from {qname}").collect()}
        # 2 fails quality, 3 is contaminated; bloom has no false negatives
        # and (at 2^23 bits for ~40 grams) effectively no false positives
        assert kept == {1}, method


def test_minhash_lsh_pairs_ml(spark):
    from sparkplug_spark.operators import minhash_lsh_pairs_ml

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight again"),
        (2, "the quick brown fox jumps over the lazy dog tonight also"),
        (3, "completely unrelated text about spark physical plans and shuffles"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs_ml(docs, max_jaccard_distance=0.9).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5
    assert all(3 not in p for p in pairs)


def test_token_count_bpe(spark):
    from sparkplug_spark.functions.text import token_count_bpe

    df = spark.createDataFrame([(1, "Hello, world! It's 2024.")], ["id", "text"])
    # Hello , world ! It ' s 2024 .  -> 9
    assert df.select(token_count_bpe("text").alias("n")).collect()[0]["n"] == 9


def test_winnowing_fingerprints_edit_robust(spark):
    from sparkplug_spark.functions.text import winnowing_fingerprints

    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    edited = base.replace("lazy", "hazy")
    df = spark.createDataFrame([(1, base), (2, edited), (3, "zz")], ["id", "text"])
    rows = {
        r["id"]: set(r["fp"])
        for r in df.select("id", winnowing_fingerprints("text").alias("fp")).collect()
    }
    overlap = len(rows[1] & rows[2]) / len(rows[1] | rows[2])
    assert overlap > 0.5           # local edit keeps most fingerprints
    assert len(rows[3]) == 1       # short doc -> single gram fingerprint


def test_cc_long_chain_many_rounds(spark):
    """A 64-node path graph needs many label-propagation rounds — stresses
    the per-round checkpoint-block freeing added in r3 (a wrongly freed
    block would crash or corrupt labels mid-loop)."""
    from sparkplug_spark.operators import connected_components_star

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    lp = {
        r["id"]: r["group_id"]
        for r in near_dup_groups(pairs, max_iterations=80).collect()
    }
    assert set(lp.values()) == {0} and len(lp) == 64
    star = {
        r["id"]: r["group_id"]
        for r in connected_components_star(pairs).collect()
    }
    assert star == lp


def test_stream_stream_join_within_window(spark, tmp_path):
    """Stream-stream equi-join with an event-time range bound: purchases
    match a view only within the hour after it; both sides watermarked so
    join state is evictable."""
    from sparkplug_spark.streaming import stream_stream_join

    vsrc = str(tmp_path / "views_src")
    psrc = str(tmp_path / "buys_src")
    views = [
        (1, ts("2024-01-01 10:00:00")),
        (2, ts("2024-01-01 10:00:00")),
    ]
    buys = [
        (1, ts("2024-01-01 10:30:00"), 9.99),   # within the hour -> match
        (2, ts("2024-01-01 12:00:00"), 5.00),   # 2h later -> no match
    ]
    spark.createDataFrame(views, ["user_id", "ts"]).write.parquet(vsrc)
    spark.createDataFrame(buys, ["user_id", "ts", "amount"]).write.parquet(psrc)
    vstream = spark.readStream.schema("user_id long, ts timestamp").parquet(vsrc)
    bstream = spark.readStream.schema(
        "user_id long, ts timestamp, amount double"
    ).parquet(psrc)
    joined = stream_stream_join(
        vstream, bstream, on="user_id",
        left_time_col="ts", right_time_col="ts", within_seconds=3600,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["r_amount"])
        for r in spark.sql("select * from ssj_test").collect()
    }
    assert got == {(1, 9.99)}


def test_stream_stream_join_rejects_bad_args(spark, tmp_path):
    from sparkplug_spark.streaming import stream_stream_join

    src = str(tmp_path / "ssj_bad")
    spark.createDataFrame([(1, ts("2024-01-01 10:00:00"))], ["user_id", "ts"]).write.parquet(src)
    s = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        stream_stream_join(s, s, "user_id", "ts", "ts", within_seconds=0)
    with _pytest.raises(ValueError):
        stream_stream_join(s, s, "user_id", "ts", "ts", 10, how="full")
