"""JSON extraction/flattening and snapshot diff."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    extract_json_fields,
    flatten_json,
    snapshot_diff,
)


@pytest.fixture()
def jdf(spark):
    return spark.createDataFrame(
        [
            (1, '{"k": 7, "meta": {"tag": "a"}, "score": 0.5}'),
            (2, '{"k": "not-an-int", "meta": {}}'),
            (3, "{broken"),
            (4, None),
        ],
        ["id", "props"],
    )


def test_extract_json_fields(jdf):
    out = {
        r["id"]: r
        for r in extract_json_fields(
            jdf,
            "props",
            {
                "k": ("$.k", "bigint"),
                "tag": ("$.meta.tag", "string"),
                "score": ("$.score", "double"),
            },
        ).collect()
    }
    assert out[1]["k"] == 7 and out[1]["tag"] == "a" and out[1]["score"] == 0.5
    assert out[2]["k"] is None  # uncastable -> null
    assert out[3]["k"] is None  # malformed -> null
    assert out[4]["k"] is None
    with pytest.raises(ValueError, match="non-empty"):
        extract_json_fields(jdf, "props", {})


def test_flatten_json(jdf):
    out = {
        r["id"]: r
        for r in flatten_json(
            jdf, "props", "k BIGINT, score DOUBLE", prefix="p_"
        ).collect()
    }
    assert out[1]["p_k"] == 7 and out[1]["p_score"] == 0.5
    assert out[3]["p_k"] is None
    assert "props" not in flatten_json(jdf, "props", "k BIGINT").columns
    kept = flatten_json(jdf, "props", "k BIGINT", drop=False)
    assert "props" in kept.columns


def test_snapshot_diff(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], ["id", "text"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, ""), (5, "e")], ["id", "text"]
    )
    out = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, ["id"], ["text"]).collect()
    }
    assert out == {1: "removed", 3: "changed", 4: "changed", 5: "added"}
    # null vs empty string is a change (4); unchanged row 2 excluded
    full = {
        r["id"]: r["status"]
        for r in snapshot_diff(
            old, new, ["id"], ["text"], include_unchanged=True
        ).collect()
    }
    assert full[2] == "unchanged"
    with pytest.raises(ValueError, match="non-empty"):
        snapshot_diff(old, new, [], ["text"])


def test_stateless_new_ops_compose_with_streams(spark, tmp_path):
    """extract_json_fields, flatten_json, and flag_violations are narrow
    per-row transforms — they must apply to a readStream unchanged."""
    from sparkplug_spark.operators import Expectation, flag_violations

    src = str(tmp_path / "json_stream_src")
    spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "{broken"), (3, None)],
        "id long, props string",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("id long, props string").parquet(src)

    ex = extract_json_fields(stream, "props", {"k": ("$.k", "bigint")})
    flagged = flag_violations(
        ex, [Expectation("k_present", "not_null", column="k")]
    )
    flat = flatten_json(stream, "props", "k BIGINT", prefix="j_")
    assert flagged.isStreaming and flat.isStreaming

    q = (
        flagged.writeStream.format("memory")
        .queryName("json_flag_q")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r for r in spark.sql("select * from json_flag_q").collect()}
    assert got[1]["k"] == 5 and got[1]["failed_expectations"] == []
    assert got[2]["failed_expectations"] == ["k_present"]
    assert got[3]["failed_expectations"] == ["k_present"]


def test_scd2_merge(spark):
    from sparkplug_spark.operators import scd2_merge

    history = spark.createDataFrame(
        [
            # key 1: closed v0 + open v1
            (1, "a0", 0, 10),
            (1, "a1", 10, None),
            # key 2: open, will change
            (2, "b0", 0, None),
            # key 3: open, will disappear
            (3, "c0", 0, None),
        ],
        "id long, t string, valid_from long, valid_to long",
    )
    snapshot = spark.createDataFrame(
        [(1, "a1"), (2, "b1"), (4, "d0")], "id long, t string"
    )
    out = scd2_merge(history, snapshot, ["id"], ["t"], as_of=20)
    rows = sorted(
        (r["id"], r["t"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    assert rows == [
        (1, "a0", 0, 10),      # closed row untouched
        (1, "a1", 10, None),   # unchanged open row stays open
        (2, "b0", 0, 20),      # changed: closed at as_of...
        (2, "b1", 20, None),   # ...and reopened with the new value
        (3, "c0", 0, 20),      # removed: closed
        (4, "d0", 20, None),   # added: opened
    ]
    # idempotence: merging the same snapshot again changes nothing
    again = scd2_merge(out, snapshot, ["id"], ["t"], as_of=30)
    assert sorted(
        (r["id"], r["t"], r["valid_from"], r["valid_to"])
        for r in again.collect()
    ) == rows


def test_scd2_apply_changes_delta_semantics(spark):
    from sparkplug_spark.operators import scd2_apply_changes

    history = spark.createDataFrame(
        [
            (1, "a0", 0, None),
            (2, "b0", 0, None),
            (3, "c0", 0, None),
        ],
        "id long, t string, valid_from long, valid_to long",
    )
    # partial batch: touches 1 (no-op redelivery) and 2 (change), adds 4;
    # key 3 absent -> MUST stay open (delta, not full-snapshot, semantics)
    changes = spark.createDataFrame(
        [(1, "a0"), (2, "b1"), (4, "d0")], "id long, t string"
    )
    out = scd2_apply_changes(history, changes, ["id"], ["t"], as_of=20)
    rows = sorted(
        (r["id"], r["t"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    assert rows == [
        (1, "a0", 0, None),
        (2, "b0", 0, 20),
        (2, "b1", 20, None),
        (3, "c0", 0, None),   # untouched despite absence from the batch
        (4, "d0", 20, None),
    ]


def test_scd2_apply_duplicate_keys_in_batch(spark):
    """A change feed may deliver several events per key per batch: the
    apply must reduce to one row per key (last-wins by order_col), never
    lose the update or open two concurrent rows."""
    from sparkplug_spark.operators import scd2_apply_changes

    history = spark.createDataFrame(
        [(1, "a0", 0, None)], "id long, t string, valid_from long, valid_to long"
    )
    changes = spark.createDataFrame(
        [(1, "a0", 10), (1, "b1", 11), (1, "a9", 9)],
        "id long, t string, seq long",
    )
    out = scd2_apply_changes(
        history, changes, ["id"], ["t"], as_of=20, order_col="seq"
    )
    rows = sorted(
        (r["id"], r["t"], r["valid_from"], r["valid_to"]) for r in out.collect()
    )
    # seq=11 wins: old closed, exactly one open row with 'b1'
    assert rows == [(1, "a0", 0, 20), (1, "b1", 20, None)]
    open_rows = [r for r in rows if r[3] is None]
    assert len(open_rows) == 1


def test_scd2_streaming_foreachbatch_history(spark, tmp_path):
    """Micro-batch history maintenance: each arriving file is a change
    batch folded into a stored history table via foreachBatch."""
    import time

    from sparkplug_spark.operators import scd2_apply_changes

    src = str(tmp_path / "cdc_src")
    hist_dir = str(tmp_path / "cdc_history")
    spark.createDataFrame([(1, "a0"), (2, "b0")], "id long, t string").coalesce(
        1
    ).write.parquet(src)
    spark.createDataFrame(
        [], "id long, t string, valid_from long, valid_to long"
    ).write.parquet(hist_dir)

    def fold(batch, epoch_id):
        # the leak-free per-epoch recipe: release=False (no session-lifetime
        # localCheckpoint inside the operator), checkpoint_tracked to
        # materialize BEFORE overwriting the directory being read, then
        # free this epoch's blocks once the write is durable
        from sparkplug_spark.caching import checkpoint_tracked, unpersist_ids

        hist = batch.sparkSession.read.parquet(hist_dir)
        merged = scd2_apply_changes(
            hist, batch, ["id"], ["t"], as_of=int(epoch_id) + 1, release=False
        )
        merged, ids = checkpoint_tracked(merged)
        merged.write.mode("overwrite").parquet(hist_dir)
        unpersist_ids(batch.sparkSession, ids)

    ckpt = str(tmp_path / "cdc_ckpt")
    stream = spark.readStream.schema("id long, t string").parquet(src)
    # shared checkpointLocation: the second run resumes source progress
    # and folds ONLY the new file, not a re-read of everything
    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(1)
    spark.createDataFrame([(2, "b1"), (3, "c0")], "id long, t string").coalesce(
        1
    ).write.mode("append").parquet(src)
    q2 = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    hist = {
        (r["id"], r["t"]): (r["valid_from"], r["valid_to"])
        for r in spark.read.parquet(hist_dir).collect()
    }
    assert hist[(1, "a0")][1] is None          # untouched by batch 2
    assert hist[(2, "b0")][1] is not None      # closed
    assert hist[(2, "b1")][1] is None          # reopened
    assert hist[(3, "c0")][1] is None          # added


def test_snapshot_diff_duplicate_keys_collapse(spark):
    old = spark.createDataFrame([(1, "a"), (1, "a")], ["id", "text"])
    new = spark.createDataFrame([(1, "a")], ["id", "text"])
    assert snapshot_diff(old, new, ["id"], ["text"]).count() == 0


class TestQuarantineJson:
    def test_lanes(self, spark):
        from sparkplug_spark.operators import quarantine_json

        df = spark.createDataFrame(
            [
                (1, '{"k": 5}'),      # clean
                (2, '{{"k": 6}'),     # malformed prefix -> quarantined
                (3, None),            # absent, not corrupt
                (4, '{"k": "zz"}'),   # valid JSON, wrong type -> quarantined
                (5, '{"k": 7}trail'), # trailing garbage: Spark parses it
            ],
            "id long, p string",
        )
        out = {
            r["id"]: (r["k"], r["is_corrupt"], r["_corrupt_record"])
            for r in quarantine_json(df, "p", {"k": "bigint"}).collect()
        }
        assert out[1] == (5, False, None)
        assert out[2] == (None, True, '{{"k": 6}')
        assert out[3] == (None, False, None)
        assert out[4] == (None, True, '{"k": "zz"}')
        # documented from_json behavior: first complete object wins
        assert out[5] == (7, False, None)

    def test_collision_guards(self, spark):
        from sparkplug_spark.operators import quarantine_json

        df = spark.createDataFrame([(1, "{}")], "k long, p string")
        with pytest.raises(ValueError, match="already exist"):
            quarantine_json(df, "p", {"k": "bigint"})
        df2 = spark.createDataFrame([(1, "{}")], "id long, p string")
        with pytest.raises(ValueError, match="collides"):
            quarantine_json(df2, "p", {"_corrupt_record": "string"})


class TestScd2Asof:
    def test_reads_version_open_at_instant(self, spark):
        from sparkplug_spark.operators import scd2_asof

        hist = spark.createDataFrame(
            [
                (1, "v1", 0, 100),
                (1, "v2", 100, None),
                (2, "only", 0, None),
                (3, "gone", 0, 50),
            ],
            "k long, v string, valid_from long, valid_to long",
        )
        at_0 = {r["k"]: r["v"] for r in scd2_asof(hist, 0).collect()}
        assert at_0 == {1: "v1", 2: "only", 3: "gone"}
        at_99 = {r["k"]: r["v"] for r in scd2_asof(hist, 99).collect()}
        assert at_99 == {1: "v1", 2: "only"}
        # half-open: the version closed AT 100 is already replaced
        at_100 = {r["k"]: r["v"] for r in scd2_asof(hist, 100).collect()}
        assert at_100 == {1: "v2", 2: "only"}

    def test_keep_validity_retains_columns(self, spark):
        from sparkplug_spark.operators import scd2_asof

        hist = spark.createDataFrame(
            [(1, "v", 0, None)], "k long, v string, valid_from long, valid_to long"
        )
        assert scd2_asof(hist, 5).columns == ["k", "v"]
        assert "valid_from" in scd2_asof(hist, 5, keep_validity=True).columns
