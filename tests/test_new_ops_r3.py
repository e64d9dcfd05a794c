"""Round-3 additions: context-window chunking, incremental signature
dedup, rank-based quartiles."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    chunk_documents,
    length_quartiles_by_source,
    minhash_lsh_join,
    minhash_signatures,
)


class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = chunk_documents(df, chunk_tokens=4, overlap=1).collect()
        # stride 3: ceil((10-1)/3) = 3 chunks
        assert [r.chunk_idx for r in out] == [0, 1, 2]
        assert out[0].chunk_text == "t0 t1 t2 t3"
        assert out[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
        assert out[2].chunk_text == "t6 t7 t8 t9"
        assert [r.n_chunk_tokens for r in out] == [4, 4, 4]

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        out = chunk_documents(df, chunk_tokens=128, overlap=16).collect()
        assert len(out) == 1
        assert out[0].chunk_text == "a b"
        assert out[0].n_chunk_tokens == 2

    def test_ragged_tail(self, spark):
        text = " ".join(f"t{i}" for i in range(5))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = chunk_documents(df, chunk_tokens=4, overlap=0).collect()
        assert [r.n_chunk_tokens for r in out] == [4, 1]

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=4, overlap=4)
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=4, overlap=-1)


class TestIncrementalMinhash:
    def test_planted_duplicate_found(self, spark):
        dup = "the quick brown fox jumps over the lazy dog again and again"
        rows = [(0, dup), (2, "completely different corpus content here entirely"),
                (1, dup), (3, "nothing shared with anything else at all truly")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        corpus = df.filter(F.col("doc_id") % 2 == 0)
        new = df.filter(F.col("doc_id") % 2 == 1)
        out = minhash_lsh_join(
            minhash_signatures(new), minhash_signatures(corpus)
        ).collect()
        hits = {(r.id_new, r.id_corpus): r.est_jaccard for r in out}
        assert hits.get((1, 0)) == 1.0  # identical doc: all minhashes agree
        assert (3, 2) not in hits

    def test_threshold_filters(self, spark):
        dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = spark.createDataFrame(
            [(0, dup), (1, dup)], "doc_id long, text string"
        )
        out = minhash_lsh_join(
            minhash_signatures(df.filter("doc_id = 1")),
            minhash_signatures(df.filter("doc_id = 0")),
            min_est_jaccard=1.01,
        )
        assert out.count() == 0


class TestLengthQuartiles:
    def test_known_quartiles(self, spark):
        rows = [(i, "s", v) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80])]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        r = length_quartiles_by_source(df).collect()[0]
        # n=8: q1 at rank ceil(8/4)=2, median rank ceil(8/2)=4, q3 rank 6
        assert (r.n_docs, r.min_v, r.q1, r.median, r.q3, r.max_v) == (
            8, 10, 20, 40, 60, 80
        )

    def test_single_row_group(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 7)], "doc_id long, source string, n_chars long"
        )
        r = length_quartiles_by_source(df).collect()[0]
        assert (r.n_docs, r.min_v, r.q1, r.median, r.q3, r.max_v) == (
            1, 7, 7, 7, 7, 7
        )


class TestStreamingNearDup:
    def test_batch_flags(self, spark):
        from sparkplug_spark.operators import minhash_signatures
        from sparkplug_spark.streaming import near_dup_flags

        dup = "one two three four five six seven eight nine ten"
        corpus = spark.createDataFrame(
            [(100, dup), (102, "unrelated corpus content entirely different words")],
            "doc_id long, text string",
        )
        batch = spark.createDataFrame(
            [(1, dup), (3, "totally novel text nothing in common whatsoever")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in near_dup_flags(
                batch, minhash_signatures(corpus)
            ).collect()
        }
        assert out[1].is_near_dup and out[1].near_dup_of == 100
        assert not out[3].is_near_dup and out[3].near_dup_of is None

    def test_stream_foreachbatch(self, spark, tmp_path):
        from sparkplug_spark.caching import materialize_release
        from sparkplug_spark.operators import minhash_signatures
        from sparkplug_spark.streaming import streaming_near_dup_flags

        dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        corpus = spark.createDataFrame(
            [(100, dup)], "doc_id long, text string"
        )
        corpus_sigs = materialize_release(minhash_signatures(corpus))
        src = str(tmp_path / "nd_src")
        spark.createDataFrame(
            [(1, dup), (2, "fresh unseen content with zero overlap here")],
            "doc_id long, text string",
        ).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        got = {}

        def sink(df, batch_id):
            for r in df.collect():
                got[r.doc_id] = (r.is_near_dup, r.near_dup_of)

        q = (
            streaming_near_dup_flags(stream, corpus_sigs, sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert got[1] == (True, 100)
        assert got[2] == (False, None)


def test_signature_table_parquet_round_trip(spark, tmp_path):
    """The incremental-dedup contract: signatures written in one session
    are a faithful join input later — stored artifact, not a cache."""
    from sparkplug_spark.operators import minhash_lsh_join, minhash_signatures

    dup = "red orange yellow green blue indigo violet colors of the bow"
    corpus = spark.createDataFrame(
        [(10, dup), (11, "some other corpus document with different text")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sigs")
    minhash_signatures(corpus).write.parquet(path)

    stored = spark.read.parquet(path)
    new = spark.createDataFrame([(21, dup)], "doc_id long, text string")
    out = minhash_lsh_join(minhash_signatures(new), stored).collect()
    assert {(r.id_new, r.id_corpus, r.est_jaccard) for r in out} == {(21, 10, 1.0)}


class TestScoreWithModel:
    def test_fake_scorer_deterministic(self, spark):
        from sparkplug_spark.operators import score_with_model

        df = spark.createDataFrame(
            [(1, "hello world"), (2, "another doc"), (3, None)],
            "doc_id long, text string",
        )
        a = {r.doc_id: r.model_score for r in score_with_model(df).collect()}
        b = {
            r.doc_id: r.model_score
            for r in score_with_model(df.repartition(3)).collect()
        }
        assert a == b  # partitioning-independent
        assert all(0.0 <= v < 1.0 for v in a.values())

    def test_model_loader_once_per_worker(self, spark):
        from sparkplug_spark.operators import score_with_model

        def loader():
            # the count visible per task proves the loader ran once there
            import pandas as pd

            state = {"n": 0}

            def fn(s):
                state["n"] += 1
                return pd.Series([float(state["n"])] * len(s))

            return fn

        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
        ).coalesce(1)
        spark.conf.set("spark.sparkplug.spread.enabled", "false")
        try:
            scores = [
                r.model_score
                for r in score_with_model(
                    df, model_loader=loader, batch_rows=4
                ).collect()
            ]
        finally:
            spark.conf.unset("spark.sparkplug.spread.enabled")
        # 10 rows, batch_rows=4 -> batches scored 1.0, 2.0, 3.0 by the SAME
        # model instance (a per-batch loader would yield all 1.0)
        assert sorted(set(scores)) == [1.0, 2.0, 3.0]

    def test_batch_rows_bounds_model_input(self, spark):
        from sparkplug_spark.operators import score_with_model
        import pandas as pd

        def probe(s: pd.Series) -> pd.Series:
            assert len(s) <= 4
            return pd.Series([float(len(s))] * len(s))

        df = spark.createDataFrame(
            [(i, "x") for i in range(11)], "doc_id long, text string"
        ).coalesce(1)
        out = score_with_model(df, scorer=probe, batch_rows=4).collect()
        assert len(out) == 11

    def test_exclusive_args(self, spark):
        import pytest as _pytest
        from sparkplug_spark.operators import score_with_model

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            score_with_model(df, scorer=lambda s: s, model_loader=lambda: None)


def test_incremental_exact_dedup(spark, tmp_path):
    from sparkplug_spark.operators import content_digests, dedup_exact_against

    corpus = spark.createDataFrame(
        [(1, "Seen Before!"), (2, "also in corpus")], "doc_id long, text string"
    )
    path = str(tmp_path / "digests")
    content_digests(corpus).write.parquet(path)

    batch = spark.createDataFrame(
        [
            (10, "seen before"),        # normalized dup of corpus doc 1
            (11, "brand new content"),
            (12, "brand new content"),  # intra-batch dup of 11
            (13, "also unseen"),
        ],
        "doc_id long, text string",
    )
    out = sorted(
        r.doc_id
        for r in dedup_exact_against(
            batch, spark.read.parquet(path)
        ).collect()
    )
    assert out == [11, 13]


def test_length_quartiles_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(1, "s", 10), (2, "s", None), (3, "s", 30)],
        "doc_id long, source string, n_chars long",
    )
    r = length_quartiles_by_source(df).collect()[0]
    assert (r.n_docs, r.min_v, r.median, r.max_v) == (2, 10, 10, 30)


def test_stateless_ops_compose_with_streams(spark, tmp_path):
    """chunk_documents, scrub_pii, gopher_quality_flags, and
    score_with_model are narrow per-row transforms — they must apply to a
    readStream unchanged (no state store, no watermark)."""
    from sparkplug_spark.operators import (
        chunk_documents,
        dedup_spans_within_doc,
        gopher_quality_flags,
        score_with_model,
        scrub_pii,
    )

    src = str(tmp_path / "stateless_src")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta contact a@b.co"), (2, "tiny")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)

    piped = score_with_model(
        gopher_quality_flags(scrub_pii(stream, out_col="text"))
    )
    chunks = chunk_documents(stream, chunk_tokens=3, overlap=1)
    spans = dedup_spans_within_doc(stream, span_tokens=2)
    assert piped.isStreaming and chunks.isStreaming and spans.isStreaming

    for name, df in [("pipe_q", piped), ("chunk_q", chunks), ("span_q", spans)]:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.sql("select * from pipe_q").collect()}
    assert got[1].n_email == 1 and 0.0 <= got[1].model_score < 1.0
    assert spark.sql("select * from chunk_q").count() >= 3
    spans_got = {r.doc_id: r for r in spark.sql("select * from span_q").collect()}
    assert spans_got[1].n_removed == 0 and spans_got[2].text_clean == "tiny"


class TestOversampleByKey:
    def test_expected_multiplicities(self, spark):
        from sparkplug_spark.operators import oversample_by_key

        df = spark.createDataFrame(
            [(i, "a" if i < 100 else "b") for i in range(200)],
            "doc_id long, source string",
        )
        out = oversample_by_key(df, "source", {"a": 2.0, "b": 0.0})
        rows = out.groupBy("source").count().collect()
        counts = {r.source: r["count"] for r in rows}
        assert counts.get("a") == 200  # exactly 2 copies each
        assert "b" not in counts       # dropped entirely

    def test_fractional_deterministic_and_composable(self, spark):
        from sparkplug_spark.operators import oversample_by_key

        df = spark.createDataFrame(
            [(i, "s") for i in range(1000)], "doc_id long, source string"
        )
        a = oversample_by_key(df, "source", {"s": 1.5}).collect()
        b = oversample_by_key(df.repartition(7), "source", {"s": 1.5}).collect()
        assert sorted((r.doc_id, r.copy_idx) for r in a) == sorted(
            (r.doc_id, r.copy_idx) for r in b
        )
        n = len(a)
        assert 1400 <= n <= 1600  # ~1.5x in expectation, deterministic rows

    def test_negative_repeat_raises(self, spark):
        from sparkplug_spark.operators import oversample_by_key

        df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
        with pytest.raises(ValueError):
            oversample_by_key(df, "source", {"s": -0.5})
