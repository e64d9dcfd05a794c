"""Corpus-mixing round additions: inter-document boilerplate span
removal, per-key token-budget selection, fuzzy (MinHash) benchmark
decontamination."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    decontaminate_fuzzy,
    remove_boilerplate_spans,
    sample_to_token_budget,
)

HEADER = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


class TestRemoveBoilerplateSpans:
    def test_shared_header_removed_bodies_kept(self, spark):
        body1 = "one two three four five six seven eight"
        body2 = "nine ten eleven twelve thirteen fourteen fifteen sixteen"
        unique = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13 u14 u15 u16"
        df = spark.createDataFrame(
            [(1, f"{HEADER} {body1}"), (2, f"{HEADER} {body2}"), (3, unique)],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in remove_boilerplate_spans(
                df, span_tokens=8, min_docs=2
            ).collect()
        }
        assert out[1].text_clean == body1
        assert out[2].text_clean == body2
        assert out[1].n_removed == 1 and out[1].n_spans == 2
        assert out[3].text_clean == unique
        assert out[3].n_removed == 0 and out[3].n_spans == 2

    def test_all_boilerplate_doc_empties(self, spark):
        df = spark.createDataFrame(
            [(1, HEADER), (2, HEADER)], "doc_id long, text string"
        )
        out = remove_boilerplate_spans(df, span_tokens=8, min_docs=2).collect()
        for r in out:
            assert r.text_clean == ""
            assert r.n_spans == 1 and r.n_removed == 1

    def test_within_doc_repetition_not_boilerplate(self, spark):
        # the same span twice in ONE doc is repetition, not boilerplate:
        # distinct-doc count is 1, below min_docs=2
        df = spark.createDataFrame(
            [(1, f"{HEADER} {HEADER}"), (2, "totally different words here now")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in remove_boilerplate_spans(
                df, span_tokens=8, min_docs=2
            ).collect()
        }
        assert out[1].n_removed == 0
        assert out[1].text_clean == f"{HEADER} {HEADER}"

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            remove_boilerplate_spans(df, span_tokens=0)
        with pytest.raises(ValueError):
            remove_boilerplate_spans(df, min_docs=1)


class TestSampleToTokenBudget:
    def _df(self, spark):
        rows = [(i, "a" if i < 6 else "b", 10) for i in range(10)]
        return spark.createDataFrame(rows, "doc_id long, source string, w int")

    def test_budget_prefix_semantics(self, spark):
        out = sample_to_token_budget(
            self._df(spark), {"a": 25}, key_col="source", weight_col="w",
            default_budget=0,
        ).collect()
        # each kept row started under budget; overshoot is at most one row
        assert all(r.w_before < 25 for r in out)
        assert {r.source for r in out} == {"a"}
        assert len(out) == 3  # w_before 0, 10, 20 < 25; 30 is out

    def test_positive_budget_keeps_at_least_one(self, spark):
        out = sample_to_token_budget(
            self._df(spark), {"a": 1, "b": 1}, key_col="source",
            weight_col="w",
        ).collect()
        by_key = {}
        for r in out:
            by_key.setdefault(r.source, []).append(r)
        assert len(by_key["a"]) == 1 and len(by_key["b"]) == 1

    def test_deterministic(self, spark):
        a = sample_to_token_budget(
            self._df(spark), {"a": 30, "b": 15}, key_col="source",
            weight_col="w",
        ).collect()
        b = sample_to_token_budget(
            self._df(spark), {"a": 30, "b": 15}, key_col="source",
            weight_col="w",
        ).collect()
        assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)

    def test_negative_budget_raises(self, spark):
        with pytest.raises(ValueError):
            sample_to_token_budget(
                self._df(spark), {"a": -1}, key_col="source", weight_col="w"
            )


class TestDecontaminateFuzzy:
    def test_near_copy_flagged_unrelated_not(self, spark):
        leaked = (
            "the quick brown fox jumps over the lazy dog near the old river bank"
        )
        rows = [
            (0, leaked),  # in eval subset (doc_id % 2 == 0 below)
            (1, leaked),  # training near-copy -> must flag
            (3, "completely unrelated content about spark shuffles and joins"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        eval_df = df.filter(F.col("doc_id") % 2 == 0)
        out = {
            r.doc_id: r
            for r in decontaminate_fuzzy(
                df, eval_df, min_est_jaccard=0.5
            ).collect()
        }
        assert len(out) == 3  # every input row comes back
        assert out[1].fuzzy_contaminated and out[1].max_est_jaccard == 1.0
        assert out[0].fuzzy_contaminated  # eval member matches itself
        assert not out[3].fuzzy_contaminated
        assert out[3].n_fuzzy_matches == 0 and out[3].max_est_jaccard is None


class TestWriteSharded:
    def test_manifest_and_roundtrip(self, spark, tmp_path):
        from sparkplug_spark.sources import write_sharded

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        n_in = docs.count()
        out = str(tmp_path / "shards")
        m = write_sharded(
            docs, out, target_weight=5000, weight_col="n_chars",
            num_groups=4,
        )
        rows = m.collect()
        assert sum(r.n_rows for r in rows) == n_in
        # one file per shard, every file non-empty on disk
        assert len({r.shard for r in rows}) == len(rows)
        assert all(r.bytes > 0 for r in rows)
        # byte sizes are per-file, not one size echoed everywhere (shard
        # dirs share part-file basenames; regression guard for the
        # basename-keyed listing bug)
        if len({r.n_rows for r in rows}) > 1:
            assert len({r.bytes for r in rows}) > 1
        # read-back preserves the corpus
        back = spark.read.parquet(out)
        assert back.count() == n_in
        assert back.select("doc_id").distinct().count() == n_in

    def test_deterministic_packing(self, spark, tmp_path):
        from sparkplug_spark.sources import write_sharded

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        m1 = write_sharded(
            docs, str(tmp_path / "a"), target_weight=3000,
            weight_col="n_chars", num_groups=2,
        ).select("shard", "n_rows", "total_weight").collect()
        m2 = write_sharded(
            docs, str(tmp_path / "b"), target_weight=3000,
            weight_col="n_chars", num_groups=2,
        ).select("shard", "n_rows", "total_weight").collect()
        assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))


class TestDedupSpansWithinDoc:
    def test_repeats_dropped_first_kept(self, spark):
        from sparkplug_spark.operators import dedup_spans_within_doc

        # spans of 2: "a b" "c d" "a b" "e f" -> second "a b" dropped
        df = spark.createDataFrame(
            [(1, "a b c d a b e f"), (2, "x y z w")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in dedup_spans_within_doc(df, span_tokens=2).collect()
        }
        assert out[1].text_clean == "a b c d e f"
        assert out[1].n_spans == 4 and out[1].n_removed == 1
        assert out[2].text_clean == "x y z w"
        assert out[2].n_removed == 0

    def test_ragged_tail_span_distinct(self, spark):
        from sparkplug_spark.operators import dedup_spans_within_doc

        # tail span "a" (1 token) differs from "a b": both kept
        df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
        out = dedup_spans_within_doc(df, span_tokens=2).collect()[0]
        assert out.text_clean == "a b a"
        assert out.n_spans == 2 and out.n_removed == 0

    def test_zero_shuffle_plan(self, spark):
        from sparkplug_spark.operators import dedup_spans_within_doc

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            dedup_spans_within_doc(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the only Exchange is spread()'s round-robin rebalance of the
        # single-row-group testdata scan; the operator itself never
        # shuffles on a key
        import re

        assert not re.search(r"Exchange hashpartitioning", plan)
        assert not re.search(r"Exchange rangepartitioning", plan)

    def test_bad_args(self, spark):
        from sparkplug_spark.operators import dedup_spans_within_doc

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            dedup_spans_within_doc(df, span_tokens=0)
