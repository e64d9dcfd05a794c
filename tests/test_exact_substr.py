"""E127 cross-document exact-substring dedup (Lee et al. 2021 ExactSubstr,
relational form): overlapping-window detection, keep-first-occurrence
canonical, any-alignment capture that the non-overlapping span ops miss."""

import pytest

from sparkplug_spark.operators import dedup_substrings_global

# 10 tokens so a k=8 window catches it at several alignments
SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


class TestDedupSubstringsGlobal:
    def test_keep_first_occurrence_only(self, spark):
        # doc 1 is the canonical occurrence: its text survives untouched;
        # doc 2 repeats the same 10 tokens PLUS unique tail -> shared run
        # removed, tail kept
        df = spark.createDataFrame(
            [(1, SHARED), (2, SHARED + " tail1 tail2 tail3")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup_substrings_global(df, window_tokens=8).collect()
        }
        assert out[1]["text_clean"] == SHARED
        assert out[1]["n_removed"] == 0
        assert out[2]["text_clean"] == "tail1 tail2 tail3"
        assert out[2]["n_removed"] == 10

    def test_any_alignment_caught(self, spark):
        # doc 2 embeds the shared run mid-document at an alignment that a
        # non-overlapping span grid would straddle
        df = spark.createDataFrame(
            [(1, SHARED), (2, "x1 x2 x3 " + SHARED + " y1 y2")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup_substrings_global(df, window_tokens=8).collect()
        }
        assert out[1]["n_removed"] == 0
        assert out[2]["text_clean"] == "x1 x2 x3 y1 y2"
        assert out[2]["n_removed"] == 10

    def test_short_docs_untouched(self, spark):
        # both docs shorter than the window emit no windows at all
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
        )
        out = dedup_substrings_global(df, window_tokens=8).collect()
        assert all(r["n_removed"] == 0 for r in out)
        assert {r["text_clean"] for r in out} == {"a b c"}

    def test_within_doc_repeat_keeps_first(self, spark):
        # the SAME doc repeating its own run: first copy kept, second
        # deleted (ExactSubstr semantics, unlike boilerplate min_docs=2)
        df = spark.createDataFrame(
            [(1, SHARED + " " + SHARED)], "doc_id long, text string"
        )
        out = dedup_substrings_global(df, window_tokens=8).collect()[0]
        assert out["text_clean"] == SHARED
        assert out["n_removed"] == 10

    def test_rejects_nonpositive_window(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            dedup_substrings_global(df, window_tokens=0)


class TestDedupLinesGlobal:
    def _collect(self, spark, rows, **kw):
        from sparkplug_spark.operators import dedup_lines_global

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r for r in dedup_lines_global(df, **kw).collect()}

    def test_keep_first_occurrence(self, spark):
        out = self._collect(spark, [
            (1, "alpha one\nshared line\nbeta"),
            (2, "shared line\ngamma"),
            (3, "delta\nshared line"),
        ])
        assert out[1]["text_clean"] == "alpha one\nshared line\nbeta"
        assert out[2]["text_clean"] == "gamma"
        assert out[3]["text_clean"] == "delta"
        assert (out[1]["n_dropped"], out[2]["n_dropped"], out[3]["n_dropped"]) == (0, 1, 1)
        assert out[2]["n_lines"] == 2

    def test_within_doc_repeat(self, spark):
        out = self._collect(spark, [(1, "x\nx\ny")])
        assert out[1]["text_clean"] == "x\ny"
        assert out[1]["n_dropped"] == 1

    def test_min_chars_exempts_short_lines(self, spark):
        out = self._collect(spark, [(1, "ok\nok\nlong enough line"),
                                    (2, "long enough line")],
                            min_chars=5)
        assert out[1]["text_clean"] == "ok\nok\nlong enough line"
        assert out[2]["text_clean"] == ""
        assert out[2]["n_dropped"] == 1

    def test_all_dropped_doc_survives_empty(self, spark):
        out = self._collect(spark, [(1, "only line"), (2, "only line")])
        assert out[2]["text_clean"] == ""
        assert out[2]["n_lines"] == 1

    def test_partitioning_invariance(self, spark):
        from sparkplug_spark.operators import dedup_lines_global

        rows = [(i, f"common\nuniq {i}\n{'even' if i % 2 == 0 else 'odd'}")
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {r["doc_id"]: r["text_clean"]
             for r in dedup_lines_global(df).collect()}
        b = {r["doc_id"]: r["text_clean"]
             for r in dedup_lines_global(df.repartition(7)).collect()}
        assert a == b
        assert a[0] == "common\nuniq 0\neven"

    def test_negative_min_chars_rejected(self, spark):
        from sparkplug_spark.operators import dedup_lines_global

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            dedup_lines_global(df, min_chars=-1)


class TestDedupLinesAgainst:
    def test_batch_vs_store_and_within_batch(self, spark):
        from pyspark.sql import functions as F

        from sparkplug_spark.functions.text import hash60
        from sparkplug_spark.operators import dedup_lines_against

        store = (
            spark.createDataFrame([("old line",)], "line string")
            .select(hash60(F.col("line")).alias("line_hash"))
        )
        batch = spark.createDataFrame(
            [(10, "old line\nfresh a"), (11, "fresh a\nfresh b")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r
               for r in dedup_lines_against(batch, store).collect()}
        assert out[10]["text_clean"] == "fresh a"      # store dup dropped
        assert out[11]["text_clean"] == "fresh b"      # in-batch dup dropped
        assert out[10]["n_dropped"] == 1 and out[11]["n_dropped"] == 1
        # store update hashes = kept lines only
        assert len(out[10]["line_hashes"]) == 1
        assert sorted(out[10]["line_hashes"] + out[11]["line_hashes"])

    def test_matches_global_when_store_empty(self, spark):
        from sparkplug_spark.operators import (
            dedup_lines_against,
            dedup_lines_global,
        )

        df = spark.createDataFrame(
            [(i, f"common\nuniq {i}") for i in range(20)],
            "doc_id long, text string",
        )
        empty = spark.createDataFrame([], "line_hash bigint")
        a = {r["doc_id"]: (r["text_clean"], r["n_dropped"])
             for r in dedup_lines_against(df, empty).collect()}
        b = {r["doc_id"]: (r["text_clean"], r["n_dropped"])
             for r in dedup_lines_global(df).collect()}
        assert a == b

    def test_two_batch_fold_equals_one_shot(self, spark):
        # ingest batch1 then batch2 against batch1's store == global dedup
        # of the concatenated corpus (the incremental contract)
        from pyspark.sql import functions as F

        from sparkplug_spark.operators import (
            dedup_lines_against,
            dedup_lines_global,
        )

        rows = [(i, f"shared\nonly {i % 7}") for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        b1, b2 = df.filter("doc_id < 15"), df.filter("doc_id >= 15")
        empty = spark.createDataFrame([], "line_hash bigint")
        out1 = dedup_lines_against(b1, empty)
        store = out1.select(
            F.explode("line_hashes").alias("line_hash")
        ).distinct()
        out2 = dedup_lines_against(b2, store)
        inc = {r["doc_id"]: r["text_clean"]
               for r in out1.union(out2).collect()}
        full = {r["doc_id"]: r["text_clean"]
                for r in dedup_lines_global(df).collect()}
        assert inc == full
