"""Sentence segmentation (E241): boundary detection, abbreviation and
decimal protection, ellipses, ordering."""

import pytest

from sparkplug_spark.operators import split_sentences


def _sents(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return [
        r["sentence"]
        for r in split_sentences(df, **kw).orderBy("sent_pos").collect()
    ]


class TestSplitSentences:
    def test_basic_terminators(self, spark):
        assert _sents(spark, "One here. Two there? Three now! Four") == [
            "One here.", "Two there?", "Three now!", "Four",
        ]

    def test_abbreviations_protected(self, spark):
        s = _sents(spark, "Dr. Smith met Mrs. Jones. They left.")
        assert s == ["Dr. Smith met Mrs. Jones.", "They left."]

    def test_multi_dot_abbreviation(self, spark):
        s = _sents(spark, "See e.g. the appendix. Done.")
        assert s == ["See e.g. the appendix.", "Done."]

    def test_decimals_protected(self, spark):
        s = _sents(spark, "It costs 3.50 dollars. Cheap.")
        assert s == ["It costs 3.50 dollars.", "Cheap."]

    def test_ellipsis_is_one_boundary(self, spark):
        s = _sents(spark, "Wait... it happened. End")
        assert s == ["Wait...", "it happened.", "End"]

    def test_terminator_at_end_keeps_sentence(self, spark):
        assert _sents(spark, "Only one sentence.") == ["Only one sentence."]

    def test_positions_and_lengths(self, spark):
        df = spark.createDataFrame(
            [(1, "Aa bb. Cc dd.")], "doc_id long, text string"
        )
        rows = split_sentences(df).orderBy("sent_pos").collect()
        assert [(r["sent_pos"], r["n_chars"]) for r in rows] == [(1, 6), (2, 6)]

    def test_min_chars_drops_fragments(self, spark):
        assert _sents(spark, "Ok. A. Longer sentence here.", min_chars=3) == [
            "Ok.", "Longer sentence here.",
        ]

    def test_empty_and_null(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, text string"
        )
        assert split_sentences(df).count() == 0

    def test_custom_abbreviations(self, spark):
        assert _sents(spark, "Sec. 5 applies. Yes.") == [
            "Sec.", "5 applies.", "Yes.",
        ]
        assert _sents(
            spark, "Sec. 5 applies. Yes.", abbreviations=("sec",)
        ) == ["Sec. 5 applies.", "Yes."]

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            split_sentences(df, min_chars=0)


class TestChunkSentences:
    def _chunks(self, spark, text, budget, **kw):
        from sparkplug_spark.operators import chunk_sentences

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return sorted(
            chunk_sentences(df, chunk_tokens=budget, **kw).collect(),
            key=lambda r: r["chunk_idx"],
        )

    def test_greedy_packing_respects_boundaries(self, spark):
        text = "one two three. four five. six seven eight nine. ten."
        # counts: 3, 2, 4, 1; budget 5 -> [3+2], [4+1]
        rows = self._chunks(spark, text, 5)
        assert [(r["chunk_idx"], r["n_sentences"], r["n_chunk_tokens"])
                for r in rows] == [(0, 2, 5), (1, 2, 5)]
        assert rows[0]["chunk_text"] == "one two three. four five."
        assert rows[1]["chunk_text"] == "six seven eight nine. ten."

    def test_oversize_sentence_alone(self, spark):
        text = "a b c d e f g h. ok."
        rows = self._chunks(spark, text, 3)
        assert [(r["n_sentences"], r["n_chunk_tokens"]) for r in rows] == [
            (1, 8), (1, 1),
        ]

    def test_abbreviations_not_split(self, spark):
        text = "dr. smith spoke to mr. jones today. they agreed."
        rows = self._chunks(spark, text, 100)
        assert len(rows) == 1 and rows[0]["n_sentences"] == 2

    def test_empty_text_yields_no_rows(self, spark):
        from sparkplug_spark.operators import chunk_sentences

        df = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, text string"
        )
        assert chunk_sentences(df).count() == 0

    def test_param_validation(self, spark):
        from sparkplug_spark.operators import chunk_sentences

        df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_sentences(df, chunk_tokens=0)
