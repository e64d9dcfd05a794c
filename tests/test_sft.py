"""SFT transcript structuring (E239) and preference-pair construction
(E240)."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    dialogue_stats,
    parse_dialogue,
    preference_pairs,
)


def _turns(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (r["turn"], r["role"], r["content"])
        for r in parse_dialogue(df).collect()
    )


class TestParseDialogue:
    def test_roles_and_order(self, spark):
        t = _turns(
            spark, "system: rules\nuser: hi\nassistant: hello\nuser: bye"
        )
        assert t == [
            (1, "system", "rules"),
            (2, "user", "hi"),
            (3, "assistant", "hello"),
            (4, "user", "bye"),
        ]

    def test_multiline_turn_joined(self, spark):
        t = _turns(spark, "user: a\ncontinues here\nassistant: b")
        assert t[0] == (1, "user", "a\ncontinues here")

    def test_embedded_colon_is_content(self, spark):
        t = _turns(spark, "user: note: this stays\nassistant: ok")
        assert t[0] == (1, "user", "note: this stays")

    def test_unknown_role_prefix_is_content(self, spark):
        t = _turns(spark, "user: q\nmoderator: not a role\nassistant: a")
        assert t[0] == (1, "user", "q\nmoderator: not a role")

    def test_preamble_kept_with_null_role(self, spark):
        t = _turns(spark, "junk before\nuser: q")
        assert t[0] == (0, None, "junk before")

    def test_empty_preamble_dropped(self, spark):
        t = _turns(spark, "user: q\nassistant: a")
        assert t[0][0] == 1

    def test_empty_and_null_text_produce_no_turns(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, text string"
        )
        assert parse_dialogue(df).count() == 0


class TestDialogueStats:
    def _stats(self, spark, text):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return dialogue_stats(parse_dialogue(df)).collect()[0]

    def test_clean_transcript(self, spark):
        r = self._stats(
            spark,
            "system: s\nuser: q1\nassistant: a1\nuser: q2\nassistant: a2",
        )
        assert (r["n_turns"], r["n_user"], r["n_assistant"], r["n_system"]) \
            == (5, 2, 2, 1)
        assert r["starts_with_user"] and r["alternates_ok"]
        assert not r["has_preamble"] and r["n_empty_turns"] == 0

    def test_double_user_breaks_alternation(self, spark):
        r = self._stats(spark, "user: q1\nuser: q2\nassistant: a")
        assert not r["alternates_ok"]
        assert r["starts_with_user"]

    def test_assistant_first_flagged(self, spark):
        r = self._stats(spark, "assistant: hi\nuser: q")
        assert not r["starts_with_user"]
        assert not r["alternates_ok"]

    def test_preamble_and_empty_turns_counted(self, spark):
        r = self._stats(spark, "noise\nuser: \nassistant: a")
        assert r["has_preamble"] and r["n_empty_turns"] == 1


class TestPreferencePairs:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, 10, 5), (1, 11, 3), (1, 12, 5), (2, 20, 1), (2, 21, 9),
             (3, 30, 4)],
            "prompt_id long, response_id long, score long",
        )

    def test_all_pairs_margin(self, spark):
        rows = sorted(
            tuple(r)
            for r in preference_pairs(self._df(spark), min_margin=2).collect()
        )
        assert rows == [(1, 10, 11, 2), (1, 12, 11, 2), (2, 21, 20, 8)]

    def test_best_worst_deterministic_ties(self, spark):
        rows = sorted(
            tuple(r)
            for r in preference_pairs(
                self._df(spark), min_margin=1, mode="best_worst"
            ).collect()
        )
        # prompt 1: best score 5 tie (10 vs 12) -> smallest id 10 chosen;
        # prompt 3 has one candidate -> no row
        assert rows == [(1, 10, 11, 2), (2, 21, 20, 8)]

    def test_nulls_dropped_and_no_self_pairs(self, spark):
        df = spark.createDataFrame(
            [(1, 10, 5), (1, 10, 1), (1, None, 9), (1, 11, None)],
            "prompt_id long, response_id long, score long",
        )
        rows = preference_pairs(df, min_margin=1).collect()
        assert all(r["chosen_id"] != r["rejected_id"] for r in rows)

    def test_mode_validation(self, spark):
        with pytest.raises(ValueError):
            preference_pairs(self._df(spark), mode="tournament")
        with pytest.raises(ValueError):
            preference_pairs(self._df(spark), min_margin=0)


class TestPackTranscripts:
    def _turn_rows(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, turn long, role string, content string"
        )

    def test_transcripts_never_split_and_offsets_contiguous(self, spark):
        from sparkplug_spark.operators import pack_transcripts

        rows = [
            (d, t, r, c)
            for d in range(8)
            for t, r, c in [
                (1, "user", "one two three"),
                (2, "assistant", "four five six seven"),
            ]
        ]
        out = pack_transcripts(
            self._turn_rows(spark, rows), budget=30, turn_overhead=4,
            num_groups=1,
        ).collect()
        # per transcript: (4+3) + (4+4) = 15 tokens; budget 30 -> 2/shard
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for d, turns in by_doc.items():
            shards = {(t["pack_group"], t["shard_id"]) for t in turns}
            assert len(shards) == 1, "transcript split across shards"
            turns = sorted(turns, key=lambda t: t["turn"])
            assert turns[0]["end_tok"] == turns[1]["start_tok"]
            assert turns[0]["n_tokens"] == 7 and turns[1]["n_tokens"] == 8
        # every shard holds exactly 2 transcripts of 15 tokens
        per_shard = {}
        for r in out:
            per_shard.setdefault((r["pack_group"], r["shard_id"]), set()).add(
                r["doc_id"]
            )
        assert all(len(v) == 2 for v in per_shard.values())

    def test_block_offsets_are_cumulative_across_transcripts(self, spark):
        from sparkplug_spark.operators import pack_transcripts

        rows = [
            (d, 1, "user", "a b")
            for d in range(4)
        ]
        out = sorted(
            pack_transcripts(
                self._turn_rows(spark, rows), budget=1000, turn_overhead=0,
                num_groups=1,
            ).collect(),
            key=lambda r: r["start_tok"],
        )
        assert [r["start_tok"] for r in out] == [0, 2, 4, 6]
        assert [r["end_tok"] for r in out] == [2, 4, 6, 8]

    def test_mask_marks_assistant_only(self, spark):
        from sparkplug_spark.operators import pack_transcripts

        rows = [
            (1, 0, None, "preamble text"),
            (1, 1, "system", "sys rules"),
            (1, 2, "user", "hi there"),
            (1, 3, "assistant", "hello back"),
        ]
        out = {
            r["turn"]: r["mask"]
            for r in pack_transcripts(
                self._turn_rows(spark, rows), budget=100
            ).collect()
        }
        assert out == {0: 0, 1: 0, 2: 0, 3: 1}

    def test_oversize_transcript_alone_in_shard(self, spark):
        from sparkplug_spark.operators import pack_transcripts

        rows = [
            (1, 1, "user", " ".join(["w"] * 50)),
            (2, 1, "user", "tiny"),
            (3, 1, "user", "tiny"),
        ]
        out = pack_transcripts(
            self._turn_rows(spark, rows), budget=20, turn_overhead=0,
            num_groups=1,
        ).collect()
        shard_of = {r["doc_id"]: (r["pack_group"], r["shard_id"]) for r in out}
        docs_in = {}
        for d, s in shard_of.items():
            docs_in.setdefault(s, set()).add(d)
        assert {1} in docs_in.values()  # the 50-token one is alone

    def test_param_validation(self, spark):
        from sparkplug_spark.operators import pack_transcripts

        df = self._turn_rows(spark, [(1, 1, "user", "x")])
        with pytest.raises(ValueError):
            pack_transcripts(df, budget=0)
        with pytest.raises(ValueError):
            pack_transcripts(df, budget=10, turn_overhead=-1)


class TestRenderChat:
    def test_rendering_order_and_preamble(self, spark):
        from sparkplug_spark.operators import parse_dialogue, render_chat

        df = spark.createDataFrame(
            [(1, "preamble line\nuser: hi\nassistant: hello\nthere")],
            "doc_id long, text string",
        )
        r = render_chat(parse_dialogue(df)).collect()[0]
        assert r["text"] == (
            "<|context|>\npreamble line\n"
            "<|user|>\nhi\n"
            "<|assistant|>\nhello\nthere"
        )
        assert r["n_turns"] == 3
        assert r["n_chars"] == len(r["text"])

    def test_custom_markers(self, spark):
        from sparkplug_spark.operators import parse_dialogue, render_chat

        df = spark.createDataFrame(
            [(1, "user: q\nassistant: a")], "doc_id long, text string"
        )
        r = render_chat(
            parse_dialogue(df), role_open="[", role_close="]",
            turn_sep="\n\n",
        ).collect()[0]
        assert r["text"] == "[user]\nq\n\n[assistant]\na"
