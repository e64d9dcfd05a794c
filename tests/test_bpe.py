"""BPE trainer + applier vs an independent reference implementation."""

import random
from collections import Counter

import pytest

from sparkplug_spark.operators import apply_bpe, train_bpe_merges


def _ref_train(texts, n_merges):
    """Independent reference BPE (dict-of-list representation)."""
    wf = Counter()
    import re

    for t in texts:
        clean = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", (t or "").lower())).strip()
        for w in clean.split(" "):
            if w:
                wf[w] += 1
    vocab = {w: list(w) + ["</w>"] for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc or max(pc.values()) < 2:
            break
        m = max(pc.values())
        best = min(p for p, c in pc.items() if c == m)
        merges.append(best)
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(best[0] + best[1]); i += 2
                else:
                    out.append(syms[i]); i += 1
            vocab[w] = out
    return merges, vocab, wf


class TestBpe:
    TEXTS = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a catty cat chatted",
        "mats and cats and hats",
        "the the the banana bandana",
    ]

    def test_trainer_matches_reference(self, spark):
        df = spark.createDataFrame([(i, t) for i, t in enumerate(self.TEXTS)], "doc_id long, text string")
        got = train_bpe_merges(df, n_merges=30, sample_docs=100)
        want, _, _ = _ref_train(self.TEXTS, 30)
        assert got == want

    def test_apply_counts_match_reference_segmentation(self, spark):
        df = spark.createDataFrame([(i, t) for i, t in enumerate(self.TEXTS)], "doc_id long, text string")
        merges = train_bpe_merges(df, n_merges=25, sample_docs=100)
        out = {r["doc_id"]: r["n_bpe_tokens"] for r in apply_bpe(df, merges).collect()}
        _, vocab, _ = _ref_train(self.TEXTS, 25)
        import re

        for i, t in enumerate(self.TEXTS):
            clean = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
            want = sum(len(vocab[w]) for w in clean.split(" ") if w)
            assert out[i] == want, (i, t)

    def test_merges_shrink_counts(self, spark):
        df = spark.createDataFrame([(i, t) for i, t in enumerate(self.TEXTS)], "doc_id long, text string")
        no_merge = {r["doc_id"]: r["n_bpe_tokens"] for r in apply_bpe(df, []).collect()}
        merges = train_bpe_merges(df, n_merges=40)
        with_m = {r["doc_id"]: r["n_bpe_tokens"] for r in apply_bpe(df, merges).collect()}
        assert all(with_m[k] <= no_merge[k] for k in no_merge)
        assert sum(with_m.values()) < sum(no_merge.values())
        # with zero merges every word costs len(chars)+1 (the </w> mark)
        assert no_merge[0] == sum(len(w) + 1 for w in "the cat sat on the mat".split())

    def test_deterministic_ties(self, spark):
        df = spark.createDataFrame([(1, "ab ba ab ba")], "doc_id long, text string")
        m1 = train_bpe_merges(df, n_merges=5)
        m2 = train_bpe_merges(df, n_merges=5)
        assert m1 == m2

    def test_guards(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            train_bpe_merges(df, n_merges=0)
        empty = spark.createDataFrame([(1, "  ")], "doc_id long, text string")
        with pytest.raises(ValueError):
            train_bpe_merges(empty, n_merges=5)


class TestWordpiece:
    def test_greedy_longest_match_and_rendering(self, spark):
        from sparkplug_spark.operators.bpe import _wp_segment

        starts = frozenset({"un", "u", "n", "f", "o", "r", "g", "e", "t",
                            "a", "b", "l", "unforg"})
        conts = frozenset({"et", "ta", "ble", "e", "t", "a", "b", "l", "o",
                           "r", "g", "n", "f", "u"})
        out = _wp_segment("unforgettable", starts, conts, 6, 3)
        # longest-first: 'unforg' beats 'un'/'u'; then ##et,##ta,##ble
        assert out == ["unforg", "##et", "##ta", "##ble"]

    def test_unk_discards_partial_pieces(self, spark):
        from sparkplug_spark.operators.bpe import _wp_segment

        starts = frozenset({"ab", "a", "b"})
        conts = frozenset({"b"})  # no 'c' continuation anywhere
        assert _wp_segment("abc", starts, conts, 2, 1) == ["[UNK]"]

    def test_trainer_deterministic_and_char_covered(self):
        from collections import Counter

        from sparkplug_spark.operators.bpe import (
            train_wordpiece_vocab_from_counts,
        )

        wf = Counter({"hello": 5, "help": 3, "world": 3, "word": 2})
        s1 = train_wordpiece_vocab_from_counts(wf, n_words=2, n_cont=3)
        s2 = train_wordpiece_vocab_from_counts(wf, n_words=2, n_cont=3)
        assert s1 == s2
        starts, conts = s1
        assert "hello" in starts and "help" in starts and "world" not in starts
        for ch in "helowrd":
            assert ch in starts and ch in conts
        assert len([c for c in conts if len(c) == 2]) == 3

    def test_stats_match_pure_python(self, spark):
        import math

        from sparkplug_spark.operators import (
            train_wordpiece_vocab,
            wordpiece_token_stats,
        )
        from sparkplug_spark.operators.bpe import _words, _wp_segment

        rows = [
            (1, "the quick brown fox jumps the fence"),
            (2, "the quick quick fox"),
            (3, ""),
            (4, "zzz the"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        vocab = train_wordpiece_vocab(df, n_words=3, n_cont=4, sample_docs=10)
        got = {
            r["doc_id"]: (
                r["n_words"], r["n_pieces"], r["n_unk"],
                r["n_distinct_pieces"],
            )
            for r in wordpiece_token_stats(df, vocab).collect()
        }
        starts, conts = frozenset(vocab[0]), frozenset(vocab[1])
        ms, mc = max(map(len, starts)), max(map(len, conts))
        want = {}
        for doc_id, text in rows:
            words = [w for w in _words(text) if w]
            segs = [_wp_segment(w, starts, conts, ms, mc) for w in words]
            pieces = [p for s in segs for p in s]
            want[doc_id] = (
                len(words),
                len(pieces),
                sum(1 for p in pieces if p == "[UNK]"),
                len(set(pieces)),
            )
        assert got == want
        assert got[3] == (0, 0, 0, 0)  # empty doc keeps a zero row


class TestUnigram:
    """E202 Unigram-LM: Viterbi optimality vs exhaustive enumeration,
    trainer determinism, UNK handling, stats vs a pure-Python twin."""

    def _vocab(self):
        from collections import Counter

        from sparkplug_spark.operators import (
            train_unigram_vocab_from_counts,
        )

        wf = Counter(
            {"spark": 8, "sparkle": 3, "park": 5, "bark": 4, "spa": 2,
             "lark": 2, "larks": 1}
        )
        return train_unigram_vocab_from_counts(
            wf, vocab_size=20, max_piece_len=3, em_iters=3
        )

    def test_viterbi_is_optimal_vs_bruteforce(self):
        from itertools import product

        from sparkplug_spark.operators.bpe import (
            UNIGRAM_COMBINED_MULT,
            _uni_viterbi,
        )

        cost = dict(self._vocab())
        max_len = max(len(p) for p in cost)

        def brute(word):
            # enumerate all segmentations via cut masks
            best = None
            n = len(word)
            for mask in product([0, 1], repeat=n - 1):
                cuts = [0] + [i + 1 for i, m in enumerate(mask) if m] + [n]
                pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
                if any(len(p) > max_len or p not in cost for p in pieces):
                    continue
                comb = sum(
                    cost[p] * UNIGRAM_COMBINED_MULT + 1 for p in pieces
                )
                if best is None or comb < best:
                    best = comb
            return best

        for w in ["spark", "sparkle", "parks", "aslark", "bark"]:
            got, _ = _uni_viterbi(w, cost, max_len)
            assert got == brute(w), w

    def test_trainer_deterministic_chars_kept_size_bounded(self):
        v1 = self._vocab()
        v2 = self._vocab()
        assert v1 == v2
        pieces = {p for p, _ in v1}
        assert len(v1) <= 20
        # every training character survives pruning
        assert {"s", "p", "a", "r", "k", "l", "e", "b"} <= pieces
        assert all(isinstance(c, int) and c > 0 for _, c in v1)

    def test_unk_and_stats_match_pure_python(self, spark):
        from sparkplug_spark.operators import unigram_token_stats
        from sparkplug_spark.operators.bpe import (
            UNIGRAM_COMBINED_MULT,
            _uni_viterbi,
            _words,
        )

        vocab = self._vocab()
        cost = dict(vocab)
        max_len = max(len(p) for p in cost)
        docs = [
            (1, "spark park bark"),
            (2, "sparkle larks zzz???"),  # zzz has OOV char 'z'
            (3, ""),  # zero row
            (4, "SPA-RK spa rk"),  # normalization applies
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_words"], r["n_pieces"], r["n_unk"],
                          r["cost_micros"])
            for r in unigram_token_stats(df, vocab).collect()
        }

        def twin(text):
            nw = np = nu = cm = 0
            for w in _words(text):
                if not w:
                    continue
                nw += 1
                comb, _ = _uni_viterbi(w, cost, max_len)
                if comb is None:
                    np += 1
                    nu += 1
                else:
                    np += comb % UNIGRAM_COMBINED_MULT
                    cm += comb // UNIGRAM_COMBINED_MULT
            return (nw, np, nu, cm)

        assert got == {d: twin(t) for d, t in docs}
        assert got[3] == (0, 0, 0, 0)
        assert got[2][2] >= 1  # the OOV word counted as UNK

    def test_partition_invariant(self, spark):
        from sparkplug_spark.operators import unigram_token_stats

        vocab = self._vocab()
        rows = [(i, "spark park " * (i % 3 + 1)) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, unigram_token_stats(df, vocab).collect()))
        b = sorted(
            map(tuple,
                unigram_token_stats(df.repartition(7), vocab).collect())
        )
        assert a == b

    def test_trainer_guards(self):
        from collections import Counter

        from sparkplug_spark.operators import (
            train_unigram_vocab_from_counts,
        )

        with pytest.raises(ValueError, match="empty sample"):
            train_unigram_vocab_from_counts(Counter())
        with pytest.raises(ValueError, match="distinct characters"):
            train_unigram_vocab_from_counts(
                Counter({"abcdefgh": 1}), vocab_size=3
            )
