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
