"""E133 BM25 ranked retrieval: engine-exact integer saturation/length
normalization, parameter edges, stored-index path parity."""

import pytest

from sparkplug_spark.operators import bm25_search, build_term_index


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _expected_score(terms_tf, dl, n_docs, avgdl, dfs, k1_x10=12, b_x4=3):
    total = 0
    for term, tf in terms_tf:
        df = dfs[term]
        idf = (n_docs - df + 1) * 1000 // (df + 1)
        num = 4000 * (10 + k1_x10) * tf * avgdl
        den = 40 * tf * avgdl + k1_x10 * (4 - b_x4) * avgdl + k1_x10 * b_x4 * dl
        total += idf * (num // den)
    return total


class TestBm25Search:
    def test_exact_scores_match_hand_formula(self, spark):
        texts = [
            "spark join hash join",          # dl=4, tf(join)=2
            "join",                          # dl=1
            "window sort stream filter",     # dl=4
            "hash hash hash hash hash",      # dl=5
        ]
        out = {
            (r["query_id"], r["doc_id"]): r["score_ppm"]
            for r in bm25_search(
                _docs(spark, texts), {"q": ["join", "hash"]}, k=10
            ).collect()
        }
        n, tdl = 4, 14
        avgdl = tdl // n
        dfs = {"join": 2, "hash": 2}
        assert out[("q", 0)] == _expected_score(
            [("join", 2), ("hash", 1)], 4, n, avgdl, dfs
        )
        assert out[("q", 1)] == _expected_score([("join", 1)], 1, n, avgdl, dfs)
        assert out[("q", 3)] == _expected_score([("hash", 5)], 5, n, avgdl, dfs)
        assert ("q", 2) not in out

    def test_saturation_beats_raw_tf(self, spark):
        # doc 0 has tf=1 of BOTH terms; doc 1 has tf=50 of one term.
        # With idf equal, BM25 saturation caps doc 1's contribution near
        # (k1+1)*idf, so the two-term doc must win.
        texts = ["alpha beta " + "pad " * 48, "alpha " * 50 + "pad " * 10]
        rows = bm25_search(
            _docs(spark, texts), {"q": ["alpha", "beta"]}, k=2
        ).collect()
        top = min(rows, key=lambda r: r["rank"])
        assert top["doc_id"] == 0

    def test_length_normalization_prefers_shorter(self, spark):
        # same tf, very different dl -> shorter doc scores higher
        texts = ["target", "target " + "filler " * 200]
        rows = {
            r["doc_id"]: r["score_ppm"]
            for r in bm25_search(
                _docs(spark, texts), {"q": ["target"]}, k=2
            ).collect()
        }
        assert rows[0] > rows[1]

    def test_b_zero_disables_length_normalization(self, spark):
        texts = ["target", "target " + "filler " * 200]
        rows = {
            r["doc_id"]: r["score_ppm"]
            for r in bm25_search(
                _docs(spark, texts), {"q": ["target"]}, k=2, b_x4=0
            ).collect()
        }
        assert rows[0] == rows[1]

    def test_stored_index_path_matches_inline(self, spark):
        texts = [
            "spark join hash join",
            "join window",
            "window sort stream filter",
            "hash hash join",
        ]
        docs = _docs(spark, texts)
        queries = {"a": ["join", "hash"], "b": ["window"]}
        inline = sorted(
            map(tuple, bm25_search(docs, queries, k=10).collect())
        )
        idx = build_term_index(docs)
        stored = sorted(
            map(tuple, bm25_search(docs, queries, k=10, index=idx).collect())
        )
        assert inline == stored

    def test_rank_ties_break_on_doc_id(self, spark):
        texts = ["same text here", "same text here", "other stuff"]
        rows = sorted(
            (r["rank"], r["doc_id"])
            for r in bm25_search(
                _docs(spark, texts), {"q": ["same"]}, k=5
            ).collect()
        )
        assert rows == [(1, 0), (2, 1)]

    def test_validation(self, spark):
        docs = _docs(spark, ["x"])
        with pytest.raises(ValueError):
            bm25_search(docs, {}, k=5)
        with pytest.raises(ValueError):
            bm25_search(docs, {"q": ["x"]}, k=0)
        with pytest.raises(ValueError):
            bm25_search(docs, {"q": ["x"]}, b_x4=5)


class TestAppendToTermIndex:
    def test_fold_equals_rebuild_with_revisions(self, spark):
        from sparkplug_spark.operators import (
            append_to_term_index,
            build_term_index,
        )

        b1 = spark.createDataFrame(
            [(1, "old text about cats"), (2, "dogs bark loudly")],
            "doc_id long, text string",
        )
        # doc 1 re-crawled with DIFFERENT terms + doc 3 brand new
        b2 = spark.createDataFrame(
            [(1, "fresh page on birds"), (3, "fish swim")],
            "doc_id long, text string",
        )
        final = spark.createDataFrame(
            [
                (1, "fresh page on birds"),
                (2, "dogs bark loudly"),
                (3, "fish swim"),
            ],
            "doc_id long, text string",
        )
        folded = {
            (r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in append_to_term_index(build_term_index(b1), b2).collect()
        }
        rebuilt = {
            (r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in build_term_index(final).collect()
        }
        assert folded == rebuilt
        # stale posting gone: doc 1 no longer matches 'cats'
        assert ("cats", 1) not in folded
        assert ("birds", 1) in folded

    def test_recrawl_to_empty_drops_stale_postings(self, spark):
        from sparkplug_spark.operators import (
            append_to_term_index,
            build_term_index,
        )

        b1 = spark.createDataFrame(
            [(1, "cats everywhere"), (2, "dogs")],
            "doc_id long, text string",
        )
        # doc 1 re-crawled as GONE (null text): postings must vanish
        b2 = spark.createDataFrame(
            [(1, None)], "doc_id long, text string"
        )
        folded = append_to_term_index(build_term_index(b1), b2).collect()
        assert {r["doc_id"] for r in folded} == {2}
