"""E132 reciprocal-rank fusion: paper formula in exact integer micros,
missing-doc semantics, tie-break determinism."""

import pytest

from sparkplug_spark.operators import reciprocal_rank_fusion


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id long, rank long"
    )


class TestReciprocalRankFusion:
    def test_paper_formula_exact(self, spark):
        a = _df(spark, [("q", 1, 1), ("q", 2, 2)])
        b = _df(spark, [("q", 2, 1), ("q", 3, 2)])
        out = {
            r["doc_id"]: r
            for r in reciprocal_rank_fusion([a, b], k0=60, k=10).collect()
        }
        # doc2: 1e6//62 + 1e6//61 ; doc1: 1e6//61 ; doc3: 1e6//62
        assert out[2]["rrf_micros"] == 1_000_000 // 62 + 1_000_000 // 61
        assert out[1]["rrf_micros"] == 1_000_000 // 61
        assert out[3]["rrf_micros"] == 1_000_000 // 62
        assert out[2]["n_lists"] == 2
        assert out[1]["n_lists"] == 1
        assert out[2]["fused_rank"] == 1

    def test_consensus_beats_single_list_top(self, spark):
        # doc 9 is rank 1 in one list only; doc 5 is rank 2 in both ->
        # doc 5 fuses higher (the whole point of RRF)
        a = _df(spark, [("q", 9, 1), ("q", 5, 2)])
        b = _df(spark, [("q", 7, 1), ("q", 5, 2)])
        rows = reciprocal_rank_fusion([a, b], k0=60, k=3).collect()
        top = min(rows, key=lambda r: r["fused_rank"])
        assert top["doc_id"] == 5

    def test_tie_breaks_on_doc_id(self, spark):
        a = _df(spark, [("q", 8, 1), ("q", 3, 1)])  # impossible ranks ok
        out = {
            r["doc_id"]: r["fused_rank"]
            for r in reciprocal_rank_fusion([a], k0=60, k=10).collect()
        }
        assert out[3] == 1 and out[8] == 2

    def test_k_truncates_per_query(self, spark):
        a = _df(spark, [("q", i, i) for i in range(1, 8)])
        rows = reciprocal_rank_fusion([a], k0=60, k=3).collect()
        assert len(rows) == 3

    def test_rejects_empty_and_bad_params(self, spark):
        with pytest.raises(ValueError):
            reciprocal_rank_fusion([])
        a = _df(spark, [("q", 1, 1)])
        with pytest.raises(ValueError):
            reciprocal_rank_fusion([a], k0=0)


class TestHashedEmbedding:
    def test_unit_norm_and_determinism(self, spark):
        from sparkplug_spark.operators import hashed_embedding

        df = spark.createDataFrame(
            [(1, "alpha beta beta gamma"), (2, ""), (3, "alpha alpha")],
            "doc_id long, text string",
        )
        rows = hashed_embedding(df, dim=16, as_rows=True).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["w_micros"])
        # micro-quantized unit vectors: sum of squares just under 1e12
        for d in (1,):
            ss = sum(w * w for w in by_doc[d])
            assert 0.99e12 < ss <= 1.0e12 + 1
        dense = {
            r["doc_id"]: list(r["embedding"])
            for r in hashed_embedding(df, dim=16).collect()
        }
        assert len(dense[1]) == 16
        # dense form mirrors sparse rows (micro -> float/1e6)
        nz = sorted(w for w in by_doc[1])
        got_nz = sorted(
            round(v * 1e6) for v in dense[1] if abs(v) > 0
        )
        assert got_nz == nz
        # identical text -> identical vector; doc 3 has one token type
        again = {
            r["doc_id"]: list(r["embedding"])
            for r in hashed_embedding(df, dim=16).collect()
        }
        assert again == dense

    def test_sparse_topk_exact_reference(self, spark):
        from sparkplug_spark.operators import sparse_topk_neighbors

        rows = [
            (1, 0, 800_000), (1, 1, 600_000),
            (2, 0, 800_000), (2, 1, 600_000),   # identical to 1
            (3, 1, 1_000_000),                  # shares bucket 1
            (4, 5, 1_000_000),                  # disjoint: no pairs
        ]
        df = spark.createDataFrame(rows, "doc_id long, bucket int, w_micros long")
        got = {
            r["doc_id"]: (r["neighbor_id"], r["dot"])
            for r in sparse_topk_neighbors(df, k=1).collect()
        }
        assert got[1] == (2, 800_000**2 + 600_000**2)
        assert got[2] == (1, 800_000**2 + 600_000**2)
        assert got[3][0] in (1, 2) and got[3][1] == 600_000 * 1_000_000
        assert got[3][0] == 1  # tie on dot -> smallest id
        assert 4 not in got  # no shared buckets, no row
