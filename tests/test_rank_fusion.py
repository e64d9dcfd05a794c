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
