"""E142 int8 embedding quantization: hand-checked codes/scale/error,
zero-vector guard, half-up rounding, error bound."""

import numpy as np

from sparkplug_spark.operators import quantize_embeddings


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


class TestQuantizeEmbeddings:
    def test_hand_computed(self, spark):
        r = quantize_embeddings(_df(spark, [[127.0, -63.5, 0.0]])).collect()[0]
        assert r["scale"] == 1.0
        assert r["codes"] == [127, -63, 0]  # floor(-63.5+0.5) = -63
        assert r["n_saturated"] == 1
        assert r["max_abs_err"] == 0.5
        assert r["n_dims"] == 3

    def test_zero_vector(self, spark):
        r = quantize_embeddings(_df(spark, [[0.0, 0.0]])).collect()[0]
        assert r["scale"] == 0.0
        assert r["codes"] == [0, 0]
        assert r["max_abs_err"] == 0.0
        assert r["n_saturated"] == 0

    def test_error_bounded_by_half_scale(self, spark):
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((20, 16)).astype(np.float32)
        rows = quantize_embeddings(_df(spark, vecs.tolist())).collect()
        for r in rows:
            assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
            assert all(-127 <= c <= 127 for c in r["codes"])

    def test_max_element_always_saturates(self, spark):
        rows = quantize_embeddings(
            _df(spark, [[0.25, -1.5, 0.7], [3.0, 1.0, 2.0]])
        ).collect()
        for r in rows:
            assert r["n_saturated"] >= 1

    def test_cosine_roughly_preserved(self, spark):
        rng = np.random.default_rng(11)
        vecs = rng.standard_normal((10, 64)).astype(np.float32)
        rows = quantize_embeddings(_df(spark, vecs.tolist())).collect()
        for r in rows:
            v = vecs[r["vec_id"]].astype(np.float64)
            rec = np.array(r["codes"], dtype=np.float64) * r["scale"]
            cos = v @ rec / (np.linalg.norm(v) * np.linalg.norm(rec))
            assert cos > 0.999
