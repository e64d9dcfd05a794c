"""E142 int8 embedding quantization: hand-checked codes/scale/error,
zero-vector guard, half-up rounding, error bound."""

import numpy as np
import pytest

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


class TestDimTruncationAudit:
    def test_full_dim_row_is_trivially_perfect_and_prefix_degrades(
        self, spark
    ):
        import random

        from sparkplug_spark.operators import dim_truncation_audit

        random.seed(5)
        rows = [
            (i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(60)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["dims"]: (r["n_vecs"], r["n_top1_match"], r["match_ppm"])
            for r in dim_truncation_audit(df, dims=(16, 8, 2)).collect()
        }
        assert got[16] == (60, 60, 1_000_000)  # vs itself: perfect
        assert got[8][1] <= 60 and got[2][1] <= got[8][1] + 20
        # random vectors: 2 dims of 16 must lose most structure
        assert got[2][2] < got[16][2]

    def test_matches_brute_force_reference(self, spark):
        import math

        import numpy as np

        from sparkplug_spark.operators import dim_truncation_audit

        rng = np.random.RandomState(9)
        vecs = rng.uniform(-1, 1, (40, 8)).astype(np.float32)
        rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["dims"]: r["n_top1_match"]
            for r in dim_truncation_audit(df, dims=(8, 4)).collect()
        }
        # reference: same quantization (floor half-up), integer L2
        scale = np.abs(vecs).max(1) / 127.0
        codes = np.floor(vecs / scale[:, None] + 0.5).astype(np.int64)

        def top1(d):
            out = []
            for i in range(40):
                d2 = ((codes[:, :d] - codes[i, :d]) ** 2).sum(1)
                d2[i] = 1 << 60
                out.append(int(np.argmin(d2)))  # ids are 0..39 ascending
            return out

        t8, t4 = top1(8), top1(4)
        assert got[8] == 40
        assert got[4] == sum(1 for a, b in zip(t4, t8) if a == b)

    def test_guards(self, spark):
        from sparkplug_spark.operators import dim_truncation_audit

        df = spark.createDataFrame(
            [(1, [0.1, 0.2])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="exceeds vector dim"):
            dim_truncation_audit(df, dims=(4, 2))
        with pytest.raises(ValueError, match="max_rows"):
            dim_truncation_audit(df, dims=(2,), max_rows=0)

    def test_string_id_column(self, spark):
        # r5 ADVICE: the audit must not assume int64 ids — string keys
        # (doc hashes, URLs) are the common case for corpus stores.
        # Values must match the long-id run on the same vectors.
        from sparkplug_spark.operators import dim_truncation_audit

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(25, 8)).astype(np.float32)
        long_rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
        # zero-padded so string order == numeric order (same tie-breaks)
        str_rows = [(f"doc{i:03d}", v.tolist()) for i, v in enumerate(vecs)]
        df_l = spark.createDataFrame(
            long_rows, "vec_id long, embedding array<float>"
        )
        df_s = spark.createDataFrame(
            str_rows, "vec_id string, embedding array<float>"
        )
        got_l = {
            r["dims"]: (r["n_vecs"], r["n_top1_match"], r["match_ppm"])
            for r in dim_truncation_audit(df_l, dims=(8, 4)).collect()
        }
        got_s = {
            r["dims"]: (r["n_vecs"], r["n_top1_match"], r["match_ppm"])
            for r in dim_truncation_audit(df_s, dims=(8, 4)).collect()
        }
        assert got_l == got_s
        assert got_l[8] == (25, 25, 1000000)

    def test_duplicate_ids_rejected(self, spark):
        from sparkplug_spark.operators import dim_truncation_audit

        df = spark.createDataFrame(
            [("a", [0.1, 0.2]), ("a", [0.3, 0.4])],
            "vec_id string, embedding array<float>",
        )
        with pytest.raises(ValueError, match="unique"):
            dim_truncation_audit(df, dims=(2,))


class TestClusterProfileFrozen:
    """E82 exact tier: frozen centroids, integer micro sims, zero rows."""

    def test_matches_numpy_twin_and_partition_invariant(self, spark):
        import math

        from sparkplug_spark.operators import cluster_profile_frozen

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(40, 8)).astype(np.float32)
        rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        centers = df.filter("vec_id < 4")
        got = {
            r["cluster_id"]: (r["n_vecs"], r["share_ppm"],
                              r["sum_sim_micros"])
            for r in cluster_profile_frozen(df, centers).collect()
        }
        got2 = {
            r["cluster_id"]: (r["n_vecs"], r["share_ppm"],
                              r["sum_sim_micros"])
            for r in cluster_profile_frozen(
                df.repartition(7), centers
            ).collect()
        }
        assert got == got2  # integer sums commute

        # numpy twin with the operator's exact quantization discipline
        x = vecs.astype(np.float64)
        c = x[:4]
        stats = {i: [0, 0] for i in range(4)}
        for row in x:
            cos = []
            for cv in c:
                d = float(np.einsum("i,i->", row, cv))
                na = math.sqrt(float(np.einsum("i,i->", row, row)))
                nb = math.sqrt(float(np.einsum("i,i->", cv, cv)))
                cos.append(round(d / (na * nb), 6) if na * nb else 0.0)
            best = max(range(4), key=lambda j: (cos[j], -j))
            stats[best][0] += 1
            stats[best][1] += int(math.floor(cos[best] * 1e6 + 0.5))
        for cid in range(4):
            n, ssum = stats[cid]
            assert got[cid][0] == n
            assert got[cid][2] == ssum
            assert got[cid][1] == n * 1_000_000 // 40

    def test_empty_center_keeps_zero_row(self, spark):
        from sparkplug_spark.operators import cluster_profile_frozen

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.9, 0.1])],
            "vec_id long, embedding array<float>",
        )
        centers = spark.createDataFrame(
            [(10, [1.0, 0.0]), (11, [-1.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        got = {
            r["cluster_id"]: r["n_vecs"]
            for r in cluster_profile_frozen(df, centers).collect()
        }
        assert got == {10: 2, 11: 0}


class TestEmbeddingIsotropy:
    """E211: spectrum sums to ~1e6 ppm, detects anisotropy, invariance."""

    def test_isotropic_vs_anisotropic(self, spark):
        rng = np.random.default_rng(4)
        iso = rng.normal(size=(400, 8)).astype(np.float32)
        aniso = iso.copy()
        aniso[:, 0] *= 10.0  # one dominant direction
        from sparkplug_spark.operators import embedding_isotropy

        def spec(v):
            df = spark.createDataFrame(
                [(i, row.tolist()) for i, row in enumerate(v)],
                "vec_id long, embedding array<float>",
            )
            return [
                r["explained_ppm"]
                for r in embedding_isotropy(df).orderBy("component").collect()
            ]

        s_iso, s_aniso = spec(iso), spec(aniso)
        assert len(s_iso) == 8
        # isotropic: no component dominates; anisotropic: first does
        assert max(s_iso) < 250_000
        assert s_aniso[0] > 900_000
        # explained shares sum to ~1e6 (integer floor losses only)
        assert 999_900 <= sum(s_iso) <= 1_000_000

    def test_descending_and_cumulative(self, spark):
        rng = np.random.default_rng(9)
        v = rng.normal(size=(100, 6)).astype(np.float32)
        from sparkplug_spark.operators import embedding_isotropy

        df = spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(v)],
            "vec_id long, embedding array<float>",
        )
        rows = embedding_isotropy(df).orderBy("component").collect()
        eig = [r["eigen_micro"] for r in rows]
        assert eig == sorted(eig, reverse=True)
        assert rows[-1]["cum_ppm"] == 1_000_000 or rows[-1]["cum_ppm"] >= 999_999
        cums = [r["cum_ppm"] for r in rows]
        assert cums == sorted(cums)

    def test_empty_input_raises_value_error(self, spark):
        """An empty DataFrame raises the intended ValueError, not an
        opaque TypeError from subscripting a None first() row."""
        import pytest

        from sparkplug_spark.operators import embedding_isotropy

        df = spark.createDataFrame(
            [], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="empty vectors"):
            embedding_isotropy(df)
