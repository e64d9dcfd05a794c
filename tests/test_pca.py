"""E135 exact distributed PCA: numpy-twin equality, orthonormal basis,
partitioning independence, frozen-basis application to new batches."""

import numpy as np
import pytest

from sparkplug_spark.operators import pca_fit, pca_project


def _toy(spark, n=60, d=6, parts=4):
    rng = np.random.RandomState(7)
    # anisotropic data: variance concentrated in two directions
    basis = np.linalg.qr(rng.randn(d, d))[0]
    scales = np.array([10.0, 5.0, 1.0, 0.5, 0.2, 0.1])
    X = (rng.randn(n, d) * scales) @ basis.T + rng.randn(d)
    rows = [(i, [float(v) for v in X[i]]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)
    return df, X


def _numpy_pca(X, k):
    mu = X.mean(0)
    cov = (X - mu).T @ (X - mu) / len(X)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, evals[order]


class TestPcaFit:
    def test_matches_numpy_twin(self, spark):
        df, X = _toy(spark)
        mean, comps, ev = pca_fit(df, k=3)
        mu, tw, tev = _numpy_pca(X, 3)
        assert np.allclose(mean, mu, atol=1e-9)
        assert np.allclose(comps, tw, atol=1e-8)
        assert np.allclose(ev, tev, atol=1e-9)

    def test_orthonormal_and_sorted(self, spark):
        df, _ = _toy(spark)
        _, comps, ev = pca_fit(df, k=4)
        assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-9)
        assert np.all(np.diff(ev) <= 1e-12)

    def test_partitioning_independent(self, spark):
        df, _ = _toy(spark, parts=1)
        df9, _ = _toy(spark, parts=9)
        m1, c1, e1 = pca_fit(df, k=3)
        m9, c9, e9 = pca_fit(df9, k=3)
        assert np.allclose(m1, m9, atol=1e-9)
        assert np.allclose(c1, c9, atol=1e-8)

    def test_rejects_bad_k(self, spark):
        df, _ = _toy(spark)
        with pytest.raises(ValueError):
            pca_fit(df, k=0)
        with pytest.raises(ValueError):
            pca_fit(df, k=7)


class TestPcaProject:
    def test_projection_and_residual(self, spark):
        df, X = _toy(spark)
        mu, tw, tev = _numpy_pca(X, 2)
        out = (
            pca_project(df, k=2, fitted=(mu, tw, tev))
            .toPandas()
            .sort_values("vec_id")
        )
        P = np.array(list(out.projected))
        assert np.allclose(P, (X - mu) @ tw.T, atol=1e-7)
        # top-2 of a [10, 5, 1, ...] spectrum captures most variance
        assert out.residual_ppm.median() < 200_000
        assert (out.residual_ppm >= 0).all()

    def test_whiten_unit_variance(self, spark):
        df, X = _toy(spark, n=200)
        out = (
            pca_project(df, k=2, whiten=True).toPandas().sort_values("vec_id")
        )
        P = np.array(list(out.projected))
        # population variance of each whitened component ~= 1
        assert np.allclose(P.var(0), 1.0, atol=0.05)

    def test_frozen_basis_on_new_batch(self, spark):
        df, X = _toy(spark)
        fitted = pca_fit(df, k=2)
        new = spark.createDataFrame(
            [(999, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        out = pca_project(new, k=2, fitted=fitted).collect()[0]
        expect = (np.array([1, 0, 0, 0, 0, 0.0]) - fitted[0]) @ fitted[1].T
        assert np.allclose(out["projected"], expect, atol=1e-9)
