"""k-anonymity / l-diversity audit."""

import pytest

from sparkplug_spark.operators import k_anonymity_report

SCHEMA = "zip string, seg string, diag string"


class TestKAnonymity:
    def test_small_groups_flagged(self, spark):
        rows = [
            ("94110", "a", "flu"),
            ("94110", "a", "cold"),
            ("94110", "a", "flu"),
            ("10001", "b", "flu"),  # size-1 group
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            (r["zip"], r["seg"]): (r["group_size"], r["k_violation"])
            for r in k_anonymity_report(df, ["zip", "seg"], k=2).collect()
        }
        assert out == {("10001", "b"): (1, True)}

    def test_compliant_table_is_empty(self, spark):
        rows = [("z", "a", "x")] * 5
        df = spark.createDataFrame(rows, SCHEMA)
        assert k_anonymity_report(df, ["zip"], k=5).count() == 0

    def test_l_diversity_catches_uniform_sensitive(self, spark):
        # big group, but everyone shares one diagnosis -> l-violation
        rows = [("z", "a", "flu")] * 10 + [("y", "a", d) for d in ("flu", "cold")]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            r["zip"]: (r["group_size"], r["n_sensitive"],
                       r["k_violation"], r["l_violation"])
            for r in k_anonymity_report(
                df, ["zip"], k=3, sensitive_col="diag", min_l=2
            ).collect()
        }
        assert out == {"z": (10, 1, False, True), "y": (2, 2, True, False)}

    def test_null_quasi_identifiers_group_together(self, spark):
        rows = [(None, "a", "x"), (None, "a", "y"), ("z", "a", "x")]
        df = spark.createDataFrame(rows, SCHEMA)
        out = {
            r["zip"]: r["group_size"]
            for r in k_anonymity_report(df, ["zip"], k=3).collect()
        }
        assert out == {None: 2, "z": 1}

    def test_guards(self, spark):
        df = spark.createDataFrame([("z", "a", "x")], SCHEMA)
        with pytest.raises(ValueError):
            k_anonymity_report(df, [], k=2)
        with pytest.raises(ValueError):
            k_anonymity_report(df, ["zip"], k=0)
        with pytest.raises(ValueError):
            k_anonymity_report(df, ["zip"], k=2, sensitive_col="diag", min_l=0)


import random
from collections import Counter, defaultdict

import pytest as _pytest


@_pytest.mark.parametrize("seed", [4, 29])
def test_k_anonymity_twin(spark, seed):
    rng = random.Random(seed)
    rows = [
        (rng.choice("wxyz"), rng.choice("ab"), rng.choice("pqr"))
        for _ in range(150)
    ]
    k, min_l = 12, 3
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["zip"], r["seg"]): (
            r["group_size"], r["n_sensitive"],
            r["k_violation"], r["l_violation"],
        )
        for r in k_anonymity_report(
            df, ["zip", "seg"], k=k, sensitive_col="diag", min_l=min_l
        ).collect()
    }
    sizes, sens = Counter(), defaultdict(set)
    for z, s, d in rows:
        sizes[(z, s)] += 1
        sens[(z, s)].add(d)
    want = {}
    for g, n in sizes.items():
        kv, lv = n < k, len(sens[g]) < min_l
        if kv or lv:
            want[g] = (n, len(sens[g]), kv, lv)
    assert got == want


class TestDpRelease:
    """E207 seeded discrete-Laplace release: mechanism contract
    (cutoffs implement the intended pmf), determinism, noise shape."""

    def test_cutoffs_implement_discrete_laplace_pmf(self):
        import math

        from sparkplug_spark.operators import discrete_laplace_cutoffs

        for eps, sens in ((1.0, 1), (0.5, 2), (2.0, 1)):
            cutoffs, z_max = discrete_laplace_cutoffs(eps, sens)
            assert len(cutoffs) == 2 * z_max + 1
            assert cutoffs[-1] == 1 << 60
            assert cutoffs == sorted(cutoffs)
            t = eps / sens
            p = math.exp(-t)
            total = sum(p ** abs(z) for z in range(-z_max, z_max + 1))
            prev = 0
            for k, c in enumerate(cutoffs):
                mass = (c - prev) / (1 << 60)
                want = p ** abs(k - z_max) / total
                assert abs(mass - want) < 1e-12, (eps, k)
                prev = c
            # symmetry: P(Z <= -1) == P(Z >= 1) up to float/floor noise
            # (a few thousand units of 2^-60 — i.e. ~1e-15 of mass)
            left = cutoffs[z_max - 1]
            right = (1 << 60) - cutoffs[z_max]
            assert abs(left - right) < 4096

    def test_validation(self):
        from sparkplug_spark.operators import discrete_laplace_cutoffs

        with pytest.raises(ValueError, match="epsilon"):
            discrete_laplace_cutoffs(0.0)
        with pytest.raises(ValueError, match="sensitivity"):
            discrete_laplace_cutoffs(1.0, 0)

    def test_deterministic_reproducible_and_seed_sensitive(self, spark):
        from sparkplug_spark.operators import dp_release_counts

        df = spark.createDataFrame(
            [(i % 7, i) for i in range(700)], "g long, x long"
        )
        a = sorted(map(tuple, dp_release_counts(df, ["g"]).collect()))
        b = sorted(
            map(tuple, dp_release_counts(df.repartition(5), ["g"]).collect())
        )
        assert a == b  # same seed -> the SAME release, no budget re-spend
        c = sorted(
            map(tuple, dp_release_counts(df, ["g"], seed=7).collect())
        )
        assert a != c  # a new release seed draws fresh noise

    def test_noise_shape_over_many_groups(self, spark):
        import math

        from sparkplug_spark.operators import dp_release_counts

        # 400 groups of exactly 10 rows: released - 10 IS the noise draw
        df = spark.createDataFrame(
            [(i % 400, i) for i in range(4000)], "g long, x long"
        )
        noise = [
            r["released_count"] - 10
            for r in dp_release_counts(df, ["g"], epsilon=1.0).collect()
        ]
        assert len(noise) == 400
        p = math.exp(-1.0)
        var_want = 2 * p / (1 - p) ** 2  # discrete Laplace variance
        mean = sum(noise) / len(noise)
        var = sum((z - mean) ** 2 for z in noise) / len(noise)
        assert abs(mean) < 0.35
        assert 0.5 * var_want < var < 2.0 * var_want
        # md5 coins: integer noise, overwhelmingly small at eps=1
        assert all(isinstance(z, int) and abs(z) <= 36 for z in noise)

    def test_null_group_key_is_its_own_group(self, spark):
        from sparkplug_spark.operators import dp_release_counts

        df = spark.createDataFrame(
            [("a",), (None,), (None,), ("b",)], "g string"
        )
        rows = dp_release_counts(df, ["g"]).collect()
        assert len(rows) == 3  # a, b, NULL all released separately
