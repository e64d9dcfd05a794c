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
