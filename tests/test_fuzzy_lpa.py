"""E221 edit-distance self-join (ED-Join prefix filter) and E222
synchronous label-propagation communities."""

import numpy as np
import pytest

from sparkplug_spark.operators import edit_distance_pairs, label_propagation


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


class TestEditDistancePairs:
    def test_typo_pairs_found(self, spark):
        rows = [
            (1, "jonathan smith"),
            (2, "jonathon smith"),   # 1 substitution
            (3, "jonathan smyth"),   # 1 substitution
            (4, "completely different"),
            (5, "jonathan smith jr"),  # distance 3 from 1
        ]
        df = spark.createDataFrame(rows, "id long, name string")
        got = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in edit_distance_pairs(df, "name", "id", 1).collect()
        }
        assert got == {(1, 2): 1, (1, 3): 1}

    def test_matches_brute_force_twin(self, spark):
        rng = np.random.default_rng(5)
        alpha = "abcde"
        rows = []
        for i in range(120):
            n = int(rng.integers(1, 9))
            rows.append(
                (i, "".join(alpha[j] for j in rng.integers(0, 5, n)))
            )
        df = spark.createDataFrame(rows, "id long, name string")
        for k in (1, 2):
            want = {
                (a, b): _lev(sa, sb)
                for a, sa in rows
                for b, sb in rows
                if a < b and _lev(sa, sb) <= k
            }
            got = {
                (r["id_a"], r["id_b"]): r["distance"]
                for r in edit_distance_pairs(df, "name", "id", k).collect()
            }
            # the short alphabet makes MANY short-sliver pairs — exactly
            # the completeness trap the fallback pass exists for
            assert got == want, (k, len(got), len(want))

    def test_empty_and_null_strings(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "a"), (4, "xyz")],
            "id long, name string",
        )
        got = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in edit_distance_pairs(df, "name", "id", 1).collect()
        }
        # "" ~ "" (dist 0), "" ~ "a" (dist 1); xyz matches nothing
        assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}

    def test_guards(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, name string")
        with pytest.raises(ValueError, match="max_distance"):
            edit_distance_pairs(df, "name", "id", 0)
        with pytest.raises(ValueError, match="q"):
            edit_distance_pairs(df, "name", "id", 1, q=0)


def _lpa_twin(edges, iterations):
    from collections import Counter, defaultdict

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
        adj[d].append(s)
    lab = {v: v for v in adj}
    for _ in range(iterations):
        new = {}
        for v, nbrs in adj.items():
            c = Counter(lab[u] for u in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    return lab


class TestLabelPropagation:
    def test_two_triangles_with_bridge(self, spark):
        edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=4).collect()
        }
        assert got == _lpa_twin(edges, 4)
        # the two triangles end with different labels
        assert len({got[1], got[10]}) == 2
        assert got[1] == got[2] == got[3]

    def test_matches_twin_on_random_graph(self, spark):
        rng = np.random.default_rng(7)
        edges = list(
            {
                (int(a), int(b)) if a < b else (int(b), int(a))
                for a, b in rng.integers(0, 40, size=(120, 2))
                if a != b
            }
        )
        df = spark.createDataFrame(edges, "src long, dst long")
        for it in (1, 3):
            got = {
                r["node"]: r["label"]
                for r in label_propagation(df, iterations=it).collect()
            }
            assert got == _lpa_twin(edges, it), it

    def test_guard(self, spark):
        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="iterations"):
            label_propagation(df, iterations=0)
