"""E136 k-core decomposition via iterated h-index: exact-peeling twin,
convergence, canonicalization, partitioning independence."""

from collections import defaultdict

from sparkplug_spark.operators import coreness


def _peel(edges):
    """Exact sequential peeling (the textbook O(m) algorithm)."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = {v: len(ns) for v, ns in adj.items()}
    core = {}
    while alive:
        k = min(alive.values())
        stack = [v for v, d in alive.items() if d <= k]
        while stack:
            u = stack.pop()
            if u not in alive:
                continue
            if alive[u] <= k:
                core[u] = k
                del alive[u]
                for w in adj[u]:
                    if w in alive:
                        alive[w] -= 1
                        if alive[w] <= k:
                            stack.append(w)
    return core


def _got(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["item"]: r["core"] for r in coreness(df).collect()}


class TestCoreness:
    def test_clique_with_tail(self, spark):
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
        assert _got(spark, edges) == _peel(edges)

    def test_two_cliques_bridged(self, spark):
        k4a = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
        k3b = [(10, 11), (10, 12), (11, 12)]
        bridge = [(4, 10)]
        edges = k4a + k3b + bridge
        got = _got(spark, edges)
        assert got == _peel(edges)
        assert got[1] == 3 and got[10] == 2

    def test_tree_is_one_core(self, spark):
        edges = [(1, 2), (1, 3), (2, 4), (2, 5), (3, 6)]
        got = _got(spark, edges)
        assert set(got.values()) == {1}

    def test_duplicates_and_direction_ignored(self, spark):
        edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 3)]
        got = _got(spark, edges)
        assert got == {1: 2, 2: 2, 3: 2}

    def test_degree_column_and_core_bound(self, spark):
        edges = [(0, i) for i in range(1, 6)]  # star
        df = spark.createDataFrame(edges, "src long, dst long")
        rows = {r["item"]: r for r in coreness(df).collect()}
        assert rows[0]["degree"] == 5 and rows[0]["core"] == 1
        assert all(rows[i]["core"] <= rows[i]["degree"] for i in rows)
