"""Strongly connected components (E295): hand graphs with known
decompositions, soundness of the min-pivot peeling, and the failure
contract."""

import pytest

from sparkplug_spark.operators import strongly_connected_components


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(df, **kw).collect()
    }


class TestSCC:
    def test_bow_tie(self, spark):
        # IN tendril 9 -> core {1,2,3} -> mid SCC {5,6} -> OUT sink 7
        edges = [(1, 2), (2, 3), (3, 1), (3, 5), (5, 6), (6, 5), (6, 7), (9, 1)]
        assert _run(spark, edges) == {
            1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 9: 9,
        }

    def test_self_loop_and_isolated_edge(self, spark):
        edges = [(4, 4), (10, 11)]
        assert _run(spark, edges) == {4: 4, 10: 10, 11: 11}

    def test_two_disjoint_cycles(self, spark):
        edges = [(1, 2), (2, 1), (7, 8), (8, 9), (9, 7)]
        assert _run(spark, edges) == {1: 1, 2: 1, 7: 7, 8: 7, 9: 7}

    def test_scc_chain_needs_multiple_rounds(self, spark):
        # chain of 3 SCCs: {1,2} -> {3,4} -> {5,6}; min-pivot peels the
        # whole weak component's min SCC each round, so this converges
        # within the cap and assigns everything
        edges = [
            (1, 2), (2, 1), (2, 3),
            (3, 4), (4, 3), (4, 5),
            (5, 6), (6, 5),
        ]
        assert _run(spark, edges) == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5}

    def test_round_cap_raises(self, spark):
        # chain of 2 SCCs where the downstream SCC has the SMALLER ids:
        # round 1 peels only {1,2} (the weak-component min), so a cap of
        # 1 must raise rather than return partial output
        edges = [(5, 6), (6, 5), (6, 1), (1, 2), (2, 1)]
        with pytest.raises(ValueError, match="max_rounds"):
            _run(spark, edges, max_rounds=1)
        assert _run(spark, edges, max_rounds=4) == {
            1: 1, 2: 1, 5: 5, 6: 5,
        }

    def test_deterministic_rerun(self, spark):
        edges = [(i, (i * 3) % 11) for i in range(11)]
        assert _run(spark, edges) == _run(spark, edges)


class TestBowTie:
    def test_regions(self, spark):
        from sparkplug_spark.operators import bow_tie_report

        edges = [
            (1, 2), (2, 3), (3, 1),   # core (largest SCC)
            (9, 1),                   # IN
            (3, 5), (5, 6), (6, 5),   # OUT (smaller SCC downstream)
            (6, 7),                   # OUT sink
            (20, 21),                 # disconnected -> OTHER
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["scc_id"], r["region"])
            for r in bow_tie_report(df).collect()
        }
        assert got == {
            1: (1, "CORE"), 2: (1, "CORE"), 3: (1, "CORE"),
            9: (9, "IN"),
            5: (5, "OUT"), 6: (5, "OUT"), 7: (7, "OUT"),
            20: (20, "OTHER"), 21: (21, "OTHER"),
        }

    def test_core_tie_breaks_to_smallest_scc_id(self, spark):
        from sparkplug_spark.operators import bow_tie_report

        # two 2-cycles, equal size: the smaller scc_id is the core
        edges = [(10, 11), (11, 10), (3, 4), (4, 3)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["region"] for r in bow_tie_report(df).collect()
        }
        assert got == {3: "CORE", 4: "CORE", 10: "OTHER", 11: "OTHER"}

    def test_detailed_taxonomy(self, spark):
        from sparkplug_spark.operators import bow_tie_report

        # core {1,2,3}; IN 9; OUT 7; TUBE 30 (9->30->7 bypasses core);
        # TENDRIL 40 (hangs off IN); DISCONNECTED 20,21
        edges = [
            (1, 2), (2, 3), (3, 1), (9, 1), (3, 7),
            (9, 30), (30, 7), (9, 40), (20, 21),
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["region"]
            for r in bow_tie_report(df, detailed=True).collect()
        }
        assert got == {
            1: "CORE", 2: "CORE", 3: "CORE", 9: "IN", 7: "OUT",
            30: "TUBE", 40: "TENDRIL", 20: "DISCONNECTED",
            21: "DISCONNECTED",
        }
