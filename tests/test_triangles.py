"""E129 exact triangle counting with degree-ordered orientation: known
small graphs, direction/duplicate canonicalization, hub-orientation bound."""

from pyspark.sql import functions as F

from sparkplug_spark.operators import triangle_counts


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["item"]: (r["degree"], r["triangles"], r["clustering_ppm"])
        for r in triangle_counts(df).collect()
    }


class TestTriangleCounts:
    def test_two_triangles_sharing_an_edge(self, spark):
        out = _counts(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)])
        assert out[1] == (2, 1, 1000000)
        assert out[2] == (3, 2, 666666)
        assert out[3] == (3, 2, 666666)
        assert out[4] == (2, 1, 1000000)

    def test_triangle_free_graph(self, spark):
        # 4-cycle: degrees 2, zero triangles everywhere
        out = _counts(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        assert all(v == (2, 0, 0) for v in out.values())

    def test_direction_and_duplicates_canonicalized(self, spark):
        # same triangle given twice, reversed, plus a self-loop
        out = _counts(
            spark,
            [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (2, 2)],
        )
        assert out == {
            1: (2, 1, 1000000),
            2: (2, 1, 1000000),
            3: (2, 1, 1000000),
        }

    def test_k5_complete(self, spark):
        edges = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
        out = _counts(spark, edges)
        # each K5 node: degree 4, C(4,2)=6 triangles, coefficient 1
        assert all(v == (4, 6, 1000000) for v in out.values())

    def test_hub_star_no_wedge_blowup(self, spark):
        # star K1,20: hub has degree 20 but every edge orients INTO the
        # hub (leaves have lower rank), so wedges fan out from leaves
        # only — zero wedges, zero triangles
        edges = [(0, i) for i in range(1, 21)]
        out = _counts(spark, edges)
        assert out[0] == (20, 0, 0)
        assert all(out[i] == (1, 0, 0) for i in range(1, 21))
