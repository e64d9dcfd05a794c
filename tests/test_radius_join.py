"""Planar grid radius join (E289): boundary completeness, uniqueness,
exact distances, and null quarantine."""

import itertools

import pytest

from sparkplug_spark.operators import radius_join


class TestRadiusJoin:
    def test_matches_brute_force_on_boundary_grid(self, spark):
        # points planted ON and AROUND cell boundaries (multiples of the
        # radius), incl. negatives — the corner cases a floor/trunc or
        # neighborhood bug silently drops
        r = 1000
        coords = [-2 * r, -r - 1, -r, -1, 0, 1, r - 1, r, 2 * r]
        pts = [
            (i, lat, lon)
            for i, (lat, lon) in enumerate(
                itertools.product(coords, coords[:4])
            )
        ]
        a = spark.createDataFrame(
            pts, "id long, lat_udeg long, lon_udeg long"
        )
        b = spark.createDataFrame(
            [(i + 1000, lat, lon) for i, lat, lon in pts],
            "pid long, lat_udeg long, lon_udeg long",
        )
        got = {
            (x["id"], x["pid"]): x["d2_udeg2"]
            for x in radius_join(
                a, b, id_left="id", id_right="pid", radius_udeg=r
            ).collect()
        }
        want = {}
        for i, la, lo in pts:
            for j, lb, lob in pts:
                d2 = (la - lb) ** 2 + (lo - lob) ** 2
                if d2 <= r * r:
                    want[(i, j + 1000)] = d2
        assert got == want

    def test_each_pair_emitted_once(self, spark):
        a = spark.createDataFrame(
            [(1, 0, 0)], "id long, lat_udeg long, lon_udeg long"
        )
        b = spark.createDataFrame(
            [(2, 1, 1)], "pid long, lat_udeg long, lon_udeg long"
        )
        rows = radius_join(
            a, b, id_left="id", id_right="pid", radius_udeg=5000
        ).collect()
        assert len(rows) == 1
        assert rows[0]["d2_udeg2"] == 2

    def test_null_coords_quarantine(self, spark):
        a = spark.createDataFrame(
            [(1, None, 0), (2, 0, 0)],
            "id long, lat_udeg long, lon_udeg long",
        )
        b = spark.createDataFrame(
            [(3, 0, 0)], "pid long, lat_udeg long, lon_udeg long"
        )
        rows = radius_join(
            a, b, id_left="id", id_right="pid", radius_udeg=100
        ).collect()
        assert [(r["id"], r["pid"]) for r in rows] == [(2, 3)]

    def test_radius_validation(self, spark):
        df = spark.createDataFrame(
            [(1, 0, 0)], "id long, lat_udeg long, lon_udeg long"
        )
        with pytest.raises(ValueError):
            radius_join(df, df, radius_udeg=0)
