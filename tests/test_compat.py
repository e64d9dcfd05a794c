"""Reference-compat mode (``compat="reference"``): byte-for-byte parity
with the Scala engine's rename/drop mechanics, quirks Q1/Q2 included.

Scenario matrix mirrors the reference spec — SparkPlugSpec.scala:200-219
(sequential top-level rules), :221-253 (keepOldField), :359-395 (struct
fields — where Q1's residual ``_old`` column hides behind ``as[T]``'s
tolerance for extra columns) — plus the README.md:143-159 two-actions-on-
one-struct case (Q2) that no reference test covered.
"""

import pytest
from pyspark.sql import Row

from sparkplug_spark import PlugAction, PlugRule, SparkPlug


def _df(spark):
    # TestRow(title, brand, price) — SparkPlugSpec.scala:24
    return spark.createDataFrame(
        [("iPhone", "Apple", 300), ("Galaxy", "Samsung", 200)],
        "title string, brand string, price int",
    )


def _struct_df(spark):
    # TestRowWithStruct / TestPriceDetails — SparkPlugSpec.scala:40-45
    rows = [
        ("iPhone", "Apple", Row(minPrice=100.0, maxPrice=150.0,
                                availability="available")),
        ("Galaxy", "Samsung", Row(minPrice=10.0, maxPrice=15.0,
                                  availability="not available")),
        ("Lumia", "Nokia", None),
    ]
    return spark.createDataFrame(
        rows,
        "title string, brand string, "
        "price struct<minPrice:double,maxPrice:double,availability:string>",
    )


SEQ_RULES = [
    PlugRule("rule1", "version1", "title like '%iPhone%'",
             (PlugAction("price", "1000"), PlugAction("title", "Apple iPhone"))),
    PlugRule("rule2", "version1", "title like '%Galaxy%'",
             (PlugAction("price", "700"), PlugAction("title", "Samsung Galaxy"))),
]

STRUCT_RULES = [
    PlugRule("rule1", "version1", "title like '%iPhone%'",
             (PlugAction("price.minPrice", "1000.0"),
              PlugAction("title", "Apple iPhone"))),
    PlugRule("rule2", "version1", "title like '%Galaxy%'",
             (PlugAction("price.availability", "available"),)),
    PlugRule("rule3", "version1", "title like '%Lumia%'",
             (PlugAction("price.availability", "available"),)),
]


class TestTopLevelParity:
    def test_both_modes_agree_on_declared_columns(self, spark):
        # SparkPlugSpec.scala:200-219: price 1000 / 700 after the fold
        df = _df(spark)
        for mode in ("fixed", "reference"):
            plugged = (SparkPlug.builder(spark).with_compat(mode).create()
                       .plug(df, SEQ_RULES))
            got = {r["title"]: r["price"]
                   for r in plugged.select("title", "price").collect()}
            assert got == {"Apple iPhone": 1000, "Samsung Galaxy": 700}, mode

    def test_compat_moves_updated_columns_to_end(self, spark):
        # The reference's rename dance appends the updated column where
        # <key>_new sat — column ORDER is part of parity.
        out = (SparkPlug.builder(spark).with_compat("reference").create()
               .plug(_df(spark), SEQ_RULES))
        assert out.columns == ["brand", "price", "title"]
        fixed = (SparkPlug.builder(spark).create().plug(_df(spark), SEQ_RULES))
        assert fixed.columns == ["title", "brand", "price"]


class TestKeepOldField:
    def test_reference_trace(self, spark):
        # SparkPlugSpec.scala:221-253 (TestRowWithOldField asserts), plus
        # the exact column order the rename fold produces.
        out = (SparkPlug.builder(spark).with_compat("reference")
               .keep_old_field().create().plug(_df(spark), SEQ_RULES))
        assert out.columns == [
            "title_rule1_old", "brand", "price_rule1_old", "price_rule2_old",
            "title_rule2_old", "price", "title",
        ]
        rows = {r["brand"]: r for r in out.collect()}
        iphone, galaxy = rows["Apple"], rows["Samsung"]
        assert (iphone["title"], iphone["title_rule1_old"]) == ("Apple iPhone", "iPhone")
        assert (iphone["price"], iphone["price_rule1_old"]) == (1000, 300)
        assert (galaxy["title"], galaxy["title_rule1_old"]) == ("Samsung Galaxy", "Galaxy")
        assert (galaxy["price"], galaxy["price_rule2_old"]) == (700, 200)

    def test_fixed_mode_same_values(self, spark):
        out = (SparkPlug.builder(spark).keep_old_field().create()
               .plug(_df(spark), SEQ_RULES))
        rows = {r["brand"]: r for r in out.collect()}
        assert rows["Apple"]["price_rule1_old"] == 300
        assert rows["Samsung"]["price_rule2_old"] == 200


class TestStructQ1:
    def test_residual_old_columns_in_reference_mode(self, spark):
        # SparkPlugSpec.scala:359-395 value asserts hold in BOTH modes;
        # compat additionally leaves the Q1 residual <parent>_<rule>_old
        # columns (drop used the full dotted key — PlugRule.scala:83-87).
        out = (SparkPlug.builder(spark).with_compat("reference").create()
               .plug(_struct_df(spark), STRUCT_RULES))
        assert out.columns == [
            "brand", "price_rule1_old", "price_rule2_old", "title",
            "price_rule3_old", "price",
        ]
        rows = {r["brand"]: r for r in out.collect()}
        assert rows["Apple"]["price"]["minPrice"] == 1000.0
        assert rows["Apple"]["title"] == "Apple iPhone"
        assert rows["Apple"]["price_rule1_old"]["minPrice"] == 100.0
        assert rows["Samsung"]["price"]["availability"] == "available"
        assert rows["Samsung"]["price_rule2_old"]["availability"] == "not available"
        assert rows["Nokia"]["price"] is None
        assert rows["Nokia"]["price_rule3_old"] is None

    def test_fixed_mode_drops_old_columns(self, spark):
        out = (SparkPlug.builder(spark).create()
               .plug(_struct_df(spark), STRUCT_RULES))
        assert out.columns == ["title", "brand", "price"]
        rows = {r["brand"]: r for r in out.collect()}
        assert rows["Apple"]["price"]["minPrice"] == 1000.0
        assert rows["Samsung"]["price"]["availability"] == "available"
        assert rows["Nokia"]["price"] is None


class TestStructQ2:
    RULE = [PlugRule("rule1", "version1", "title like '%iPhone%'",
                     (PlugAction("price.minPrice", "1.0"),
                      PlugAction("price.maxPrice", "2.0")))]

    def test_reference_mode_destroys_parent(self, spark):
        # README.md:143-159 advertises two actions on one struct; the Scala
        # engine's duplicate <parent>_new aliases + rename-all fold destroy
        # the parent column. Reproduced structurally.
        out = (SparkPlug.builder(spark).with_compat("reference").create()
               .plug(_struct_df(spark), self.RULE))
        assert out.columns == [
            "title", "brand", "price_rule1_old", "price_rule1_old",
            "price_rule1_old",
        ]

    def test_fixed_mode_updates_both_fields(self, spark):
        out = (SparkPlug.builder(spark).create()
               .plug(_struct_df(spark), self.RULE))
        assert out.columns == ["title", "brand", "price"]
        iphone = {r["brand"]: r for r in out.collect()}["Apple"]
        assert (iphone["price"]["minPrice"], iphone["price"]["maxPrice"]) == (1.0, 2.0)


class TestCompatSurface:
    def test_bad_mode_rejected(self, spark):
        with pytest.raises(ValueError, match="compat"):
            SparkPlug.builder(spark).with_compat("scala")

    def test_three_level_key_raises(self, spark):
        df = spark.createDataFrame(
            [(1, Row(b=Row(c=1)))], "id long, a struct<b:struct<c:int>>"
        )
        rules = [PlugRule("r", "v", "true", (PlugAction("a.b.c", "2"),))]
        with pytest.raises(ValueError, match="two[\\s]*levels"):
            (SparkPlug.builder(spark).with_compat("reference").create()
             .plug(df, rules))
        # the fixed engine handles N levels (Q4 repaired)
        got = (SparkPlug.builder(spark).create().plug(df, rules)).collect()
        assert got[0]["a"]["b"]["c"] == 2

    def test_plug_details_parity(self, spark):
        # details bookkeeping must match the fixed engine entry-for-entry
        for mode in ("fixed", "reference"):
            out = (SparkPlug.builder(spark).with_compat(mode)
                   .enable_plug_details().create().plug(_df(spark), SEQ_RULES))
            det = {r["brand"]: r["plugDetails"] for r in out.collect()}
            assert [d["name"] for d in det["Apple"]] == ["rule1"], mode
            assert [d["name"] for d in det["Samsung"]] == ["rule2"], mode
            assert det["Apple"][0]["fieldNames"] == ["price", "title"], mode
