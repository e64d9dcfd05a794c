"""Structure-preserving main-content extraction (E243):
extract_main_blocks block typing/gating and blocks_to_markdown
reassembly."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import blocks_to_markdown, extract_main_blocks

PROSE = (
    "The quick brown fox is one of the animals that a reader of the "
    "corpus is likely to see in a long paragraph of the plain prose "
    "that it keeps for the training set."
)


def _blocks(spark, html, **kw):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return sorted(
        extract_main_blocks(df, "html", "doc_id", **kw).collect(),
        key=lambda r: r["block_pos"],
    )


class TestBlockTyping:
    def test_heading_list_code_table_para_tagged(self, spark):
        html = (
            "<h2>Section Title</h2>"
            f"<p>{PROSE}</p>"
            "<ul><li>first item</li><li>second item</li></ul>"
            "<pre>def f(x): return x + 1</pre>"
            "<table><tr><td>cell one</td><td>cell two</td></tr></table>"
        )
        rows = _blocks(spark, html)
        types = [(r["block_type"], r["text"]) for r in rows]
        assert ("heading", "Section Title") in types
        assert ("para", PROSE) in types
        assert ("list", "first item") in types
        assert ("list", "second item") in types
        assert ("code", "def f(x): return x + 1") in types
        assert ("table", "cell one") in types
        assert ("table", "cell two") in types

    def test_heading_level_captured(self, spark):
        html = "<h1>One</h1><h3>Three</h3><H6>Six</H6>"
        rows = _blocks(spark, html)
        lv = {r["text"]: r["heading_level"] for r in rows}
        assert lv == {"One": 1, "Three": 3, "Six": 6}
        assert all(r["block_type"] == "heading" for r in rows)

    def test_untyped_fragment_defaults_to_para(self, spark):
        # a div boundary produces an untyped fragment -> para gates apply
        html = f"<div>{PROSE}</div>"
        rows = _blocks(spark, html)
        assert [r["block_type"] for r in rows] == ["para"]

    def test_dt_dd_are_list(self, spark):
        rows = _blocks(spark, "<dl><dt>term</dt><dd>definition</dd></dl>")
        assert {r["block_type"] for r in rows} == {"list"}


class TestGates:
    def test_short_para_dropped_short_heading_kept(self, spark):
        rows = _blocks(spark, "<h2>Tiny</h2><p>too short</p>")
        assert [(r["block_type"], r["text"]) for r in rows] == [
            ("heading", "Tiny")
        ]

    def test_link_farm_list_dropped(self, spark):
        html = (
            '<ul><li><a href="/a">all of the chars are inside anchors'
            "</a></li><li>a plain item of text</li></ul>"
        )
        rows = _blocks(spark, html)
        assert [r["text"] for r in rows] == ["a plain item of text"]

    def test_stopword_gate_skipped_for_code(self, spark):
        # stopword-free code survives; the same text as a para would fail
        code = "x = fft(signal); y = convolve(x, kernel); plot(y)"
        rows = _blocks(spark, f"<pre>{code}</pre><p>{code}</p>")
        assert [(r["block_type"]) for r in rows] == ["code"]

    def test_block_pos_orders_and_gaps(self, spark):
        html = f"<h1>T</h1><nav><a href='/'>Home Link Row</a></nav><p>{PROSE}</p>"
        rows = _blocks(spark, html)
        assert [r["block_type"] for r in rows] == ["heading", "para"]
        assert rows[0]["block_pos"] < rows[1]["block_pos"]

    def test_sentinel_chars_in_input_neutralized(self, spark):
        html = f"<p>{PROSE} \x01h1\x02 fake</p>"
        rows = _blocks(spark, html)
        assert len(rows) == 1 and rows[0]["block_type"] == "para"
        assert "\x01" not in rows[0]["text"]

    def test_param_validation(self, spark):
        df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
        with pytest.raises(ValueError):
            extract_main_blocks(df, min_chars=0)
        with pytest.raises(ValueError):
            extract_main_blocks(df, max_link_pct=101)


class TestMarkdown:
    def test_reassembly_shapes(self, spark):
        html = (
            "<h2>Title Here</h2>"
            f"<p>{PROSE}</p>"
            "<ul><li>item one</li></ul>"
            "<pre>print(1)</pre>"
            "<table><tr><td>cellval</td></tr></table>"
        )
        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        out = blocks_to_markdown(
            extract_main_blocks(df, min_stop_pct=2)
        ).collect()[0]
        md = out["markdown"].split("\n\n")
        assert md[0] == "## Title Here"
        assert md[1] == PROSE
        assert md[2] == "- item one"
        assert md[3] == "    print(1)"
        assert md[4] == "| cellval |"
        assert out["n_blocks"] == 5

    def test_multiple_docs_independent(self, spark):
        df = spark.createDataFrame(
            [(i, f"<h1>Doc {i}</h1><p>{PROSE}</p>") for i in range(3)],
            "doc_id long, html string",
        )
        out = {
            r["doc_id"]: r["markdown"]
            for r in blocks_to_markdown(extract_main_blocks(df)).collect()
        }
        for i in range(3):
            assert out[i] == f"# Doc {i}\n\n{PROSE}"
