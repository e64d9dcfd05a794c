"""HTML main-content extraction (E234): block segmentation, link/stopword
density classification, script/style/comment removal, entity decode,
document-order reassembly."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import extract_main_content

# a block that passes every gate at the defaults (min_chars=80,
# max_link_pct=30, min_stop_pct=25): long, link-free, stopword-rich
PROSE = (
    "The quick brown fox is one of the animals that a reader of the "
    "corpus is likely to see in a long paragraph of the plain prose "
    "that it keeps for the training set."
)


def _run(spark, html, **kw):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return extract_main_content(df, "html", "doc_id", **kw).collect()[0]


class TestClassification:
    def test_prose_kept_chrome_dropped(self, spark):
        html = (
            '<html><body><nav><a href="/">Home</a> <a href="/a">About</a> '
            '<a href="/c">Contact</a></nav>'
            f"<h1>Short title</h1><p>{PROSE}</p>"
            "<footer>Copyright 2026 Example Corp</footer></body></html>"
        )
        r = _run(spark, html)
        assert r["n_good"] == 1
        assert r["main_text"] == PROSE
        assert r["main_chars"] == len(PROSE)

    def test_link_farm_dropped_even_when_long(self, spark):
        # longer than min_chars but nearly all chars sit inside anchors
        links = " ".join(
            f'<a href="/{i}">the item of the catalog number {i}</a>'
            for i in range(6)
        )
        r = _run(spark, f"<div>{links}</div>")
        assert r["n_good"] == 0
        assert r["main_text"] == ""

    def test_link_density_boundary_is_integer_exact(self, spark):
        # controlled lengths: cleaned block = 70 + 1 + 30 = 101 chars with
        # exactly 30 anchor chars -> 30*100 <= 101*30 keeps it; one more
        # anchor char (31*100 > 102*30) must drop it
        body = "t" * 70  # no stopwords, so gate them off
        r1 = _run(spark, f"<p>{body} <a>{'l' * 30}</a></p>", min_stop_pct=0)
        assert r1["n_good"] == 1 and r1["main_chars"] == 101
        r2 = _run(spark, f"<p>{body} <a>{'l' * 31}</a></p>", min_stop_pct=0)
        assert (r2["n_good"], r2["main_chars"]) == (0, 0)

    def test_stopword_poor_code_dropped(self, spark):
        code = "def frobnicate(x): return x.map(lambda y: y * 2)  # " + (
            "z" * 60
        )
        r = _run(spark, f"<pre>{code}</pre>")
        assert r["n_good"] == 0

    def test_short_block_dropped_by_length(self, spark):
        r = _run(spark, "<p>the of and to a short one</p>")
        assert r["n_blocks"] == 1 and r["n_good"] == 0


class TestSegmentationAndCleaning:
    def test_script_style_comment_bodies_never_become_blocks(self, spark):
        noise = f"<script>{PROSE}</script><style>{PROSE}</style>" + (
            f"<!-- {PROSE} -->"
        )
        r = _run(spark, f"<html><body>{noise}<p>{PROSE}</p></body></html>")
        assert r["n_blocks"] == 1 and r["n_good"] == 1
        assert r["main_text"] == PROSE

    def test_case_insensitive_and_attribute_tags_split(self, spark):
        html = f'<DIV CLASS="a">{PROSE}</DIV><P id=x>{PROSE}</P>'
        r = _run(spark, html)
        assert r["n_blocks"] == 2 and r["n_good"] == 2
        assert r["main_text"] == PROSE + "\n" + PROSE

    def test_self_closing_br_splits_blocks(self, spark):
        r = _run(spark, f"<p>{PROSE}<br/>{PROSE}</p>")
        assert r["n_blocks"] == 2 and r["n_good"] == 2

    def test_inline_tags_stay_inside_block(self, spark):
        html = f"<p>{PROSE[:80]} <b>bold</b> <em>em</em> {PROSE[80:]}</p>"
        r = _run(spark, html)
        assert r["n_blocks"] == 1 and r["n_good"] == 1
        assert "bold" in r["main_text"] and "<" not in r["main_text"]

    def test_entities_decoded_after_tag_strip(self, spark):
        # &lt;ok&gt; decodes to literal <ok> TEXT (it was never a tag)
        html = f"<p>{PROSE} Quoted &amp; saved &lt;ok&gt;</p>"
        r = _run(spark, html)
        assert r["main_text"].endswith("Quoted & saved <ok>")

    def test_document_order_preserved(self, spark):
        first = PROSE
        second = PROSE.replace("quick", "slow")
        r = _run(spark, f"<p>{first}</p><div>junk</div><p>{second}</p>")
        assert r["main_text"] == first + "\n" + second

    def test_null_and_empty_html(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "<p></p>")], "doc_id long, html string"
        )
        rows = {
            r["doc_id"]: r
            for r in extract_main_content(df, "html", "doc_id").collect()
        }
        assert set(rows) == {1, 2, 3}
        for r in rows.values():
            assert (r["n_blocks"], r["n_good"], r["main_text"]) == (0, 0, "")

    def test_whitespace_collapsed(self, spark):
        r = _run(spark, f"<p>  the\t\tfox {PROSE}  </p>")
        assert "\t" not in r["main_text"]
        assert "  " not in r["main_text"]


class TestParams:
    def test_custom_stopwords(self, spark):
        body = ("lorem ipsum dolor sit amet " * 5).strip()
        assert _run(spark, f"<p>{body}</p>")["n_good"] == 0
        r = _run(
            spark,
            f"<p>{body}</p>",
            stopwords=["lorem", "ipsum"],
            min_stop_pct=25,
        )
        assert r["n_good"] == 1

    def test_param_validation(self, spark):
        df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
        with pytest.raises(ValueError):
            extract_main_content(df, min_chars=0)
        with pytest.raises(ValueError):
            extract_main_content(df, max_link_pct=101)
        with pytest.raises(ValueError):
            extract_main_content(df, min_stop_pct=-1)

    def test_multiple_docs_grouped_independently(self, spark):
        df = spark.createDataFrame(
            [(1, f"<p>{PROSE}</p>"), (2, "<p>short</p>")],
            "doc_id long, html string",
        )
        out = {
            r["doc_id"]: r["n_good"]
            for r in extract_main_content(df, "html", "doc_id").collect()
        }
        assert out == {1: 1, 2: 0}
