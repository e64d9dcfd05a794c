"""HTML metadata extraction (E237) and site-template block removal
(E238)."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    drop_repeated_blocks,
    extract_html_metadata,
)


def _meta(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return extract_html_metadata(df).collect()[0]


class TestExtractHtmlMetadata:
    def test_full_head(self, spark):
        r = _meta(
            spark,
            '<html lang="EN-us"><head><title> The &amp; Title </title>'
            '<meta name="description" content="A description">'
            '<link rel="canonical" href="https://example.com/x">'
            "<script>var a=1;</script></head>"
            '<body><a href="/1">one</a><A HREF="/2">two</A></body></html>',
        )
        assert r["title"] == "The & Title"
        assert r["meta_description"] == "A description"
        assert r["html_lang"] == "en-us"
        assert r["canonical_url"] == "https://example.com/x"
        assert r["n_anchors"] == 2 and r["n_scripts"] == 1

    def test_reversed_meta_attribute_order(self, spark):
        r = _meta(
            spark, '<meta content="Reversed order" name="description">'
        )
        assert r["meta_description"] == "Reversed order"

    def test_absent_fields_are_null(self, spark):
        r = _meta(spark, "<p>no head</p>")
        assert r["title"] is None
        assert r["meta_description"] is None
        assert r["html_lang"] is None
        assert r["canonical_url"] is None
        assert (r["n_anchors"], r["n_scripts"]) == (0, 0)

    def test_empty_title_is_null(self, spark):
        assert _meta(spark, "<title>  </title>")["title"] is None

    def test_null_html(self, spark):
        df = spark.createDataFrame([(1, None)], "doc_id long, html string")
        r = extract_html_metadata(df).collect()[0]
        assert r["title"] is None and r["n_anchors"] == 0

    def test_nested_markup_in_title_stripped(self, spark):
        r = _meta(spark, "<title>A <b>bold</b>\n  move</title>")
        assert r["title"] == "A bold move"


class TestDropRepeatedBlocks:
    def _corpus(self, spark):
        rows = []
        for i in range(5):
            rows.append(
                (
                    i,
                    "s1",
                    f"<p>unique body {i} content</p>"
                    "<footer>shared footer of site one</footer>",
                )
            )
        # the SAME footer text under another group must NOT be dropped
        rows.append(
            (
                10,
                "s2",
                "<p>unique body ten</p>"
                "<footer>shared footer of site one</footer>",
            )
        )
        return spark.createDataFrame(
            rows, "doc_id long, src string, html string"
        )

    def test_grouped_template_dropped_only_within_group(self, spark):
        out = {
            r["doc_id"]: r
            for r in drop_repeated_blocks(
                self._corpus(spark), "html", "doc_id",
                group_col="src", min_docs=3,
            ).collect()
        }
        for i in range(5):
            assert out[i]["n_dropped"] == 1
            assert out[i]["content_text"] == f"unique body {i} content"
        assert out[10]["n_dropped"] == 0
        assert "shared footer" in out[10]["content_text"]

    def test_corpus_wide_when_no_group(self, spark):
        out = {
            r["doc_id"]: r
            for r in drop_repeated_blocks(
                self._corpus(spark), "html", "doc_id", min_docs=3
            ).collect()
        }
        # without grouping the footer repeats in 6 docs -> dropped even in s2
        assert out[10]["n_dropped"] == 1
        assert out[10]["content_text"] == "unique body ten"

    def test_repeat_within_one_doc_does_not_count_twice(self, spark):
        df = spark.createDataFrame(
            [
                (1, "<p>same block</p><p>same block</p><p>own text</p>"),
                (2, "<p>same block</p>"),
            ],
            "doc_id long, html string",
        )
        out = {
            r["doc_id"]: r
            for r in drop_repeated_blocks(
                df, "html", "doc_id", min_docs=3
            ).collect()
        }
        # "same block" appears in only 2 DISTINCT docs -> kept
        assert out[1]["n_dropped"] == 0
        assert out[1]["content_text"].count("same block") == 2

    def test_document_order_preserved(self, spark):
        df = spark.createDataFrame(
            [(i, "<p>alpha</p><p>keep %d</p><p>omega</p>" % i) for i in range(3)],
            "doc_id long, html string",
        )
        out = drop_repeated_blocks(df, "html", "doc_id", min_docs=3).collect()
        for r in out:
            assert r["content_text"] == f"keep {r['doc_id']}"
            assert r["n_dropped"] == 2

    def test_empty_doc_row_survives(self, spark):
        df = spark.createDataFrame(
            [(1, "<p>body text here</p>"), (2, ""), (3, None)],
            "doc_id long, html string",
        )
        out = {
            r["doc_id"]: r
            for r in drop_repeated_blocks(
                df, "html", "doc_id", min_docs=3
            ).collect()
        }
        assert set(out) == {1, 2, 3}
        assert out[2]["n_blocks"] == 0 and out[2]["content_text"] == ""

    def test_null_group_forms_its_own_group(self, spark):
        # r8 ADVICE: a plain equality join never matched NULL group keys,
        # so template blocks in NULL-group docs were silently kept
        rows = [
            (i, None, f"<p>unique body {i} content</p>"
                      "<footer>shared footer of nullgroup</footer>")
            for i in range(4)
        ] + [(9, "s1", "<p>solo page body</p>"
                       "<footer>shared footer of nullgroup</footer>")]
        df = spark.createDataFrame(
            rows, "doc_id long, src string, html string"
        )
        out = {
            r["doc_id"]: r
            for r in drop_repeated_blocks(
                df, "html", "doc_id", group_col="src", min_docs=3
            ).collect()
        }
        for i in range(4):
            assert out[i]["n_dropped"] == 1
            assert out[i]["content_text"] == f"unique body {i} content"
        # the s1 doc shares the footer TEXT but not the group -> kept
        assert out[9]["n_dropped"] == 0
        assert "shared footer" in out[9]["content_text"]

    def test_min_docs_validation(self, spark):
        df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
        with pytest.raises(ValueError):
            drop_repeated_blocks(df, min_docs=1)
