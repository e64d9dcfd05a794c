"""Image–text pair construction (E242): <img> reference extraction with
caption candidates, and the canonical-URL join to the decoded-image
lane."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import extract_image_refs, image_text_pairs


def _refs(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return sorted(
        extract_image_refs(df, "html", "doc_id").collect(),
        key=lambda r: r["img_pos"],
    )


class TestExtractImageRefs:
    def test_src_alt_title_extracted(self, spark):
        html = (
            '<p>text</p><img src="http://e.com/a.png" alt="a cat photo" '
            'title="the title">'
            "<img src='http://e.com/b.png'>"
        )
        rows = _refs(spark, html)
        assert len(rows) == 2
        assert rows[0]["src"] == "http://e.com/a.png"
        assert rows[0]["alt"] == "a cat photo"
        assert rows[0]["title"] == "the title"
        assert rows[0]["caption"] == "a cat photo"
        assert rows[1]["alt"] is None and rows[1]["caption"] is None

    def test_img_pos_in_document_order(self, spark):
        html = "".join(f'<img src="/i/{i}.png">' for i in range(4))
        rows = _refs(spark, html)
        assert [r["img_pos"] for r in rows] == [0, 1, 2, 3]
        assert [r["src"] for r in rows] == [f"/i/{i}.png" for i in range(4)]

    def test_figcaption_wins_over_alt(self, spark):
        html = (
            '<figure><img src="/x.png" alt="alt text">'
            "<figcaption>A <b>figure</b> caption &amp; more</figcaption>"
            "</figure>"
        )
        r = _refs(spark, html)[0]
        assert r["figcaption"] == "A figure caption & more"
        assert r["caption"] == "A figure caption & more"

    def test_img_without_src_skipped(self, spark):
        rows = _refs(spark, '<img alt="no src"><img src="/ok.png">')
        # the src-less tag emits no row but still occupies position 0
        assert [(r["img_pos"], r["src"]) for r in rows] == [(1, "/ok.png")]

    def test_commented_img_ignored(self, spark):
        html = '<!-- <img src="/ghost.png"> --><img src="/real.png">'
        rows = _refs(spark, html)
        assert [r["src"] for r in rows] == ["/real.png"]

    def test_entities_decoded_in_captions(self, spark):
        r = _refs(spark, '<img src="/a.png" alt="x &lt;y&gt; &amp; z">')[0]
        assert r["alt"] == "x <y> & z"

    def test_repeated_src_in_figures_takes_min_caption(self, spark):
        html = (
            '<figure><img src="/s.png"><figcaption>zebra cap</figcaption>'
            '</figure><figure><img src="/s.png">'
            "<figcaption>alpha cap</figcaption></figure>"
        )
        rows = _refs(spark, html)
        assert all(r["figcaption"] == "alpha cap" for r in rows)


class TestImageTextPairs:
    def _pages(self, spark):
        return spark.createDataFrame(
            [
                (
                    1,
                    '<img src="HTTP://WWW.Img.example:80/i/1.png?utm_s=x" '
                    'alt="first caption">'
                    '<img src="http://img.example/i/2.png">',
                ),
                (2, '<img src="http://img.example/i/2.png" alt="second cap">'),
            ],
            "doc_id long, html string",
        )

    def _images(self, spark):
        return spark.createDataFrame(
            [
                ("http://img.example/i/1.png", 11, 101),
                ("http://img.example/i/2.png#frag", 22, 202),
                ("http://img.example/i/unreferenced.png", 33, 303),
            ],
            "url string, dhash_hi long, dhash_lo long",
        )

    def test_join_on_canonical_url(self, spark):
        out = sorted(
            image_text_pairs(
                self._pages(spark), self._images(spark)
            ).collect(),
            key=lambda r: (r["doc_id"], r["img_pos"]),
        )
        # doc1 img2 has no caption -> dropped by require_caption
        assert [(r["doc_id"], r["img_pos"]) for r in out] == [(1, 0), (2, 0)]
        assert out[0]["image_url"] == "http://img.example/i/1.png"
        assert out[0]["caption"] == "first caption"
        assert (out[0]["dhash_hi"], out[0]["dhash_lo"]) == (11, 101)
        assert out[1]["image_url"] == "http://img.example/i/2.png"
        assert (out[1]["dhash_hi"], out[1]["dhash_lo"]) == (22, 202)

    def test_require_caption_false_keeps_all_matches(self, spark):
        out = image_text_pairs(
            self._pages(spark), self._images(spark), require_caption=False
        ).collect()
        assert len(out) == 3
        caps = {(r["doc_id"], r["img_pos"]): r["caption"] for r in out}
        assert caps[(1, 1)] is None

    def test_relative_srcs_never_match(self, spark):
        pages = spark.createDataFrame(
            [(1, '<img src="/relative/i.png" alt="c">')],
            "doc_id long, html string",
        )
        assert image_text_pairs(pages, self._images(spark)).count() == 0
