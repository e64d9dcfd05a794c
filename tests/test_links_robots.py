"""Link extraction (E247) and robots.txt parsing/matching (E248)."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    extract_links,
    match_robots,
    parse_robots_txt,
)


class TestExtractLinks:
    def _links(self, spark, html):
        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        return sorted(
            extract_links(df).collect(), key=lambda r: r["link_pos"]
        )

    def test_href_text_rel(self, spark):
        html = (
            '<a href="http://e.com/a">first <b>link</b> &amp; text</a>'
            '<a rel="NoFollow" href="/b">second</a>'
            "<a name='anchor-only'>no href</a>"
        )
        rows = self._links(spark, html)
        assert [(r["link_pos"], r["href"]) for r in rows] == [
            (0, "http://e.com/a"), (1, "/b"),
        ]
        assert rows[0]["anchor_text"] == "first link & text"
        assert rows[0]["rel"] is None
        assert rows[1]["rel"] == "nofollow"

    def test_empty_anchor_text_null(self, spark):
        rows = self._links(spark, '<a href="/x"></a>')
        assert rows[0]["anchor_text"] is None

    def test_commented_anchor_ignored(self, spark):
        rows = self._links(
            spark, '<!-- <a href="/ghost">g</a> --><a href="/r">r</a>'
        )
        assert [r["href"] for r in rows] == ["/r"]


ROBOTS = """# site policy
Sitemap: http://e.com/sitemap.xml
User-agent: *
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 2

User-agent: trainbot
User-agent: otherbot
Disallow: /
Allow: /open/
Disallow:
Disallow: /glob/*.json
"""


class TestParseRobots:
    def _rules(self, spark):
        df = spark.createDataFrame(
            [("e.com", ROBOTS)], "host string, robots_txt string"
        )
        return parse_robots_txt(df).collect()

    def test_groups_and_shared_agents(self, spark):
        rows = self._rules(spark)
        star = {(r["directive"], r["path"]) for r in rows if r["agent"] == "*"}
        assert star == {
            ("disallow", "/private/"),
            ("allow", "/private/ok/"),
            ("crawl-delay", "2"),
        }
        # consecutive UA lines share the second group's rules
        tb = {(r["directive"], r["path"]) for r in rows if r["agent"] == "trainbot"}
        ob = {(r["directive"], r["path"]) for r in rows if r["agent"] == "otherbot"}
        assert tb == ob
        assert ("disallow", "/") in tb and ("allow", "/open/") in tb
        assert ("disallow", "") in tb  # empty disallow kept, matcher ignores

    def test_wildcard_flagged(self, spark):
        rows = self._rules(spark)
        wc = [r for r in rows if r["has_wildcard"]]
        assert wc and all(r["path"] == "/glob/*.json" for r in wc)

    def test_crawl_delay_surfaced_not_matched(self, spark):
        rows = self._rules(spark)
        cd = [r for r in rows if r["directive"] == "crawl-delay"]
        assert {(r["agent"], r["path"]) for r in cd} == {("*", "2")}

    def test_sitemaps_extracted(self, spark):
        from sparkplug_spark.operators import robots_sitemaps

        df = spark.createDataFrame(
            [("e.com", ROBOTS)], "host string, robots_txt string"
        )
        out = robots_sitemaps(df).collect()
        assert [(r["host"], r["sitemap_url"]) for r in out] == [
            ("e.com", "http://e.com/sitemap.xml")
        ]

    def test_comments_stripped(self, spark):
        df = spark.createDataFrame(
            [("e.com", "User-agent: * # all\nDisallow: /x # hidden\n")],
            "host string, robots_txt string",
        )
        rows = parse_robots_txt(df).collect()
        assert [(r["agent"], r["path"]) for r in rows] == [("*", "/x")]


class TestMatchRobots:
    def _verdicts(self, spark, agent):
        rules = parse_robots_txt(
            spark.createDataFrame(
                [("e.com", ROBOTS)], "host string, robots_txt string"
            )
        )
        urls = spark.createDataFrame(
            [
                (1, "e.com", "http://e.com/public/page"),
                (2, "e.com", "http://e.com/private/doc"),
                (3, "e.com", "http://e.com/private/ok/doc"),
                (4, "e.com", "http://e.com/open/data"),
                (5, "e.com", "http://e.com"),
                (6, "other.com", "http://other.com/private/doc"),
            ],
            "doc_id long, host string, url string",
        )
        return {
            r["doc_id"]: r
            for r in match_robots(urls, rules, agent=agent).collect()
        }

    def test_star_group(self, spark):
        v = self._verdicts(spark, "somebot")
        assert v[1]["allowed"] and v[1]["matched_path"] is None
        assert not v[2]["allowed"]
        assert v[2]["matched_path"] == "/private/"
        # longest match wins: the allow outranks the shorter disallow
        assert v[3]["allowed"] and v[3]["matched_path"] == "/private/ok/"
        assert v[4]["allowed"]
        assert v[5]["allowed"]  # bare host -> path "/"; no "/" rule in *
        assert v[6]["allowed"]  # host without robots rules

    def test_exact_agent_group_preferred(self, spark):
        v = self._verdicts(spark, "TrainBot")
        assert not v[1]["allowed"]  # Disallow: / catches everything
        assert v[1]["matched_path"] == "/"
        assert v[4]["allowed"] and v[4]["matched_path"] == "/open/"
        assert not v[5]["allowed"]
        # the * group's /private/ok/ allow does NOT apply to trainbot
        assert not v[3]["allowed"]

    def test_wildcard_longest_pattern_wins(self, spark):
        # trainbot's /glob/*.json (12 octets) outranks Disallow: / and
        # Allow: /open/ — and without a trailing-$ anchor it matches as
        # a PREFIX pattern (x.json5 still trips it)
        rules = parse_robots_txt(
            spark.createDataFrame(
                [("e.com", ROBOTS)], "host string, robots_txt string"
            )
        )
        urls = spark.createDataFrame(
            [
                (1, "e.com", "http://e.com/glob/x.json"),
                (2, "e.com", "http://e.com/glob/x.json5"),
                (3, "e.com", "http://e.com/glob/x.txt"),
            ],
            "doc_id long, host string, url string",
        )
        v = {
            r["doc_id"]: r
            for r in match_robots(urls, rules, agent="trainbot").collect()
        }
        assert not v[1]["allowed"]
        assert v[1]["matched_path"] == "/glob/*.json"
        assert not v[2]["allowed"]  # unanchored pattern = prefix match
        assert v[2]["matched_path"] == "/glob/*.json"
        assert not v[3]["allowed"]  # falls back to Disallow: /
        assert v[3]["matched_path"] == "/"

    def test_dollar_anchor_and_mid_dollar_literal(self, spark):
        body = (
            "User-agent: *\n"
            "Disallow: /*.pdf$\n"
            "Disallow: /cash/$$/\n"
        )
        rules = parse_robots_txt(
            spark.createDataFrame(
                [("e.com", body)], "host string, robots_txt string"
            )
        )
        urls = spark.createDataFrame(
            [
                (1, "e.com", "http://e.com/docs/a.pdf"),
                (2, "e.com", "http://e.com/docs/a.pdfx"),  # $ anchors
                (3, "e.com", "http://e.com/cash/$$/x"),  # mid-$ literal
                (4, "e.com", "http://e.com/cash/ab/x"),
            ],
            "doc_id long, host string, url string",
        )
        v = {
            r["doc_id"]: r
            for r in match_robots(urls, rules).collect()
        }
        assert not v[1]["allowed"] and v[1]["matched_path"] == "/*.pdf$"
        assert v[2]["allowed"] and v[2]["matched_path"] is None
        assert not v[3]["allowed"] and v[3]["matched_path"] == "/cash/$$/"
        assert v[4]["allowed"]

    def test_duplicate_rows_preserved_and_map_columns_ok(self, spark):
        # the verdict is a per-row projection: duplicate URL rows stay
        # duplicated, and non-groupable column types (maps) pass through
        rules = parse_robots_txt(
            spark.createDataFrame(
                [("e.com", ROBOTS)], "host string, robots_txt string"
            )
        )
        urls = spark.createDataFrame(
            [
                ("e.com", "http://e.com/private/doc", {"k": "v1"}),
                ("e.com", "http://e.com/private/doc", {"k": "v2"}),
            ],
            "host string, url string, meta map<string,string>",
        )
        rows = match_robots(urls, rules).collect()
        assert len(rows) == 2
        assert all(not r["allowed"] for r in rows)
        assert sorted(r["meta"]["k"] for r in rows) == ["v1", "v2"]


class TestCrawlFrontier:
    def test_discover_dedupe_cap(self, spark):
        from sparkplug_spark.operators import crawl_frontier

        pages = spark.createDataFrame(
            [
                (1, '<a href="http://e.com/new/a">x</a>'
                    '<a href="HTTP://WWW.e.com/new/a?utm_s=1">dup</a>'
                    '<a rel="nofollow" href="http://e.com/spam">s</a>'),
                (2, '<a href="http://e.com/new/a">y</a>'
                    '<a href="http://e.com/seen">old</a>'
                    '<a href="http://e.com/new/b">z</a>'),
            ],
            "doc_id long, html string",
        )
        crawled = spark.createDataFrame(
            [("http://e.com/seen",)], "url string"
        )
        out = {
            r["url"]: r
            for r in crawl_frontier(pages, crawled).collect()
        }
        assert set(out) == {"http://e.com/new/a", "http://e.com/new/b"}
        a = out["http://e.com/new/a"]
        assert a["n_refs"] == 3  # both variants from doc1 + doc2's ref
        assert (a["first_doc"], a["first_pos"]) == (1, 0)
        assert a["url_domain"] == "e.com"

    def test_per_domain_cap_deterministic(self, spark):
        from sparkplug_spark.operators import crawl_frontier

        html = "".join(
            f'<a href="http://e.com/p/{i}">l</a>' for i in range(10)
        )
        pages = spark.createDataFrame(
            [(1, html)], "doc_id long, html string"
        )
        crawled = spark.createDataFrame([("http://x.com/",)], "url string")
        out1 = sorted(
            r["url"]
            for r in crawl_frontier(
                pages, crawled, per_domain_cap=4
            ).collect()
        )
        out2 = sorted(
            r["url"]
            for r in crawl_frontier(
                pages, crawled, per_domain_cap=4
            ).collect()
        )
        assert len(out1) == 4 and out1 == out2
