"""Robots/usage-policy gate (E245): policy fields in
extract_html_metadata(policy=True) and the filter_by_policy opt-out
filter."""

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import extract_html_metadata, filter_by_policy


class TestPolicyMetadata:
    def _meta(self, spark, html):
        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        return extract_html_metadata(df, policy=True).collect()[0]

    def test_meta_robots_both_attribute_orders(self, spark):
        a = self._meta(spark, '<meta name="robots" content="NoIndex, nofollow">')
        b = self._meta(spark, '<meta content="NOAI" name="robots">')
        assert a["meta_robots"] == "noindex, nofollow"
        assert b["meta_robots"] == "noai"

    def test_license_url_extracted(self, spark):
        r = self._meta(
            spark,
            '<link rel="license" '
            'href="https://creativecommons.org/licenses/by/4.0/">',
        )
        assert r["license_url"] == (
            "https://creativecommons.org/licenses/by/4.0/"
        )

    def test_absent_fields_null(self, spark):
        r = self._meta(spark, "<html><body><p>x</p></body></html>")
        assert r["meta_robots"] is None and r["license_url"] is None

    def test_base_schema_unchanged_without_policy(self, spark):
        df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
        cols = extract_html_metadata(df).columns
        assert "meta_robots" not in cols and "license_url" not in cols


class TestFilterByPolicy:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, None, "cc-by"),
                (2, "index, follow", "cc-by"),
                (3, "NoAI", "cc-by"),
                (4, " noindex ,nofollow", "cc-by"),
                (5, "index", "proprietary"),
                (6, "index", None),
            ],
            "doc_id long, meta_robots string, license string",
        )

    def test_deny_tokens_drop(self, spark):
        kept = {
            r["doc_id"] for r in filter_by_policy(self._df(spark)).collect()
        }
        assert kept == {1, 2, 5, 6}

    def test_token_match_not_substring(self, spark):
        df = spark.createDataFrame(
            [(1, "noindexing"), (2, "noindex")],
            "doc_id long, meta_robots string",
        )
        kept = {r["doc_id"] for r in filter_by_policy(df).collect()}
        assert kept == {1}

    def test_license_allowlist_requires_affirmative(self, spark):
        kept = {
            r["doc_id"]
            for r in filter_by_policy(
                self._df(spark),
                license_col="license",
                allow_licenses=["cc-by", "cc0"],
            ).collect()
        }
        assert kept == {1, 2}  # 5 wrong license, 6 NULL license both drop

    def test_flag_only_appends_boolean(self, spark):
        out = {
            r["doc_id"]: r["policy_ok"]
            for r in filter_by_policy(
                self._df(spark), flag_only=True
            ).collect()
        }
        assert out == {1: True, 2: True, 3: False, 4: False, 5: True, 6: True}

    def test_param_validation(self, spark):
        df = self._df(spark)
        with pytest.raises(ValueError):
            filter_by_policy(df, deny=())
        with pytest.raises(ValueError):
            filter_by_policy(df, allow_licenses=["cc-by"])
