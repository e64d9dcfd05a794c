"""URL operators: parse fields, registered domain, blocklist filter,
per-domain cap determinism."""

from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    cap_per_domain,
    extract_url_parts,
    filter_urls,
)


def _parts(spark, url):
    df = spark.createDataFrame([(1, url)], "doc_id long, url string")
    r = extract_url_parts(df).collect()[0]
    return (r["url_scheme"], r["url_host"], r["url_domain"],
            r["url_path"], r["url_query"])


class TestExtractUrlParts:
    def test_full_url(self, spark):
        assert _parts(
            spark, "https://user:pw@News.BBC.co.uk:8080/world/uk?id=3&x=1#frag"
        ) == ("https", "news.bbc.co.uk", "bbc.co.uk", "/world/uk", "id=3&x=1")

    def test_plain_com(self, spark):
        assert _parts(spark, "http://www.example.com/a") == (
            "http", "www.example.com", "example.com", "/a", None)

    def test_bare_host_no_path(self, spark):
        assert _parts(spark, "https://example.com") == (
            "https", "example.com", "example.com", None, None)

    def test_single_label_host(self, spark):
        assert _parts(spark, "http://localhost:9000/x") == (
            "http", "localhost", "localhost", "/x", None)

    def test_malformed_is_all_null(self, spark):
        assert _parts(spark, "not a url") == (None, None, None, None, None)

    def test_multi_label_suffix_exact(self, spark):
        # host IS an eTLD+1 under a 2-label suffix: keeps all 3 labels
        assert _parts(spark, "https://bbc.co.uk/")[2] == "bbc.co.uk"


class TestFilterUrls:
    def test_blocklist_scheme_and_path(self, spark):
        rows = [
            (1, "https://good.com/a"),
            (2, "https://ads.tracker.com/a"),      # blocked domain
            (3, "ftp://good.com/a"),               # blocked scheme
            (4, "https://good.com/casino-games"),  # blocked path token
            (5, "garbage"),                        # unparseable
            (6, "https://sub.good.com/fine"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = filter_urls(
            df, block_domains=["tracker.com"],
            block_path_tokens=["casino"],
        )
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 6]
        assert "url_domain" in out.columns

    def test_empty_allow_schemes_rejected(self, spark):
        import pytest

        df = spark.createDataFrame([(1, "https://a.com")],
                                   "doc_id long, url string")
        with pytest.raises(ValueError, match="allow_schemes"):
            filter_urls(df, allow_schemes=[])


class TestCapPerDomain:
    def test_cap_and_determinism(self, spark):
        rows = [(i, f"https://{'big' if i < 40 else 'small'}.com/p/{i}")
                for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = cap_per_domain(df, cap=10)
        counts = {r["url_domain"]: r["n"] for r in
                  out.groupBy("url_domain").agg(F.count("*").alias("n")).collect()}
        assert counts == {"big.com": 10, "small.com": 10}
        # deterministic across partitionings
        a = sorted(r["doc_id"] for r in out.collect())
        b = sorted(
            r["doc_id"]
            for r in cap_per_domain(df.repartition(7), cap=10).collect()
        )
        assert a == b

    def test_bad_cap(self, spark):
        import pytest

        df = spark.createDataFrame([(1, "https://a.com")],
                                   "doc_id long, url string")
        with pytest.raises(ValueError, match="positive"):
            cap_per_domain(df, cap=0)


class TestCanonicalizeUrls:
    def _canon(self, spark, url, **kw):
        from sparkplug_spark.operators import canonicalize_urls

        df = spark.createDataFrame([(1, url)], "doc_id long, url string")
        return canonicalize_urls(df, **kw).collect()[0]["url_canon"]

    def test_folds_noise(self, spark):
        assert self._canon(
            spark,
            "HTTP://WWW.Example.com:80/a/b/?utm_source=x&z=2&a=1&fbclid=q#frag",
        ) == "http://example.com/a/b?a=1&z=2"

    def test_default_https_port_and_trailing_slash(self, spark):
        assert self._canon(spark, "https://example.com:443/") == "https://example.com"

    def test_nondefault_port_kept(self, spark):
        assert self._canon(spark, "https://example.com:8443/x") == "https://example.com:8443/x"

    def test_keep_www_option(self, spark):
        assert self._canon(spark, "https://www.example.com/x", strip_www=False) == \
            "https://www.example.com/x"

    def test_unparseable_is_null(self, spark):
        assert self._canon(spark, "not a url") is None

    def test_same_page_same_key(self, spark):
        from pyspark.sql import functions as F

        from sparkplug_spark.operators import canonicalize_urls

        variants = [
            (1, "http://WWW.shop.com/item/42?utm_campaign=a"),
            (2, "http://shop.com:80/item/42/"),
            (3, "http://shop.com/item/42#reviews"),
        ]
        df = spark.createDataFrame(variants, "doc_id long, url string")
        out = canonicalize_urls(df).agg(F.countDistinct("url_canon").alias("n")).collect()
        assert out[0]["n"] == 1


class TestVocabCoverage:
    def test_oov_rates(self, spark):
        from sparkplug_spark.operators import vocab_coverage

        df = spark.createDataFrame(
            [(1, "the the the rare"), (2, "the unique"), (3, "")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               vocab_coverage(df, vocab_size=1).collect()}
        # vocab = {'the'} (top-1); doc1: 4 tokens 1 oov; doc2: 2 tokens 1 oov
        assert (out[1]["n_tokens"], out[1]["n_oov"], out[1]["oov_ppm"]) == (4, 1, 250000)
        assert (out[2]["n_tokens"], out[2]["n_oov"], out[2]["oov_ppm"]) == (2, 1, 500000)
        assert (out[3]["n_tokens"], out[3]["n_oov"], out[3]["oov_ppm"]) == (0, 0, 0)

    def test_frozen_vocab(self, spark):
        from sparkplug_spark.operators import vocab_coverage

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        vocab = spark.createDataFrame([("a",), ("b",)], "token string")
        out = vocab_coverage(df, vocab=vocab).collect()[0]
        assert (out["n_tokens"], out["n_oov"]) == (3, 1)


class TestCanonicalizeProperties:
    def test_idempotent(self, spark):
        # canon(canon(x)) == canon(x): the canonical form is a fixed point
        from pyspark.sql import functions as F

        from sparkplug_spark.operators import canonicalize_urls

        urls = [
            "HTTP://WWW.A.com:80/x/?utm_a=1&b=2#f",
            "https://b.co.uk:8443/p?z=1&a=2",
            "ftp://weird.host/path",
            "https://c.com/",
        ]
        df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                                   "doc_id long, url string")
        once = canonicalize_urls(df).select(
            "doc_id", F.col("url_canon").alias("url"))
        twice = canonicalize_urls(once)
        bad = twice.filter(F.col("url") != F.col("url_canon")).collect()
        assert bad == []

    def test_cap_per_domain_uses_windowgrouplimit(self, spark):
        # scale contract: the per-domain cap must push a partial top-k
        # below the exchange (only <=cap rows per domain shuffle)
        from sparkplug_spark.operators import cap_per_domain

        df = spark.createDataFrame(
            [(i, f"https://d{i % 3}.com/{i}") for i in range(30)],
            "doc_id long, url string",
        )
        plan = (
            cap_per_domain(df, cap=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "WindowGroupLimit" in plan and "Partial" in plan
