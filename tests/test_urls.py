"""URL parsing / normalization / domain curation (operators/urls.py):
parse decomposition, the C4-style canonicalization rules, registered-domain
extraction incl. two-level suffixes, deterministic domain caps, and the
per-domain profile — all checked against hand-written expectations."""

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.urls import (
    domain_caps,
    domain_stats,
    normalize_urls,
    parse_urls,
    registered_domain,
)

URLS = [
    (0, "https://www.Example.com/path/page?a=1&utm_source=x&b=2#frag"),
    (1, "http://example.com:80/"),
    (2, "HTTPS://Sub.Example.CO.UK:443?fbclid=abc"),
    (3, "https://example.com:8443/x?gclid=1"),
    (4, "not a url"),
    (5, None),
    (6, "ftp://files.example.org/pub/file.txt"),
    (7, "https://example.com/search?q=hello&UTM_CAMPAIGN=z&q2=w"),
]


def _df(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


class TestParseUrls:
    def test_decomposition(self, spark):
        out = {r["doc_id"]: r for r in parse_urls(_df(spark)).collect()}
        r = out[0]
        assert (r["scheme"], r["host"], r["port"]) == ("https", "www.example.com", "")
        assert r["path"] == "/path/page"
        assert r["query"] == "a=1&utm_source=x&b=2"
        assert out[1]["port"] == "80"
        assert out[2]["host"] == "sub.example.co.uk"
        assert out[6]["scheme"] == "ftp"
        # unparseable / NULL rows -> empty parts
        assert out[4]["host"] == ""

    def test_missing_column(self, spark):
        with pytest.raises(DataFrameValidationError):
            parse_urls(_df(spark), url_col="nope")


class TestNormalizeUrls:
    def test_rules(self, spark):
        out = {
            r["doc_id"]: r["url_norm"]
            for r in normalize_urls(_df(spark)).collect()
        }
        # lowercase host, fragment dropped, utm_ stripped, order preserved
        assert out[0] == "https://www.example.com/path/page?a=1&b=2"
        # default port dropped, empty path -> /
        assert out[1] == "http://example.com/"
        # scheme lowercased, 443 dropped, tracking-only query removed
        assert out[2] == "https://sub.example.co.uk/"
        # non-default port preserved
        assert out[3] == "https://example.com:8443/x"
        # unparseable -> NULL (quarantine convention)
        assert out[4] is None and out[5] is None
        # case-insensitive utm_ prefix
        assert out[7] == "https://example.com/search?q=hello&q2=w"

    def test_idempotent(self, spark):
        once = normalize_urls(_df(spark))
        twice = normalize_urls(
            once.select("doc_id", "url_norm"), url_col="url_norm", out_col="n2"
        )
        for r in twice.collect():
            assert r["n2"] == r["url_norm"]


class TestRegisteredDomain:
    def test_suffix_handling(self, spark):
        hosts = [
            (0, "www.example.com", "example.com"),
            (1, "a.b.example.co.uk", "example.co.uk"),
            (2, "news.site.com.au", "site.com.au"),
            (3, "example.org", "example.org"),
            (4, "localhost", "localhost"),
            (5, "deep.sub.domain.net", "domain.net"),
        ]
        df = spark.createDataFrame(
            [(i, h) for i, h, _ in hosts], "doc_id long, host string"
        )
        out = {r["doc_id"]: r["domain"] for r in registered_domain(df).collect()}
        for i, _, want in hosts:
            assert out[i] == want, (i, out[i], want)


class TestDomainCaps:
    def _docs(self, spark):
        rows = [(i, "big.com" if i < 40 else f"d{i}.com") for i in range(50)]
        return spark.createDataFrame(rows, "doc_id long, domain string")

    def test_cap_and_determinism(self, spark):
        df = self._docs(spark)
        kept = domain_caps(df, "domain", cap=5)
        by_dom = (
            kept.groupBy("domain").count().rdd.map(lambda r: (r[0], r[1])).collect()
        )
        assert dict(by_dom)["big.com"] == 5
        assert all(c <= 5 for _, c in by_dom)
        # pure function of rows: same kept set at different partitioning
        again = set(
            r["doc_id"]
            for r in domain_caps(df.repartition(7), "domain", cap=5).collect()
        )
        assert again == set(r["doc_id"] for r in kept.collect())
        # different seed -> (almost surely) different big.com sample
        other = set(
            r["doc_id"]
            for r in domain_caps(df, "domain", cap=5, seed="other").collect()
            if r["domain"] == "big.com"
        )
        assert other != set(
            r["doc_id"] for r in kept.collect() if r["domain"] == "big.com"
        )

    def test_validation(self, spark):
        df = self._docs(spark)
        with pytest.raises(DataFrameValidationError):
            domain_caps(df, "domain", cap=0)
        with pytest.raises(DataFrameValidationError):
            domain_caps(df, "nope", cap=1)


class TestDomainStats:
    def test_profile(self, spark):
        df = spark.createDataFrame(
            [(0, "a.com", 10), (1, "a.com", 30), (2, "b.com", 5)],
            "doc_id long, domain string, nbytes long",
        )
        out = {
            r["domain"]: r for r in domain_stats(df, "domain", "nbytes").collect()
        }
        assert out["a.com"]["n_docs"] == 2
        assert out["a.com"]["share"] == pytest.approx(2 / 3, abs=1e-6)
        assert out["a.com"]["total_size"] == 40
        assert out["a.com"]["mean_size"] == pytest.approx(20.0)
        assert out["b.com"]["n_docs"] == 1
