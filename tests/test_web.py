"""URL canonicalization / registered-domain / url_dedup unit tests."""

import pytest

from db_cdc_poc_spark.operators.web import (
    canonical_url,
    host_of,
    registered_domain,
    url_dedup,
)

pytestmark = pytest.mark.usefixtures("spark")


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url("url").alias("c")).collect()]


def test_canonical_url_full_normalization(spark):
    got = _canon(
        spark,
        ["HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&id=3&a=1#frag"],
    )
    # authority lowercased, www. + default port stripped, path case and
    # order preserved, trailing slash trimmed, tracking param dropped,
    # survivors sorted, fragment gone
    assert got == ["https://example.com/A/b?a=1&id=3"]


def test_canonical_url_ports_and_plain(spark):
    got = _canon(
        spark,
        [
            "http://a.com:80/x",
            "http://a.com:8080/x",
            "https://a.com/",
            "https://a.com/x?utm_source=1&fbclid=2",
            "https://a.com/x?id=1&id=0",
        ],
    )
    assert got == [
        "http://a.com/x",
        "http://a.com:8080/x",  # non-default port kept
        "https://a.com",
        "https://a.com/x",  # all params were tracking
        "https://a.com/x?id=0&id=1",  # repeated keys sorted, kept
    ]


def test_canonical_url_equates_known_variants(spark):
    variants = [
        "https://www.shop.example.com/p/1?utm_campaign=a&sku=9",
        "HTTPS://shop.example.com:443/p/1/?sku=9",
        "https://shop.example.com/p/1?sku=9#reviews",
    ]
    assert len(set(_canon(spark, variants))) == 1


def test_canonical_url_without_scheme_passes_through(spark):
    assert _canon(spark, ["not a url"]) == ["not a url"]


def test_host_and_registered_domain(spark):
    rows = [
        ("https://news.bbc.co.uk/x?q=1",),
        ("https://a.b.example.com/",),
        ("http://user:pw@Sub.Example.COM:8080/p",),
        ("https://localhost/x",),
    ]
    df = spark.createDataFrame(rows, "url string")
    out = df.select(
        host_of("url").alias("h"), registered_domain("url").alias("d")
    ).collect()
    assert [(r.h, r.d) for r in out] == [
        ("news.bbc.co.uk", "bbc.co.uk"),  # ccTLD second-level: 3 labels
        ("a.b.example.com", "example.com"),
        ("sub.example.com", "example.com"),  # userinfo + port stripped
        ("localhost", "localhost"),  # single label: kept whole
    ]


def test_url_dedup_prefers_then_breaks_ties_low_id(spark):
    rows = [
        (1, "https://www.a.com/p?utm_source=x", 10),
        (2, "https://a.com/p", 30),  # same canonical, longest -> wins
        (3, "https://a.com/p/", 30),  # tie on prefer -> lower id wins
        (4, "https://a.com/q", 5),  # distinct page survives
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    out = url_dedup(df, "url", "doc_id", prefer_col="n_chars")
    got = {r.doc_id: r.canonical_url for r in out.collect()}
    assert set(got) == {2, 4}
    assert got[2] == "https://a.com/p"


def test_url_dedup_no_prefer_keeps_lowest_id(spark):
    rows = [(7, "https://a.com/p"), (3, "https://a.com/p#top")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(df, "url", "doc_id")
    assert [r.doc_id for r in out.collect()] == [3]


def test_domain_stats_counts_hosts_and_share(spark):
    from db_cdc_poc_spark.operators.web import domain_stats

    rows = [
        (1, "https://a.shop.com/x"),
        (2, "https://b.shop.com/y"),
        (3, "https://a.shop.com/z"),
        (4, "https://news.bbc.co.uk/1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.domain: r for r in domain_stats(df, "url").collect()}
    assert got["shop.com"].n_docs == 3 and got["shop.com"].n_hosts == 2
    assert got["bbc.co.uk"].n_docs == 1
    assert got["shop.com"].share_ppm == 750_000
    assert got["bbc.co.uk"].share_ppm == 250_000


def test_blocklist_blocks_subdomains_and_fails_open(spark):
    from db_cdc_poc_spark.operators.web import filter_blocked_domains

    rows = [
        (1, "https://evil.com/x"),
        (2, "https://deep.sub.evil.com/y"),  # subdomain: blocked too
        (3, "https://good.com/z"),
        (4, "not a url"),  # unparseable: kept (fail open)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("evil.com",)], "domain string")
    kept = {r.doc_id for r in filter_blocked_domains(df, bl, "url").collect()}
    assert kept == {3, 4}
